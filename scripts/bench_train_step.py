"""Flagship CP train-step timing harness (the BENCHMARKS.md step-
optimization study, codified).

Measures ms/step for the reference training envelope — siglip d=1536,
6 layers, 16 heads, L=16+1, focal loss, AdamW+OneCycle, remat — on a
device-resident synthetic catalog. Iterations are serialized by the state
dependency; a scalar D2H syncs the chain (the axon relay's
block_until_ready does not wait for device completion).

Variants are selected with the shipping env flags, so every row of the
study is reproducible:
    OUTFITX_FAST_PRNG=1        rbg dropout keys (default on this path)
    OUTFITX_MHA_BWD=xla        XLA-recompute MHA backward (vs fused Pallas)
    OUTFITX_MHA_TILE=128       forward attention batch-tile override
    OUTFITX_MHA_BWD_TILE=32    backward attention batch-tile override
    OUTFITX_DROPOUT_BITS=exact exact bernoulli masks (vs uint8 bits)

    python scripts/bench_train_step.py [--batch 3072] [--dropout 0.3]
        [--iters 20] [--no-remat] [--smoke]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3072)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--dropout", type=float, default=None)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--items", type=int, default=8192)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument(
        "--smoke", action="store_true", help="tiny shapes, CPU-runnable"
    )
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        apply_env_flags,
        enable_compilation_cache,
        retry_if_backend_down,
    )

    if not args.smoke:
        retry_if_backend_down()
    enable_compilation_cache()
    apply_env_flags()

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core.config import (
        OptimizerConfig,
        OutfitXConfig,
        TransformerConfig,
    )
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.train.optim import make_optimizer
    from outfitx_tpu.train.state import TrainState
    from outfitx_tpu.train.steps import make_cp_train_step

    if args.smoke:
        args.batch, args.items, args.iters = 8, 64, 2
        cfg = OutfitXConfig(
            transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=2),
            max_outfit_len=8,
        )
    else:
        tcfg = TransformerConfig()
        if args.dropout is not None:
            tcfg = TransformerConfig(dropout=args.dropout)
        cfg = OutfitXConfig(transformer=tcfg, remat=not args.no_remat)
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizerConfig(), total_steps=1000)
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    step = make_cp_train_step(model, tx)

    rng = np.random.default_rng(0)
    b, l, a = args.batch, cfg.max_outfit_len, args.accum
    catalog = jnp.asarray(
        rng.standard_normal((args.items + 1, cfg.d_embed)), dtype=jnp.float32
    )
    batch = {
        "item_idx": jnp.asarray(
            rng.integers(0, args.items, (a, b, l)), dtype=jnp.int32
        ),
        "mask": jnp.asarray(
            np.arange(l)[None, None, :] >= rng.integers(2, l + 1, (a, b, 1))
        ),
        "label": jnp.asarray(
            (rng.random((a, b)) > 0.5).astype(np.float32)
        ),
    }

    t0 = time.perf_counter()
    state, out = step(state, catalog, batch)
    float(np.asarray(out["loss"]))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, out = step(state, catalog, batch)
    float(np.asarray(out["loss"]))
    dt = (time.perf_counter() - t0) / args.iters

    flags = {
        k: os.environ[k]
        for k in (
            "OUTFITX_FAST_PRNG",
            "OUTFITX_MHA_BWD",
            "OUTFITX_MHA_TILE",
            "OUTFITX_MHA_BWD_TILE",
            "OUTFITX_DROPOUT_BITS",
        )
        if k in os.environ
    }
    print(
        json.dumps(
            {
                "metric": "cp_train_step_ms",
                "value": round(dt * 1000, 1),
                "unit": "ms/step",
                "batch": b,
                "accum": a,
                "global_batch": a * b,
                "dropout": cfg.transformer.dropout,
                "remat": cfg.remat,
                "outfits_per_sec": round(a * b / dt, 1),
                "compile_plus_first_s": round(compile_s, 1),
                "flags": flags,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
