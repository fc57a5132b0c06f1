"""FFN lane-alignment study: does zero-padding d_ffn 2024 -> 2048 at apply
time buy forward/train throughput? (VERDICT r3 item 3.)

d_ffn=2024 (reference transformer_config.py:16) is 15*128 + 104, so both
FFN matmuls end in a partial MXU tile. `TransformerConfig(ffn_pad_to=2048)`
pads w1/b1/w2 with zeros at apply time (exact: mish(0)=0, zero w2 rows —
see models/outfit_transformer.py). This probe measures, on the live chip:

  fwd_base     CP forward, d_ffn=2024                    (bench.py shape)
  fwd_pad      CP forward, ffn_pad_to=2048 apply-time pad
  fwd_native   CP forward, d_ffn=2048 stored params       (upper bound)
  [--train]    flagship train step (B=3072, remat, dropout .3) base vs pad

Usage: python scripts/bench_ffn_pad.py [--train] [--iters 12] [--windows 4]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core.config import OutfitXConfig, TransformerConfig
    from outfitx_tpu.models import OutfitXModel

    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    base_cfg = OutfitXConfig()
    b, l, d = args.batch, base_cfg.max_outfit_len, base_cfg.d_embed
    emb = jnp.asarray(rng.standard_normal((b, l, d)), dtype=jnp.bfloat16)
    mask = jnp.asarray(
        np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
    )

    def measure_forward(cfg, params, tag):
        model = OutfitXModel(cfg)

        def chained(params, emb, mask):
            scores = model.cp_forward(params, emb, mask)
            new_emb = emb + (scores[:, None, None] * 1e-6).astype(emb.dtype)
            return scores, new_emb

        fn = jax.jit(chained)
        scores, e = fn(params, emb, mask)
        float(np.asarray(scores[0]))
        per_window = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            e = emb
            for _ in range(args.iters):
                scores, e = fn(params, e, mask)
            float(np.asarray(scores[0]))
            per_window.append((time.perf_counter() - t0) / args.iters)
        best = b / min(per_window)
        print(
            json.dumps(
                {
                    "probe": tag,
                    "outfits_per_sec": round(best, 1),
                    "windows": [round(b / w, 1) for w in per_window],
                }
            ),
            flush=True,
        )
        return best, fn

    model0 = OutfitXModel(base_cfg)
    params = model0.init(jax.random.PRNGKey(0))

    pad_cfg = dataclasses.replace(
        base_cfg,
        transformer=dataclasses.replace(base_cfg.transformer, ffn_pad_to=2048),
    )
    native_cfg = dataclasses.replace(
        base_cfg,
        transformer=dataclasses.replace(base_cfg.transformer, d_ffn=2048),
    )
    native_params = OutfitXModel(native_cfg).init(jax.random.PRNGKey(0))

    fwd_base, fn_base = measure_forward(base_cfg, params, "fwd_base_2024")
    fwd_pad, fn_pad = measure_forward(pad_cfg, params, "fwd_pad_2048")
    fwd_native, _ = measure_forward(native_cfg, native_params, "fwd_native_2048")

    # exactness: padded apply == base apply on the same params — via the
    # already-compiled measurement handles (fresh jit wrappers would cost
    # two extra 1-7 min remote compiles)
    s_base, _ = fn_base(params, emb, mask)
    s_pad, _ = fn_pad(params, emb, mask)
    diff = float(jnp.max(jnp.abs(s_base - s_pad)))
    print(json.dumps({"probe": "exactness_max_abs_diff", "value": diff}), flush=True)
    print(
        json.dumps(
            {
                "probe": "forward_summary",
                "pad_vs_base": round(fwd_pad / fwd_base, 4),
                "native_vs_base": round(fwd_native / fwd_base, 4),
            }
        ),
        flush=True,
    )

    if not args.train:
        return

    # --- flagship train step: B=3072, remat, dropout 0.3 -----------------
    from outfitx_tpu.core.config import OptimizerConfig
    from outfitx_tpu.train.optim import make_optimizer
    from outfitx_tpu.train.state import TrainState
    from outfitx_tpu.train.steps import make_cp_train_step

    tb, n_items = 3072, 20_000
    catalog = jnp.asarray(
        rng.standard_normal((n_items + 1, d)), dtype=jnp.float32
    )
    batch = {
        "item_idx": jnp.asarray(
            rng.integers(0, n_items, (1, tb, l)), dtype=jnp.int32
        ),
        "mask": jnp.asarray(
            np.arange(l)[None, None, :] >= rng.integers(2, l + 1, (1, tb, 1))
        ),
        "label": jnp.asarray((rng.random((1, tb)) > 0.5).astype(np.float32)),
    }

    def measure_train(cfg, tag):
        model = OutfitXModel(dataclasses.replace(cfg, remat=True))
        params = model.init(jax.random.PRNGKey(0))
        tx = make_optimizer(OptimizerConfig(), total_steps=1000)
        st = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_cp_train_step(model, tx)
        st, out = step(st, catalog, batch)
        float(np.asarray(out["loss"]))
        per_window = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, out = step(st, catalog, batch)
            float(np.asarray(out["loss"]))
            per_window.append((time.perf_counter() - t0) / args.iters)
        ms = min(per_window) * 1e3
        print(
            json.dumps(
                {
                    "probe": tag,
                    "step_ms": round(ms, 1),
                    "outfits_per_sec_trained": round(tb / (ms / 1e3), 1),
                }
            ),
            flush=True,
        )
        return ms

    t_base = measure_train(base_cfg, "train_base_2024")
    t_pad = measure_train(pad_cfg, "train_pad_2048")
    print(
        json.dumps(
            {"probe": "train_summary", "pad_vs_base": round(t_base / t_pad, 4)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
