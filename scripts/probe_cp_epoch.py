"""Phase-level timing of a production-scale CP train epoch on the TPU.

Splits each epoch into: host batch assembly (cp_train_batches), explicit
H2D of the batch, step dispatch, and the end-of-epoch loss/score sync —
to locate the gap between 8 x ~0.43 s measured super-steps and the
~14.6 s/epoch the envelope campaign recorded.

Usage: python scripts/probe_cp_epoch.py --dataset-dir /tmp/polyvore250k --epochs 3
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-dir", default="/tmp/polyvore250k")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    args = ap.parse_args()

    from outfitx_tpu.core import runtime

    runtime.force_platform_from_env()
    runtime.enable_compilation_cache()
    import jax

    from outfitx_tpu.core.config import CPTrainConfig, OutfitXConfig
    from outfitx_tpu.data.sampler import cp_train_batches
    from outfitx_tpu.parallel import gather_global
    from outfitx_tpu.train.cp_trainer import CPTrainer

    cfg = CPTrainConfig(
        dataset_dir=args.dataset_dir,
        n_epochs=args.epochs,
        checkpoint_dir="/tmp/probe_cp/ckpt",
        log_dir="/tmp/probe_cp/logs",
    )
    model_cfg = OutfitXConfig(remat=args.remat)
    t = CPTrainer(cfg, model_cfg)
    t.setup()
    print(
        f"split {len(t._train_split)} outfits, super-batch "
        f"{cfg.batch_size}x{cfg.accumulation_steps}"
    )

    for epoch in range(args.epochs):
        t_assemble = t_h2d = t_dispatch = 0.0
        losses = []
        t0 = time.perf_counter()
        it = cp_train_batches(
            t._train_split,
            batch_size=cfg.batch_size,
            accum_steps=cfg.accumulation_steps,
            epoch=epoch,
            seed=cfg.seed,
        )
        steps = 0
        while True:
            a0 = time.perf_counter()
            batch = next(it, None)
            t_assemble += time.perf_counter() - a0
            if batch is None:
                break
            h0 = time.perf_counter()
            batch_dev = jax.device_put(batch)
            jax.block_until_ready(batch_dev)  # dispatch-side wait only
            t_h2d += time.perf_counter() - h0
            d0 = time.perf_counter()
            t.state, out = t.train_step(t.state, t.catalog_dev, batch_dev)
            losses.append(out["loss"])
            t_dispatch += time.perf_counter() - d0
            steps += 1
        s0 = time.perf_counter()
        vals = [float(x) for x in gather_global(losses)]
        t_sync = time.perf_counter() - s0
        total = time.perf_counter() - t0
        print(
            f"epoch {epoch}: total {total:6.2f}s = assemble {t_assemble:5.2f} "
            f"+ h2d {t_h2d:5.2f} + dispatch {t_dispatch:5.2f} "
            f"+ sync {t_sync:5.2f} ({steps} steps, loss {np.mean(vals):.4f})"
        )


if __name__ == "__main__":
    main()
