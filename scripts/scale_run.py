"""Production-scale validation: CP training at the reference's envelope
(batch 3072 x accum 4, compatibility_prediction_train_config.py:9,18) over a
Polyvore-scale catalog (250k items x 1536d = 1.5 GB HBM-resident), synthetic
data. Reports catalog residency, step time, epoch time, and quality signal.

    python scripts/scale_run.py [--items 250000] [--outfits 98304]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=250_000)
    ap.add_argument("--outfits", type=int, default=98_304)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=3072)
    ap.add_argument("--accum", type=int, default=4)
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from outfitx_tpu.core.config import (
        CPTrainConfig,
        OptimizerConfig,
        OutfitXConfig,
    )
    from outfitx_tpu.data.catalog import Catalog
    from outfitx_tpu.data.splits import CPSplit
    from outfitx_tpu.train.cp_trainer import CPTrainer

    # flagship siglip-scale, d=1536; remat keeps the batch-3072 backward
    # inside 16 GB HBM alongside the 1.5 GB catalog
    model_cfg = OutfitXConfig(remat=True)
    d = model_cfg.d_embed
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    n = args.items
    # Planted style structure, built columnar (no per-item python loop).
    n_styles = 32
    styles = rng.standard_normal((n_styles, d)).astype(np.float32)
    item_style = rng.integers(0, n_styles, n)
    emb = styles[item_style] + 0.5 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    embeddings = np.zeros((n + 1, d), dtype=np.float32)
    embeddings[:n] = emb
    catalog = Catalog(
        item_ids=np.arange(n, dtype=np.int64),
        embeddings=embeddings,
        category_id=rng.integers(0, 150, n).astype(np.int32),
        semantic_category=rng.integers(0, 12, n).astype(np.int32),
        semantic_vocab=[f"s{i}" for i in range(12)],
        id_to_row={},  # not needed for index-based splits
    )

    def make_split(n_outfits: int) -> CPSplit:
        max_len = model_cfg.max_outfit_len
        lengths = rng.integers(4, max_len + 1, n_outfits)
        labels = (np.arange(n_outfits) % 2).astype(np.float32)
        rows = np.full((n_outfits, max_len), catalog.pad_row, dtype=np.int32)
        # coherent outfits: items from one style; incoherent: uniform
        style_pick = rng.integers(0, n_styles, n_outfits)
        by_style = [np.flatnonzero(item_style == s) for s in range(n_styles)]
        uniform = rng.integers(0, n, size=(n_outfits, max_len)).astype(np.int32)
        for s in range(n_styles):
            sel = np.flatnonzero((style_pick == s) & (labels == 1))
            if len(sel):
                rows_s = rng.choice(
                    by_style[s], size=(len(sel), max_len)
                ).astype(np.int32)
                rows[sel] = rows_s
        neg_sel = labels == 0
        rows[neg_sel] = uniform[neg_sel]
        mask = np.arange(max_len)[None, :] >= lengths[:, None]
        rows[mask] = catalog.pad_row
        return CPSplit(rows, mask, labels)

    train_split = make_split(args.outfits)
    valid_split = make_split(12_288)
    print(f"data built in {time.perf_counter()-t0:.1f}s "
          f"({n} items, {args.outfits} train outfits)")

    cfg = CPTrainConfig(
        n_epochs=args.epochs,
        batch_size=args.batch_size,
        accumulation_steps=args.accum,
        optimizer=OptimizerConfig(learning_rate=2e-4),
        checkpoint_dir="/tmp/scale_ckpt",
        log_dir="/tmp/scale_logs",
    )
    with CPTrainer(
        cfg,
        model_cfg,
        catalog=catalog,
        train_split=train_split,
        valid_split=valid_split,
        eval_batch_size=args.batch_size,
    ) as t:
        metrics = t.run()
    steps = args.outfits // (args.batch_size * args.accum)
    print(
        f"RESULT: valid AUC {metrics['auc']:.4f} after {args.epochs} epochs; "
        f"{steps} optimizer steps/epoch at global batch "
        f"{args.batch_size * args.accum}"
    )


if __name__ == "__main__":
    main()
