"""Production-scale CIR validation: curriculum training with the native C++
assembler over a 250k-item catalog, and full Recall@k evaluation against
per-category 3000-item pools (the reference protocol,
complementary_item_retrieval_trainer.py:192-249) — all on device.

    python scripts/scale_cir.py
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
    ap.add_argument("--outfits", type=int, default=49_152)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=512)
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from outfitx_tpu.core.config import CIRTrainConfig, OptimizerConfig, OutfitXConfig
    from outfitx_tpu.data.catalog import Catalog
    from outfitx_tpu.data.splits import OutfitSplit
    from outfitx_tpu.train.cir_trainer import CIRTrainer

    model_cfg = OutfitXConfig()
    d = model_cfg.d_embed
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()

    n = args.items
    n_styles, n_cats = 32, 60  # ~4.2k items/category: all pool-eligible
    styles = rng.standard_normal((n_styles, d)).astype(np.float32)
    item_style = rng.integers(0, n_styles, n)
    emb = styles[item_style] + 0.5 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    embeddings = np.zeros((n + 1, d), dtype=np.float32)
    embeddings[:n] = emb
    catalog = Catalog(
        item_ids=np.arange(n, dtype=np.int64),
        embeddings=embeddings,
        category_id=rng.integers(0, n_cats, n).astype(np.int32),
        semantic_category=rng.integers(0, 12, n).astype(np.int32),
        semantic_vocab=[f"s{i}" for i in range(12)],
        id_to_row={},
    )

    def make_split(n_outfits: int) -> OutfitSplit:
        max_len = model_cfg.max_outfit_len
        lengths = rng.integers(4, max_len, n_outfits)
        rows = np.full((n_outfits, max_len), catalog.pad_row, dtype=np.int32)
        by_style = [np.flatnonzero(item_style == s) for s in range(n_styles)]
        pick = rng.integers(0, n_styles, n_outfits)
        for s in range(n_styles):
            sel = np.flatnonzero(pick == s)
            if len(sel):
                rows[sel] = rng.choice(
                    by_style[s], size=(len(sel), max_len)
                ).astype(np.int32)
        mask = np.arange(max_len)[None, :] >= lengths[:, None]
        rows[mask] = catalog.pad_row
        return OutfitSplit(
            item_rows=rows,
            lengths=lengths.astype(np.int32),
            pos_eligible=~mask,
        )

    train_split = make_split(args.outfits)
    valid_split = make_split(8_192)
    print(f"data built in {time.perf_counter()-t0:.1f}s")

    cfg = CIRTrainConfig(
        n_epochs=args.epochs,
        batch_size=args.batch_size,
        accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=2e-4),
        switch_to_hard_epoch=args.epochs // 2,  # exercise the curriculum
        recall_every=1,
        candidate_pool_size=3000,
        checkpoint_dir="/tmp/scale_cir_ckpt",
        log_dir="/tmp/scale_cir_logs",
    )
    with CIRTrainer(
        cfg,
        model_cfg,
        catalog=catalog,
        train_split=train_split,
        valid_split=valid_split,
        pool_threshold=3000,
    ) as t:
        metrics = t.run()
    print(
        "RESULT:",
        {k: round(v, 4) for k, v in metrics.items()},
    )


if __name__ == "__main__":
    main()
