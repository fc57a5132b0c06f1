"""build_engine against an on-disk Polyvore layout: --dataset-dir,
--polyvore-type and --checkpoint-dir reach the loaders (the reference demo
serves whichever split type its config selects, demo/app.py:51-116)."""

import json
import pickle

import numpy as np
import pytest

from outfitx_tpu.core.config import (
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)


@pytest.fixture(scope="module")
def small_cfg():
    return OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(
            n_heads=4, d_ffn=64, n_layers=1, dropout=0.0
        ),
        max_outfit_len=8,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def disjoint_dir(tmp_path_factory, small_cfg):
    """Miniature dataset whose split files live under `disjoint/` ONLY —
    loading it proves the type flag is honored (a hardcoded 'nondisjoint'
    would FileNotFoundError into the degraded no-splits path)."""
    root = tmp_path_factory.mktemp("polyvore_disjoint")
    rng = np.random.default_rng(0)
    n, d = 60, small_cfg.d_embed
    ids = [300_000 + i for i in range(n)]
    metadata = [
        {
            "item_id": iid,
            "url_name": f"u{i}",
            "description": "",
            "title": f"t{i}",
            "category_id": 10 + (i % 3),
            "semantic_category": ["tops", "bottoms", "shoes"][i % 3],
        }
        for i, iid in enumerate(ids)
    ]
    (root / "item_metadata.json").write_text(json.dumps(metadata))
    (root / "categories.json").write_text(
        json.dumps({str(10 + k): f"cat{k}" for k in range(3)})
    )
    emb_dir = root / "precomputed_embeddings"
    emb_dir.mkdir()
    with open(
        emb_dir / f"{small_cfg.model_name}_embedding_subset_0.pkl", "wb"
    ) as f:
        pickle.dump(
            {
                "ids": ids,
                "embeddings": rng.standard_normal((n, d)).astype(np.float32),
            },
            f,
        )
    t = root / "disjoint"
    (t / "compatibility").mkdir(parents=True)
    (t / "fill_in_the_blank").mkdir()
    (t / "compatibility" / "test.json").write_text(
        json.dumps(
            [{"label": i % 2, "question": ids[i : i + 3]} for i in range(6)]
        )
    )
    (t / "test.json").write_text(
        json.dumps([{"item_ids": ids[i : i + 4]} for i in range(0, 24, 4)])
    )
    (t / "fill_in_the_blank" / "test.json").write_text(
        json.dumps(
            [
                {
                    "question": ids[i : i + 3],
                    "answers": ids[i + 3 : i + 7],
                    "label": i % 4,
                }
                for i in range(0, 8, 4)
            ]
        )
    )
    return root


def test_build_engine_disjoint_type(disjoint_dir, small_cfg):
    from outfitx_tpu.serve.app import build_engine

    eng = build_engine(
        mock=True,
        model_cfg=small_cfg,
        dataset_dir=str(disjoint_dir),
        polyvore_type="disjoint",
        checkpoint_dir=str(disjoint_dir / "no_checkpoints"),
    )
    assert eng.catalog.n_items == 60
    # all three split-backed surfaces loaded from the disjoint tree (pools
    # are built — empty at this toy scale, where no category reaches the
    # reference's >=3000-item large-category threshold)
    assert eng.pools is not None
    assert eng.cir_split is not None
    assert eng.cp_split is not None and eng.fitb_split is not None


def test_build_engine_wrong_type_degrades(disjoint_dir, small_cfg):
    """Pointing at the absent nondisjoint tree must degrade (pools=None,
    whole-catalog retrieval), not raise."""
    from outfitx_tpu.serve.app import build_engine

    eng = build_engine(
        mock=True,
        model_cfg=small_cfg,
        dataset_dir=str(disjoint_dir),
        polyvore_type="nondisjoint",
    )
    assert eng.pools is None and eng.cp_split is None


def test_cli_demo_exposes_dataset_flags():
    """The click command must accept the pass-through flags (a reference
    user serves real data from a non-default path via the CLI)."""
    from outfitx_tpu.cli.main import cli

    params = {p.name for p in cli.commands["demo"].params}
    assert {"dataset_dir", "polyvore_type", "checkpoint_dir"} <= params
