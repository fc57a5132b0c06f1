"""Disk-backed image pipeline: JPEG fixtures through load_image_uint8,
RawItemSource.from_polyvore, and the precompute sweep's disk path."""

import json

import numpy as np
import pytest
from PIL import Image

from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.preprocess import load_image_uint8
from outfitx_tpu.data.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def image_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)
    n = 12
    ids = [300_000 + i for i in range(n)]
    metadata = []
    for i, iid in enumerate(ids):
        # non-square images exercise resize + center-crop
        w, h = (40 + 4 * i, 30 + 2 * i)
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "images" / f"{iid}.jpg")
        metadata.append(
            {
                "item_id": iid,
                "category_id": 10 + i % 2,
                "semantic_category": "tops",
                "title": f"shirt {i}",
                "url_name": "",
            }
        )
    (root / "item_metadata.json").write_text(json.dumps(metadata))
    (root / "categories.json").write_text(json.dumps({"10": "a", "11": "b"}))
    return root, ids


class TestImageLoading:
    def test_load_resize_crop(self, image_dataset):
        root, ids = image_dataset
        img = load_image_uint8(str(root / "images" / f"{ids[0]}.jpg"), 24)
        assert img.shape == (3, 24, 24)
        assert img.dtype == np.uint8

    def test_raw_item_source_from_disk(self, image_dataset):
        from outfitx_tpu.train.original_cp_trainer import RawItemSource

        root, ids = image_dataset
        catalog = Catalog.from_metadata_only(root)
        src = RawItemSource.from_polyvore(
            catalog, root, image_size=24,
            tokenizer=HashTokenizer(vocab_size=100, bos=97, eos=98),
            text_len=8,
        )
        assert src.image_bank.shape == (len(ids) + 1, 3, 24, 24)
        # pad row is zeros with empty attention
        np.testing.assert_array_equal(src.image_bank[-1], 0)
        assert src.attn[-1].sum() == 0
        # real items decoded (non-zero with overwhelming probability)
        assert src.image_bank[0].sum() > 0
        out = src.gather(np.asarray([0, len(ids)]))  # real + pad
        assert out["images"].shape == (2, 3, 24, 24)

    def test_precompute_disk_path(self, image_dataset):
        """PrecomputeRunner._iter_items reads metadata + images from disk."""
        from outfitx_tpu.core.config import (
            ItemEncoderConfig,
            OutfitXConfig,
            PrecomputeConfig,
        )
        from outfitx_tpu.models.item_encoder import ItemEncoderModel
        from outfitx_tpu.models.towers import TextTowerConfig, VisionTowerConfig
        from outfitx_tpu.train.precompute import PrecomputeRunner

        root, ids = image_dataset
        enc = ItemEncoderModel(
            ItemEncoderConfig(encoder_type="clip", dim_per_modality=24),
            vision_cfg=VisionTowerConfig(
                variant="clip", image_size=32, patch_size=16, d_model=32,
                n_heads=4, d_mlp=48, n_layers=1, proj_dim=24,
            ),
            text_cfg=TextTowerConfig(
                variant="clip", vocab_size=200, max_len=16, d_model=32,
                n_heads=4, d_mlp=48, n_layers=1, proj_dim=24, eos_token_id=199,
            ),
        )
        cfg = PrecomputeConfig(batch_size=8, dataset_dir=str(root))
        runner = PrecomputeRunner(
            cfg,
            OutfitXConfig(item_encoder=enc.cfg),
            output_dir=str(root / "out"),
            encoder=enc,
        )
        result = runner.run()
        assert result["items"] == len(ids)
        shard = list((root / "out").glob("*.pkl"))
        assert len(shard) == 1
        # round-trip: the shard + metadata feed Catalog.from_polyvore
        import shutil

        emb_dir = root / "precomputed_embeddings"
        emb_dir.mkdir(exist_ok=True)
        model_name = OutfitXConfig(item_encoder=enc.cfg).model_name
        shutil.copy(shard[0], emb_dir / f"{model_name}_embedding_subset_0.pkl")
        cat = Catalog.from_polyvore(root, model_name=model_name)
        assert cat.n_items == len(ids)
        assert cat.d_embed == 48  # 2 * proj_dim
