"""ItemEncoder fusion semantics + precompute sweep round-trip."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outfitx_tpu.core.config import (
    ItemEncoderConfig,
    OutfitXConfig,
    PrecomputeConfig,
)
from outfitx_tpu.models.item_encoder import ItemEncoderModel
from outfitx_tpu.models.towers import TextTowerConfig, VisionTowerConfig


def tiny_encoder(aggregation="concat", encoder_type="clip"):
    return ItemEncoderModel(
        ItemEncoderConfig(
            encoder_type=encoder_type,
            aggregation=aggregation,
            dim_per_modality=48,
        ),
        vision_cfg=VisionTowerConfig(
            variant="clip", image_size=32, patch_size=16, d_model=64,
            n_heads=4, d_mlp=96, n_layers=2, proj_dim=48,
        ),
        text_cfg=TextTowerConfig(
            variant="clip", vocab_size=500, max_len=16, d_model=64,
            n_heads=4, d_mlp=96, n_layers=2, proj_dim=48, eos_token_id=499,
        ),
    )


@pytest.fixture(scope="module")
def enc():
    return tiny_encoder()


@pytest.fixture(scope="module")
def enc_params(enc):
    return enc.init(jax.random.PRNGKey(0))


def _inputs(rng, b=4, size=32, t=16):
    imgs = rng.integers(0, 256, (b, 3, size, size), dtype=np.uint8)
    ids = rng.integers(1, 400, (b, t)).astype(np.int32)
    ids[:, -1] = 499
    mask = np.ones((b, t), dtype=np.int32)
    return jnp.asarray(imgs), jnp.asarray(ids), jnp.asarray(mask)


class TestItemEncoder:
    def test_concat_fusion_text_is_second_half(self, enc, enc_params, rng):
        imgs, ids, mask = _inputs(rng)
        full = enc.encode(enc_params, imgs, ids, mask)
        txt = enc.encode_texts(enc_params, ids, mask)
        d = full.shape[-1]
        # invariant the datasets rely on: text half = emb[d//2:]
        np.testing.assert_allclose(
            np.asarray(full[:, d // 2 :]), np.asarray(txt), atol=1e-6
        )
        assert d == 96  # 2 * proj_dim

    def test_modalities_l2_normalized(self, enc, enc_params, rng):
        imgs, ids, mask = _inputs(rng)
        img = enc.encode_images(enc_params, imgs)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(img), axis=-1), 1.0, atol=1e-5
        )

    @pytest.mark.parametrize("agg,expect_dim", [("mean", 48), ("sum", 48)])
    def test_other_aggregations(self, rng, agg, expect_dim):
        e = tiny_encoder(aggregation=agg)
        p = e.init(jax.random.PRNGKey(0))
        imgs, ids, mask = _inputs(rng)
        out = e.encode(p, imgs, ids, mask)
        assert out.shape[-1] == expect_dim
        img = e.encode_images(p, imgs)
        txt = e.encode_texts(p, ids, mask)
        want = (img + txt) / (2.0 if agg == "mean" else 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)

    def test_frozen_towers_stop_gradient(self, enc, enc_params, rng):
        imgs, ids, mask = _inputs(rng)

        def loss(p):
            return jnp.sum(enc.encode(p, imgs, ids, mask) ** 2)

        g = jax.grad(loss)(enc_params)
        total = sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)
        )
        assert total == 0.0  # towers are frozen


class TestPrecompute:
    def test_synthetic_sweep_roundtrip(self, enc, tmp_path):
        from outfitx_tpu.data.catalog import Catalog
        from outfitx_tpu.train.precompute import PrecomputeRunner

        cfg = PrecomputeConfig(batch_size=32, dataset_dir=str(tmp_path))
        model_cfg = OutfitXConfig(item_encoder=enc.cfg)
        runner = PrecomputeRunner(
            cfg,
            model_cfg,
            output_dir=str(tmp_path / "emb"),
            synthetic_items=70,  # exercises the partial trailing batch
            encoder=enc,
        )
        result = runner.run()
        assert result["items"] == 70
        shards = list((tmp_path / "emb").glob("*.pkl"))
        assert len(shards) == 1
        with open(shards[0], "rb") as f:
            payload = pickle.load(f)
        assert len(payload["ids"]) == 70
        assert payload["embeddings"].shape == (70, 96)
        # shards feed Catalog.from_columns (same contract as from_polyvore)
        metadata = [
            {"item_id": i, "category_id": 1, "semantic_category": "x", "title": "t"}
            for i in payload["ids"]
        ]
        emb_dict = dict(zip(payload["ids"], payload["embeddings"]))
        cat = Catalog.from_columns(metadata, emb_dict)
        assert cat.n_items == 70
        assert cat.d_embed == 96

    def test_sliced_sweep_partitions_and_matches_unsliced(self, enc, tmp_path):
        """`pes --shards N` semantics: N slice runners partition the catalog
        exactly, write the reference per-rank shard layout
        (precompute_embedding_script.py:35-55), and every item's embedding
        is byte-identical to the single-process sweep."""
        from outfitx_tpu.train.precompute import PrecomputeRunner

        cfg = PrecomputeConfig(batch_size=32, dataset_dir=str(tmp_path))
        model_cfg = OutfitXConfig(item_encoder=enc.cfg)
        single = PrecomputeRunner(
            cfg, model_cfg, output_dir=str(tmp_path / "one"),
            synthetic_items=70, encoder=enc,
        )
        single.run()
        for k in range(3):
            sliced = PrecomputeRunner(
                cfg, model_cfg, output_dir=str(tmp_path / "sliced"),
                synthetic_items=70, encoder=enc,
                n_slices=3, slice_index=k,
            )
            res = sliced.run()
            assert res["shards"] == 1

        def load_all(d):
            out = {}
            for p in sorted((tmp_path / d).glob("*.pkl")):
                with open(p, "rb") as f:
                    payload = pickle.load(f)
                for iid, e in zip(payload["ids"], payload["embeddings"]):
                    assert iid not in out  # slices must not overlap
                    out[iid] = np.asarray(e)
            return out

        one, sliced_all = load_all("one"), load_all("sliced")
        # per-rank layout: one file per slice, named by slice index
        names = sorted(p.name for p in (tmp_path / "sliced").glob("*.pkl"))
        prefix = f"{model_cfg.model_name}_embedding_subset_"
        assert names == [f"{prefix}{k}.pkl" for k in range(3)]
        assert set(one) == set(sliced_all)
        for iid in one:
            np.testing.assert_array_equal(one[iid], sliced_all[iid])
