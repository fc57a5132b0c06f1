"""Serving with per-category candidate pools: CIR results stay within the
target's category (reference demo semantics, app.py:169-201)."""

import jax

from outfitx_tpu.core.config import (
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.data.sampler import CandidatePools
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.serve.engine import ServingEngine


def test_cir_restricted_to_target_category():
    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=1, dropout=0.0),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    data = make_synthetic(n_items=400, d_embed=32, n_outfits=64, seed=8)
    pools = CandidatePools.build(
        data.catalog, data.cir_valid, pool_size=200, threshold=1
    )
    params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
    eng = ServingEngine(
        model_cfg=model_cfg,
        catalog=data.catalog,
        cp_params=params,
        cir_params=params,
        pools=pools,
    )
    outfit = eng.sample_outfit(3)
    target = eng.sample_outfit(1)[0]
    target_cat = int(
        data.catalog.category_id[data.catalog.id_to_row[target]]
    )
    items = eng.cir_top10(outfit, target)
    assert len(items) == 10
    # every retrieved item comes from the target's category pool
    assert all(i["category_id"] == target_cat for i in items)


def test_build_engine_synthetic_has_pools():
    from outfitx_tpu.serve.app import build_engine

    eng = build_engine(synthetic=True, mock=True)
    assert eng.pools is not None and len(eng.pools.pools) > 0


def test_build_engine_shard_catalog_wiring():
    from outfitx_tpu.serve.app import build_engine

    eng = build_engine(synthetic=True, mock=True, shard_catalog=True)
    # 8 fake devices: 2001 catalog rows pad to 2008 = 8 x 251
    assert eng.mesh is not None and eng.mesh.devices.size == 8
    assert eng.catalog_dev.shape[0] == 2008
    assert len(eng.catalog_dev.sharding.device_set) == 8


def test_similar_items_excludes_self():
    import jax

    from outfitx_tpu.models import OutfitXModel

    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=1, dropout=0.0),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    data = make_synthetic(n_items=200, d_embed=32, n_outfits=32, seed=3)
    params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
    eng = ServingEngine(
        model_cfg=model_cfg, catalog=data.catalog,
        cp_params=params, cir_params=params,
    )
    iid = eng.sample_outfit(1)[0]
    items = eng.similar_items(iid, k=5)
    assert len(items) == 5
    assert all(i["item_id"] != iid for i in items)
    scores = [i["score"] for i in items]
    assert scores == sorted(scores)


def test_quantized_engine_whole_catalog():
    import jax

    from outfitx_tpu.models import OutfitXModel

    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=1, dropout=0.0),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    data = make_synthetic(n_items=300, d_embed=32, n_outfits=32, seed=4)
    params = OutfitXModel(model_cfg).init(jax.random.PRNGKey(0))
    eng = ServingEngine(
        model_cfg=model_cfg, catalog=data.catalog,
        cp_params=params, cir_params=params, quantized=True,
    )
    assert eng._qcat is not None
    items = eng.cir_top10(eng.sample_outfit(3), eng.sample_outfit(1)[0])
    assert len(items) == 10
    sims = eng.similar_items(eng.sample_outfit(1)[0], k=5)
    assert len(sims) == 5
