"""Int8 (W8A8) serving forward: drift vs the f32 model, retrieval-rank
stability, and the ServingEngine(quantize_model=True) route."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outfitx_tpu.core.config import (
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.models.quantized import (
    QuantizedOutfitX,
    q8_dot,
    quantize_outfitx_params,
    quantize_weight,
)
from outfitx_tpu.serve.engine import ServingEngine


@pytest.fixture(scope="module")
def cfg():
    return OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(
            n_heads=4, d_ffn=64, n_layers=2, dropout=0.0
        ),
        max_outfit_len=8,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def model_and_params(cfg):
    model = OutfitXModel(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def _batch(cfg, b=16, seed=1):
    rng = np.random.default_rng(seed)
    d = cfg.d_embed
    emb = rng.normal(size=(b, cfg.max_outfit_len, d)).astype(np.float32)
    lengths = rng.integers(2, cfg.max_outfit_len + 1, size=b)
    mask = np.arange(cfg.max_outfit_len)[None, :] >= lengths[:, None]
    emb[mask] = 0.0
    return jnp.asarray(emb), jnp.asarray(mask)


class TestQ8Dot:
    def test_matches_f32_dot(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(48, 24)).astype(np.float32))
        ref = x @ w
        out = q8_dot(x, quantize_weight(w, axis=0))
        # both operands carry <=0.8% per-element quantization noise
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        assert err < 0.05 * scale

    def test_zero_channels_exact(self):
        # ffn_pad_to-style zero columns must dequantize to exact zeros
        w = jnp.zeros((8, 4), jnp.float32)
        qw = quantize_weight(w, axis=0)
        out = q8_dot(jnp.ones((3, 8)), qw)
        assert float(jnp.max(jnp.abs(out))) == 0.0

    def test_int8_storage(self):
        w = jnp.asarray(np.random.default_rng(1).normal(size=(16, 8)),
                        jnp.float32)
        qw = quantize_weight(w, axis=0)
        assert qw.values.dtype == jnp.int8
        assert qw.scales.shape == (8,)


class TestForwardDrift:
    def test_cp_scores_track_f32(self, cfg, model_and_params):
        model, params = model_and_params
        q8 = QuantizedOutfitX(cfg)
        qp = quantize_outfitx_params(params, cfg)
        emb, mask = _batch(cfg, b=32)
        ref = np.asarray(model.cp_forward(params, emb, mask))
        out = np.asarray(q8.cp_forward(qp, emb, mask))
        # logits stay tightly correlated and close in absolute terms
        corr = np.corrcoef(ref, out)[0, 1]
        assert corr > 0.995, corr
        assert np.max(np.abs(ref - out)) < 0.15 * (np.std(ref) + 1e-6)

    def test_cir_embedding_drift(self, cfg, model_and_params):
        model, params = model_and_params
        q8 = QuantizedOutfitX(cfg)
        qp = quantize_outfitx_params(params, cfg)
        emb, mask = _batch(cfg, b=16, seed=3)
        text = jnp.asarray(
            np.random.default_rng(4).normal(
                size=(16, cfg.d_embed // 2)
            ).astype(np.float32)
        )
        ref = np.asarray(model.cir_forward(params, emb, mask, text))
        out = np.asarray(q8.cir_forward(qp, emb, mask, text))
        cos = np.sum(ref * out, -1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
        )
        assert float(cos.min()) > 0.999, cos.min()

    def test_topk_overlap(self, cfg, model_and_params):
        """Retrieval ranks survive quantization: top-10 against a random
        pool overlaps >= 8/10 with the f32 model's."""
        from outfitx_tpu.ops.retrieval import retrieve

        model, params = model_and_params
        q8 = QuantizedOutfitX(cfg)
        qp = quantize_outfitx_params(params, cfg)
        emb, mask = _batch(cfg, b=8, seed=5)
        text = jnp.asarray(
            np.random.default_rng(6).normal(
                size=(8, cfg.d_embed // 2)
            ).astype(np.float32)
        )
        pool = jnp.asarray(
            np.random.default_rng(7).normal(
                size=(500, cfg.d_embed)
            ).astype(np.float32)
        )
        y_ref = model.cir_forward(params, emb, mask, text)
        y_q8 = q8.cir_forward(qp, emb, mask, text)
        _, i_ref = retrieve(y_ref, pool, k=10)
        _, i_q8 = retrieve(y_q8, pool, k=10)
        overlaps = [
            len(set(np.asarray(a)) & set(np.asarray(b)))
            for a, b in zip(i_ref, i_q8)
        ]
        assert np.mean(overlaps) >= 8.0, overlaps

    def test_quantized_params_are_int8(self, cfg, model_and_params):
        _, params = model_and_params
        qp = quantize_outfitx_params(params, cfg)
        assert qp["layers"]["attn"]["wqkv"].values.dtype == jnp.int8
        assert qp["layers"]["ffn"]["w1"].values.dtype == jnp.int8
        assert qp["cir_proj"]["w"].values.dtype == jnp.int8
        # padded FFN channels present and exactly representable
        pad_to = max(cfg.transformer.ffn_pad_to, cfg.transformer.d_ffn)
        assert qp["layers"]["ffn"]["w1"].values.shape[-1] == pad_to


class TestEngineQuantizeModel:
    @pytest.fixture(scope="class")
    def engines(self, cfg):
        data = make_synthetic(n_items=300, d_embed=32, n_outfits=64, seed=5)
        params = OutfitXModel(cfg).init(jax.random.PRNGKey(0))
        mk = lambda **kw: ServingEngine(
            model_cfg=cfg,
            catalog=data.catalog,
            cp_params=params,
            cir_params=params,
            warmup=False,
            **kw,
        )
        return mk(), mk(quantize_model=True)

    def test_cp_scores_close(self, engines):
        f32, q8 = engines
        outfit = f32.sample_outfit(4)
        a, b = f32.cp_score(outfit), q8.cp_score(outfit)
        assert abs(a - b) < 0.05, (a, b)

    def test_batch_matches_single(self, engines):
        _, q8 = engines
        outfits = [q8.sample_outfit(n) for n in (2, 4, 3)]
        batch = q8.cp_score_batch(outfits)
        singles = [q8.cp_score(o) for o in outfits]
        np.testing.assert_allclose(batch, singles, atol=1e-5)

    def test_cir_and_fitb_routes(self, engines):
        f32, q8 = engines
        outfit = f32.sample_outfit(4)
        target = f32.sample_outfit(1)[0]
        top_f32 = [r["item_id"] for r in f32.cir_top10(outfit, target)]
        top_q8 = [r["item_id"] for r in q8.cir_top10(outfit, target)]
        assert len(top_q8) == 10
        assert len(set(top_f32) & set(top_q8)) >= 7, (top_f32, top_q8)
        cands = f32.sample_outfit(4)
        pick = q8.fitb_pick(outfit, cands)
        assert 0 <= pick < 4

    def test_shared_params_quantized_once(self, cfg):
        data = make_synthetic(n_items=100, d_embed=32, n_outfits=16, seed=9)
        params = OutfitXModel(cfg).init(jax.random.PRNGKey(0))
        eng = ServingEngine(
            model_cfg=cfg, catalog=data.catalog,
            cp_params=params, cir_params=params,
            warmup=False, quantize_model=True,
        )
        assert eng.cir_params is eng.cp_params
