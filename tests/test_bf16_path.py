"""The default bf16 compute path (production dtype policy) must run
forward/backward with finite outputs — CPU tests elsewhere force f32."""

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.core.config import (
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.losses import focal_loss
from outfitx_tpu.models import OutfitXModel


def test_bf16_forward_backward_finite(rng):
    cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=32),
        transformer=TransformerConfig(n_heads=4, d_ffn=96, n_layers=2, dropout=0.3),
        max_outfit_len=8,
        compute_dtype="bfloat16",  # production policy
    )
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    emb = jnp.asarray(rng.standard_normal((8, 8, cfg.d_embed)), dtype=jnp.bfloat16)
    mask = jnp.asarray(np.arange(8)[None, :] >= rng.integers(2, 9, size=(8, 1)))
    labels = jnp.asarray((rng.random(8) > 0.5).astype(np.float32))

    scores = model.cp_forward(params, emb, mask)
    assert scores.dtype == jnp.float32  # logits surfaced in f32
    assert np.isfinite(np.asarray(scores)).all()

    def loss(p):
        s = model.cp_forward(
            p, emb, mask, deterministic=False, rng=jax.random.PRNGKey(1)
        )
        return focal_loss(s, labels)

    lval, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(lval))
    for path, g in jax.tree.leaves_with_path(grads):
        a = np.asarray(g, dtype=np.float32)
        assert np.isfinite(a).all(), path
        assert g.dtype == jnp.float32, path  # grads land in param dtype


def test_bf16_f32_agree_loosely(rng):
    kw = dict(
        item_encoder=ItemEncoderConfig(dim_per_modality=32),
        transformer=TransformerConfig(n_heads=4, d_ffn=96, n_layers=2, dropout=0.0),
        max_outfit_len=8,
    )
    m_bf = OutfitXModel(OutfitXConfig(compute_dtype="bfloat16", **kw))
    m_f32 = OutfitXModel(OutfitXConfig(compute_dtype="float32", **kw))
    params = m_f32.init(jax.random.PRNGKey(2))
    emb = jnp.asarray(rng.standard_normal((6, 8, 64)), dtype=jnp.float32)
    mask = jnp.zeros((6, 8), dtype=bool)
    a = np.asarray(m_bf.cp_forward(params, emb, mask))
    b = np.asarray(m_f32.cp_forward(params, emb, mask))
    # bf16 rounding noise only — same order of magnitude, high correlation
    assert np.corrcoef(a, b)[0, 1] > 0.99


class TestTowerBf16Compute:
    """Towers default to bf16 compute (MXU rate; the reference's fp16
    autocast equivalent, slip_image_encoder.py:43) but must emit f32,
    unit-norm embeddings that agree loosely with the f32 path."""

    def _encoder(self, compute_dtype):
        from outfitx_tpu.models.item_encoder import ItemEncoderModel
        from outfitx_tpu.models.towers.text import TextTowerConfig
        from outfitx_tpu.models.towers.vision import VisionTowerConfig

        return ItemEncoderModel(
            ItemEncoderConfig(encoder_type="siglip", dim_per_modality=16),
            # siglip vision has no output projection: d_out == d_model,
            # so d_model must equal dim_per_modality here.
            vision_cfg=VisionTowerConfig(
                variant="siglip", image_size=32, patch_size=16, d_model=16,
                n_heads=4, d_mlp=64, n_layers=2,
                compute_dtype=compute_dtype,
            ),
            text_cfg=TextTowerConfig(
                variant="siglip", vocab_size=128, max_len=16, d_model=32,
                n_heads=4, d_mlp=64, n_layers=2, proj_dim=16,
                compute_dtype=compute_dtype,
            ),
        )

    def test_bf16_towers_emit_f32_close_to_f32_path(self, rng):
        enc_bf = self._encoder("bfloat16")
        enc_f32 = self._encoder("float32")
        params = enc_bf.init(jax.random.PRNGKey(0))
        imgs = jnp.asarray(
            rng.integers(0, 256, (4, 3, 32, 32)), dtype=jnp.uint8
        )
        ids = jnp.asarray(rng.integers(2, 128, (4, 16)), dtype=jnp.int32)
        attn = jnp.ones_like(ids)

        e_bf = enc_bf.encode(params, imgs, ids, attn)
        e_f32 = enc_f32.encode(params, imgs, ids, attn)
        assert e_bf.dtype == jnp.float32
        # halves are independently L2-normalized
        d = e_bf.shape[-1]
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e_bf[:, : d // 2]), axis=-1), 1.0,
            atol=1e-3,
        )
        # bf16 mantissa is 8 bits: loose agreement with the f32 path
        np.testing.assert_allclose(
            np.asarray(e_bf), np.asarray(e_f32), atol=0.05
        )
