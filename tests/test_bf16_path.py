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
