"""Numerical parity of the full OutfitX set-transformer against the
reference architecture assembled in torch (nn.TransformerEncoder with
pre-LN, mish, key-padding mask — outfit_x.py:32-45,120-172), with OUR
weights exported into the torch module. Proves layer order, mask semantics,
head split, scaling, and head wiring all match the reference's numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from outfitx_tpu.core.config import (
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.models import OutfitXModel


def export_to_torch(model: OutfitXModel, params) -> nn.Module:
    """Build the reference's torch stack and load our pytree into it,
    honoring activation/norm_first/final_norm from the config."""
    cfg = model.cfg
    d = cfg.d_embed
    act = {"mish": F.mish, "relu": F.relu, "gelu": F.gelu}[
        cfg.transformer.activation
    ]
    layer = nn.TransformerEncoderLayer(
        d_model=d,
        nhead=cfg.transformer.n_heads,
        dim_feedforward=cfg.transformer.d_ffn,
        dropout=0.0,
        activation=act,
        batch_first=True,
        norm_first=cfg.transformer.norm_first,
    )
    final = nn.LayerNorm(d) if cfg.transformer.final_norm else None
    enc = nn.TransformerEncoder(
        layer, cfg.transformer.n_layers, norm=final
    ).eval()

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    L = params["layers"]
    with torch.no_grad():
        for i, tl in enumerate(enc.layers):
            lp = jax.tree.map(lambda x: x[i], L)
            a = lp["attn"]
            # fused (d, 3, d) layout: wqkv[:, j] is the j-th projection
            tl.self_attn.in_proj_weight.copy_(
                torch.cat(
                    [t(a["wqkv"][:, j]).T for j in range(3)], dim=0
                )
            )
            tl.self_attn.in_proj_bias.copy_(t(a["bqkv"]).reshape(-1))
            tl.self_attn.out_proj.weight.copy_(t(a["wo"]).T)
            tl.self_attn.out_proj.bias.copy_(t(a["bo"]))
            tl.linear1.weight.copy_(t(lp["ffn"]["w1"]).T)
            tl.linear1.bias.copy_(t(lp["ffn"]["b1"]))
            tl.linear2.weight.copy_(t(lp["ffn"]["w2"]).T)
            tl.linear2.bias.copy_(t(lp["ffn"]["b2"]))
            tl.norm1.weight.copy_(t(lp["ln1"]["scale"]))
            tl.norm1.bias.copy_(t(lp["ln1"]["bias"]))
            tl.norm2.weight.copy_(t(lp["ln2"]["scale"]))
            tl.norm2.bias.copy_(t(lp["ln2"]["bias"]))
        if final is not None:
            final.weight.copy_(t(params["final_ln"]["scale"]))
            final.bias.copy_(t(params["final_ln"]["bias"]))
    return enc


@pytest.fixture(scope="module")
def setup():
    cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=32),
        transformer=TransformerConfig(n_heads=4, d_ffn=96, n_layers=3, dropout=0.3),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(3))
    return model, params, export_to_torch(model, params)


class TestReferenceParity:
    def test_cp_forward_matches_reference_stack(self, setup, rng):
        model, params, enc = setup
        d = model.cfg.d_embed
        b, l = 5, 8
        emb = rng.standard_normal((b, l, d)).astype(np.float32)
        lengths = rng.integers(1, l + 1, size=b)
        mask = np.arange(l)[None, :] >= lengths[:, None]

        # reference pipeline (outfit_x.py:120-144): prepend token, encode
        # with key-padding mask, score token 0
        tok = np.asarray(params["outfit_token"], dtype=np.float32)
        x = np.concatenate(
            [np.broadcast_to(tok, (b, 1, d)), emb], axis=1
        )
        full_mask = np.concatenate([np.zeros((b, 1), bool), mask], axis=1)
        with torch.no_grad():
            states = enc(
                torch.from_numpy(x),
                src_key_padding_mask=torch.from_numpy(full_mask),
            ).numpy()
        w = np.asarray(params["cp_head"]["w"], dtype=np.float32)
        bias = np.asarray(params["cp_head"]["b"], dtype=np.float32)
        want = states[:, 0] @ w + bias

        got = model.cp_forward(params, jnp.asarray(emb), jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(got), want[:, 0], atol=2e-4, rtol=1e-3
        )

    def test_cir_forward_matches_reference_stack(self, setup, rng):
        model, params, enc = setup
        d = model.cfg.d_embed
        b, l = 4, 8
        emb = rng.standard_normal((b, l, d)).astype(np.float32)
        mask = np.zeros((b, l), dtype=bool)
        mask[:, 5:] = True
        text = rng.standard_normal((b, d // 2)).astype(np.float32)

        # reference (outfit_x.py:147-172): target token = concat(learned
        # image half, text half), prepend, project token-0 state
        img_half = np.asarray(params["target_image_emb"], dtype=np.float32)
        target = np.concatenate(
            [np.broadcast_to(img_half, (b, d // 2)), text], axis=-1
        )[:, None, :]
        x = np.concatenate([target, emb], axis=1)
        full_mask = np.concatenate([np.zeros((b, 1), bool), mask], axis=1)
        with torch.no_grad():
            states = enc(
                torch.from_numpy(x),
                src_key_padding_mask=torch.from_numpy(full_mask),
            ).numpy()
        want = states[:, 0] @ np.asarray(params["cir_proj"]["w"], dtype=np.float32)

        got = model.cir_forward(
            params, jnp.asarray(emb), jnp.asarray(mask), jnp.asarray(text)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


class TestConfigKnobParity:
    """activation / norm_first / final_norm are live config knobs; each
    variant must match torch's own implementation of that variant."""

    @pytest.mark.parametrize(
        "activation,norm_first,final_norm",
        [
            ("relu", True, False),  # activation knob alone
            ("gelu", False, True),  # post-LN + terminal LN together
            ("mish", False, False),  # post-LN with the default activation
        ],
    )
    def test_variant_matches_torch(self, rng, activation, norm_first, final_norm):
        cfg = OutfitXConfig(
            item_encoder=ItemEncoderConfig(dim_per_modality=32),
            transformer=TransformerConfig(
                n_heads=4,
                d_ffn=96,
                n_layers=2,
                dropout=0.3,
                activation=activation,
                norm_first=norm_first,
                final_norm=final_norm,
            ),
            max_outfit_len=8,
            compute_dtype="float32",
        )
        model = OutfitXModel(cfg)
        params = model.init(jax.random.PRNGKey(11))
        assert ("final_ln" in params) == final_norm
        specs = model.param_partition_specs()
        assert ("final_ln" in specs) == final_norm
        enc = export_to_torch(model, params)

        d = cfg.d_embed
        b, l = 5, 8
        emb = rng.standard_normal((b, l, d)).astype(np.float32)
        lengths = rng.integers(1, l + 1, size=b)
        mask = np.arange(l)[None, :] >= lengths[:, None]
        tok = np.asarray(params["outfit_token"], dtype=np.float32)
        x = np.concatenate([np.broadcast_to(tok, (b, 1, d)), emb], axis=1)
        full_mask = np.concatenate([np.zeros((b, 1), bool), mask], axis=1)
        with torch.no_grad():
            states = enc(
                torch.from_numpy(x),
                src_key_padding_mask=torch.from_numpy(full_mask),
            ).numpy()
        w = np.asarray(params["cp_head"]["w"], dtype=np.float32)
        bias = np.asarray(params["cp_head"]["b"], dtype=np.float32)
        want = (states[:, 0] @ w + bias)[:, 0]

        got = model.cp_forward(params, jnp.asarray(emb), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
