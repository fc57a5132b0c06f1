"""Text towers: CLIP text transformer (causal, EOS-pooled, projected) and
SigLIP text transformer (bidirectional, last-token/MAP-free, head-projected).

Mirrors HF CLIPTextModelWithProjection (reference
clip_text_encoder.py:42-47) and SiglipTextModel semantics so pretrained
weights port 1:1.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from outfitx_tpu.models.towers.common import (
    apply_encoder,
    init_encoder_layers,
    init_linear,
    init_ln,
    linear,
)
from outfitx_tpu.ops import layer_norm


@dataclasses.dataclass(frozen=True)
class TextTowerConfig:
    variant: str = "clip"  # {'clip', 'siglip'}
    vocab_size: int = 49408
    max_len: int = 77
    d_model: int = 512
    n_heads: int = 8
    d_mlp: int = 2048
    n_layers: int = 12
    proj_dim: int = 512
    act: str = "quick_gelu"  # siglip: 'gelu_tanh'
    ln_eps: float = 1e-5  # siglip: 1e-6
    eos_token_id: int = 49407
    # bf16 MXU-rate compute (reference fp16 autocast equivalent,
    # slip_text_encoder.py:27-32); "float32" for HF parity tests.
    compute_dtype: str = "bfloat16"

    @property
    def d_out(self) -> int:
        return self.proj_dim

    @classmethod
    def clip_b(cls) -> "TextTowerConfig":
        return cls()

    @classmethod
    def siglip_b(cls) -> "TextTowerConfig":
        """SigLIP-B text: 64-token context, bidirectional, gelu_tanh."""
        return cls(
            variant="siglip",
            vocab_size=32000,
            max_len=64,
            d_model=768,
            n_heads=12,
            d_mlp=3072,
            proj_dim=768,
            act="gelu_tanh",
            ln_eps=1e-6,
            eos_token_id=1,
        )


@dataclasses.dataclass(frozen=True)
class TextTower:
    cfg: TextTowerConfig

    def init(self, key: jax.Array):
        cfg = self.cfg
        ks = jax.random.split(key, 4)
        params = {
            "tok_emb": 0.02
            * jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model)),
            "pos_emb": 0.01 * jax.random.normal(ks[1], (cfg.max_len, cfg.d_model)),
            "layers": init_encoder_layers(
                ks[2],
                d=cfg.d_model,
                n_heads=cfg.n_heads,
                d_mlp=cfg.d_mlp,
                n_layers=cfg.n_layers,
            ),
            "final_ln": init_ln(cfg.d_model),
            "proj": init_linear(
                ks[3],
                cfg.d_model,
                cfg.proj_dim,
                bias=cfg.variant == "siglip",  # siglip 'head' has bias
            ),
        }
        return params

    def __call__(
        self,
        params,
        input_ids: jax.Array,  # (B, T) int32
        attention_mask: jax.Array | None = None,  # (B, T) 1 = real token
    ) -> jax.Array:
        cfg = self.cfg
        t = input_ids.shape[1]
        x = jnp.take(params["tok_emb"], input_ids, axis=0)
        x = x.astype(jnp.dtype(cfg.compute_dtype))
        x = x + params["pos_emb"][None, :t].astype(x.dtype)
        pad_mask = None
        if attention_mask is not None:
            pad_mask = attention_mask == 0
        x = apply_encoder(
            params["layers"],
            x,
            n_heads=cfg.n_heads,
            act=cfg.act,
            pad_mask=pad_mask,
            causal=cfg.variant == "clip",
            ln_eps=cfg.ln_eps,
        )
        x = layer_norm(
            x, params["final_ln"]["scale"], params["final_ln"]["bias"],
            eps=cfg.ln_eps,
        )
        if cfg.variant == "clip":
            # EOS pooling: position of the eos token per row
            # (HF CLIPTextTransformer pooled_output semantics).
            eos_pos = jnp.argmax(
                (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
            )
            pooled = x[jnp.arange(x.shape[0]), eos_pos]
        else:
            # SigLIP pools the LAST token.
            pooled = x[:, -1]
        return linear(params["proj"], pooled)
