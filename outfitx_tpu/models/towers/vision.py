"""Vision towers: CLIP-ViT and SigLIP-ViT in native JAX.

Numerically mirrors the HF torch modules the reference wraps
(CLIPVisionModelWithProjection for fashion-clip,
clip_image_encoder.py:20-27; SiglipVisionModel for marqo-fashionSigLIP,
slip_image_encoder.py:13-24) so pretrained weights port 1:1.

TPU-first notes: the patch embedding is conv-as-matmul — patches are a
reshape/transpose (free for XLA) and the projection is one MXU matmul over
(B*N, 3*P*P) x (3*P*P, D); inputs stay NCHW to match torch weight layout.
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
class VisionTowerConfig:
    variant: str = "clip"  # {'clip', 'siglip'}
    image_size: int = 224
    patch_size: int = 32
    d_model: int = 768
    n_heads: int = 12
    d_mlp: int = 3072
    n_layers: int = 12
    proj_dim: int = 512  # CLIP visual projection; ignored for siglip
    act: str = "quick_gelu"  # siglip: 'gelu_tanh'
    ln_eps: float = 1e-5  # siglip: 1e-6
    # MXU-rate compute; f32 runs at ~1/4 throughput (measured 1375 ->
    # items/s on the precompute sweep, BENCHMARKS.md). Matches the
    # reference's fp16 autocast inside its SigLIP/CLIP encoders
    # (slip_image_encoder.py:43); layernorm/softmax stay f32 internally.
    # Set "float32" for bit-level parity against HF torch towers.
    compute_dtype: str = "bfloat16"

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.n_patches + (1 if self.variant == "clip" else 0)

    @property
    def d_out(self) -> int:
        return self.proj_dim if self.variant == "clip" else self.d_model

    @classmethod
    def clip_b32(cls) -> "VisionTowerConfig":
        """fashion-clip / openai CLIP-B/32."""
        return cls()

    @classmethod
    def siglip_b16(cls) -> "VisionTowerConfig":
        """marqo-fashionSigLIP (ViT-B/16 SigLIP)."""
        return cls(
            variant="siglip",
            patch_size=16,
            act="gelu_tanh",
            proj_dim=768,
            ln_eps=1e-6,
        )


@dataclasses.dataclass(frozen=True)
class VisionTower:
    cfg: VisionTowerConfig

    def init(self, key: jax.Array):
        cfg = self.cfg
        ks = jax.random.split(key, 8)
        patch_in = 3 * cfg.patch_size**2
        params = {
            "patch": init_linear(
                ks[0], patch_in, cfg.d_model, bias=cfg.variant == "siglip"
            ),
            "pos_emb": 0.02
            * jax.random.normal(ks[1], (cfg.seq_len, cfg.d_model)),
            "layers": init_encoder_layers(
                ks[2],
                d=cfg.d_model,
                n_heads=cfg.n_heads,
                d_mlp=cfg.d_mlp,
                n_layers=cfg.n_layers,
            ),
            "post_ln": init_ln(cfg.d_model),
        }
        if cfg.variant == "clip":
            params["cls"] = 0.02 * jax.random.normal(ks[3], (cfg.d_model,))
            params["pre_ln"] = init_ln(cfg.d_model)
            params["proj"] = init_linear(
                ks[4], cfg.d_model, cfg.proj_dim, bias=False
            )
        else:  # siglip MAP attention-pooling head
            params["map"] = {
                "probe": 0.02 * jax.random.normal(ks[3], (cfg.d_model,)),
                "attn": {
                    "q": init_linear(ks[4], cfg.d_model, cfg.d_model),
                    "k": init_linear(ks[5], cfg.d_model, cfg.d_model),
                    "v": init_linear(ks[6], cfg.d_model, cfg.d_model),
                    "o": init_linear(ks[7], cfg.d_model, cfg.d_model),
                },
                "ln": init_ln(cfg.d_model),
                "mlp": {
                    "fc1": init_linear(ks[5], cfg.d_model, cfg.d_mlp),
                    "fc2": init_linear(ks[6], cfg.d_mlp, cfg.d_model),
                },
            }
        return params

    # ------------------------------------------------------------ apply --
    def patchify(self, images: jax.Array) -> jax.Array:
        """(B, 3, H, W) -> (B, N, 3*P*P), channel-first patch pixel order
        matching torch Conv2d weight layout (D, 3, P, P)."""
        cfg = self.cfg
        b = images.shape[0]
        g = cfg.image_size // cfg.patch_size
        p = cfg.patch_size
        x = images.reshape(b, 3, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, 3, P, P)
        return x.reshape(b, g * g, 3 * p * p)

    def __call__(self, params, images: jax.Array) -> jax.Array:
        """images (B, 3, H, W) preprocessed -> (B, d_out) embeddings."""
        cfg = self.cfg
        b = images.shape[0]
        images = images.astype(jnp.dtype(cfg.compute_dtype))
        x = linear(params["patch"], self.patchify(images))  # (B, N, D)
        if cfg.variant == "clip":
            cls = jnp.broadcast_to(
                params["cls"].astype(x.dtype)[None, None], (b, 1, cfg.d_model)
            )
            x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_emb"].astype(x.dtype)[None]
        if cfg.variant == "clip":
            x = layer_norm(
                x, params["pre_ln"]["scale"], params["pre_ln"]["bias"],
                eps=cfg.ln_eps,
            )
        x = apply_encoder(
            params["layers"], x, n_heads=cfg.n_heads, act=cfg.act,
            ln_eps=cfg.ln_eps,
        )
        if cfg.variant == "clip":
            pooled = layer_norm(
                x[:, 0], params["post_ln"]["scale"], params["post_ln"]["bias"],
                eps=cfg.ln_eps,
            )
            return linear(params["proj"], pooled)
        # siglip: post-LN over all tokens, then MAP pooling
        x = layer_norm(x, params["post_ln"]["scale"], params["post_ln"]["bias"], eps=cfg.ln_eps)
        return self._map_pool(params["map"], x)

    def _map_pool(self, mp, x: jax.Array) -> jax.Array:
        """SigLIP MultiheadAttentionPoolingHead: probe query attends over
        tokens; residual MLP; returns (B, D)."""
        cfg = self.cfg
        b, s, d = x.shape
        h = cfg.n_heads
        dh = d // h
        probe = jnp.broadcast_to(mp["probe"].astype(x.dtype)[None, None], (b, 1, d))
        q = linear(mp["attn"]["q"], probe).reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
        k = linear(mp["attn"]["k"], x).reshape(b, s, h, dh).transpose(0, 2, 1, 3)
        v = linear(mp["attn"]["v"], x).reshape(b, s, h, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / (dh**0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, d)
        o = linear(mp["attn"]["o"], o)
        y = layer_norm(o, mp["ln"]["scale"], mp["ln"]["bias"], eps=cfg.ln_eps)
        o = o + linear(mp["mlp"]["fc2"], jax.nn.gelu(linear(mp["mlp"]["fc1"], y), approximate=True))
        return o[:, 0]
