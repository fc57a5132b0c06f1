"""Int8 (W8A8) serving forward for the OutfitX set-transformer.

Serving-only quantization of the big MXU matmuls — QKV / attention-out /
FFN / cir projection — to int8 x int8 -> int32 dot_generals:

- weights: per-output-channel symmetric int8 (scale = max|col| / 127),
  quantized ONCE from a trained f32 checkpoint (`quantize_outfitx_params`);
- activations: dynamic per-token symmetric int8 (scale = max|row| / 127),
  quantized on the fly inside the program (`q8_dot`);
- everything else (LayerNorm, softmax/attention core, residual stream,
  biases, task heads' tiny d->1 matmul) stays in the bf16/f32 compute
  path — the accuracy-critical, FLOP-cheap parts.

v5e's MXU executes int8 x int8 at ~2x its bf16 rate (394 vs 197 TOPS
peak), and int8 weights halve the weight-side HBM traffic vs bf16, so the
projection/FFN matmuls that dominate the serving forward (the attention
core at L=17 is ~5.5 of ~144 ms x 6 layers) speed up roughly 2x where
MXU-bound. Measured numbers live in BENCHMARKS.md (scripts/bench_q8.py).

This mirrors the eval-mode (deterministic) semantics of
`OutfitXModel.cp_forward` / `cir_forward` (reference outfit_x.py:120-172)
— no dropout, no VJP — and is routed by `serve.engine.ServingEngine(
quantize_model=True)`. Training and metric-eval paths are untouched.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from outfitx_tpu.core import dtypes
from outfitx_tpu.core.config import OutfitXConfig
from outfitx_tpu.core.mesh import constrain
from outfitx_tpu.models.outfit_transformer import OutfitXModel
from outfitx_tpu.ops import layer_norm, masked_mha, resolve_activation

Params = Dict[str, Any]


@dataclasses.dataclass
class QuantLinear:
    """One int8 weight matrix with per-output-channel dequant scales.

    ``values`` keeps the f32 weight's shape (..., d_out) in int8;
    ``scales`` is (..., d_out) f32 broadcast over the contraction dim.
    """

    values: jax.Array  # int8, same shape as the source weight
    scales: jax.Array  # f32, the weight shape minus the contraction dim


jax.tree_util.register_dataclass(
    QuantLinear, data_fields=["values", "scales"], meta_fields=[]
)


def quantize_weight(w: jax.Array, *, axis: int = 0) -> QuantLinear:
    """Per-output-channel symmetric int8: scale = max|w| over ``axis``
    (the contraction dim) / 127. All-zero channels (e.g. ffn_pad_to
    columns) get scale 1.0 and quantize to exact zeros."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=axis)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    values = jnp.clip(
        jnp.round(w / jnp.expand_dims(scales, axis)), -127, 127
    ).astype(jnp.int8)
    return QuantLinear(values=values, scales=scales)


def q8_dot(x: jax.Array, qw: QuantLinear, *, layer_first: bool = False):
    """``x @ w`` with dynamic per-token int8 activations.

    x (..., d_in) float -> f32 (..., d_out). The contraction runs as an
    int8 x int8 -> int32 dot_general (the MXU's int8 path); the two
    symmetric scales are applied to the int32 accumulator.

    ``layer_first``: qw carries a leading stacked-layer axis (scanned
    caller passes the per-layer slice, so this is unused there; kept for
    one-shot whole-stack use in tests).
    """
    del layer_first
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        qw.values,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # sx broadcasts over the output channels; qw.scales over the tokens.
    return acc.astype(jnp.float32) * sx * qw.scales


def quantize_outfitx_params(
    params: Params, cfg: OutfitXConfig
) -> Params:
    """Trained f32 param pytree -> serving int8 pytree.

    Layer weights (stacked, leading n_layers axis) become QuantLinear
    leaves quantized per layer + output channel; the FFN is zero-padded to
    ``cfg.transformer.ffn_pad_to`` BEFORE quantization (zero channels are
    exact, see `quantize_weight`), so the padded program shape matches the
    bf16 path. LayerNorms, biases, prefix tokens and the d->1 CP head stay
    f32.
    """
    d = cfg.d_embed
    lp = params["layers"]
    pad = max(0, cfg.transformer.ffn_pad_to - cfg.transformer.d_ffn)
    w1 = jnp.asarray(lp["ffn"]["w1"], jnp.float32)
    b1 = jnp.asarray(lp["ffn"]["b1"], jnp.float32)
    w2 = jnp.asarray(lp["ffn"]["w2"], jnp.float32)
    if pad:
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, pad)))
        b1 = jnp.pad(b1, ((0, 0), (0, pad)))
        w2 = jnp.pad(w2, ((0, 0), (0, pad), (0, 0)))
    n_layers = w1.shape[0]
    wqkv = jnp.asarray(lp["attn"]["wqkv"], jnp.float32).reshape(
        n_layers, d, 3 * d
    )
    q = {
        "layers": {
            "ln1": jax.tree.map(
                lambda t: jnp.asarray(t, jnp.float32), lp["ln1"]
            ),
            "ln2": jax.tree.map(
                lambda t: jnp.asarray(t, jnp.float32), lp["ln2"]
            ),
            "attn": {
                # (n, d, 3d): contraction axis 1, channel scales (n, 3d)
                "wqkv": quantize_weight(wqkv, axis=1),
                "wo": quantize_weight(
                    jnp.asarray(lp["attn"]["wo"], jnp.float32), axis=1
                ),
                "bqkv": jnp.asarray(lp["attn"]["bqkv"], jnp.float32).reshape(
                    n_layers, 3 * d
                ),
                "bo": jnp.asarray(lp["attn"]["bo"], jnp.float32),
            },
            "ffn": {
                "w1": quantize_weight(w1, axis=1),
                "b1": b1,
                "w2": quantize_weight(w2, axis=1),
                "b2": jnp.asarray(lp["ffn"]["b2"], jnp.float32),
            },
        },
        "outfit_token": jnp.asarray(params["outfit_token"], jnp.float32),
        "target_image_emb": jnp.asarray(
            params["target_image_emb"], jnp.float32
        ),
        "cp_head": jax.tree.map(
            lambda t: jnp.asarray(t, jnp.float32), params["cp_head"]
        ),
        "cir_proj": {
            "w": quantize_weight(
                jnp.asarray(params["cir_proj"]["w"], jnp.float32), axis=0
            )
        },
    }
    if cfg.transformer.final_norm:
        q["final_ln"] = jax.tree.map(
            lambda t: jnp.asarray(t, jnp.float32), params["final_ln"]
        )
    return q


@dataclasses.dataclass(frozen=True)
class QuantizedOutfitX:
    """Eval-mode int8 twin of `OutfitXModel`: same task forwards, int8
    projections. Construct once per serving process; params come from
    `quantize_outfitx_params`."""

    cfg: OutfitXConfig = dataclasses.field(default_factory=OutfitXConfig)

    # ---------------------------------------------------------- encoder --
    def _layer(self, lp: Params, x, pad_mask):
        cfg = self.cfg
        h = cfg.transformer.n_heads
        b, s, d = x.shape
        dh = d // h
        norm_first = cfg.transformer.norm_first
        act = resolve_activation(cfg.transformer.activation)
        cdt = x.dtype

        y = (
            layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
            if norm_first
            else x
        )
        a = lp["attn"]
        qkv = (q8_dot(y, a["wqkv"]) + a["bqkv"]).astype(cdt)
        qkv = constrain(qkv.reshape(b, s, 3, d), P("data", None, None, None))
        qkv = qkv.reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)
        o = masked_mha(qkv[0], qkv[1], qkv[2], pad_mask)  # (B,H,S,Dh)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        o = (q8_dot(o, a["wo"]) + a["bo"]).astype(cdt)
        x = x + constrain(o, P("data", None, None))
        if not norm_first:
            x = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])

        y = (
            layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
            if norm_first
            else x
        )
        f = lp["ffn"]
        hmid = act(q8_dot(y, f["w1"]) + f["b1"]).astype(cdt)
        hmid = constrain(hmid, P("data", None, None))
        o = (q8_dot(hmid, f["w2"]) + f["b2"]).astype(cdt)
        x = x + constrain(o, P("data", None, None))
        if not norm_first:
            x = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
        return x

    def encode_set(self, params: Params, tokens, pad_mask) -> jax.Array:
        cfg = self.cfg
        cdt = dtypes.resolve(cfg.compute_dtype)
        x = constrain(tokens.astype(cdt), P("data", None, None))

        def body(carry, lp):
            return self._layer(lp, carry, pad_mask), None

        if cfg.transformer.n_layers > 0:
            x, _ = jax.lax.scan(body, x, params["layers"])
        if cfg.transformer.final_norm:
            fl = params["final_ln"]
            x = layer_norm(x, fl["scale"], fl["bias"])
        return x

    # ------------------------------------------------------- task heads --
    def cp_forward(
        self, params: Params, outfit_embedding, outfit_mask,
        *, deterministic: bool = True, rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        assert deterministic, "int8 forward is serving-only (no dropout)"
        del rng
        cdt = dtypes.resolve(self.cfg.compute_dtype)
        b = outfit_embedding.shape[0]
        tok = jnp.broadcast_to(
            params["outfit_token"].astype(cdt)[None, None, :],
            (b, 1, self.cfg.d_embed),
        )
        x = jnp.concatenate([tok, outfit_embedding.astype(cdt)], axis=1)
        mask = jnp.concatenate(
            [jnp.zeros((b, 1), dtype=bool), outfit_mask], axis=1
        )
        states = self.encode_set(params, x, mask)
        h = params["cp_head"]
        scores = (
            jnp.dot(states[:, 0, :], h["w"].astype(cdt)) + h["b"].astype(cdt)
        )
        return scores[:, 0].astype(jnp.float32)

    def cir_forward(
        self, params: Params, outfit_embedding, outfit_mask,
        target_item_text_embedding,
        *, deterministic: bool = True, rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        assert deterministic, "int8 forward is serving-only (no dropout)"
        del rng
        cdt = dtypes.resolve(self.cfg.compute_dtype)
        b = outfit_embedding.shape[0]
        img_half = jnp.broadcast_to(
            params["target_image_emb"].astype(cdt)[None, :],
            (b, self.cfg.d_embed // 2),
        )
        target_tok = jnp.concatenate(
            [img_half, target_item_text_embedding.astype(cdt)], axis=-1
        )[:, None, :]
        x = jnp.concatenate([target_tok, outfit_embedding.astype(cdt)], axis=1)
        mask = jnp.concatenate(
            [jnp.zeros((b, 1), dtype=bool), outfit_mask], axis=1
        )
        states = self.encode_set(params, x, mask)
        return q8_dot(states[:, 0, :], params["cir_proj"]["w"]).astype(
            jnp.float32
        )

    fitb_forward = cir_forward


def quantized_twin(
    model: OutfitXModel, params: Params
) -> tuple:
    """(QuantizedOutfitX, quantized params) for a trained model."""
    return QuantizedOutfitX(model.cfg), quantize_outfitx_params(
        params, model.cfg
    )
