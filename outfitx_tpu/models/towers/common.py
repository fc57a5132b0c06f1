"""Shared transformer-encoder core for the frozen CLIP/SigLIP-family towers.

The reference consumes these towers through HuggingFace/open_clip torch
modules (reference src/models/encoders/image_encoders/clip_image_encoder.py,
slip_image_encoder.py); here they are native JAX functions over param
pytrees, numerically matching the HF architectures so pretrained weights
port 1:1 (models/convert.py).

Layer structure (CLIP + SigLIP both): pre-LN residual blocks,
x = x + attn(ln1(x)); x = x + mlp(ln2(x)); biased QKV/out projections.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from outfitx_tpu.ops import layer_norm, masked_mha


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


ACTIVATIONS: dict[str, Callable] = {
    "quick_gelu": quick_gelu,
    "gelu_tanh": gelu_tanh,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def init_linear(key, d_in, d_out, dtype=jnp.float32, bias=True):
    bound = 1.0 / (d_in**0.5)
    k1, k2 = jax.random.split(key)
    p = {
        "w": jax.random.uniform(
            k1, (d_in, d_out), minval=-bound, maxval=bound, dtype=dtype
        )
    }
    if bias:
        p["b"] = jax.random.uniform(
            k2, (d_out,), minval=-bound, maxval=bound, dtype=dtype
        )
    return p


def linear(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def init_ln(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_encoder_layers(key, *, d, n_heads, d_mlp, n_layers, dtype=jnp.float32):
    def one(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": init_ln(d, dtype),
            "ln2": init_ln(d, dtype),
            "attn": {
                "q": init_linear(ks[0], d, d, dtype),
                "k": init_linear(ks[1], d, d, dtype),
                "v": init_linear(ks[2], d, d, dtype),
                "o": init_linear(ks[3], d, d, dtype),
            },
            "mlp": {
                "fc1": init_linear(ks[4], d, d_mlp, dtype),
                "fc2": init_linear(ks[5], d_mlp, d, dtype),
            },
        }

    keys = jax.random.split(key, n_layers)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *[one(k) for k in keys])


def apply_encoder(
    layers,
    x: jax.Array,  # (B, S, D)
    *,
    n_heads: int,
    act: str,
    pad_mask: Optional[jax.Array] = None,  # (B, S) True = pad
    causal: bool = False,
    ln_eps: float = 1e-5,
):
    b, s, d = x.shape
    dh = d // n_heads
    act_fn = ACTIVATIONS[act]
    # OUTFITX_TOWER_FLASH=1 routes unmasked non-causal tower attention
    # (the ViTs) through the stock TPU flash kernel. Structurally exact
    # (geometric padding excluded via segment ids) but measured SLOWER at
    # ViT-B/16 scale on v5e — 1537 vs 1177 ms/2048-batch (0.77x): at
    # S=256/Dh=64 the kernel's per-program overheads beat the HBM-traffic
    # saving it exists for. Kept as an opt-in escape hatch for longer
    # sequences; default is the custom Pallas routing below.
    attn_impl = "auto"
    if s > 32:
        # Default ('auto', masked_mha): the padded Pallas kernel for L>128
        # (ViT-B/16 S=197 measured 1.18x vs XLA), the DIRECT kernel for
        # 32<L<=128 (text L=64 and ViT-B/32 S=50 both measured 1.33x —
        # no geometric pad, so none of the score-FLOP inflation that made
        # the padded route lose here; the causal CLIP text tower at L=77
        # rides the same direct kernel via its compile-time triangular
        # branch). OUTFITX_TOWER_ATTN overrides the formulation:
        #   xla    — einsum attention; scores materialize in HBM
        #   pallas — the fused VMEM-score kernel at any tower length
        #            (key-padding masks and causal handled natively)
        #   flash  — stock TPU flash kernel (measured 0.77x at ViT-B
        #            scale; kept for longer sequences); unmasked,
        #            non-causal only.
        choice = os.environ.get("OUTFITX_TOWER_ATTN", "")
        if not choice and os.environ.get("OUTFITX_TOWER_FLASH", "0") == "1":
            choice = "flash"  # back-compat alias
        if choice == "xla" or choice == "pallas" or (
            choice == "flash" and pad_mask is None and not causal
        ):
            attn_impl = choice
        elif choice == "block" and not causal and 32 < s <= 64 and s % 8 == 0:
            # OUTFITX_TOWER_ATTN=block: the fully-fused attention block
            # (ops/attn_block.py — qkv proj + attention + out-proj in one
            # kernel). Towers are FROZEN, so the fused (d, 3, d) weight
            # layout is a pure function of constant params — stacked once
            # per call below, outside the layer scan (the apply-time
            # per-layer concat that made fused-QKV lose here, :143-147,
            # was inside the scan body). Probed by bench_attn_block.py.
            # FORWARD-ONLY (no VJP): for precompute/eval/serving sweeps.
            # Do not set during original-cp training — the trainable
            # head grads flow around the towers (stop_gradient), but a
            # differentiated encoder call would fail to lower.
            # Shape guard from the 2026-08-18 on-chip study
            # (parity_artifacts/measure_r5/attn_block.out): the block wins
            # only at sublane-aligned L=64 (1.19x); S=50 (0.87x), S=197
            # (0.74x) and causal L=77 (0.82x) all LOSE to the decomposed
            # direct-kernel path — Mosaic lowers the kernel's 3D x 2D
            # projection dots efficiently only when L is a sublane
            # multiple, and small VMEM-bounded batch tiles starve it at
            # S=197. Non-winning shapes fall through to 'auto'.
            attn_impl = "block"
    # OUTFITX_TOWER_MLP=pallas: fused MLP kernel (VMEM-resident mid tensor,
    # ops/mlp.py) — benchmark opt-in.
    mlp_impl = os.environ.get("OUTFITX_TOWER_MLP", "xla")
    if pad_mask is None:
        pad_mask = jnp.zeros((b, s), dtype=bool)

    if attn_impl == "block":
        # (n_layers, d, 3, d) / (n_layers, 3, d): fused layouts stacked
        # once, fed to the scan as xs next to the layer dict.
        a = layers["attn"]
        wqkv_all = jnp.stack(
            [a["q"]["w"], a["k"]["w"], a["v"]["w"]], axis=2
        ).astype(x.dtype)
        bqkv_all = jnp.stack(
            [a["q"]["b"], a["k"]["b"], a["v"]["b"]], axis=1
        ).astype(x.dtype)
        layers = (layers, {"wqkv": wqkv_all, "bqkv": bqkv_all})
    else:
        layers = (layers, None)

    def block(carry, xs):
        lp, fused_w = xs
        h = carry
        y = layer_norm(h, lp["ln1"]["scale"], lp["ln1"]["bias"], eps=ln_eps)

        def heads(t):
            return t.reshape(b, s, n_heads, dh).transpose(0, 2, 1, 3)

        if attn_impl == "block":
            from outfitx_tpu.ops.attn_block import attn_block

            o = attn_block(
                y,
                fused_w["wqkv"],
                fused_w["bqkv"],
                lp["attn"]["o"]["w"].astype(y.dtype),
                pad_mask,
                n_heads=n_heads,
                causal=causal,
            ).astype(h.dtype)
            h = h + o + lp["attn"]["o"]["b"].astype(h.dtype)
        else:
            # Per-projection matmuls, NOT apply-time-fused QKV: concatenating
            # the stacked-layer weight slices into one (d, 3d) matmul was
            # measured SLOWER here (vision 1095 vs 987 ms, text 361 vs 321 —
            # the per-layer concat materializes and breaks XLA's scheduling),
            # unlike the set transformer where wqkv is fused in the PARAMS.
            q = heads(linear(lp["attn"]["q"], y))
            k = heads(linear(lp["attn"]["k"], y))
            v = heads(linear(lp["attn"]["v"], y))
            o = masked_mha(q, k, v, pad_mask, causal=causal, impl=attn_impl)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
            h = h + linear(lp["attn"]["o"], o)
        y = layer_norm(h, lp["ln2"]["scale"], lp["ln2"]["bias"], eps=ln_eps)
        if mlp_impl == "pallas":
            from outfitx_tpu.ops.mlp import mlp_fused

            m = lp["mlp"]
            h = h + mlp_fused(
                y, m["fc1"]["w"], m["fc1"]["b"], m["fc2"]["w"], m["fc2"]["b"],
                act=act,
            )
        else:
            h = h + linear(lp["mlp"]["fc2"], act_fn(linear(lp["mlp"]["fc1"], y)))
        return h, None

    x, _ = jax.lax.scan(block, x, layers)
    return x
