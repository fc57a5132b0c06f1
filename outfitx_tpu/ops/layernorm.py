"""Fused LayerNorm (Pallas) with an XLA reference path.

The reference relies on torch's nn.LayerNorm inside
nn.TransformerEncoderLayer (reference outfit_x.py:32-45). Here LayerNorm is a
first-class op: a row-tiled Pallas kernel that keeps statistics in f32 while
streaming bf16 activations, with a custom VJP whose backward uses the closed
form (in plain XLA — the backward is bandwidth-bound and XLA fuses it well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outfitx_tpu.ops.common import cdiv, round_up, use_interpret

_EPS = 1e-5


def _ln_reference(x, scale, bias, eps=_EPS):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + _EPS)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_pallas_2d(x2, scale, bias):
    rows, d = x2.shape
    tile_r = min(256, round_up(max(rows, 1), 8))
    pad_rows = round_up(rows, tile_r)
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))
    out = pl.pallas_call(
        _ln_kernel,
        grid=(cdiv(pad_rows, tile_r),),
        in_specs=[
            pl.BlockSpec((tile_r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_r, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pad_rows, d), x2.dtype),
        interpret=use_interpret(),
    )(x2, scale, bias)
    return out[:rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _ln_pallas(x, scale, bias):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    return _ln_pallas_2d(x2, scale, bias).reshape(shape)


def _ln_fwd(x, scale, bias):
    return _ln_pallas(x, scale, bias), (x, scale, bias)


def _ln_bwd(res, g):
    x, scale, bias = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mean) * rstd
    d = x.shape[-1]
    gxhat = gf * scale.astype(jnp.float32)
    dx = (
        gxhat
        - jnp.mean(gxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(gxhat * xhat, axis=-1, keepdims=True)
    ) * rstd
    dscale = jnp.sum(gf * xhat, axis=tuple(range(x.ndim - 1)))
    dbias = jnp.sum(gf, axis=tuple(range(x.ndim - 1)))
    return (
        dx.astype(x.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
    )


_ln_pallas.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, scale, bias, *, eps: float = _EPS, impl: str = "auto"):
    """LayerNorm over the last axis.

    impl: 'xla' | 'pallas' | 'auto'. 'auto' resolves to 'xla': benchmarked on
    v5e at the flagship shape (B=4096, L=17, d=1536), XLA's fused LN beats
    this standalone Pallas kernel inside the full model (33.2k vs 24.2k
    outfits/s with Pallas MHA) because XLA fuses LN into neighboring ops.
    The Pallas kernel remains for standalone-normalization paths.
    """
    if impl == "auto":
        impl = "xla"
    if impl == "pallas":
        if eps != _EPS:
            raise NotImplementedError("pallas LN kernel is specialized to eps=1e-5")
        return _ln_pallas(x, scale, bias)
    return _ln_reference(x, scale, bias, eps=eps)
