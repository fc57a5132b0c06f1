"""Fused transformer-MLP kernel for the frozen towers.

XLA computes fc1 -> gelu -> fc2 with the (B, S, d_mlp) mid tensor written
to and re-read from HBM (ViT-B/16 @ batch 2048: ~3.2 GB each way per
layer). This kernel keeps the mid tensor VMEM-resident per batch tile and
holds BOTH weight matrices in VMEM across the whole grid (their BlockSpec
index is constant, so they are DMA'd once, not per program).

MEASURED AND REJECTED as a default (kept as the OUTFITX_TOWER_MLP=pallas
opt-in): ViT-B/16 tower 1030-1071 ms vs 987 ms XLA across row tiles
{256, 512, 1024}. The MLP's arithmetic intensity is high enough that XLA
fully hides the mid-tensor HBM traffic behind the MXU — unlike the
attention scores (low-intensity, traffic-exposed), where the fused kernel
wins (BENCHMARKS.md tower-attention study). Golden-tested against the XLA
formulation in tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outfitx_tpu.ops.common import cdiv, round_up, use_interpret


def _act(name: str, x):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act):
    x = x_ref[:]  # (TR, D)
    mid = jax.lax.dot_general(
        x, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    mid = _act(act, mid).astype(x.dtype)
    out = jax.lax.dot_general(
        mid, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def mlp_fused(x, w1, b1, w2, b2, *, act: str = "quick_gelu",
              tile_rows: int = 512):
    """act(x @ w1 + b1) @ w2 + b2 with the mid tensor VMEM-resident.

    x: (..., D). Rows (flattened leading dims) are tiled; both weights stay
    in VMEM across the grid. Works for d_mlp * tile_rows * 2B + weights
    within the ~16 MB VMEM budget (ViT-B: 512 rows x 3072 bf16 mid = 3.1 MB
    + 9.4 MB weights).
    """
    import os

    orig_shape = x.shape
    d = x.shape[-1]
    d_mlp = w1.shape[1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    tile_rows = int(os.environ.get("OUTFITX_TOWER_MLP_TILE", "0")) or tile_rows
    tr = min(tile_rows, max(8, rows))
    pad_rows = round_up(rows, tr)
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))
    cdt = x.dtype
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, act=act),
        grid=(cdiv(pad_rows, tr),),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d_mlp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_mlp,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_mlp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pad_rows, d), cdt),
        interpret=use_interpret(),
    )(x2, w1.astype(cdt), b1.astype(cdt), w2.astype(cdt), b2.astype(cdt))
    return out[:rows].reshape(orig_shape)
