"""Fully-fused set-attention BLOCK: QKV projection + masked attention +
out-projection in ONE Pallas kernel (eval/serving forward path).

Motivation (BENCHMARKS.md attention studies): at the flagship shape
(L=17, d=1536) the decomposed path materializes per layer, in HBM,
(a) the fused-QKV matmul output (B, L, 3, d) — ~640 MB at B=4096 bf16,
(b) its transposed (3, B, H, L, Dh) copy feeding the attention kernel,
(c) the attention output and its transpose back to (B, L, d) for the
out-projection. The matmul FLOPs hide none of this traffic because the
per-head matmuls are tiny. This kernel keeps the whole chain VMEM-resident
per (batch-tile, head) program and accumulates the out-projection across
the sequential head grid axis — HBM sees exactly one read of the block
input and one write of the block output.

Weight layout: the (d, 3, d) fused wqkv is re-arranged at APPLY time to
(3, H, d, Dh) and wo to (H, Dh, d) — transposing WEIGHTS is ~14 MB once
per call vs the ~1.7 GB of activation transposes it replaces.

Scope: forward only (no custom VJP) — the training path keeps the
decomposed kernels whose fused backward is measured; this block serves
the deterministic forward (serving, precompute-style sweeps, bench).
Opt-in: OUTFITX_ATTN_BLOCK=fused routes OutfitXModel's eval-mode layer
through it (models/outfit_transformer.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outfitx_tpu.ops.attention import _causal_keep
from outfitx_tpu.ops.common import cdiv, round_up, use_interpret

_NEG = -1e9


def _attn_block_kernel(
    y_ref,  # (TB, L, d)        — block input (post-LN), constant over j
    w_ref,  # (3, 1, d, Dh)     — head j's q/k/v projection slices
    b_ref,  # (3, 1, 1, Dh)     — head j's q/k/v biases
    wo_ref,  # (1, Dh, d)       — head j's out-projection rows
    mask_ref,  # (TB, 1, L)     — key-padding mask (True = pad)
    o_ref,  # (TB, L, d) f32    — accumulated across the head grid axis
    *,
    scale: float,
    causal: bool,
):
    j = pl.program_id(1)
    y = y_ref[...]  # (TB, L, d)
    tb, l, d = y.shape
    w = w_ref[:, 0]  # (3, d, Dh)
    b = b_ref[:, 0, 0]  # (3, Dh)

    # No reshapes anywhere in this kernel: Mosaic's layout inference
    # rejects (TB*L, x) <-> (TB, L, x) shape casts whenever L is not a
    # multiple of the 8-row sublane tile (L=17/197/77 all fail; measured
    # on-chip, scripts/probe_mosaic.py 2026-08-18) — while 3D x 2D
    # dot_general contracting the minor dim compiles, so the projections
    # produce (TB, L, Dh) directly.
    def proj(i):
        return (
            jax.lax.dot_general(
                y, w[i],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(y.dtype)
            + b[i].astype(y.dtype)
        )

    q, k, v = proj(0), proj(1), proj(2)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (TB, L, L) f32
    scores = jnp.where(mask_ref[...], _NEG, scores)
    if causal:  # compile-time branch (CLIP text tower, L=77)
        scores = jnp.where(_causal_keep(l, l)[None], scores, _NEG)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    ctx = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(y.dtype)  # (TB, L, Dh)
    part = jax.lax.dot_general(
        ctx, wo_ref[0],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TB, L, d) — head j's out-projection contribution, f32

    @pl.when(j == 0)
    def _init():
        o_ref[...] = part

    @pl.when(j > 0)
    def _accum():
        o_ref[...] += part


def attn_block(
    y,
    wqkv,
    bqkv,
    wo,
    pad_mask,
    n_heads: int,
    *,
    tile_b: int = 32,
    scale: float | None = None,
    causal: bool = False,
):
    """One-kernel attention block: returns ``out_proj(MHA(y @ wqkv))``.

    y: (B, L, d) post-LN input; wqkv: (d, 3, d); bqkv: (3, d);
    wo: (d, d); pad_mask: (B, L) bool True = pad. Returns (B, L, d) f32
    (the out-projection bias and residual/dropout stay with the caller).
    Numerics match the decomposed path to f32-accumulation order.
    ``scale`` defaults to 1/sqrt(Dh) of the given weights; a lane-packing
    probe with zero-padded heads must pass the REAL head dim's scale.
    """
    import os

    b, l, d = y.shape
    h = n_heads
    # Dh from the weight shape, not d//h: a lane-packing probe may carry
    # per-head zero-padded projections (wqkv (d, 3, H*Dh') with Dh' > d/H,
    # inert columns — scripts/bench_dh_pack.py); square reference weights
    # give the usual d//h.
    dh = wqkv.shape[2] // h
    dh_p = round_up(dh, 128)
    env_tile = int(os.environ.get("OUTFITX_ATTN_TILE", "0"))
    if env_tile:
        tile_b = env_tile  # explicit probe override, unguarded
    else:
        # VMEM ceiling: per-program footprint modelled against Mosaic's
        # padded extents (sublanes to 8, lanes to 128) — y bf16 + o/part
        # f32 (10 bytes/elem of (TB, L8, d)), q/k/v/ctx at the padded
        # head dim (8 bytes), ~4 f32 score-sized temporaries (16 bytes of
        # (TB, L8, Lp)), + the per-head weight slices. Validated on-chip
        # 2026-08-18: flagship (L=17, d=1536) tile 32 measured 19.87 MB
        # (3.87 over the 16 MB stack), tile 16 ~8.7 MB compiles — the
        # estimate reproduces both.
        l8 = round_up(l, 8)
        lp = round_up(l, 128)
        while tile_b > 1 and (
            tile_b * l8 * (10 * d + 8 * dh_p + 16 * lp) + 8 * d * dh_p
            > 14 * 2**20
        ):
            tile_b //= 2
    if scale is None:
        scale = 1.0 / (dh**0.5)
    # weight re-layout (cheap: weights, not activations)
    w = wqkv.reshape(d, 3, h, dh).transpose(1, 2, 0, 3)  # (3, H, d, Dh)
    bq = bqkv.reshape(3, h, 1, dh)  # (3, H, 1, Dh)
    wo_h = wo.reshape(h, dh, d)  # (H, Dh, d)
    if dh % 128:
        # Mosaic's 3D x 2D dot_general requires a lane-aligned (128k)
        # contraction dim (measured on-chip: 96/64 fail layout inference,
        # 128/768/1536 compile — scripts/probe_mosaic.py 2026-08-18), and
        # a 96-lane matmul occupies full 128-lane MXU tiles anyway.
        # Zero-pad the head dim: zero v-columns make a zero ctx tail,
        # zero wo rows contribute nothing — bitwise-inert. `scale` was
        # fixed from the REAL Dh above.
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, dh_p - dh)))
        bq = jnp.pad(bq, ((0, 0), (0, 0), (0, 0), (0, dh_p - dh)))
        wo_h = jnp.pad(wo_h, ((0, 0), (0, dh_p - dh), (0, 0)))
        dh = dh_p

    tile_b = max(1, min(tile_b, b))
    pad_b = round_up(b, tile_b)
    if pad_b != b:
        y = jnp.pad(y, ((0, pad_b - b), (0, 0), (0, 0)))
        mrow = (
            jnp.ones((pad_b - b, l), dtype=pad_mask.dtype).at[:, 0].set(False)
        )
        pad_mask = jnp.concatenate([pad_mask, mrow], axis=0)
    grid = (cdiv(pad_b, tile_b), h)
    out = pl.pallas_call(
        functools.partial(
            _attn_block_kernel, scale=float(scale), causal=causal,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, l, d), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, d, dh), lambda i, j: (0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, 1, dh), lambda i, j: (0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, dh, d), lambda i, j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_b, 1, l), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, l, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pad_b, l, d), jnp.float32),
        interpret=use_interpret(),
    )(y, w, bq, wo_h, pad_mask[:, None, :])
    return out[:b]


@functools.cache
def fused_attn_block_enabled() -> bool:
    import os

    return os.environ.get("OUTFITX_ATTN_BLOCK", "") == "fused"
