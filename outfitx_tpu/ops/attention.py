"""Masked multi-head set attention.

The reference's attention is torch's nn.MultiheadAttention inside
nn.TransformerEncoderLayer with src_key_padding_mask (True = pad; the prefix
token at position 0 is never masked — reference outfit_x.py:128-144). Outfits
are at most 16 items + 1 prefix token, so this is *set attention over tiny
sequences*: the TPU-native design keeps the whole (L, L) score matrix in
registers/VMEM, computes softmax in f32, and fuses the score+softmax+combine
chain in a single Pallas kernel gridded over (batch-tile, head). Sequence
parallelism is structurally unnecessary at L<=32 (SURVEY.md 5, long-context).

Inputs are (B, H, L, Dh) with a (B, L) bool key-padding mask.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outfitx_tpu.ops.common import cdiv, round_up, use_interpret

_NEG = -1e9


def _mha_reference(q, k, v, pad_mask, causal: bool = False):
    """XLA path: einsum attention, f32 softmax, bf16 matmuls."""
    dh = q.shape[-1]
    scale = 1.0 / (dh**0.5)
    scores = jnp.einsum(
        "bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    mask = pad_mask[:, None, None, :]  # (B,1,1,L) over keys
    scores = jnp.where(mask, _NEG, scores)
    if causal:
        l = q.shape[2]
        tri = jnp.tril(jnp.ones((l, l), dtype=bool))
        scores = jnp.where(tri[None, None], scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhlm,bhmd->bhld",
        probs.astype(q.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _causal_keep(l_q: int, l_k: int):
    """(Lq, Lk) bool: True on/below the diagonal (the compile-time causal
    branch; reference clip_text_encoder.py:42-47). Applied as a where-SET
    to _NEG, matching _mha_reference's formulation exactly."""
    row = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 1)
    return col <= row


def _block_keep(l_q: int, l_k: int, block: int):
    """(Lq, Lk) bool: True where query and key fall in the same
    ``block``-sized diagonal block. Compile-time constant — the outfit
    -packing route tiles ``pack`` independent outfits of length ``block``
    along the sequence dim and this mask keeps their score blocks
    mutually invisible (cross-outfit scores are set to _NEG, which
    underflows to exactly 0.0 through the f32 softmax, so each outfit's
    attention is bit-identical to running it alone)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 0) // block
    col = jax.lax.broadcasted_iota(jnp.int32, (l_q, l_k), 1) // block
    return row == col


def _mha_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref,
    *, causal: bool = False, block: int = 0,
):
    # Blocks: q/k/v (TB, 1, L, Dh); mask (TB, 1, L) — the singleton middle
    # axis keeps the mask block's trailing dims (1, L) legal for any TB
    # (Pallas requires trailing block dims (8k, 128k) OR equal to the
    # array dims; small batch tiles at lane-aligned L need the latter).
    # Matmul operands stay in the input dtype (bf16 on the training path —
    # the MXU's native rate; f32 operands would run at ~1/4 throughput);
    # accumulation and softmax are f32.
    q = q_ref[:, 0]  # (TB, L, Dh)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    dh = q.shape[-1]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (1.0 / (dh**0.5))  # (TB, L, L) f32
    mask = mask_ref[:]  # (TB, 1, L) key mask
    scores = jnp.where(mask, _NEG, scores)
    if causal:
        scores = jnp.where(_causal_keep(*scores.shape[-2:])[None], scores, _NEG)
    if block:
        scores = jnp.where(
            _block_keep(*scores.shape[-2:], block)[None], scores, _NEG
        )
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, L, Dh)
    o_ref[:, 0] = out.astype(o_ref.dtype)


# Per-program f32 score-block byte budget. Validated corners on v5e
# (16 MB scoped-VMEM stack, total program footprint ~3.6x the score
# block): tile 16 at Lp=256 -> 4.19 MB compiles; tile 32 at L=196 ->
# 6.55 MB is the measured 23.65 MB Mosaic OOM. Tiles are sized so the
# score block stays under this, and the router falls back to XLA when
# even tile 1 exceeds it (ADVICE r3: a future tower with a long enough
# sequence must degrade to XLA, not fail Mosaic compilation).
_VMEM_SCORE_BUDGET = int(4.5 * 2**20)


def _tile_cap(l: int, budget: int = _VMEM_SCORE_BUDGET) -> int:
    # Returns the largest batch tile whose per-program (TB, Lq, Lk) f32
    # score block fits the budget (0: nothing fits -> caller goes XLA).
    # Mosaic pads the sublane dim to 8 and the lane dim to 128 internally,
    # so budget against the padded extents. Measurements behind the caps:
    # ViT-B/16 tower (padded kernel) tile 4 -> 1004 ms, 8 -> 994, 16 ->
    # 987 per 2048-batch; direct kernel at S=196: 8 -> 764, 16 -> 756;
    # flagship L=17 forward core tile 32 -> 7.55 ms, 64 -> 7.09, 128 ->
    # 6.87, 256 -> 6.96, 512 -> compile fail (and +0.6% on the
    # end-to-end CP forward at 128) under the 2026-08-17 codegen.
    if l <= 32:
        return 128
    lq = round_up(l, 8)
    lk = round_up(l, 128)
    t = 16  # measured-fastest tile in the 32 < L <= 256 band
    while t >= 1 and t * lq * lk * 4 > budget:
        t //= 2
    return t


def _pad_batch(q, k, v, pad_mask, tile_b):
    """Pad the batch to a tile multiple. Padded rows: every key masked
    except key 0 (uniform attention over key 0 — harmless, sliced away)."""
    b, _, l, _ = q.shape
    pad_b = round_up(b, tile_b)
    if pad_b != b:
        pad = ((0, pad_b - b), (0, 0), (0, 0), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        mrow = jnp.ones((pad_b - b, l), dtype=pad_mask.dtype).at[:, 0].set(False)
        pad_mask = jnp.concatenate([pad_mask, mrow], axis=0)
    return q, k, v, pad_mask, pad_b


def _mha_pallas_impl(q, k, v, pad_mask, causal: bool = False, block: int = 0):
    b, h, l, dh = q.shape
    cap = int(os.environ.get("OUTFITX_MHA_TILE", "0")) or _tile_cap(l)
    tile_b = max(1, min(cap, b))
    q, k, v, pad_mask, pad_b = _pad_batch(q, k, v, pad_mask, tile_b)
    grid = (cdiv(pad_b, tile_b), h)
    qkv_spec = pl.BlockSpec(
        (tile_b, 1, l, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_mha_kernel, causal=causal, block=block),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec(
                (tile_b, 1, l), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((pad_b, h, l, dh), q.dtype),
        interpret=use_interpret(),
    )(q, k, v, pad_mask[:, None, :])
    return out[:b]


def _mha_bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, causal: bool = False, block: int = 0,
):
    # One fused backward per (batch-tile, head): recompute the tiny (L, L)
    # score/prob matrices in VMEM (cheaper than spilling them to HBM in the
    # forward), then the five small matmuls of the attention VJP. Matches the
    # forward's precision contract: matmul operands bf16, softmax/accum f32.
    q = q_ref[:, 0]  # (TB, L, Dh)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    g = g_ref[:, 0]
    dh = q.shape[-1]
    scale = 1.0 / (dh**0.5)

    def bdot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    scores = bdot(q, k, ((2,), (2,))) * scale  # (TB, L, L) f32
    mask = mask_ref[:]  # (TB, 1, L) key mask
    scores = jnp.where(mask, _NEG, scores)
    if causal:
        scores = jnp.where(_causal_keep(*scores.shape[-2:])[None], scores, _NEG)
    if block:
        scores = jnp.where(
            _block_keep(*scores.shape[-2:], block)[None], scores, _NEG
        )
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (TB, L, L) f32
    pb = p.astype(v.dtype)

    # dv = p^T g  — contract over query dim
    dv = bdot(pb, g, ((1,), (1,)))  # (TB, L_k, Dh)
    # dp = g v^T
    dp = bdot(g, v, ((2,), (2,)))  # (TB, L_q, L_k) f32
    # softmax vjp (masked entries have p == 0 so ds == 0 there)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = (ds * scale).astype(q.dtype)
    dq = bdot(dsb, k, ((2,), (1,)))  # (TB, L_q, Dh)
    dk = bdot(dsb, q, ((1,), (1,)))  # (TB, L_k, Dh)

    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)


def _mha_bwd_pallas_impl(q, k, v, pad_mask, g, causal: bool = False,
                         block: int = 0):
    b, h, l, dh = q.shape
    # Backward keeps its own measured cap (64 at L<=32): with five
    # in-program matmuls the VMEM/unroll pressure differs from the
    # forward's two, and 64 is the validated-fastest backward tile
    # (override: OUTFITX_MHA_BWD_TILE).
    # Half the forward's score budget: the backward holds ~3 (L, L) f32
    # temporaries (p, dp, ds) in VMEM vs the forward's ~2.
    cap = int(os.environ.get("OUTFITX_MHA_BWD_TILE", "0")) or (
        64 if l <= 32 else _tile_cap(l, _VMEM_SCORE_BUDGET // 2)
    )
    tile_b = max(1, min(cap, b))
    q, k, v, pad_mask, pad_b = _pad_batch(q, k, v, pad_mask, tile_b)
    if pad_b != b:
        g = jnp.pad(g, ((0, pad_b - b), (0, 0), (0, 0), (0, 0)))
    grid = (cdiv(pad_b, tile_b), h)
    qkv_spec = pl.BlockSpec(
        (tile_b, 1, l, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((pad_b, h, l, dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mha_bwd_kernel, causal=causal, block=block),
        grid=grid,
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec(
                (tile_b, 1, l), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            qkv_spec,
        ],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[shape, shape, shape],
        interpret=use_interpret(),
    )(q, k, v, pad_mask[:, None, :], g)
    return dq[:b], dk[:b], dv[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mha_pallas(q, k, v, pad_mask, causal=False, block=0):
    return _mha_pallas_impl(q, k, v, pad_mask, causal, block)


def _mha_fwd(q, k, v, pad_mask, causal, block):
    return (
        _mha_pallas_impl(q, k, v, pad_mask, causal, block),
        (q, k, v, pad_mask),
    )


def _mha_bwd(causal, block, res, g):
    q, k, v, pad_mask = res
    if (
        os.environ.get("OUTFITX_MHA_BWD", "pallas") == "pallas"
        and _tile_cap(q.shape[2], _VMEM_SCORE_BUDGET // 2) >= 1
    ):
        # Fused single-kernel backward: recomputes the tiny (L, L)
        # scores/probs in VMEM and emits dq/dk/dv in one pass (measured
        # faster than the XLA recompute chain at the flagship shape).
        dq, dk, dv = _mha_bwd_pallas_impl(q, k, v, pad_mask, g, causal, block)
        return dq, dk, dv, None
    # OUTFITX_MHA_BWD=xla: recompute-based backward through the XLA path.
    def ref(q, k, v):
        out = _mha_reference(q, k, v, pad_mask, causal=causal)
        return out

    if block:
        # The XLA reference has no block-diagonal branch; differentiate
        # the per-outfit formulation by unpacking, which is exactly
        # equivalent (cross-outfit probs are exactly 0).
        def ref(q, k, v):  # noqa: F811
            b, h, lp, dh = q.shape
            pack = lp // block

            def unpack(t):
                return (
                    t.reshape(b, h, pack, block, dh)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(b * pack, h, block, dh)
                )

            m = pad_mask.reshape(b * pack, block)
            o = _mha_reference(unpack(q), unpack(k), unpack(v), m)
            return (
                o.reshape(b, pack, h, block, dh)
                .transpose(0, 2, 1, 3, 4)
                .reshape(b, h, lp, dh)
            )

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_mha_pallas.defvjp(_mha_fwd, _mha_bwd)


def _mha_pallas_packed(q, k, v, pad_mask, pack: int):
    """Outfit packing for tiny-L set attention: tile ``pack`` outfits of
    length L along the sequence dim (pack*L <= 128) so each per-program
    score/combine matmul fills a full MXU tile instead of L/128 of one.
    Cross-outfit scores are masked by the compile-time block-diagonal
    mask (see ``_block_keep``) and underflow to exactly 0.0 through the
    f32 softmax, so outputs are bit-identical to the unpacked kernel.

    MEASURED NEGATIVE on v5e (2026-08-19, scripts/probe_mha_pack.py,
    flagship shape B=4096 H=16 L=17 Dh=96): kernel-only 9.32 ms packed vs
    6.78 ms unpacked, + 6.43 ms of pack/unpack transposes = 16.7 ms end
    -to-end (2.4x WORSE; tile-insensitive across 8/16/32). Why the MXU
    -fill thesis fails: the L=17 core is score-block-traffic/VPU-bound,
    not MXU-pass-bound (BENCHMARKS.md formulation study), and packing
    inflates per-outfit score work by the pack factor — (pack*L)^2
    elements per pack outfits = pack*L^2 per outfit vs L^2 unpacked —
    which the saved MXU passes cannot buy back. Kept as an opt-in
    (OUTFITX_MHA_PACK=auto|<int>) negative-result formulation, like the
    fused-MLP and flash studies.
    """
    b, h, l, dh = q.shape
    bp = round_up(b, pack)
    if bp != b:
        pad = ((0, bp - b), (0, 0), (0, 0), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        mrow = jnp.ones((bp - b, l), dtype=pad_mask.dtype).at[:, 0].set(False)
        pad_mask = jnp.concatenate([pad_mask, mrow], axis=0)
    g = bp // pack

    def packf(t):
        return (
            t.reshape(g, pack, h, l, dh)
            .transpose(0, 2, 1, 3, 4)
            .reshape(g, h, pack * l, dh)
        )

    out = _mha_pallas(
        packf(q), packf(k), packf(v),
        pad_mask.reshape(g, pack * l), False, l,
    )
    out = (
        out.reshape(g, h, pack, l, dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(bp, h, l, dh)
    )
    return out[:b]


def _mha_flash_nomask(q, k, v):
    """Unmasked long-sequence attention via the stock TPU flash-attention
    Pallas kernel (jax.experimental.pallas.ops.tpu.flash_attention).

    Used for the ViT towers (L=197 ViT-B/16, 50 ViT-B/32): XLA's einsum
    attention materializes the (B*H, L, L) score matrix in HBM, which is
    the dominant non-matmul traffic of the vision tower (BENCHMARKS.md
    precompute bisection). Sequences are padded to a 128 multiple; padded
    positions are excluded EXACTLY via segment ids (real tokens segment 0,
    padding segment 1), so real queries attend precisely the real keys and
    the padded query rows are sliced away — numerics match the reference
    formulation up to flash's f32 online-softmax reassociation."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, h, l, dh = q.shape
    lp = round_up(l, 128)
    if lp != l:
        pad = ((0, 0), (0, 0), (0, lp - l), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    seg = jnp.broadcast_to(
        (jnp.arange(lp) >= l).astype(jnp.int32)[None, :], (b, lp)
    )
    out = flash_attention(
        q,
        k,
        v,
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=False,
        sm_scale=1.0 / (dh**0.5),
    )
    return out[:, :, :l]


def _mha_pallas_padded(q, k, v, pad_mask, causal: bool = False):
    """The L<=32 set-attention kernel applied at tower sequence lengths
    (L=50 ViT-B/32, 197 ViT-B/16): pad L up to a 128 lane multiple, mask
    the geometric padding as extra PAD KEYS (exact — padded keys get score
    -inf; padded query rows compute garbage and are sliced away, and their
    cotangents are zero so dk/dv stay exact through the custom VJP; with
    ``causal`` the padded key columns sit above every real row's diagonal
    anyway).

    Keeps the whole (TB, Lp, Lp) score block VMEM-resident per
    (batch-tile, head) program — the technique that won at L=17 — instead
    of XLA materializing (B*H, L, L) scores in HBM (the measured #1 loss of
    the ViT tower, BENCHMARKS.md precompute bisection)."""
    b, h, l, dh = q.shape
    lp = round_up(l, 128)
    if lp != l:
        pad = ((0, 0), (0, 0), (0, lp - l), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        pad_mask = jnp.pad(
            pad_mask, ((0, 0), (0, lp - l)), constant_values=True
        )
    out = _mha_pallas(q, k, v, pad_mask, causal)
    return out[:, :, :l]


def masked_mha(q, k, v, pad_mask, *, causal: bool = False, impl: str = "auto"):
    """Multi-head attention with key-padding mask (True = pad) and optional
    causal masking (text towers).

    q, k, v: (B, H, L, Dh); pad_mask: (B, L) bool. Returns (B, H, L, Dh).
    """
    if impl == "auto":
        # Pallas wins where it was measured to win on v5e:
        # - tiny-L set attention (+22% end-to-end at L=17);
        # - long tower sequences L>128 via the padded kernel (ViT-B/16
        #   S=197->256: vision tower 1177 -> 995 ms/2048-batch, 1.18x —
        #   VMEM-resident scores beat XLA's HBM score materialization);
        # - 32 < L <= 128 via the DIRECT kernel (blocks equal to the
        #   array dims need no geometric pad): text tower L=64 measured
        #   322 -> 241 ms/2048-batch, 1.33x. (The earlier "text loses"
        #   result — 356 vs 322 ms — was the EXPLICIT 128-pad route whose
        #   4x score-FLOP inflation the direct kernel avoids.)
        # Causal (CLIP text, L=77) rides the same direct kernel via a
        # compile-time triangular branch (VERDICT r3 item 4).
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "flash":
        # Caller guarantees pad_mask is all-False and not causal; the stock
        # flash kernel needs a TPU backend.
        if jax.default_backend() == "tpu" and not causal:
            return _mha_flash_nomask(q, k, v)
        impl = "xla"
    if impl == "pallas":
        # Blocks equal to the array dims are legal at ANY l (Mosaic pads
        # lanes internally), so the explicit geometric 128-pad (and its
        # score-FLOP inflation) is only applied above a threshold. Direct
        # measured: text L=64 and ViT-B/32 S=50 1.33x vs XLA; ViT-B/16
        # S=197 756 vs 988 ms (padded) vs 1177 (XLA) = 1.56x. Default
        # threshold 256 = the largest per-program (tile 16) extent Mosaic
        # is known to compile (BENCHMARKS.md tower-attention study);
        # OUTFITX_MHA_DIRECT_MAX overrides.
        direct_max = int(os.environ.get("OUTFITX_MHA_DIRECT_MAX", "256"))
        l = q.shape[2]
        lp = round_up(l, 128) if l > direct_max else l
        if _tile_cap(lp) < 1:
            # even a tile-1 program's score block exceeds the scoped-VMEM
            # budget (l beyond ~1k) — degrade to XLA instead of letting
            # Mosaic fail to compile (ADVICE r3).
            return _mha_reference(q, k, v, pad_mask, causal=causal)
        if l > direct_max:
            return _mha_pallas_padded(q, k, v, pad_mask, causal)
        # Outfit packing (see _mha_pallas_packed): measured NEGATIVE on
        # v5e and kept opt-in only. OUTFITX_MHA_PACK: "0"/"1"/unset (off,
        # default), "auto" (pack to 128 rows), or an explicit pack factor.
        pack_env = os.environ.get("OUTFITX_MHA_PACK", "1")
        if pack_env == "auto":
            pack = 128 // l
        else:
            try:
                pack = int(pack_env)
            except ValueError:
                pack = 1  # "", "off", typos: opt-in stays off, never crash
        if not causal and l <= 32 and pack > 1 and q.shape[0] >= pack:
            return _mha_pallas_packed(q, k, v, pad_mask, pack)
        return _mha_pallas(q, k, v, pad_mask, causal)
    return _mha_reference(q, k, v, pad_mask, causal=causal)
