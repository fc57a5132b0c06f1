"""Dh lane-packing probe: does the half-filled MXU contraction at
Dh=96 (set transformer, 16 heads x 1536) / Dh=64 (clip towers) cost
measurable attention-core throughput, and does zero-padding Dh to 128
buy it back? (Second half of VERDICT r3 item 3; the FFN half lives in
bench_ffn_pad.py.)

Exactness of the pad: q/k zero columns add 0 to every q.k^T score; v zero
columns produce ctx columns that are sliced away (and in a fused block the
matching wo rows are zero). So a Dh->128 pad is bitwise-inert like the
ffn_pad_to mechanism — IF it wins, the same apply-time treatment applies.

Measures, best-of-N windows (relay noise protocol, bench.py):
  core96     masked_mha at (B, 16, 17, 96)   — flagship attention core
  core128    masked_mha at (B, 16, 17, 128)  — zero-padded q/k/v, ctx sliced
  block96    attn_block at d=1536 H=16       — fused block, Dh=96
  block128   attn_block with per-head Dh padded weights (inert columns)

Usage: python scripts/bench_dh_pack.py [--batch 4096] [--iters 12]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--windows", type=int, default=4)
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.ops.attention import masked_mha
    from outfitx_tpu.ops.attn_block import attn_block

    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    b, h, l, dh, d = args.batch, 16, 17, 96, 1536
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.bfloat16)
        for _ in range(3)
    )
    pad_mask = jnp.asarray(
        np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
    )

    def timeit(fn, *xs):
        out = fn(*xs)  # compile + warm
        float(np.asarray(jnp.sum(out.ravel()[:8])))  # relay sync
        per_window = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*xs)
            float(np.asarray(jnp.sum(out.ravel()[:8])))
            per_window.append((time.perf_counter() - t0) / args.iters)
        return min(per_window) * 1e3  # ms

    results = {}

    core = jax.jit(lambda q, k, v: masked_mha(q, k, v, pad_mask))
    results["core96_ms"] = timeit(core, q, k, v)

    pad = ((0, 0), (0, 0), (0, 0), (0, 128 - dh))
    # masked_mha derives its softmax scale from q.shape[-1] (=128 after the
    # pad); pre-scale q by sqrt(128/96) so scores keep the real 1/sqrt(96)
    # scale (costs one bf16 rounding of q — reflected in the diff check).
    qs = (q.astype(jnp.float32) * (128.0 / dh) ** 0.5).astype(q.dtype)
    qp = jnp.pad(qs, pad)
    kp, vp = (jnp.pad(x, pad) for x in (k, v))

    def core_padded(qp, kp, vp):
        return masked_mha(qp, kp, vp, pad_mask)[..., :dh]

    core_padded_jit = jax.jit(core_padded)  # one jit handle: a second
    # wrapper would recompile (1-7 min through the relay)
    results["core128_ms"] = timeit(core_padded_jit, qp, kp, vp)

    # exactness spot check (zero q/k columns leave scores unchanged)
    ref = core(q, k, v)
    got = core_padded_jit(qp, kp, vp)
    results["core_pad_max_abs_diff"] = float(
        np.asarray(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    )

    # ---- fused block: Dh=96 vs per-head padded weights to Dh=128 ----
    y = jnp.asarray(rng.standard_normal((b, l, d)), dtype=jnp.bfloat16)
    wqkv = jnp.asarray(
        rng.standard_normal((d, 3, d)) * 0.02, dtype=jnp.bfloat16
    )
    bqkv = jnp.asarray(rng.standard_normal((3, d)) * 0.02, dtype=jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((d, d)) * 0.02, dtype=jnp.bfloat16)

    blk = jax.jit(
        lambda y: attn_block(y, wqkv, bqkv, wo, pad_mask, n_heads=h)
    )
    results["block96_ms"] = timeit(blk, y)

    # pad each head's Dh slices with inert zeros: wqkv (d,3,H*Dh)->(d,3,H*128)
    dhp = 128
    w4 = np.asarray(wqkv, dtype=np.float32).reshape(d, 3, h, dh)
    w4p = np.zeros((d, 3, h, dhp), np.float32)
    w4p[..., :dh] = w4
    b4 = np.asarray(bqkv, dtype=np.float32).reshape(3, h, dh)
    b4p = np.zeros((3, h, dhp), np.float32)
    b4p[..., :dh] = b4
    wo4 = np.asarray(wo, dtype=np.float32).reshape(h, dh, d)
    wo4p = np.zeros((h, dhp, d), np.float32)
    wo4p[:, :dh] = wo4
    wqkv_p = jnp.asarray(w4p.reshape(d, 3, h * dhp), dtype=jnp.bfloat16)
    bqkv_p = jnp.asarray(b4p.reshape(3, h * dhp), dtype=jnp.bfloat16)
    wo_p = jnp.asarray(wo4p.reshape(h * dhp, d), dtype=jnp.bfloat16)

    # attn_block derives d from y and Dh from wqkv columns; the padded
    # variant has a (d, 3, H*128) wqkv — supported because the kernel only
    # needs n_heads and the per-head column count.
    blk_p = jax.jit(
        lambda y: attn_block(
            y, wqkv_p, bqkv_p, wo_p, pad_mask, n_heads=h,
            scale=1.0 / (dh**0.5),  # the REAL head dim's scale
        )
    )
    try:
        results["block128_ms"] = timeit(blk_p, y)
        ref_b = blk(y)
        got_b = blk_p(y)
        results["block_pad_max_abs_diff"] = float(
            np.asarray(jnp.max(jnp.abs(ref_b - got_b)))
        )
    except Exception as e:  # shape assumptions inside attn_block may reject
        results["block128_error"] = f"{type(e).__name__}: {e}"

    for name, val in results.items():
        if name.endswith("_ms"):
            results[name] = round(val, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
