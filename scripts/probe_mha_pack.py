"""Decompose the outfit-packing attention probe: kernel-only time on
pre-packed inputs vs the pack/unpack transposes vs the end-to-end packed
route (ops/attention._mha_pallas_packed).

The end-to-end wrapper measured 16.7 ms vs 6.8 ms unpacked at the
flagship shape (B=4096, H=16, L=17, Dh=96) — tile-insensitive, so the
suspicion is the bare reshape-transposes (427 MB r+w each way) dominate
and the kernel itself is fast. If kernel-only wins big, packing must be
integrated at the MODEL level (folded into the existing
(B, S, 3, H, Dh) -> (B, H, S, Dh) head-split transpose, which moves the
same bytes anyway).

    python scripts/probe_mha_pack.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    b, h, l, dh = 4096, 16, 17, 96
    pack = 128 // l  # 7
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.bfloat16)
        for _ in range(3)
    )
    mask = jnp.asarray(
        np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
    )

    # pre-packed operands (group-major)
    bp = (b + pack - 1) // pack * pack
    g = bp // pack

    def packf(t):
        tp = jnp.pad(t, ((0, bp - b), (0, 0), (0, 0), (0, 0)))
        return (
            tp.reshape(g, pack, h, l, dh)
            .transpose(0, 2, 1, 3, 4)
            .reshape(g, h, pack * l, dh)
        )

    qp, kp, vp = packf(q), packf(k), packf(v)
    mrow = np.ones((bp - b, l), dtype=bool)
    mrow[:, 0] = False
    mp = jnp.asarray(
        np.concatenate([np.asarray(mask), mrow], axis=0).reshape(g, pack * l)
    )

    def time_fn(fn, *args, iters=50):
        o = fn(*args)
        float(np.asarray(jnp.sum(o.ravel()[:8].astype(jnp.float32))))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        float(np.asarray(jnp.sum(o.ravel()[:8].astype(jnp.float32))))
        return (time.perf_counter() - t0) / iters * 1000

    rows = {}
    # 1) kernel-only on pre-packed inputs (block-diag masked)
    kern = jax.jit(lambda q, k, v, m: A._mha_pallas(q, k, v, m, False, l))
    rows["kernel_only_packed_ms"] = round(time_fn(kern, qp, kp, vp, mp), 2)
    # 2) unpacked kernel (the shipping route)
    unp = jax.jit(lambda q, k, v, m: A._mha_pallas(q, k, v, m, False, 0))
    rows["kernel_only_unpacked_ms"] = round(time_fn(unp, q, k, v, mask), 2)
    # 3) transposes only (pack 3 operands + unpack 1 output)
    def transposes(q, k, v):
        qq, kk, vv = packf(q), packf(k), packf(v)
        o = (
            qq.reshape(g, h, pack, l, dh)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bp, h, l, dh)[:b]
        )
        return o + kk[0, 0, 0, 0] + vv[0, 0, 0, 0]

    rows["transposes_only_ms"] = round(
        time_fn(jax.jit(transposes), q, k, v), 2
    )
    # 4) full packed route (wrapper)
    full = jax.jit(lambda q, k, v, m: A._mha_pallas_packed(q, k, v, m, pack))
    rows["packed_route_ms"] = round(time_fn(full, q, k, v, mask), 2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
