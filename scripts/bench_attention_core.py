"""Attention-core micro-benchmark at the flagship set-attention shape
(B=4096, H=16, L=17, Dh=96) — the per-call number behind the
BENCHMARKS.md formulation study (Pallas fused kernel ~5.5 ms vs ~9 ms
XLA einsum on v5e).

    python scripts/bench_attention_core.py [--impl pallas|xla|both]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", choices=["pallas", "xla", "both"], default="both")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--seq", type=int, default=17)
    ap.add_argument("--dh", type=int, default=96)
    ap.add_argument("--iters", type=int, default=50)
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

    rng = np.random.default_rng(0)
    b, h, l, dh = args.batch, args.heads, args.seq, args.dh
    q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.bfloat16)
    mask = jnp.asarray(
        np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
    )

    impls = ["pallas", "xla"] if args.impl == "both" else [args.impl]
    for impl in impls:

        @jax.jit
        def chained(q, k, v, mask, impl=impl):
            o = masked_mha(q, k, v, mask, impl=impl)
            # serialize iterations: feed the output back as q
            return o

        o = chained(q, k, v, mask)
        float(np.asarray(jnp.sum(o.ravel()[:8].astype(jnp.float32))))
        t0 = time.perf_counter()
        oo = q
        for _ in range(args.iters):
            oo = chained(oo, k, v, mask)
        float(np.asarray(jnp.sum(oo.ravel()[:8].astype(jnp.float32))))
        dt = (time.perf_counter() - t0) / args.iters
        print(
            json.dumps(
                {
                    "metric": f"attention_core_{impl}_ms",
                    "value": round(dt * 1000, 2),
                    "shape": f"B{b} H{h} L{l} Dh{dh}",
                    "tile_env": os.environ.get("OUTFITX_MHA_TILE", ""),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
