"""Serving-retrieval breakdown: distance matmul vs top-k, and exact
lax.top_k vs the TPU-native approx_max_k, at serving scale (250k x 1536,
Q=1024, k=10).

    python scripts/bench_retrieval_topk.py
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
    ap.add_argument("--items", type=int, default=250_000)
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.ops.retrieval import pairwise_l2

    rng = np.random.default_rng(0)
    pool = jnp.asarray(
        rng.standard_normal((args.items, args.dim)).astype(np.float32)
    )
    qs = jnp.asarray(
        rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    )
    k = args.k

    @jax.jit
    def dist_only(q, pool):
        d2 = pairwise_l2(q, pool, squared=True)
        # cheap reduction so the (Q, N) matrix is consumed on device
        return jnp.min(d2, axis=1)

    @jax.jit
    def exact(q, pool):
        d2 = pairwise_l2(q, pool, squared=True)
        nv, idx = jax.lax.top_k(-d2, k)
        return -nv, idx

    @jax.jit
    def approx(q, pool):
        d2 = pairwise_l2(q, pool, squared=True)
        nv, idx = jax.lax.approx_max_k(-d2, k, recall_target=0.99)
        return -nv, idx

    def sync(x):
        return float(np.asarray(jnp.sum(x.ravel()[:8].astype(jnp.float32))))

    results = {}
    for name, fn in (("dist_only", dist_only), ("exact_topk", exact),
                     ("approx_topk", approx)):
        out = fn(qs, pool)
        first = out[0] if isinstance(out, tuple) else out
        sync(first)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(qs, pool)
        first = out[0] if isinstance(out, tuple) else out
        sync(first)
        results[name] = (time.perf_counter() - t0) / args.iters

    dv, di = exact(qs, pool)
    av, ai = approx(qs, pool)
    overlap = float(
        np.mean(
            [len(set(a) & set(b)) / k
             for a, b in zip(np.asarray(di), np.asarray(ai))]
        )
    )
    print(
        json.dumps(
            {
                "metric": "retrieval_topk_breakdown_ms",
                "pool": f"{args.items}x{args.dim}",
                "queries": args.queries,
                "dist_only_ms": round(results["dist_only"] * 1000, 2),
                "exact_topk_ms": round(results["exact_topk"] * 1000, 2),
                "approx_topk_ms": round(results["approx_topk"] * 1000, 2),
                "approx_recall_vs_exact": round(overlap, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
