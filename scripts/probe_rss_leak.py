"""Host-RSS leak probe for the axon relay client (envelope OOM root-cause).

The 2026-08-18 envelope campaign's CIR phase was OOM-killed by the kernel
at ~epoch 261 with anon-rss 130.9 GB (dmesg) — ~500 MB/epoch of host
growth.  The trainer's per-epoch Python state is bounded, so the suspects
are the jax/relay transfer paths.  This probe isolates them:

  exec : run a pre-compiled program in a loop (no new H2D/D2H payload)
  h2d  : jax.device_put a FRESH numpy array each iteration, then drop it
  d2h  : np.asarray a device array each iteration, then drop it

RSS is sampled from /proc/self/status every `--every` iterations; a
per-iteration slope is printed at the end.  Run on the TPU (default) or
CPU (`JAX_PLATFORMS=cpu` comparison to separate relay-client growth from
generic jax host growth).

Usage: python scripts/probe_rss_leak.py --mode h2d --iters 80 --mb 32
"""
from __future__ import annotations

import argparse
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["exec", "h2d", "d2h"], default="h2d")
    ap.add_argument("--iters", type=int, default=80)
    ap.add_argument("--mb", type=float, default=32.0, help="payload size")
    ap.add_argument("--every", type=int, default=10)
    args = ap.parse_args()

    from outfitx_tpu.core import runtime

    runtime.force_platform_from_env()
    runtime.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"backend={dev.platform} mode={args.mode} payload={args.mb}MB")

    n = int(args.mb * 2**20 / 4)
    side = int(np.sqrt(n))
    host = np.random.default_rng(0).standard_normal((side, side)).astype(np.float32)

    f = jax.jit(lambda x: jnp.sum(x * 1.0001))
    resident = jax.device_put(host, dev)
    float(f(resident))  # compile + warm

    samples = []
    for i in range(args.iters):
        if args.mode == "exec":
            out = f(resident)
            float(out)
        elif args.mode == "h2d":
            fresh = host + np.float32(i)  # defeat any content-hash caching
            d = jax.device_put(fresh, dev)
            float(f(d))
            del d, fresh
        else:  # d2h
            back = np.asarray(resident)
            assert back.shape == host.shape
            del back
        if i % args.every == 0 or i == args.iters - 1:
            gc.collect()
            samples.append((i, rss_mb()))
            print(f"iter {i:5d}  rss {samples[-1][1]:9.1f} MB", flush=True)

    if len(samples) >= 3:
        # slope over the tail (skip the first sample: warmup arenas)
        (i0, r0), (i1, r1) = samples[1], samples[-1]
        per_iter = (r1 - r0) / max(1, i1 - i0)
        per_mb = per_iter / args.mb if args.mode != "exec" else float("nan")
        print(
            f"LEAK SLOPE tail: {per_iter:+.3f} MB/iter "
            f"({per_mb:+.3f} MB leaked per MB transferred)"
        )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
