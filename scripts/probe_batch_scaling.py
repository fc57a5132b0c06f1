"""Forward-throughput batch-scaling probe: outfits/s at B in {4096, 8192,
16384} under the bench.py protocol (dependency-chained iterations, scalar
D2H sync, best-of-N windows).

The headline metric is outfits scored/sec/chip; the bench's B=4096 was
inherited from the round-1 study, but nothing pins it — if a larger batch
amortizes per-dispatch and grid overheads into a better per-outfit rate,
the bench should run there (documented shape change, same metric).

    python scripts/probe_batch_scaling.py [--batches 4096,8192,16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4096,8192,16384")
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.models import OutfitXModel

    cfg = OutfitXConfig()
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    l, d = cfg.max_outfit_len, cfg.d_embed

    for b in [int(x) for x in args.batches.split(",")]:
        emb = jnp.asarray(
            rng.standard_normal((b, l, d)), dtype=jnp.bfloat16
        )
        mask = jnp.asarray(
            np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
        )

        @jax.jit
        def chained(params, emb, mask):
            scores = model.cp_forward(params, emb, mask)
            new_emb = emb + (scores[:, None, None] * 1e-6).astype(emb.dtype)
            return scores, new_emb

        scores, e = chained(params, emb, mask)
        float(np.asarray(scores[0]))
        per_window = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            e = emb
            for _ in range(args.iters):
                scores, e = chained(params, e, mask)
            float(np.asarray(scores[0]))
            per_window.append((time.perf_counter() - t0) / args.iters)
        best = b / min(per_window)
        print(
            json.dumps(
                {
                    "batch": b,
                    "outfits_per_sec": round(best, 1),
                    "windows": [round(b / w, 1) for w in per_window],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
