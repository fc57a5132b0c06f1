"""Probe XLA:TPU compiler options against the headline CP forward.

The remote compile service's codegen regressed the forward ~15% across
service versions (33.2k -> 28.4k outfits/s; BENCHMARKS.md "Headline")
while the repo's HLO was bit-identical — so the lost performance lives in
compiler scheduling/fusion decisions, not in our program. The relay DOES
forward per-compile `compiler_options` env overrides to the service
(bogus flags are rejected with HTTP 500, so accepted flags are really
applied). This probe compiles the exact bench.py chained program under a
matrix of known XLA:TPU flags and measures each executable with the
standard protocol (chained iterations, scalar D2H sync, best-of-4
windows).

Run: python scripts/probe_compiler_options.py [--iters 12 --windows 4]
Output: one JSON line per option set; rejected flags are recorded and
skipped.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

OPTION_SETS = [
    ("baseline", {}),
    # more scoped VMEM headroom for fusion (default ~16 MiB; v5e has 128)
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # scheduler family
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("lhs_rerun2", {"xla_latency_hiding_scheduler_rerun": "2"}),
    # fusion family
    ("dotdot", {"xla_tpu_dot_dot_fusion": "true"}),
    ("dotdot_off", {"xla_tpu_dot_dot_fusion": "false"}),
    ("rwb_off", {"xla_tpu_rwb_fusion": "false"}),
    ("nested_fusion", {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    # flip flash-attention-style sched heuristics
    ("mbl_opt", {"xla_tpu_memory_bound_loop_optimizer": "true"}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of option-set names")
    ns = ap.parse_args()

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
    b, l, d = 4096, cfg.max_outfit_len, cfg.d_embed
    emb = jnp.asarray(rng.standard_normal((b, l, d)), dtype=jnp.bfloat16)
    mask = jnp.asarray(
        np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
    )

    def chained(p, e, m):
        scores = model.cp_forward(p, e, m)
        return scores, e + (scores[:, None, None] * 1e-6).astype(e.dtype)

    lowered = jax.jit(chained).lower(params, emb, mask)

    def measure(call):
        scores, e = call(params, emb, mask)
        float(np.asarray(scores[0]))
        per_window = []
        for _ in range(ns.windows):
            t0 = time.perf_counter()
            e = emb
            for _ in range(ns.iters):
                scores, e = call(params, e, mask)
            float(np.asarray(scores[0]))
            per_window.append((time.perf_counter() - t0) / ns.iters)
        return b / min(per_window), [round(b / w, 1) for w in per_window]

    only = set(ns.only.split(",")) if ns.only else None
    results = {}
    for name, opts in OPTION_SETS:
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # rejected flag or compile failure
            print(json.dumps({
                "set": name, "opts": opts, "error": repr(e)[:200]
            }), flush=True)
            continue
        compile_s = round(time.time() - t0, 1)
        value, spread = measure(compiled)
        results[name] = value
        print(json.dumps({
            "set": name, "opts": opts,
            "outfits_per_s": round(value, 1),
            "windows": spread, "compile_s": compile_s,
        }), flush=True)

    if results:
        base = results.get("baseline")
        best = max(results, key=results.get)
        print(json.dumps({
            "best": best,
            "best_outfits_per_s": round(results[best], 1),
            "vs_baseline": round(results[best] / base, 4) if base else None,
        }), flush=True)


if __name__ == "__main__":
    main()
