"""Product-level serving latency: ServingEngine API calls at flagship scale
(d=1536 set transformer, 250k-item catalog, int8 + approx top-k default).

Reports per-call wall latency through the public engine surface — the
number a deployment actually sees, on top of the ops-level figures in
BENCHMARKS.md.

    python scripts/bench_serving.py [--items 250000] [--quantized]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--no-quantized", action="store_true")
    ap.add_argument(
        "--catalog-dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="device catalog storage dtype; bfloat16 halves catalog HBM "
        "(a 1M-item f32 catalog OOMs the 16 GB chip during warmup)",
    )
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    if args.smoke:
        args.items, args.iters = 500, 2
    else:
        retry_if_backend_down()
    enable_compilation_cache()

    import jax

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.data.synthetic import make_synthetic
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.serve.engine import ServingEngine

    cfg = OutfitXConfig()  # flagship: d=1536, 6 layers, 16 heads
    if args.smoke:
        from outfitx_tpu.core.config import (
            ItemEncoderConfig,
            TransformerConfig,
        )

        cfg = OutfitXConfig(
            item_encoder=ItemEncoderConfig(dim_per_modality=16),
            transformer=TransformerConfig(n_heads=4, d_ffn=32, n_layers=1),
            max_outfit_len=8,
        )
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    synth = make_synthetic(
        n_items=args.items, d_embed=cfg.d_embed, n_outfits=64, seed=0
    )
    t0 = time.perf_counter()
    eng = ServingEngine(
        model_cfg=cfg,
        catalog=synth.catalog,
        cp_params=params,
        cir_params=params,
        quantized=not args.no_quantized,
        catalog_dtype=args.catalog_dtype,
    )
    startup_s = time.perf_counter() - t0  # includes quantize + warmup jits

    ids = eng.sample_outfit(6)

    def timeit(fn):
        fn()  # ensure compiled
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

    p50 = {
        "cp_score_ms": timeit(lambda: eng.cp_score(ids)) * 1000,
        "cir_top10_ms": timeit(lambda: eng.cir_top10(ids[:5], ids[5])) * 1000,
        "similar_items_ms": timeit(lambda: eng.similar_items(ids[0], k=10))
        * 1000,
    }
    print(
        json.dumps(
            {
                "metric": "serving_engine_p50_latency",
                "catalog_items": args.items,
                "quantized": not args.no_quantized,
                "startup_s": round(startup_s, 1),
                **{k: round(v, 2) for k, v in p50.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
