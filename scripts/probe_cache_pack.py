"""Measure serving cold-start with and without the committed compile pack.

Builds the exact production-route soak engine (250k-item int8 catalog,
approx top-k, coalescers) and times process start -> engine constructed
(warmup compiles every route program) -> one in-process request per route.
Run it twice to isolate compile time (the catalog H2D and device init are
paid identically in both):

  # cold replica: empty cache, no pack
  JAX_COMPILATION_CACHE_DIR=/tmp/cc_cold OUTFITX_CACHE_PACK=0 \
      python scripts/probe_cache_pack.py

  # pack-seeded replica: empty cache, committed pack
  JAX_COMPILATION_CACHE_DIR=/tmp/cc_warm \
      python scripts/probe_cache_pack.py

Prints one JSON line: {"ready_s": ..., "engine_s": ..., "routes_s": ...,
"items": N, "seeded": N, "pack_already_present": N} — "seeded" is the
number of pack entries copied into the cache, so the A/B above is
self-verifying: the cold run must say seeded=0, pack_already_present=0.
A pack-seeded run saying seeded=0 AND pack_already_present=0 means the
pack was not applied (e.g. a stale OUTFITX_CACHE_PACK=0 left in the
environment); seeded=0 with pack_already_present>0 just means the cache
dir was reused and is already warm — a correctly warm replica, not a
seeding failure.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

T0 = time.perf_counter()


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=250_000)
    args = ap.parse_args()

    from outfitx_tpu.core import runtime

    runtime.retry_if_backend_down()
    runtime.enable_compilation_cache()

    import jax
    import numpy as np

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.data.synthetic import make_synthetic
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.serve.coalesce import (
        CoalescingCIRRetriever,
        CoalescingCPScorer,
        CoalescingSimilarItems,
    )
    from outfitx_tpu.serve.engine import ServingEngine

    cfg = OutfitXConfig()
    data = make_synthetic(
        n_items=args.items, d_embed=cfg.d_embed, n_outfits=256,
        max_len=cfg.max_outfit_len,
    )
    params = OutfitXModel(cfg).init(jax.random.PRNGKey(0))
    t_build = time.perf_counter()
    engine = ServingEngine(
        model_cfg=cfg,
        catalog=data.catalog,
        cp_params=params,
        cir_params=params,
        quantized=True,
        approx_topk=True,
        cp_split=data.cp_valid,
        cir_split=data.cir_valid,
        fitb_split=data.fitb_test,
    )
    # the full production-replica surface includes the coalescer buckets
    CoalescingCPScorer(engine)
    CoalescingCIRRetriever(engine)
    CoalescingSimilarItems(engine)
    ready_s = time.perf_counter() - T0

    ids = [int(i) for i in data.catalog.item_ids[:8]]
    t_routes = time.perf_counter()
    engine.cp_score(ids[:4])
    engine.cir_top10(ids[:3], ids[3])
    engine.fitb_pick(ids[:3], ids[3:7])
    engine.similar_items(ids[0], k=10)
    engine.sample_cp(n=4)
    routes_s = time.perf_counter() - t_routes

    print(
        json.dumps(
            {
                "ready_s": round(ready_s, 1),
                "engine_s": round(ready_s - (t_build - T0), 1),
                "routes_s": round(routes_s, 1),
                "items": args.items,
                "seeded": len(runtime.last_seeded),
                "pack_already_present": runtime.last_already_present,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
