"""Measure dynamic request coalescing (serve/coalesce.py) under concurrent
load on the real chip: 64 requests from 8 client threads per task, direct
single-request calls vs the coalescing front ends — for CP scoring AND the
60+ ms retrieval tasks (CIR top-10, similar-items; VERDICT r3 item 5).

    python scripts/bench_coalesce.py [--only cp|cir|sim]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["cp", "cir", "sim"], default=None)
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    import jax

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.data.synthetic import make_synthetic
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.serve.coalesce import (
        CoalescingCIRRetriever,
        CoalescingCPScorer,
        CoalescingSimilarItems,
    )
    from outfitx_tpu.serve.engine import ServingEngine

    cfg = OutfitXConfig()  # flagship model scale
    data = make_synthetic(
        n_items=20_000, d_embed=cfg.d_embed, n_outfits=64, seed=0
    )
    params = OutfitXModel(cfg).init(jax.random.PRNGKey(0))
    engine = ServingEngine(
        model_cfg=cfg,
        catalog=data.catalog,
        cp_params=params,
        cir_params=params,
        warmup=False,
    )
    rng = np.random.default_rng(0)
    outfits = [
        [int(data.catalog.item_ids[r]) for r in rng.choice(20_000, 4, replace=False)]
        for _ in range(64)
    ]
    targets = [int(data.catalog.item_ids[r]) for r in rng.choice(20_000, 64)]
    items = [int(data.catalog.item_ids[r]) for r in rng.choice(20_000, 64)]

    def run(call, reqs):
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            res = list(ex.map(call, *zip(*reqs)) if isinstance(reqs[0], tuple)
                       else ex.map(call, reqs))
        return time.perf_counter() - t0, res

    def measure(tag, single_call, coalescer, method, reqs, check):
        # warm singles + the batch bucket
        single_call(*reqs[0]) if isinstance(reqs[0], tuple) else single_call(reqs[0])
        coalesced_call = getattr(coalescer, method)
        direct = min(run(single_call, reqs)[0] for _ in range(3))
        try:
            coalesced_s, res_c = run(coalesced_call, reqs)
            for _ in range(2):
                s, _ = run(coalesced_call, reqs)
                coalesced_s = min(coalesced_s, s)
            dev = check(res_c)
            calls = coalescer.batch_calls
        finally:
            coalescer.close()
        out = {
            "metric": f"{tag}_concurrent_64req_8clients_s",
            "direct_s": round(direct, 3),
            "coalesced_s": round(coalesced_s, 3),
            "speedup": round(direct / coalesced_s, 2),
            "fused_calls_3_passes": calls,
            "direct_req_per_s": round(64 / direct, 1),
            "coalesced_req_per_s": round(64 / coalesced_s, 1),
            "consistency": dev,
        }
        print(json.dumps(out), flush=True)

    if args.only in (None, "cp"):
        # warm the single bucket (all sizes chunk into cp_batch_bucket)
        engine.cp_score_batch(outfits[:2])

        def cp_check(res):
            # coalesced scores ride cp_score_batch, a different executable
            # than the B=1 program — bf16 tolerance, not bitwise
            expect = [engine.cp_score(o) for o in outfits[:8]]
            return float(max(abs(a - b) for a, b in zip(res[:8], expect)))

        measure(
            "cp", engine.cp_score,
            CoalescingCPScorer(engine, window_ms=5.0),
            "score", outfits, cp_check,
        )

    if args.only in (None, "cir"):
        engine.cir_top10_batch([(outfits[0], targets[0])])
        cir_reqs = list(zip(outfits, targets))

        def cir_check(res):
            # id-overlap vs the single program (approx top-k + different
            # executables: allow rank jitter, require the same neighbours)
            overlaps = []
            for (o, t), got in list(zip(cir_reqs, res))[:8]:
                exp = {x["item_id"] for x in engine.cir_top10(o, t)}
                overlaps.append(len(exp & {x["item_id"] for x in got}))
            return min(overlaps)

        measure(
            "cir", engine.cir_top10,
            CoalescingCIRRetriever(engine, window_ms=5.0),
            "retrieve", cir_reqs, cir_check,
        )

    if args.only in (None, "sim"):
        engine.similar_items_batch(items[:2])

        def sim_check(res):
            overlaps = []
            for i, got in list(zip(items, res))[:8]:
                exp = {x["item_id"] for x in engine.similar_items(i)}
                overlaps.append(len(exp & {x["item_id"] for x in got}))
            return min(overlaps)

        measure(
            "sim", engine.similar_items,
            CoalescingSimilarItems(engine, window_ms=5.0),
            "similar", items, sim_check,
        )


if __name__ == "__main__":
    main()
