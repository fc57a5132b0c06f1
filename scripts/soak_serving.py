"""Production serving soak: sustained mixed HTTP traffic against the real
engine on TPU, with latency percentiles and host-RSS leak tracking.

The coalescing benches measure short bursts; this drives the FULL serving
path (HTTP parse -> coalescers -> fused device programs) for minutes at a
time, the way a deployment actually runs, and watches the two things that
kill long-lived servers in this environment: tail latency under mixed
concurrent load, and host RSS creep (the axon relay client leaks staging
buffers 1:1 with H2D bytes — scripts/probe_rss_leak.py — so the soak
also validates that the index-only request path keeps the leak
negligible at serving request sizes).

Reference counterpart: the gradio demo (`demo/app.py`) serves one user at
a time and publishes no load numbers; this is the deployment-grade check
it lacks.

    python scripts/soak_serving.py [--minutes 10] [--items 250000]
        [--threads 8] [--coalesce-ms 3] [--smoke]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import re
import threading
import time
import urllib.request


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        m = re.search(r"VmRSS:\s+(\d+) kB", f.read())
    return int(m.group(1)) / 1024.0 if m else float("nan")


def _pct(xs, q):
    """Percentile, rounded; None when the window had no samples (a window
    at saturation can end with every request of one kind errored — NaN
    here would serialize as the bare token ``NaN``, which is not JSON)."""
    xs = sorted(xs)
    return round(xs[min(len(xs) - 1, int(q * len(xs)))], 1) if xs else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--items", type=int, default=250_000)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--coalesce-ms", type=float, default=3.0)
    ap.add_argument("--port", type=int, default=6111)
    ap.add_argument(
        "--thread-sweep", type=str, default="",
        help="comma list of client-thread counts (e.g. 1,2,4,8,16,32): "
        "instead of one long soak, run one --window-s read-only window "
        "per count against the SAME warmed engine and report the "
        "saturation curve (req/s + cp/cir p50/p99 per point)",
    )
    ap.add_argument("--window-s", type=float, default=90.0)
    ap.add_argument(
        "--update-rate", type=float, default=0.0,
        help="live catalog writes/sec mixed into the read traffic "
        "(alternating /api/update_items refreshes and /api/add_items "
        "appends); exercises the donated-scatter update path under "
        "concurrent load",
    )
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    if args.smoke:
        args.minutes, args.items, args.threads = 0.05, 500, 3
    else:
        retry_if_backend_down()
    enable_compilation_cache()

    import jax
    import numpy as np

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.data.synthetic import make_synthetic
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.serve.app import make_handler
    from outfitx_tpu.serve.coalesce import (
        CoalescingCIRRetriever,
        CoalescingCPScorer,
        CoalescingSimilarItems,
    )
    from outfitx_tpu.serve.engine import ServingEngine

    cfg = OutfitXConfig()
    if args.smoke:
        from outfitx_tpu.core.config import (
            ItemEncoderConfig,
            TransformerConfig,
        )

        jax.config.update("jax_platforms", "cpu")
        cfg = OutfitXConfig(
            item_encoder=ItemEncoderConfig(dim_per_modality=16),
            transformer=TransformerConfig(n_heads=4, d_ffn=32, n_layers=1),
        )

    data = make_synthetic(
        n_items=args.items, d_embed=cfg.d_embed, n_outfits=256,
        max_len=cfg.max_outfit_len,
    )
    params = OutfitXModel(cfg).init(jax.random.PRNGKey(0))
    engine = ServingEngine(
        model_cfg=cfg,
        catalog=data.catalog,
        cp_params=params,
        cir_params=params,
        # production scale route: int8 catalog + approximate top-k
        quantized=not args.smoke,
        approx_topk=not args.smoke,
        cp_split=data.cp_valid,
        cir_split=data.cir_valid,
        fitb_split=data.fitb_test,
        # live-update soak: reserve append rows, and keep the scatter
        # bucket small — every write pads to the bucket and the relay
        # client leaks host RSS 1:1 per H2D byte, so the default 1024-row
        # bucket would dominate the leak budget at soak rates.
        spare_capacity=4096 if args.update_rate > 0 else 0,
        update_bucket=32 if args.update_rate > 0 else 1024,
    )
    cp_scorer = CoalescingCPScorer(engine, window_ms=args.coalesce_ms)
    cir_retriever = CoalescingCIRRetriever(engine, window_ms=args.coalesce_ms)
    sim_retriever = CoalescingSimilarItems(engine, window_ms=args.coalesce_ms)

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", args.port),
        make_handler(engine, cp_scorer, cir_retriever, sim_retriever),
    )
    server_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    server_thread.start()
    base = f"http://127.0.0.1:{args.port}"

    ids = [int(i) for i in data.catalog.item_ids]
    rng = np.random.default_rng(0)

    def request(kind: str, rng):
        pick = lambda n: [ids[i] for i in rng.choice(len(ids), n, replace=False)]
        if kind == "cp":
            req = urllib.request.Request(
                base + "/api/cp",
                data=json.dumps({"outfit": pick(4)}).encode(),
                method="POST",
            )
        elif kind == "cir":
            req = urllib.request.Request(
                base + "/api/cir",
                data=json.dumps(
                    {"outfit": pick(3), "target": pick(1)[0]}
                ).encode(),
                method="POST",
            )
        elif kind == "fitb":
            req = urllib.request.Request(
                base + "/api/fitb",
                data=json.dumps(
                    {"outfit": pick(3), "candidates": pick(4)}
                ).encode(),
                method="POST",
            )
        elif kind == "similar":
            req = urllib.request.Request(
                base + f"/api/similar?item_id={pick(1)[0]}"
            )
        else:  # sample_cp browse view
            req = urllib.request.Request(base + "/api/sample_cp?n=4")
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status

    MIX = [("cp", 0.40), ("cir", 0.20), ("similar", 0.20),
           ("fitb", 0.10), ("sample_cp", 0.10)]
    kinds = [k for k, _ in MIX]
    probs = [p for _, p in MIX]

    # Warm every route once from one thread so compile time is excluded
    # from soak percentiles (the engine's own _warmup covers its programs;
    # this also covers the coalescer buckets).
    for k in kinds:
        request(k, np.random.default_rng(1))

    def client(tid, deadline, results, lock, stop):
        crng = np.random.default_rng(1000 + tid)
        local = []
        while time.perf_counter() < deadline and not stop.is_set():
            kind = kinds[int(crng.choice(len(kinds), p=probs))]
            t0 = time.perf_counter()
            try:
                ok = request(kind, crng) == 200
            except Exception:
                ok = False
            local.append((kind, time.perf_counter() - t0, ok))
        with lock:
            results.extend(local)

    if args.thread_sweep:
        # Saturation curve: sequential read-only windows at rising client
        # concurrency against the one warmed engine (startup paid once).
        points = []
        for n in [int(x) for x in args.thread_sweep.split(",") if x]:
            res: list = []
            lk = threading.Lock()
            dl = time.perf_counter() + args.window_s
            ths = [
                threading.Thread(
                    target=client, args=(i, dl, res, lk, threading.Event())
                )
                for i in range(n)
            ]
            t0 = time.perf_counter()
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            dur = time.perf_counter() - t0

            def lat(kind, q):
                return _pct(
                    [r[1] * 1e3 for r in res if r[0] == kind and r[2]], q
                )

            points.append({
                "threads": n,
                "req_per_s": round(len(res) / dur, 1),
                "errors": sum(1 for r in res if not r[2]),
                "cp_p50_ms": lat("cp", 0.50), "cp_p99_ms": lat("cp", 0.99),
                "cir_p50_ms": lat("cir", 0.50), "cir_p99_ms": lat("cir", 0.99),
            })
            print(f"# {points[-1]}", file=sys.stderr, flush=True)
        httpd.shutdown()
        for c in (cp_scorer, cir_retriever, sim_retriever):
            c.close()
        print(
            json.dumps({
                "metric": "serving_thread_sweep",
                "items": args.items,
                "window_s": args.window_s,
                "points": points,
            }),
            flush=True,
        )
        return

    deadline = time.perf_counter() + args.minutes * 60
    stop = threading.Event()
    results = []  # (kind, latency_s, ok) tuples, merged post-hoc
    lock = threading.Lock()

    def writer():
        """Paced live-catalog writes racing the read traffic: alternate
        embedding refreshes of existing items with appends of brand-new
        ones (both through the HTTP admin endpoints, so the JSON decode +
        engine lock path is the one a deployment runs)."""
        wrng = np.random.default_rng(9999)
        d = data.catalog.d_embed
        next_id = max(ids) + 1
        period = 1.0 / args.update_rate
        next_t = time.perf_counter()
        local = []
        n = 0
        while time.perf_counter() < deadline and not stop.is_set():
            if wrng.random() < 0.5:
                body = {
                    "item_ids": [
                        ids[i] for i in wrng.choice(len(ids), 8, replace=False)
                    ],
                    "embeddings": wrng.normal(size=(8, d)).round(4).tolist(),
                }
                path, kind = "/api/update_items", "update"
            else:
                body = {
                    "item_ids": [next_id],
                    "embeddings": wrng.normal(size=(1, d)).round(4).tolist(),
                }
                next_id += 1
                path, kind = "/api/add_items", "add"
            req = urllib.request.Request(
                base + path, data=json.dumps(body).encode(), method="POST"
            )
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    ok = r.status == 200
            except Exception:
                ok = False
            local.append((kind, time.perf_counter() - t0, ok))
            n += 1
            next_t += period
            time.sleep(max(0.0, next_t - time.perf_counter()))
        # freshly appended items must be retrievable by the read path
        if n and next_id > max(ids) + 1:
            try:
                with urllib.request.urlopen(
                    base + f"/api/similar?item_id={next_id - 1}", timeout=120
                ) as r:
                    ok = r.status == 200
            except Exception:
                ok = False
            local.append(("similar_fresh_append", 0.0, ok))
        with lock:
            results.extend(local)

    rss0 = _rss_mb()
    rss_samples = [(0.0, rss0)]
    t_start = time.perf_counter()
    threads = [
        threading.Thread(target=client, args=(i, deadline, results, lock, stop))
        for i in range(args.threads)
    ]
    if args.update_rate > 0:
        threads.append(threading.Thread(target=writer))
    for t in threads:
        t.start()
    while any(t.is_alive() for t in threads):
        time.sleep(min(10.0, max(0.5, args.minutes * 6)))
        rss_samples.append((time.perf_counter() - t_start, _rss_mb()))
        for t in threads:
            t.join(timeout=0.1)
    duration = time.perf_counter() - t_start
    stop.set()
    httpd.shutdown()
    for c in (cp_scorer, cir_retriever, sim_retriever):
        c.close()

    per = {}
    for kind in dict.fromkeys(kinds + [r[0] for r in results]):
        lat = [r[1] * 1000 for r in results if r[0] == kind and r[2]]
        per[kind] = {
            "n": len(lat),
            "p50_ms": _pct(lat, 0.50),
            "p90_ms": _pct(lat, 0.90),
            "p99_ms": _pct(lat, 0.99),
            "max_ms": round(max(lat), 1) if lat else None,
        }
    n_err = sum(1 for r in results if not r[2])
    # RSS slope from the last half of the run (excludes warm allocations)
    tail = rss_samples[len(rss_samples) // 2 :]
    slope = (
        (tail[-1][1] - tail[0][1]) / ((tail[-1][0] - tail[0][0]) / 60)
        if len(tail) >= 2 and tail[-1][0] > tail[0][0]
        else 0.0
    )
    print(
        json.dumps(
            {
                "metric": "serving_soak",
                "minutes": round(duration / 60, 2),
                "threads": args.threads,
                "items": args.items,
                "total_requests": len(results),
                "req_per_s": round(len(results) / duration, 1),
                "errors": n_err,
                "per_endpoint": per,
                "rss_start_mb": round(rss0, 1),
                "rss_end_mb": round(rss_samples[-1][1], 1),
                "rss_slope_mb_per_min_tail": round(slope, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
