"""Replica-recycling soak: prove a --max-age/--max-rss-gb self-drain
recycles the serving replica MID-TRAFFIC with zero failed requests.

Topology: this process supervises `python -m outfitx_tpu.cli demo
--max-age N` as a child (the production supervisor contract: child drains
and exits DRAIN_EXIT_CODE=81, supervisor restarts it warm from the
compile-cache pack) while client threads hammer the API continuously.

Client accounting:
  - ok: 2xx responses
  - http_errors: any 4xx/5xx — MUST stay 0 (in-flight requests complete
    during the drain; the watchdog only stops the *accept* loop)
  - conn_retries: connects refused/reset while the replica is restarting —
    expected during the recycle window, retried until the new replica is
    up (a load balancer would route them to a peer replica instead)

    python scripts/soak_recycle.py [--recycles 2] [--max-age 25]
        [--threads 4] [--mock]  # --mock: CPU-only smoke, no device

Writes parity_artifacts/measure_auto/soak_recycle.json when run from the
repo; prints one JSON line either way.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

REPO = pathlib.Path(__file__).resolve().parents[1]
DRAIN_EXIT_CODE = 81


def start_replica(port: int, max_age: float, mock: bool) -> subprocess.Popen:
    cmd = [
        sys.executable, "-m", "outfitx_tpu.cli", "demo",
        "--synthetic", "--port", str(port), "--max-age", str(max_age),
    ]
    if mock:
        cmd.append("--mock")
    # child output goes to a FILE, not a pipe: a chatty replica (verbose
    # warmup warnings, a long crash traceback) would fill a 64 KB pipe
    # buffer and block, and proc.wait() here would then hang forever
    log = open("/tmp/soak_recycle_replica.log", "ab")
    proc = subprocess.Popen(
        cmd, cwd=str(REPO), stdout=log, stderr=subprocess.STDOUT,
    )
    proc._log_path = "/tmp/soak_recycle_replica.log"  # for error reporting
    log.close()  # the child holds its own fd
    return proc


def wait_ready(port: int, timeout: float = 600.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/health", timeout=2
            ) as r:
                if r.status == 200:
                    return
        except OSError:
            time.sleep(0.3)
    raise TimeoutError(f"replica on :{port} never became healthy")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--recycles", type=int, default=2)
    ap.add_argument("--max-age", type=float, default=25.0)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--port", type=int, default=6117)
    ap.add_argument("--mock", action="store_true")
    args = ap.parse_args()

    counts = {"ok": 0, "http_errors": 0, "conn_retries": 0}
    lock = threading.Lock()
    stop = threading.Event()

    def client(tid: int) -> None:
        import numpy as np

        rng = np.random.default_rng(tid)
        while not stop.is_set():
            n = int(rng.integers(2, 5))
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{args.port}/api/sample?n={n}",
                    timeout=10,
                ) as r:
                    sample = json.loads(r.read())
                req = urllib.request.Request(
                    f"http://127.0.0.1:{args.port}/api/cp",
                    data=json.dumps({"outfit": sample["outfit"]}).encode(),
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=10) as r:
                    json.loads(r.read())
                with lock:
                    counts["ok"] += 2
            except urllib.error.HTTPError:
                with lock:
                    counts["http_errors"] += 1
            except OSError:  # refused/reset/timeout: the recycle window
                with lock:
                    counts["conn_retries"] += 1
                time.sleep(0.2)

    proc = start_replica(args.port, args.max_age, args.mock)
    wait_ready(args.port)
    threads = [
        threading.Thread(target=client, args=(i,), daemon=True)
        for i in range(args.threads)
    ]
    t0 = time.time()
    for t in threads:
        t.start()

    recycles, exit_codes = 0, []
    try:
        while recycles < args.recycles:
            rc = proc.wait()  # replica runs until its max-age drain
            exit_codes.append(rc)
            if rc != DRAIN_EXIT_CODE:
                out = pathlib.Path(proc._log_path).read_text(
                    errors="replace"
                )
                raise SystemExit(
                    f"replica exited {rc}, expected drain code "
                    f"{DRAIN_EXIT_CODE}:\n{out[-2000:]}"
                )
            recycles += 1
            if recycles < args.recycles:
                proc = start_replica(args.port, args.max_age, args.mock)
                wait_ready(args.port)
        # let traffic settle against the final replica state
        time.sleep(1.0)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=10)
        if proc.poll() is None:
            proc.terminate()
            proc.wait(timeout=30)

    report = {
        "recycles": recycles,
        "exit_codes": exit_codes,
        "seconds": round(time.time() - t0, 1),
        "threads": args.threads,
        **counts,
        "ok_rate_per_s": round(counts["ok"] / max(time.time() - t0, 1e-9), 1),
        "zero_failed_requests": counts["http_errors"] == 0,
    }
    art = REPO / "parity_artifacts" / "measure_auto"
    if art.parent.is_dir():
        art.mkdir(parents=True, exist_ok=True)
        (art / "soak_recycle.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report), flush=True)
    sys.exit(0 if report["zero_failed_requests"] and recycles == args.recycles else 1)


if __name__ == "__main__":
    main()
