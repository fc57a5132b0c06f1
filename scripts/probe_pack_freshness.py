"""Detect a stale compile-cache pack (compiler-service version change).

XLA persistent-cache entries key on the full program including the
compiler version, so after a remote compile-service upgrade every
committed pack entry silently misses and each replica pays the 1-7 min
remote compiles again. This probe makes staleness observable.

**Measured gotcha that shapes this design (2026-08-20):** with this
backend the cache key ALSO embeds the cache-directory *path* — the same
program compiled under two different cache dirs gets two different entry
names (verified: same path cleared between runs -> identical key;
different path -> different key). The committed pack therefore only ever
hits under the canonical path `enable_compilation_cache` uses
(~/.cache/outfitx_tpu/jax_cache — constant across containers), and this
probe MUST compile its canary under that exact path; a tmp-dir canary
would always read "stale".

Mechanism:
- ``outfitx_pack_canary_v1`` is a fixed tiny program no real workload
  compiles; its cache entry name is ``jit_outfitx_pack_canary_v1-<key>``
  where <key> fingerprints the current compiler-service version (+ the
  canonical path, constant).
- ``build_cache_pack.py`` compiles the canary into the canonical cache
  before snapshotting, so a freshly built pack always carries the
  current canary entry.
- This probe compiles the canary under the canonical path and checks the
  resulting entry name against the pack: present -> pack fresh for this
  service version; absent -> STALE (every pack entry will miss). On a
  stale verdict the newly written canary entry is removed again (unless
  --refresh) so repeated probes stay truthful.

    python scripts/probe_pack_freshness.py            # report only
    python scripts/probe_pack_freshness.py --refresh  # stale -> rebuild
                                                      # the pack from the
                                                      # local warm cache

Prints one JSON line {"fresh": bool, ...}. The measurement batch runs
this with --refresh right after the container reset, so the pack can
never go silently stale (VERDICT r4 weak #6).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

CANARY_PREFIX = "jit_outfitx_pack_canary_v1-"

# Bump the function name's version suffix when changing the program: the
# canary must be a program no real workload ever compiles, so its key
# uniquely marks "this pack was built against this compiler service".
_CANARY_CODE = r"""
import os
import jax
# honor an explicit JAX_PLATFORMS even under a jax-importing sitecustomize
# (same reason as core/runtime.force_platform_from_env) — lets the CPU
# test suite drive this child without touching the TPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", os.environ["OUTFITX_CANARY_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
import jax.numpy as jnp


def outfitx_pack_canary_v1(a):
    return (a @ a.T + jnp.float32(20260.0)).sum()


x = jnp.asarray(np.arange(64, dtype=np.float32).reshape(8, 8))
print("CANARY", float(jax.jit(outfitx_pack_canary_v1)(x)), flush=True)
"""


def canonical_cache_dir() -> pathlib.Path:
    """The path every entry point caches under (core/runtime
    enable_compilation_cache): entry keys embed this path, so the canary
    must compile here to be comparable with the pack's."""
    return pathlib.Path(
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or pathlib.Path.home() / ".cache" / "outfitx_tpu" / "jax_cache"
    )


def compile_canary(cache_dir: str | pathlib.Path, timeout: int = 600):
    """Compile the canary under ``cache_dir`` in a child process (the
    parent's jax config stays untouched). Returns (entry_name, wrote):
    the canary's cache-entry filename and whether this run WROTE it
    (miss) vs hit an existing entry."""
    cache_dir = pathlib.Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    before = {f.name for f in cache_dir.glob(CANARY_PREFIX + "*")}
    env = dict(
        os.environ,
        OUTFITX_CANARY_DIR=str(cache_dir),
        OUTFITX_CACHE_PACK="0",  # never seed: the canary entry must come
        # from a REAL compile (or hit) against the current service
    )
    proc = subprocess.run(
        [sys.executable, "-c", _CANARY_CODE],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0 or "CANARY" not in proc.stdout:
        raise RuntimeError(f"canary compile failed:\n{proc.stderr[-2000:]}")
    after = {f.name for f in cache_dir.glob(CANARY_PREFIX + "*")}
    new = sorted(after - before)
    if new:
        return new[0], True
    if not after:
        raise RuntimeError(
            "canary ran but no canary cache entry exists — persistent "
            "cache not writing?"
        )
    # hit: the entry it used is deterministic for (path, program,
    # compiler version); with multiple historical canary entries present
    # we cannot tell which hit — report the newest.
    newest = max(after, key=lambda n: (cache_dir / n).stat().st_mtime)
    return newest, False


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pack", default=str(REPO / "compile_cache"))
    ap.add_argument(
        "--refresh", action="store_true",
        help="stale pack: re-run build_cache_pack.py (which re-stamps the "
        "canary) against the local warm cache so the next commit carries "
        "a fresh pack",
    )
    args = ap.parse_args()

    pack = pathlib.Path(args.pack)
    cache = canonical_cache_dir()
    entry, wrote = compile_canary(cache)
    fresh = (pack / entry).exists()

    refreshed = False
    if not fresh:
        if args.refresh:
            proc = subprocess.run(
                [sys.executable,
                 str(REPO / "scripts" / "build_cache_pack.py"),
                 "--cache-dir", str(cache), "--pack", str(pack)],
                capture_output=True, text=True,
            )
            refreshed = proc.returncode == 0
            if not refreshed:
                print(proc.stderr[-2000:], file=sys.stderr)
        elif wrote:
            # keep repeated probes truthful: a stale probe must not leave
            # a current-version canary behind (a later probe would hit it
            # and still correctly compare against the PACK, but the
            # wrote/hit telemetry would lie)
            (cache / entry).unlink(missing_ok=True)

    print(
        json.dumps(
            {
                "fresh": fresh,
                "canary_entry": entry,
                "canary_compiled_now": wrote,
                "pack_entries": len(list(pack.glob("*-cache"))),
                "pack_canaries": sorted(
                    p.name for p in pack.glob(CANARY_PREFIX + "*")
                ),
                "refreshed": refreshed,
                "verdict": (
                    "pack entries keyed to the CURRENT compiler service"
                    if fresh
                    else "STALE: compiler service changed since the pack "
                    "was built (or the pack was never canary-stamped)"
                    + (" — pack rebuilt from the local cache" if refreshed
                       else " — re-run scripts/build_cache_pack.py on a "
                       "warm machine and commit")
                ),
            }
        ),
        flush=True,
    )
    return 0 if fresh or refreshed else 3


if __name__ == "__main__":
    sys.exit(main())
