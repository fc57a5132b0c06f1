"""Snapshot the local XLA compilation cache into the committed warm pack.

Workflow (the production cold-start story, and this repo's own round
survival):

1. run the workload once on the target hardware — the persistent cache
   (``core/runtime.enable_compilation_cache``) collects one entry per
   compiled program (1-7 min each through the remote compile service);
2. ``python scripts/build_cache_pack.py`` snapshots those entries into
   ``compile_cache/`` (committed);
3. every later process on a machine with a matching compiler-service
   version — a fresh serving replica, a resumed campaign, the next
   round's measurement batch — seeds its cache from the pack at
   ``enable_compilation_cache`` time and skips the compiles entirely.

Entries key on the full program (HLO incl. shapes + jax + compiler
version), so a stale pack misses harmlessly; re-run this script after the
workload changes to refresh. ``jit_chained-*`` (bench.py's program) is
excluded: ``bench_cache/`` owns that pin with its own best-of logic.

Selection: smallest entries first (they cost git the least and recompile
just as slowly as big ones), bounded by --max-entry-mb / --max-total-mb.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import shutil
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--cache-dir",
        default=os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or str(pathlib.Path.home() / ".cache" / "outfitx_tpu" / "jax_cache"),
    )
    ap.add_argument("--pack", default=str(REPO / "compile_cache"))
    ap.add_argument("--max-entry-mb", type=float, default=64.0)
    ap.add_argument("--max-total-mb", type=float, default=256.0)
    ap.add_argument(
        "--prune",
        action="store_true",
        help="drop pack entries absent from the cache (superseded keys); "
        "requires a cache built with OUTFITX_CACHE_PACK=0 — refused on a "
        "pack-seeded cache, where every pack entry looks live",
    )
    ap.add_argument(
        "--no-canary", action="store_true",
        help="skip compiling the freshness canary into the cache first "
        "(scripts/probe_pack_freshness.py then cannot version-check the "
        "resulting pack)",
    )
    args = ap.parse_args()

    cache = pathlib.Path(args.cache_dir)
    pack = pathlib.Path(args.pack)
    pack.mkdir(parents=True, exist_ok=True)

    if not args.no_canary:
        # Stamp the pack with the current compiler-service version: the
        # canary entry's cache key embeds it, so probe_pack_freshness can
        # later tell a fresh pack from one built against an older service.
        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        from probe_pack_freshness import compile_canary

        try:
            compile_canary(cache)
        except Exception as e:  # noqa: BLE001 — the snapshot is still valid
            print(f"canary compile skipped ({e})", file=sys.stderr)

    if args.prune and (cache / ".seeded_from_pack").exists():
        # A seeded cache contains every pack entry by construction
        # (enable_compilation_cache copies them in before the workload
        # runs), so "absent from the cache" can never identify a
        # superseded key and --prune would be a silent no-op forever —
        # dead entries would ratchet the pack toward --max-total-mb and
        # crowd out live ones.
        print(
            f"--prune refused: {cache} was seeded from a pack "
            "(.seeded_from_pack present), so every pack entry looks "
            "live. Rebuild the cache unseeded first:\n"
            "  JAX_COMPILATION_CACHE_DIR=<fresh dir> OUTFITX_CACHE_PACK=0 "
            "<run the workload>\nthen re-run with --cache-dir <fresh dir>.",
            file=sys.stderr,
        )
        return 2

    entries = sorted(
        (f for f in cache.glob("*-cache") if not f.name.startswith("jit_chained-")),
        key=lambda f: f.stat().st_size,
    )
    pruned = 0
    if args.prune:
        # Prune BEFORE admitting new entries: dead entries must not count
        # toward --max-total-mb in the very invocation meant to free space,
        # or live cache entries get skipped as "over caps" until a second run.
        live = {f.name for f in entries}
        for f in pack.glob("*-cache"):
            if f.name not in live:
                print(f"prune {f.name}")
                f.unlink()
                pruned += 1
    total = sum(f.stat().st_size for f in pack.glob("*-cache"))
    copied = skipped_size = already = 0
    for f in entries:
        size = f.stat().st_size
        dst = pack / f.name
        old = dst.stat().st_size if dst.exists() else 0
        if old == size:
            already += 1
            continue
        # `old` leaves the pack when overwritten — budget on the delta
        if size > args.max_entry_mb * 2**20 or (
            total - old + size > args.max_total_mb * 2**20
        ):
            skipped_size += 1
            print(f"skip {f.name} ({size / 2**20:.1f} MB)")
            continue
        shutil.copyfile(f, dst)
        total += size - old
        copied += 1
        print(f"pack {f.name} ({size / 2**20:.1f} MB)")

    manifest = pack / "MANIFEST.tsv"
    rows = sorted(pack.glob("*-cache"), key=lambda f: f.name)
    with manifest.open("w") as out:
        out.write(f"# packed {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}\n")
        for f in rows:
            out.write(f"{f.name}\t{f.stat().st_size}\n")
    print(
        f"pack: {len(rows)} entries, {sum(f.stat().st_size for f in rows) / 2**20:.1f}"
        f" MB total ({copied} new, {already} unchanged, {skipped_size} over caps,"
        f" {pruned} pruned)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
