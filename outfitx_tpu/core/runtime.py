"""Runtime setup helpers."""

from __future__ import annotations

import os
import pathlib
import sys

_cache_enabled = False

# The pack entries the last enable_compilation_cache() call copied in —
# lets probes (scripts/probe_cache_pack.py) report whether seeding
# actually happened in an A/B cold-start comparison.
last_seeded: list[str] = []
# pack entries skipped because the cache dir already held them — lets the
# probe tell "pack not applied" (seeded=0, present=0) apart from "warm cache
# dir reused" (seeded=0, present>0)
last_already_present: int = 0


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache, seeded from the committed pack.

    First compiles through the TPU compile service run 1-7 minutes for this
    framework's programs; the persistent cache makes every later process
    (re-runs, resumed training, serving restarts, benchmarks) hit in
    milliseconds. Called by the harness, CLI, bench, and serving entry
    points; respects an existing JAX_COMPILATION_CACHE_DIR.

    The local cache dir does not survive environment resets (here: the
    container home is wiped at every round boundary), so a repo-committed
    *pack* of cache entries (``compile_cache/``, built by
    ``scripts/build_cache_pack.py``) is copied into the cache dir on
    enable — the generalization of ``bench_cache/``'s single-program pin
    to the whole standing surface. Entries whose key no longer matches
    (e.g. after a remote compiler-service upgrade — the key covers the
    compiler version) simply miss and recompile; seeding is never worse
    than an empty cache. Disable with ``OUTFITX_CACHE_PACK=0``.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or str(pathlib.Path.home() / ".cache" / "outfitx_tpu" / "jax_cache")
    )
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    global last_seeded
    try:
        last_seeded = seed_compilation_cache(cache_dir)
    except OSError as e:
        # Seeding is an optimization; a pack/filesystem problem must never
        # be worse than starting with an empty cache (JAX itself treats
        # persistent-cache write failures as non-fatal).
        print(
            f"outfitx_tpu: cache-pack seeding failed ({e}); "
            "continuing with the unseeded cache",
            file=sys.stderr,
        )
        last_seeded = []
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _cache_enabled = True


def default_cache_pack() -> pathlib.Path | None:
    """The committed compile-cache pack dir, if this is a repo checkout.

    ``OUTFITX_CACHE_PACK`` overrides: a path uses that pack, ``0``/``off``
    disables seeding entirely. Returns None when seeding is disabled or no
    pack exists (e.g. the package is installed outside its checkout).
    """
    env = os.environ.get("OUTFITX_CACHE_PACK")
    if env is not None:
        if env.strip().lower() in ("", "0", "off", "none"):
            return None
        p = pathlib.Path(env)
        if not p.is_dir():
            # A typo'd path (or '1' assumed to be an on/off flag) silently
            # costing 1-7 min/program in remote compiles is exactly what
            # this feature exists to avoid — say so instead.
            print(
                f"outfitx_tpu: OUTFITX_CACHE_PACK={env!r} is not a "
                "directory; cache seeding DISABLED (use a pack path, or "
                "'0' to disable on purpose)",
                file=sys.stderr,
            )
            return None
        return p
    pack = pathlib.Path(__file__).resolve().parents[2] / "compile_cache"
    return pack if pack.is_dir() else None


def seed_compilation_cache(
    cache_dir: str | pathlib.Path,
    pack_dir: str | pathlib.Path | None = None,
) -> list[str]:
    """Copy pack entries missing from ``cache_dir``; return the names copied.

    Idempotent and concurrency-safe: existing cache entries are never
    touched (a live process may be writing them), and each copy lands via
    a temp file + atomic rename so a concurrent reader sees either nothing
    or a complete entry. Manifest/metadata files are skipped — only
    ``*-cache`` entries are XLA's.
    """
    pack = pathlib.Path(pack_dir) if pack_dir is not None else default_cache_pack()
    if pack is None or not pack.is_dir():
        return []
    import shutil
    import tempfile

    cache = pathlib.Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    # Mark the cache as pack-seeded BEFORE copying: a seeded cache cannot
    # distinguish live keys from re-seeded dead ones, so
    # scripts/build_cache_pack.py refuses --prune against it (pruning must
    # run on a cache rebuilt with OUTFITX_CACHE_PACK=0).
    (cache / ".seeded_from_pack").write_text(str(pack) + "\n")
    global last_already_present
    last_already_present = 0
    seeded: list[str] = []
    failed = 0
    for src in sorted(pack.glob("*-cache")):
        dst = cache / src.name
        if dst.exists():
            last_already_present += 1
            continue
        fd, tmp = tempfile.mkstemp(dir=cache, prefix=f".{src.name}.")
        os.close(fd)
        try:
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)
        except OSError:
            # one unreadable/uncopyable entry (disk full, bad file) must
            # not abort the process OR the rest of the seeding
            pathlib.Path(tmp).unlink(missing_ok=True)
            failed += 1
            continue
        except BaseException:
            pathlib.Path(tmp).unlink(missing_ok=True)
            raise
        seeded.append(src.name)
    if failed:
        print(
            f"outfitx_tpu: {failed} cache-pack entries failed to copy "
            f"({len(seeded)} seeded); continuing",
            file=sys.stderr,
        )
    return seeded


def enable_fast_prng() -> None:
    """Switch JAX's default PRNG to the hardware 'rbg' generator.

    Dropout-key generation with the default threefry costs ~10% of the
    flagship train step (measured 517 -> 463 ms/step at B=3072 with rbg).
    rbg trades threefry's strict reproducibility-across-shardings guarantees
    for speed — fine for dropout; call before building any PRNG keys.
    Opt-in: OUTFITX_FAST_PRNG=1 or an explicit call.
    """
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")


def apply_env_flags() -> None:
    # OUTFITX_FAST_PRNG=0 is the documented opt-OUT (threefry everywhere,
    # MIGRATION.md); only a truthy value opts the *global* default impl in.
    if os.environ.get("OUTFITX_FAST_PRNG", "") not in ("", "0"):
        enable_fast_prng()


def force_platform_from_env() -> None:
    """Make ``JAX_PLATFORMS=cpu python -m outfitx_tpu.cli ...`` reliable.

    In environments where a sitecustomize imports jax (and may pin the
    platform) before user code runs, the JAX_PLATFORMS *environment
    variable* alone is not honored — only a config-level update is (same
    reason tests/conftest.py calls ``jax.config.update``). Entry points
    call this so an explicit env choice always wins; a no-op when the
    config already matches or the variable is unset."""
    plat = os.environ.get("JAX_PLATFORMS", "")
    if not plat:
        return
    import jax

    if jax.config.jax_platforms != plat:
        jax.config.update("jax_platforms", plat)


#: Site dirs whose ``sitecustomize`` registers an out-of-tree PJRT plugin
#: (the axon TPU relay in this environment). A user-supplied PYTHONPATH
#: replaces rather than extends the ambient one, silently un-registering
#: the TPU ("Backend 'axon' is not in the list of known backends").
_PLUGIN_SITE_DIRS = ("/root/.axon_site",)


def restore_shadowed_site_dirs(env: dict | None = None) -> list[str]:
    """Append any existing plugin site dir missing from PYTHONPATH.

    Mutates ``env`` (default ``os.environ``) and returns the dirs that were
    restored — empty when PYTHONPATH was already correct or no plugin site
    dir exists on this machine. The caller decides whether to re-exec."""
    env = os.environ if env is None else env
    fixed: list[str] = []
    for site_dir in _PLUGIN_SITE_DIRS:
        pp = env.get("PYTHONPATH", "")
        if (
            os.path.exists(os.path.join(site_dir, "sitecustomize.py"))
            and site_dir not in pp.split(os.pathsep)
        ):
            env["PYTHONPATH"] = (
                pp + os.pathsep + site_dir if pp else site_dir
            )
            fixed.append(site_dir)
    return fixed


def _devices_probe_ok(timeout_s: float) -> tuple[bool, str]:
    """Probe ``jax.devices()`` in a child interpreter with a hard timeout.

    Two observed outage modes of the axon relay: registration *raises*
    ("Backend 'axon' is not in the list of known backends", ~1 h stretches)
    and device init *hangs* indefinitely (2026-08-18, multi-hour). An
    in-process ``jax.devices()`` call cannot be interrupted once it hangs,
    so entry points probe via a child first — the child converts a hang
    into a bounded failure and exits cleanly (releasing any partial relay
    claim) before the parent initializes for real."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False, f"device init hung >{timeout_s:.0f}s"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()
        return False, tail[-1][-200:] if tail else f"exit {r.returncode}"
    return True, ""


def retry_if_backend_down(
    max_retries: int = 10,
    sleep_s: float = 60.0,
    probe_timeout_s: float | None = None,
) -> None:
    """Re-exec the current script (bounded) while the TPU backend is down.

    The axon relay's backend registers at interpreter start and transiently
    refuses registration (or hangs device init — see _devices_probe_ok) for
    stretches; a failed registration cannot be retried in-process, so each
    retry needs a fresh interpreter. Used by the benchmark entry points; a
    no-op once `jax.devices()` works.
    """
    import sys
    import time

    if probe_timeout_s is None:
        probe_timeout_s = float(os.environ.get("OUTFITX_PROBE_TIMEOUT", "240"))
    ok, why = _devices_probe_ok(probe_timeout_s)
    if ok:
        import jax

        try:
            jax.devices()
            return
        except RuntimeError as e:
            # relay flapped between the child's exit and our own
            # registration — fall through to the sleep/re-exec path
            ok, why = False, str(e)
    # A PYTHONPATH override (e.g. `PYTHONPATH=. python bench.py`) can
    # shadow the site dir whose sitecustomize registers the TPU plugin;
    # registration then fails every retry. Detect, restore the site dir,
    # and re-exec immediately (doesn't count against max_retries).
    fixed = restore_shadowed_site_dirs()
    if fixed:
        print(
            f"# TPU plugin site dir(s) {fixed} were shadowed by "
            "PYTHONPATH; restoring and re-executing",
            file=sys.stderr,
            flush=True,
        )
        os.execv(sys.executable, [sys.executable] + sys.argv)
    attempts = int(os.environ.get("OUTFITX_BENCH_RETRY", "0"))
    if attempts >= max_retries:
        raise RuntimeError(
            f"TPU backend unavailable after {attempts} retries: {why}"
        )
    print(
        f"# TPU backend unavailable ({why}); retry "
        f"{attempts + 1}/{max_retries} in {sleep_s:.0f}s",
        file=sys.stderr,
        flush=True,
    )
    time.sleep(sleep_s)
    os.environ["OUTFITX_BENCH_RETRY"] = str(attempts + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)
