"""Checkpointing: orbax-backed pytree save/restore + best-metric policies.

Replaces the reference's torch.save/.load of {epoch, config, model, optimizer,
scheduler, scaler} dicts (distributed_trainer.py:427-476) with orbax pytree
checkpoints. Policies preserved: best-metric checkpoints named
``best_{metric}`` (compatibility_prediction_trainer.py:489-502), a ``final``
save on clean exit (distributed_trainer.py:643-646), and cross-task chaining
CP -> CIR -> FITB via params-only restore
(complementary_item_retrieval_trainer.py:352-359,
fill_in_the_blank_trainer.py:100-107).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# Async-save snapshots are HOST-RAM numpy buffers by the time they are
# queued (save_async pays the D2H on the calling thread — see the relay
# deadlock note there); bound their total so saves queued faster than the
# writer drains them cannot pile up next to the relay client's own leaked
# staging buffers (one full envelope state is ~1.16 GB). A single
# oversized save is always admitted.
_ASYNC_STAGED_BYTES_MAX = int(
    __import__("os").environ.get("OUTFITX_CKPT_STAGED_MAX", 1_600_000_000)
)


def _np_dtype(name: str) -> np.dtype:
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def migrate_legacy_attn(params):
    """Stack pre-fusion per-projection attention params into the fused
    layout (wq/wk/wv -> wqkv (L, d, 3, d); bq/bk/bv -> bqkv (L, 3, d)).

    Checkpoints written before the QKV fusion (best_auc chains, CP->CIR
    warm starts) carry the legacy pytree; this converts in place at
    restore time so they keep loading. Returns True if a conversion
    happened."""
    attn = (
        params.get("layers", {}).get("attn")
        if isinstance(params, dict)
        else None
    )
    if not isinstance(attn, dict) or "wq" not in attn or "wqkv" in attn:
        return False
    attn["wqkv"] = np.stack(
        [np.asarray(attn.pop(k)) for k in ("wq", "wk", "wv")], axis=2
    )
    attn["bqkv"] = np.stack(
        [np.asarray(attn.pop(k)) for k in ("bq", "bk", "bv")], axis=1
    )
    return True


class CheckpointManager:
    def __init__(self, root: str | pathlib.Path, model_name: str):
        self.dir = pathlib.Path(root).absolute() / model_name
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()
        # async-save machinery (lazy): a single FIFO writer thread does the
        # device->host transfer + orbax write off the training loop
        self._lin_fn = None
        self._worker = None
        self._error: Optional[BaseException] = None

    # -------------------------------------------------- fast np format --
    # The relay's device->host path moves envelope-scale state at
    # ~9-17 MB/s, and orbax's per-leaf protocol adds another ~53 s on the
    # 1-core host, so a full (params + opt_state) save measured ~185 s.
    # The fast path: linearize every device leaf to a layout-free uint8
    # buffer in ONE jitted program (tiled 4D param layouts transfer at
    # ~half the linear rate), one device_get, one uncompressed .npz +
    # a json tree skeleton (~78 s total measured — see BENCHMARKS.md).
    # Orbax remains the reader for legacy checkpoint dirs and the
    # writer under multi-process SPMD.

    def _linearize(self, leaves):
        if self._lin_fn is None:
            import jax.numpy as jnp

            def lin_one(x):
                if x.dtype == jnp.bool_:
                    x = x.astype(jnp.uint8)
                x = jnp.ravel(x)
                if x.dtype == jnp.uint8:
                    # barrier keeps this a real jaxpr output: a pure
                    # passthrough would ALIAS the live buffer (jit
                    # short-circuits identity outputs), breaking the
                    # donation-safe-snapshot contract for uint8 leaves
                    return jax.lax.optimization_barrier(x)
                return jax.lax.bitcast_convert_type(x, jnp.uint8).ravel()

            self._lin_fn = jax.jit(lambda ls: [lin_one(x) for x in ls])
        return self._lin_fn(leaves)

    def _np_stage(self, payload):
        """Flatten + linearize the device leaves NOW (fresh uint8 buffers
        double as the donation-safe snapshot for async saves); no
        device->host transfer happens yet."""
        leaves, _ = jax.tree.flatten(payload)
        counter = iter(range(len(leaves)))
        skeleton = jax.tree.map(lambda _: next(counter), payload)
        specs = [[list(x.shape), str(x.dtype)] for x in leaves]
        is_dev = [isinstance(x, jax.Array) for x in leaves]
        dev_bufs = iter(
            self._linearize([x for x, d in zip(leaves, is_dev) if d])
            if any(is_dev)
            else ()
        )
        bufs = []
        for x, d in zip(leaves, is_dev):
            if d:
                bufs.append(next(dev_bufs))
            else:
                a = np.asarray(x)
                if a.dtype == bool:
                    a = a.astype(np.uint8)
                bufs.append(np.ascontiguousarray(a).view(np.uint8).ravel())
        return {
            "skeleton": skeleton,
            "specs": specs,
            "bufs": bufs,
            "nbytes": sum(b.nbytes for b in bufs),
        }

    def _np_write(self, path: pathlib.Path, staged, meta) -> None:
        """Write the staged buffers atomically (tmp dir + rename-aside
        swap). On the synchronous save() path the buffers are still device
        arrays and the np.asarray below pays the D2H here; on the async
        path save_async already fetched them to host numpy (the relay
        client deadlocks on background-thread device_get), so the writer
        thread does pure host-side IO."""
        import os
        import shutil

        bufs = [
            np.asarray(b) if isinstance(b, jax.Array) else b
            for b in staged["bufs"]
        ]
        tmp = path.parent / f".{path.name}.tmp{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        tmp.mkdir(parents=True)
        np.savez(
            tmp / "state.npz", **{f"leaf_{i}": b for i, b in enumerate(bufs)}
        )
        with open(tmp / "tree.json", "w") as f:
            json.dump(
                {"skeleton": staged["skeleton"], "specs": staged["specs"]}, f
            )
        with open(tmp / "meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
        # Swap via rename-aside: deleting the old checkpoint BEFORE the
        # rename leaves a multi-second window (rmtree of ~1.2 GB) where a
        # crash destroys the only resume point. Two renames shrink that
        # window to microseconds; the old dir is deleted only after the
        # new one is in place.
        old = path.parent / f".{path.name}.old{os.getpid()}"
        shutil.rmtree(old, ignore_errors=True)
        if path.exists():
            os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    @staticmethod
    def _np_read(path: pathlib.Path):
        with np.load(path / "state.npz") as z, open(path / "tree.json") as f:
            info = json.load(f)
            leaves = []
            for i, (shape, dt) in enumerate(info["specs"]):
                buf = z[f"leaf_{i}"]
                if dt == "bool":
                    arr = buf.astype(bool)
                else:
                    arr = buf.view(_np_dtype(dt))
                leaves.append(arr.reshape(shape))

        def build(sk):
            if sk is None:
                return None
            if isinstance(sk, dict):
                return {k: build(v) for k, v in sk.items()}
            if isinstance(sk, list):
                return [build(v) for v in sk]
            return leaves[sk]

        return build(info["skeleton"])

    def path(self, tag: str) -> pathlib.Path:
        return self.dir / tag

    # ------------------------------------------------------ async saves --
    def _ensure_worker(self) -> None:
        if self._worker is not None:
            return
        import collections
        import threading

        self._cv = threading.Condition()
        self._pending = {}  # path -> (staged, meta); newest wins per tag
        self._order = collections.deque()
        self._inflight = False
        self._staged_bytes = 0  # queued + in-flight snapshot host RAM

        def loop():
            while True:
                with self._cv:
                    while not self._order:
                        self._cv.wait()
                    path = self._order.popleft()
                    staged, meta = self._pending.pop(path)
                    self._inflight = True
                try:
                    self._np_write(path, staged, meta)
                except BaseException as e:  # surfaced by wait()/save_async
                    self._error = e
                finally:
                    with self._cv:
                        self._inflight = False
                        self._staged_bytes -= staged["nbytes"]
                        staged["bufs"] = None  # release snapshot HBM now
                        self._cv.notify_all()

        self._worker = threading.Thread(
            target=loop, name="ckpt-writer", daemon=True
        )
        self._worker.start()

    def _raise_pending(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err

    def save_async(self, tag: str, *, params, opt_state=None, **kwargs):
        """Queue a save with only the D2H transfer on the training loop:
        linearize staging (~ms of HBM copies — fresh buffers, donation-
        safe) and the device->host fetch run here; the npz write + fsync
        + atomic rename run on the writer thread. FIFO order preserves
        same-tag overwrite semantics; `wait()` drains before
        restore/final/exit. Multi-process SPMD falls back to the
        synchronous orbax save."""
        self._raise_pending()
        if jax.process_count() > 1:
            self.save(tag, params=params, opt_state=opt_state, **kwargs)
            return
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        staged = self._np_stage(payload)
        # Fetch device->host ON THIS THREAD. A background-thread
        # device_get deadlocks the relay client when the main thread is
        # parked (observed 2026-08-19: campaign writer futex-waiting in
        # np.asarray forever, conn threads idle, while a fresh process
        # talked to the chip fine) — so the loop pays the D2H (the fast
        # linearized path) and the writer thread handles only the pure
        # host-side npz write + atomic rename.
        staged["bufs"] = [
            np.asarray(b) if isinstance(b, jax.Array) else b
            for b in staged["bufs"]
        ]
        meta = self._build_meta(**kwargs)
        self._ensure_worker()
        path = self.path(tag)
        with self._cv:
            if path in self._pending:
                # COALESCE: a queued-but-not-started save of this tag is
                # superseded — the same directory would be overwritten
                # anyway, so write only the newest state (early training
                # improves best_loss every epoch; without this the queue
                # backpressure re-serializes the training loop)
                old, _ = self._pending[path]
                self._staged_bytes -= old["nbytes"]
                self._pending[path] = (staged, meta)
                self._staged_bytes += staged["nbytes"]
            else:
                # Backpressure in BYTES, not entries: snapshots are host
                # numpy buffers living next to the relay client's leaked
                # staging memory on the 1-core host — bound the total
                # (block until the writer drains) rather than letting a
                # best_recall + best_loss + latest pile up ~3.5 GB. A
                # single oversized save is always admitted (no deadlock).
                while (self._order or self._inflight) and (
                    self._staged_bytes + staged["nbytes"]
                    > _ASYNC_STAGED_BYTES_MAX
                ):
                    self._cv.wait()
                self._pending[path] = (staged, meta)
                self._staged_bytes += staged["nbytes"]
                self._order.append(path)
                self._cv.notify_all()

    def _drain(self) -> None:
        """Block until every queued async save is on disk (failures stay
        pending for the next wait()/save_async to surface)."""
        if self._worker is not None:
            with self._cv:
                while self._order or self._inflight:
                    self._cv.wait()

    def wait(self) -> None:
        """Block until every queued async save is on disk; re-raise any
        writer-thread failure."""
        self._drain()
        self._raise_pending()

    def save(
        self,
        tag: str,
        *,
        params,
        opt_state=None,
        step: int = 0,
        epoch: int = 0,
        metrics: Optional[Dict[str, float]] = None,
        config: Any = None,
        best: Optional[Dict[str, float]] = None,
        overwrite: bool = True,
    ) -> pathlib.Path:
        # Drain queued async saves first: a stale queued snapshot of the
        # same tag must not land AFTER this newer synchronous write (and
        # a concurrent writer-thread _np_write of the same tag would
        # collide on the same-pid tmp dir). Failures stay pending — a
        # final sync save should not be aborted by an unrelated earlier
        # async error (wait() still surfaces it).
        self._drain()
        path = self.path(tag)
        meta = self._build_meta(
            step=step, epoch=epoch, metrics=metrics, config=config, best=best
        )
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if jax.process_count() == 1:
            if not overwrite and path.exists():
                raise FileExistsError(
                    f"{path} exists and overwrite=False"
                )
            self._np_write(path, self._np_stage(payload), meta)
        else:
            # multi-process SPMD: orbax coordinates sharded leaves
            self._ckpt.save(path, _to_host(payload), force=overwrite)
            with open(path / "meta.json", "w") as f:
                json.dump(meta, f, indent=2, default=str)
        return path

    @staticmethod
    def _build_meta(
        *,
        step: int = 0,
        epoch: int = 0,
        metrics: Optional[Dict[str, float]] = None,
        config: Any = None,
        best: Optional[Dict[str, float]] = None,
    ) -> Dict[str, Any]:
        meta = {
            "step": int(step),
            "epoch": int(epoch),
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
        }
        if best:
            # Best-so-far values per tracked metric, so a resumed run
            # cannot overwrite a better best_* checkpoint with a worse one.
            meta["best"] = {k: float(v) for k, v in best.items()}
        if config is not None and dataclasses.is_dataclass(config):
            meta["config"] = dataclasses.asdict(config)
        return meta

    def restore(
        self,
        tag_or_path: str | pathlib.Path,
        template: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """template: pytree skeleton (e.g. {'params': ..., 'opt_state': ...})
        so structured leaves (optax NamedTuples) restore into the right
        container types rather than raw dicts/lists."""
        self.wait()  # an in-flight async save may be writing this tag
        path = pathlib.Path(tag_or_path)
        if not path.exists():
            path = self.path(str(tag_or_path))
        if (path / "state.npz").exists():
            return self._restore_np(path, template)
        probe = self._ckpt.restore(path)
        legacy = migrate_legacy_attn(probe.get("params", {}))
        if template is not None and not legacy:
            import jax

            saved_keys = set()
            # restore only the subtrees that were saved
            item = {}
            for k in template:
                if k in probe:
                    item[k] = jax.tree.map(lambda x: x, template[k])
                    saved_keys.add(k)
            payload = self._ckpt.restore(path, item=item)
            for k in probe:
                if k not in payload:
                    payload[k] = probe[k]
        else:
            # legacy (pre-QKV-fusion) checkpoints: the raw tree was already
            # migrated above; a template item-restore would reject the old
            # layout. Params-only consumers (warm starts, chains, serving)
            # work; full optimizer resume across the fusion does not
            # (opt_state shapes changed) — see MIGRATION.md.
            payload = probe
        meta_path = path / "meta.json"
        meta = {}
        if meta_path.exists():
            with open(meta_path) as f:
                meta = json.load(f)
        payload["meta"] = meta
        return payload

    def _restore_np(self, path: pathlib.Path, template) -> Dict[str, Any]:
        raw = self._np_read(path)
        migrate_legacy_attn(raw.get("params", {}))
        if template is not None:
            payload: Dict[str, Any] = {}
            for k in template:
                if k in raw:
                    # leaf order is stable: both sides flatten the same
                    # logical structure (sorted dict keys; NamedTuples
                    # saved as index-ordered lists)
                    payload[k] = jax.tree.unflatten(
                        jax.tree.structure(template[k]),
                        jax.tree.leaves(raw[k]),
                    )
            for k in raw:
                if k not in payload:
                    payload[k] = raw[k]
        else:
            payload = raw
        meta_path = path / "meta.json"
        meta = {}
        if meta_path.exists():
            with open(meta_path) as f:
                meta = json.load(f)
        payload["meta"] = meta
        return payload

    def exists(self, tag: str) -> bool:
        self.wait()  # queued async saves count as existing-once-settled
        return self.path(tag).exists()


class BestMetricTracker:
    """Track best values and trigger checkpoint saves
    (reference maybe_save_best_models, compatibility_prediction_trainer.py:489-502)."""

    def __init__(self, **metrics_mode: str):
        # e.g. BestMetricTracker(auc='max', loss='min')
        self.mode = metrics_mode
        self.best: Dict[str, float] = {}

    def update(self, name: str, value: float) -> bool:
        mode = self.mode[name]
        cur = self.best.get(name)
        better = (
            cur is None
            or (mode == "max" and value > cur)
            or (mode == "min" and value < cur)
        )
        if better:
            self.best[name] = float(value)
        return better
