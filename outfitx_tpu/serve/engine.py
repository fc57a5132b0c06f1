"""Serving engine: the reference demo's model-side logic
(src/demo/app.py:80-232) as a reusable library.

Loads up to three task model instances (CP / CIR / FITB-shares-CIR, app.py
:80-116,245-247), keeps the catalog + per-category candidate pools
device-resident, and serves:
- CP: sigmoid compatibility scores (:121-145)
- CIR: top-10 retrieval against the target category's pool (:169-201)
- FITB: argmin over 4 candidates (:205-232)

The engine core here reads as: build programs, run requests. The sibling
modules carry the rest behind the same ``ServingEngine`` API:
- serve/programs.py   — fused task-program construction + startup warmup
- serve/batched.py    — coalesced-batch request forms
- serve/live_update.py — live catalog updates/appends (donated scatters)
- serve/browse.py     — dataset-sample browsing views
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import numpy as np

from outfitx_tpu.core.config import OutfitXConfig
from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.sampler import CandidatePools
from outfitx_tpu.data.splits import CPSplit, FITBSplit, OutfitSplit, _pad_outfits
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.serve.batched import BatchedRequests
from outfitx_tpu.serve.browse import BrowseViews
from outfitx_tpu.serve.live_update import (  # noqa: F401 — back-compat
    LiveCatalogUpdates,
    _scatter_quant_rows,
    _scatter_rows,
)
from outfitx_tpu.serve.programs import (  # noqa: F401 — back-compat
    TaskPrograms,
    _bucket_chunks,
)


class UnknownItemError(KeyError):
    """Raised for item ids absent from the catalog."""


class _LockedRng:
    """np.random.Generator is documented not thread-safe; the engine's
    sample/mock draws run on ThreadingHTTPServer handler threads, so wrap
    the shared generator behind one lock (draws are tiny host work)."""

    def __init__(self, rng):
        import threading

        self._rng = rng
        self._lock = threading.Lock()

    def choice(self, *a, **k):
        with self._lock:
            return self._rng.choice(*a, **k)

    def integers(self, *a, **k):
        with self._lock:
            return self._rng.integers(*a, **k)

    def random(self, *a, **k):
        with self._lock:
            return self._rng.random(*a, **k)


@dataclasses.dataclass
class ServingEngine(TaskPrograms, BatchedRequests, LiveCatalogUpdates, BrowseViews):
    model_cfg: OutfitXConfig
    catalog: Catalog
    cp_params: Optional[dict] = None
    cir_params: Optional[dict] = None
    pools: Optional[CandidatePools] = None
    mock: bool = False
    quantized: bool = False  # int8 catalog for whole-catalog retrieval
    # int8 (W8A8) transformer forward: per-channel int8 weights + dynamic
    # per-token int8 activations on the MXU's 2x-rate int8 path
    # (models/quantized.py). Opt-in; scores shift by the quantization
    # error (measured in BENCHMARKS.md), metric-eval paths are untouched.
    quantize_model: bool = False
    # Reserve this many spare catalog rows at construction so `add_items`
    # can append new items at runtime without any array shape change (and
    # therefore without recompiling any task program). Spare rows hold
    # huge-norm sentinels that can never win a top-k slot, so retrieval
    # sweeps the full capacity safely.
    spare_capacity: int = 0
    # Serve from a device mesh: the catalog (f32/bf16/int8) is row-sharded
    # over the mesh's data axis and whole-catalog retrieval runs per-shard
    # top-k + one O(devices x Q x k) all_gather + exact merge
    # (ops/retrieval_sharded.py) — aggregate HBM scales with the mesh, so
    # 8 chips hold an ~80M-item int8 catalog the reference's single-GPU
    # demo could never load. None = single-device (default).
    mesh: Optional[jax.sharding.Mesh] = None
    # Device-resident catalog storage dtype. "bfloat16" halves catalog HBM
    # (1M items x 1536: 6.1 -> 3.1 GB) and the one-time host->device
    # staging bytes, doubling the max serving catalog on a 16 GB chip.
    # Forward compute is bf16 regardless (core/dtypes.py), so the only
    # numeric change is rounding at storage instead of after the gather —
    # the same ~1e-3 score shift as a bf16 executable rebuild (tested).
    catalog_dtype: str = "float32"
    # Above this catalog size, whole-catalog retrieval streams the pool in
    # chunks (lax.scan running top-k) instead of materialising (Q, N).
    chunk_threshold: int = 262_144
    # Directory holding {item_id}.jpg files (reference demo renders item
    # images, app.py:255-387); None disables image URLs.
    images_dir: Optional[str] = None
    # Serving uses the TPU-native approximate top-k: ~2.3x lower retrieval
    # latency at recall ~0.995 vs exact (ops/retrieval.topk_smallest).
    # Metric-eval code paths (evalm/) are unaffected and stay exact.
    approx_topk: bool = True

    # Test-split rows for the demo's dataset-sample browsing views
    # (reference demo samples test rows and renders ground truth vs
    # prediction, app.py:121-232). None disables the sample_* surfaces.
    cp_split: Optional[CPSplit] = None
    cir_split: Optional[OutfitSplit] = None
    fitb_split: Optional[FITBSplit] = None

    warmup: bool = True
    # cp_score_batch pads every chunk to exactly this many outfits, so the
    # engine compiles ONE batch program — warmed at startup — no matter the
    # request size (larger requests are chunked). Power-of-two buckets per
    # request size would leave the browse endpoints (n up to 32) stalling
    # behind fresh 1-7 min remote compiles for every new bucket.
    cp_batch_bucket: int = 8
    # Live updates are padded to this many rows per scatter dispatch (one
    # pre-compiled donated-scatter program per catalog representation —
    # see serve/live_update.py).
    update_bucket: int = 1024

    def __post_init__(self):
        import threading

        self._update_lock = threading.Lock()
        self.n_updated_rows = 0   # live-update counters (/api/stats)
        self.n_appended_items = 0
        self.model = OutfitXModel(self.model_cfg)
        if self.spare_capacity:
            # Grow the table to [items][sentinel spare rows][PAD] so
            # add_items can fill rows without changing any array shape
            # (compiled programs keep their traces). Splits built against
            # the ungrown catalog hold the OLD pad index in their padded
            # slots — remap them (old_pad == old n_items is outside the
            # item-row range, so a value rewrite is exact).
            old_pad = self.catalog.reserve(self.spare_capacity)
            new_pad = self.catalog.pad_row
            for split in (self.cp_split, self.cir_split, self.fitb_split):
                if split is None:
                    continue
                for attr in ("item_rows", "cand_rows"):
                    arr = getattr(split, attr, None)
                    if arr is not None:
                        arr[arr == old_pad] = new_pad
        if self.quantize_model and not self.mock:
            from outfitx_tpu.models.quantized import (
                QuantizedOutfitX,
                quantize_outfitx_params,
            )

            # Quantize ONCE at construction; the int8 pytrees replace the
            # f32 params as the jitted programs' arguments (never baked in
            # as constants). cp/cir often share one pytree (demo app) —
            # quantize it once.
            shared = self.cir_params is self.cp_params
            if self.cp_params is not None:
                self.cp_params = quantize_outfitx_params(
                    self.cp_params, self.model_cfg
                )
            if self.cir_params is not None:
                self.cir_params = (
                    self.cp_params
                    if shared
                    else quantize_outfitx_params(
                        self.cir_params, self.model_cfg
                    )
                )
            self.model = QuantizedOutfitX(self.model_cfg)
        # dtype conversion happens HOST-side inside asarray, so a bf16
        # catalog also ships half the bytes through the relay (and halves
        # the relay client's 1:1 H2D staging leak for the big transfer).
        emb = self.catalog.embeddings
        if self.mesh is not None:
            import jax.numpy as jnp

            from outfitx_tpu.core.mesh import DATA_AXIS
            from outfitx_tpu.ops.retrieval_sharded import (
                catalog_row_sharding,
                pad_rows_to_shards,
            )

            # pad rows (host-side) so every shard is equal; the extra
            # all-zero rows sit beyond the PAD row and, like it, are
            # masked out of retrieval by n_rows.
            n_pad = pad_rows_to_shards(
                emb.shape[0], self.mesh.shape[DATA_AXIS]
            )
            if n_pad != emb.shape[0]:
                emb = np.pad(emb, ((0, n_pad - emb.shape[0]), (0, 0)))
            self.catalog_dev = jax.device_put(
                emb.astype(jnp.dtype(self.catalog_dtype)),
                catalog_row_sharding(self.mesh),
            )
        else:
            import jax.numpy as jnp

            # explicit device_put (not jnp.asarray): intended transfers
            # must be distinguishable so transfer-guard hygiene tests can
            # ban accidental ones (CLAUDE.md: relay leaks host RSS per
            # H2D byte; cast host-side so bf16 ships half the bytes)
            self.catalog_dev = jax.device_put(
                np.asarray(emb).astype(jnp.dtype(self.catalog_dtype))
            )
        self._qcat = None
        if self.quantized:
            from outfitx_tpu.ops.quantization import quantize_catalog

            # quantize only real rows; PAD row stays out of retrieval anyway.
            # n_rows (not a [:n] slice) so no catalog-sized copy is made —
            # quantization peaks at one 131k-row block of f32 temporaries.
            # Mesh case: quantize ALL rows (pads quantize to zeros) so the
            # int8 fields keep the shard-divisible row count, then place
            # them row-sharded next to (or instead of) the dense catalog.
            if self.mesh is not None:
                import dataclasses as _dc

                from outfitx_tpu.ops.retrieval_sharded import (
                    catalog_row_sharding,
                )

                qc = quantize_catalog(self.catalog_dev)
                sh = catalog_row_sharding(self.mesh)
                self._qcat = _dc.replace(
                    qc,
                    values=jax.device_put(qc.values, sh),
                    scales=jax.device_put(qc.scales, sh),
                    sq_norms=jax.device_put(qc.sq_norms, sh),
                )
            else:
                self._qcat = quantize_catalog(
                    # quantize through pad_row: spare sentinel rows get
                    # huge sq_norms (never win) and appends requantize
                    # their rows in place
                    self.catalog_dev, n_rows=self.catalog.pad_row
                )
        self._rng = _LockedRng(np.random.default_rng(0))
        if not self.mock:
            self._build_task_programs()
            if self.warmup:
                self._warmup()

    def _run(self, jitted, *rest):
        """Dispatch a task program with the CURRENT catalog refs.

        A concurrent `update_items`/`add_items` donates the old catalog
        buffer; a stale python Array raises a 'deleted' RuntimeError at
        dispatch time (never silent corruption). The lock covers only the
        REF CAPTURE (so `catalog_dev`/`_qcat` are a consistent pair, never
        torn across an update) — the dispatch itself runs outside it, so a
        first-call trace+remote-compile (1-7 min for an unwarmed shape,
        e.g. an odd FITB candidate bucket) stalls only its own request,
        never every route behind the lock. If the capture loses the race
        to an update's donation, dispatch raises 'deleted' and the bounded
        retry re-captures fresh refs; the LAST attempt dispatches under
        the lock itself — it cannot lose, and by then the executable is
        compiled (the error is raised at Execute time, after tracing), so
        it never holds the lock across a compile. Under a write storm a
        lock-free request can lose several races in a row, so the
        guaranteed final attempt is what makes requests never fail.
        """
        for attempt in range(4):
            with self._update_lock:
                cat, qcat = self.catalog_dev, self._qcat
                if attempt == 3:
                    return jitted(cat, qcat, *rest)
            try:
                return jitted(cat, qcat, *rest)
            except RuntimeError as e:
                if "deleted" not in str(e).lower():
                    raise

    def lookup_row(self, item_id: int) -> int:
        row = self.catalog.id_to_row.get(int(item_id))
        if row is None:
            raise UnknownItemError(f"unknown item_id {item_id}")
        return row

    # ------------------------------------------------------------ tasks --
    def _pad(self, item_ids: List[int]):
        """Host-side row/mask assembly — numpy only, no device dispatch."""
        for i in item_ids:
            self.lookup_row(i)  # clear error for unknown ids
        rows, mask = _pad_outfits(
            self.catalog, [list(item_ids)], self.model_cfg.max_outfit_len
        )
        return np.asarray(rows, dtype=np.int32), np.asarray(mask)

    def cp_score(self, item_ids: List[int]) -> float:
        """Sigmoid compatibility score for one outfit."""
        if self.mock:
            return float(self._rng.random())
        rows, mask = self._pad(item_ids)
        return float(
            np.asarray(self._run(self._cp_task, self.cp_params, rows, mask))[0]
        )

    def cir_top10(
        self, item_ids: List[int], target_item_id: int
    ) -> List[Dict]:
        """Top-10 complementary items from the target's category pool."""
        if self.mock:
            rows = self._rng.choice(self.catalog.n_items, 10, replace=False)
            return [self._item_info(int(r), 1.0) for r in rows]
        target_row = self.lookup_row(target_item_id)
        cid = int(self.catalog.category_id[target_row])
        rows, mask = self._pad(item_ids)
        trow = np.asarray([target_row], dtype=np.int32)
        pool_rows = (
            self.pools.pools.get(cid)
            if self.pools is not None
            else None
        )
        if pool_rows is None:  # whole-catalog retrieval, one fused program
            d2, idx = self._run(
                self._cir_task, self.cir_params, rows, mask, trow
            )
            pool_rows = None  # idx already global rows
        else:
            d2, idx = self._run(
                self._cir_pool_task, self.cir_params, rows, mask, trow,
                np.asarray(pool_rows, dtype=np.int32)[None],
            )
        out = []
        for i, dist in zip(np.asarray(idx)[0], np.asarray(d2)[0]):
            row = int(i) if pool_rows is None else int(pool_rows[i])
            if row >= self.catalog.n_items:
                # unfilled spare sentinel: reachable only when fewer real
                # items than k exist (a sentinel never BEATS a real row)
                continue
            out.append(self._item_info(row, float(dist)))
        return out

    def fitb_pick(
        self, item_ids: List[int], candidate_ids: List[int]
    ) -> int:
        """Index of the best-fitting candidate."""
        if self.mock:
            return int(self._rng.integers(len(candidate_ids)))
        # The reference FITB demo uses the answer-agnostic query: candidates
        # share a category, so use the first candidate's text embedding
        # (matches processor semantics, app.py:205-232).
        rows, mask = self._pad(item_ids)
        # Bucket the candidate count to powers of two (>=4) so arbitrary
        # client counts hit a handful of compiled programs instead of one
        # trace+remote-compile per count. Pads repeat candidate 0's row:
        # a pad's distance is BITWISE equal to slot 0's, and jnp.argmin
        # returns the first minimal index, so a pad slot can never win.
        cand_rows = np.asarray(
            self.catalog.rows(candidate_ids), dtype=np.int32
        )
        bucket = max(4, 1 << (len(cand_rows) - 1).bit_length())
        if len(cand_rows) < bucket:
            cand_rows = np.concatenate(
                [cand_rows,
                 np.repeat(cand_rows[:1], bucket - len(cand_rows))]
            )
        return int(
            np.asarray(
                self._run(
                    self._fitb_task, self.cir_params, rows, mask,
                    np.asarray(
                        [self.lookup_row(candidate_ids[0])], dtype=np.int32
                    ),
                    cand_rows,
                )
            )[0]
        )

    # ------------------------------------------------------------ util --
    def image_path(self, item_id: int):
        """Filesystem path of the item's jpg, or None (unknown id, no
        images_dir, or file absent)."""
        if self.images_dir is None:
            return None
        import pathlib

        p = pathlib.Path(self.images_dir) / f"{int(item_id)}.jpg"
        return p if p.is_file() else None

    def _item_info(self, row: int, score: float) -> Dict:
        item_id = int(self.catalog.item_ids[row])
        info = {
            "item_id": item_id,
            "score": score,
            "category_id": int(self.catalog.category_id[row]),
            "description": (
                self.catalog.descriptions[row]
                if self.catalog.descriptions
                else ""
            ),
        }
        if self.image_path(item_id) is not None:
            info["image_url"] = f"/images/{item_id}.jpg"
        return info

    def similar_items(self, item_id: int, k: int = 10) -> List[Dict]:
        """Nearest catalog neighbours of an item by embedding L2 (serving
        convenience beyond the reference demo)."""
        row = self.lookup_row(item_id)
        if self.mock:  # model-free UI smoke: random neighbours
            rows = self._rng.choice(self.catalog.n_items, k, replace=False)
            return [self._item_info(int(r), 1.0) for r in rows]
        d2, idx = self._run(
            self._sim_task, np.asarray([row], dtype=np.int32), k + 1,
        )
        out = []
        for i, dist in zip(np.asarray(idx)[0], np.asarray(d2)[0]):
            if int(i) == row or int(i) >= self.catalog.n_items:
                continue  # skip the query item itself / spare sentinels
            out.append(self._item_info(int(i), float(dist)))
        return out[:k]
