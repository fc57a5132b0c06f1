"""Serving engine: the reference demo's model-side logic
(src/demo/app.py:80-232) as a reusable library.

Loads up to three task model instances (CP / CIR / FITB-shares-CIR, app.py
:80-116,245-247), keeps the catalog + per-category candidate pools
device-resident, and serves:
- CP: sigmoid compatibility scores (:121-145)
- CIR: top-10 retrieval against the target category's pool (:169-201)
- FITB: argmin over 4 candidates (:205-232)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.core.config import OutfitXConfig
from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.sampler import CandidatePools
from outfitx_tpu.data.splits import CPSplit, FITBSplit, OutfitSplit, _pad_outfits
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.ops.retrieval import (
    fitb_pick,
    retrieve,
    retrieve_chunked,
    retrieve_per_query_pools,
)


def _bucket_chunks(idxs, bucket: int):
    """Yield ``(sel, padded)`` covering ``idxs`` in chunks of exactly
    ``bucket`` indices: ``sel`` are the real indices, ``padded`` the int64
    index array padded by repeating the chunk's first index. Every batched
    device call therefore hits the single pre-warmed bucket program; pad
    results are sliced away by the caller. Shared by cp_score_batch,
    cir_top10_batch, and similar_items_batch (one encoding of the bucket
    invariant, not three)."""
    idxs = list(idxs)
    for s in range(0, len(idxs), bucket):
        sel = idxs[s : s + bucket]
        yield sel, np.asarray(sel + sel[:1] * (bucket - len(sel)), np.int64)


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


# Donated row scatters for live catalog updates: the input catalog buffer
# is reused for the output, so a 2M x 1536 catalog is updated without a
# second catalog-sized HBM allocation. Module-level jits — one compile per
# (catalog shape/dtype, bucket) for the engine's lifetime.
@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(cat, rows, vals):
    return cat.at[rows].set(vals.astype(cat.dtype))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_quant_rows(values, scales, sq_norms, rows, vals):
    """Requantize the replacement rows and scatter all three int8-catalog
    fields. Per-row symmetric quantization is row-independent, so the
    touched rows end up bit-identical to a full requantization."""
    from outfitx_tpu.ops.quantization import _quantize_block

    v, s, m = _quantize_block(vals)
    return (
        values.at[rows].set(v),
        scales.at[rows].set(s),
        sq_norms.at[rows].set(m),
    )


@dataclasses.dataclass
class ServingEngine:
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

    def _warmup(self):
        """Compile EVERY jitted task program at startup so no first HTTP
        request stalls behind XLA compilation (1-7 min per program through
        a remote compile service): cp single + THE batch bucket (all batch
        sizes chunk into it, including the sample_* browse endpoints), BOTH
        CIR routes (whole-catalog and pool), fitb, similar."""
        ids = self.sample_outfit(4)
        self.cp_score(ids)
        self.cp_score_batch([ids[:2], ids[2:]])  # pads to cp_batch_bucket
        if self.cir_params is not None:
            rows, mask = self._pad(ids[:1])
            trow = np.asarray([self.lookup_row(ids[1])], dtype=np.int32)
            self._run(  # whole-catalog route
                self._cir_task, self.cir_params, rows, mask, trow
            )
            if self.pools is not None and self.pools.pools:
                pool_rows = next(iter(self.pools.pools.values()))
                self._run(
                    self._cir_pool_task, self.cir_params, rows, mask, trow,
                    np.asarray(pool_rows, dtype=np.int32)[None],
                )
            self.fitb_pick(ids[:3], ids[:4])
            # coalesced-batch CIR bucket (B = cp_batch_bucket), BOTH routes
            b = self.cp_batch_bucket
            rows_b = np.broadcast_to(rows, (b, rows.shape[1])).copy()
            mask_b = np.broadcast_to(mask, (b, mask.shape[1])).copy()
            trows_b = np.broadcast_to(trow, (b,)).copy()
            self._run(
                self._cir_task, self.cir_params,
                rows_b, mask_b, trows_b,
            )
            if self.pools is not None and self.pools.pools:
                pool_rows = next(iter(self.pools.pools.values()))
                prows_b = np.broadcast_to(
                    np.asarray(pool_rows, dtype=np.int32)[None],
                    (b, len(pool_rows)),
                ).copy()
                self._run(
                    self._cir_pool_task, self.cir_params,
                    rows_b, mask_b, trows_b, prows_b,
                )
        self.similar_items(ids[0])
        self.similar_items_batch(ids[:2])  # coalesced-batch bucket
        # Live-update scatter programs (dense + int8 requantize): without
        # this, the FIRST /api/update_items of a cold deployment compiles
        # them (1-7 min remote) while holding the update lock, freezing
        # every write (reads capture refs under the same lock but dispatch
        # outside it). Re-setting row 0 to its own value is idempotent and
        # exact, so warmup leaves the catalog bit-identical — the value is
        # round-tripped through the catalog dtype so a bf16 catalog's int8
        # row requantizes from exactly what the device holds.
        row0 = (
            np.asarray(self.catalog.embeddings[:1])
            .astype(jnp.dtype(self.catalog_dtype))
            .astype(np.float32)
        )
        with self._update_lock:
            self._scatter_locked(np.asarray([0], dtype=np.int32), row0)

    def _build_task_programs(self):
        """One jitted program per task, taking catalog ROW INDICES.

        Each eager op is a round-trip to the device (tens of ms through a
        remote-relay deployment — measured 44-84 ms/call p50 with the
        gather/slice/forward/top-k chain dispatched op by op at 250k-item
        scale). Fusing gather + forward + retrieval into a single program
        leaves exactly one dispatch and one small D2H per request. Routing
        (quantized / chunked / dense) is static per engine config, so it is
        baked in at trace time."""
        # Retrieval bound: everything below the PAD row. With reserved
        # spare capacity this INCLUDES the sentinel spare rows (they never
        # win a top-k slot), so appended items become retrievable without
        # re-tracing — the bound is static for the engine's lifetime.
        n = self.catalog.pad_row
        d = self.catalog.d_embed
        approx = self.approx_topk
        quantized = self._qcat is not None
        chunked = n > self.chunk_threshold
        model = self.model

        def cir_query(p, cat, rows, mask, target_rows):
            # batch-polymorphic: rows (B, L), target_rows (B,) — single
            # requests are the B=1 instance, coalesced batches B=bucket.
            emb = jnp.take(cat, rows, axis=0)  # (B, L, D)
            text = jnp.take(cat, target_rows, axis=0)[:, d // 2 :]
            return model.cir_forward(p, emb, mask, text)

        def catalog_topk(y, cat, qcat, k):
            """Whole-catalog route matrix: {dense, int8} x {materialized,
            chunked, mesh-sharded} x {exact, approx}. Static per engine
            config, baked in at trace time."""
            if self.mesh is not None:
                from outfitx_tpu.ops.retrieval_sharded import (
                    retrieve_quantized_sharded,
                    retrieve_sharded,
                )

                if quantized:
                    return retrieve_quantized_sharded(
                        y, qcat, k, mesh=self.mesh, n_rows=n, approx=approx
                    )
                return retrieve_sharded(
                    y, cat, k, mesh=self.mesh, n_rows=n, approx=approx
                )
            if quantized and chunked:
                from outfitx_tpu.ops.quantization import (
                    retrieve_quantized_chunked,
                )

                return retrieve_quantized_chunked(
                    y, qcat, k, chunk_size=self.chunk_threshold, approx=approx
                )
            if quantized:
                from outfitx_tpu.ops.quantization import retrieve_quantized

                return retrieve_quantized(y, qcat, k, approx=approx)
            if chunked:
                return retrieve_chunked(
                    y, cat[:n], k, chunk_size=self.chunk_threshold,
                    approx=approx,
                )
            return retrieve(y, cat[:n], k=k, approx=approx)

        # Every program takes (cat, qcat) as its LEADING arguments and is
        # dispatched exclusively through `_run`, which reads the CURRENT
        # `self.catalog_dev` / `self._qcat` refs — the single point that
        # makes live catalog updates (whose donated scatters invalidate the
        # old buffers) safe against concurrent request threads.
        def cp_task(cat, qcat, p, rows, mask):
            del qcat
            emb = jnp.take(cat, rows, axis=0)
            return jax.nn.sigmoid(model.cp_forward(p, emb, mask))

        def cir_task(cat, qcat, p, rows, mask, target_rows):
            y = cir_query(p, cat, rows, mask, target_rows)
            return catalog_topk(y, cat, qcat, 10)

        def cir_pool_task(cat, qcat, p, rows, mask, target_rows, pool_rows):
            # pool_rows (B, P): every request retrieves against its OWN
            # target category's pool in the one batched program.
            del qcat
            y = cir_query(p, cat, rows, mask, target_rows)
            pool_emb = jnp.take(cat, pool_rows, axis=0)  # (B, P, D)
            return retrieve_per_query_pools(y, pool_emb, k=10)  # exact

        def fitb_task(cat, qcat, p, rows, mask, text_row, cand_rows):
            del qcat
            y = cir_query(p, cat, rows, mask, text_row)
            cands = jnp.take(cat, cand_rows, axis=0)[None]
            return fitb_pick(y, cands)

        def sim_task(cat, qcat, qrows, k):
            q = jnp.take(cat, qrows, axis=0)  # (B, D)
            return catalog_topk(q, cat, qcat, k)

        self._cp_task = jax.jit(cp_task)
        self._cir_task = jax.jit(cir_task)
        self._cir_pool_task = jax.jit(cir_pool_task)
        self._fitb_task = jax.jit(fitb_task)
        self._sim_task = jax.jit(sim_task, static_argnums=3)

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

    # ---------------------------------------------- live catalog updates --
    # The reference demo loads its catalog once at import and can never
    # change it (app.py:51-75); a production catalog gets corrected /
    # re-embedded items AND new ones. Every task program takes the catalog
    # as an ARGUMENT (never a baked constant), so swapping `catalog_dev` /
    # `_qcat` between requests needs NO recompilation; appends fill
    # reserved sentinel rows (`spare_capacity`), so shapes never change
    # either.
    update_bucket: int = 1024

    def update_items(
        self,
        item_ids: List[int],
        embeddings,
        descriptions: Optional[List[str]] = None,
    ) -> None:
        """In-place embedding refresh for EXISTING catalog items.

        Updates the host catalog, the device catalog (dense or bf16), and
        — when the engine serves the int8 route — requantizes exactly the
        touched rows (per-row symmetric int8 is row-independent, so the
        result is bit-identical to requantizing the whole catalog).
        Update batches are padded to ``update_bucket`` rows by repeating
        the first row (an idempotent re-set), so any update size runs on
        one pre-compiled scatter program per catalog representation; the
        catalog buffers are DONATED — no second catalog-sized HBM
        allocation. Thread-safe: the whole mutation (host copy + device
        scatter) runs under the update lock, and requests dispatch through
        `_run`, which captures the current refs under the same lock —
        in-flight requests complete against the pre-update catalog.
        """
        if not item_ids:
            return
        rows = np.asarray([self.lookup_row(i) for i in item_ids], np.int32)
        vals = np.asarray(embeddings, dtype=np.float32)
        if vals.shape != (len(rows), self.catalog.d_embed):
            raise ValueError(
                f"embeddings shape {vals.shape} != "
                f"({len(rows)}, {self.catalog.d_embed})"
            )
        with self._update_lock:
            self.catalog.embeddings[rows] = vals  # host copy stays consistent
            if descriptions is not None and self.catalog.descriptions:
                for r, text in zip(rows, descriptions):
                    self.catalog.descriptions[int(r)] = text
            self.n_updated_rows += len(rows)
            if self.mock:
                return
            if len(np.unique(rows)) != len(rows):
                # duplicate ids in one request: the host assignment above
                # is last-wins, but jnp scatter order under duplicate
                # indices is unspecified — dedupe keeping each row's LAST
                # value so host and device can never diverge
                last = {int(r): i for i, r in enumerate(rows)}
                keep = np.asarray(sorted(last.values()), dtype=np.int64)
                rows, vals = rows[keep], vals[keep]
            self._scatter_locked(rows, vals)

    def add_items(
        self,
        item_ids: List[int],
        embeddings,
        category_ids=None,
        semantic_categories: Optional[List[str]] = None,
        descriptions: Optional[List[str]] = None,
    ) -> None:
        """Append NEW items at runtime into reserved spare rows
        (``spare_capacity``); raises when the capacity is exhausted or an
        id already exists. The appended rows become retrievable by the
        very next request — whole-catalog CIR / similar-items sweep the
        full capacity (sentinel rows never win), and the same
        pre-compiled scatter programs as `update_items` fill the rows
        (int8 route included, requantized bit-identically). Per-category
        candidate pools are frozen at construction, so targets in a
        pool-served category keep their pool; new/unpooled categories
        route to whole-catalog retrieval."""
        if not item_ids:
            return
        # The lock covers the HOST append too: `append_items` claims spare
        # rows from a shared counter, so two concurrent appends outside the
        # lock could claim the same rows (and race `id_to_row`), not just
        # double-donate the device buffer.
        with self._update_lock:
            rows = self.catalog.append_items(
                item_ids, embeddings,
                category_ids=category_ids,
                semantic_categories=semantic_categories,
                descriptions=descriptions,
            )
            self.n_appended_items += len(rows)
            if self.mock:
                return
            self._scatter_locked(
                rows, np.asarray(embeddings, dtype=np.float32)
            )

    def _scatter_locked(self, rows: np.ndarray, vals: np.ndarray) -> None:
        # Caller holds `_update_lock`: writer-writer serialization (two
        # concurrent updates must not both donate the same catalog buffer)
        # and writer-reader exclusion against `_run`'s ref capture.
        b = self.update_bucket
        for s in range(0, len(rows), b):
            chunk_rows = rows[s : s + b]
            chunk_vals = vals[s : s + b]
            if len(chunk_rows) < b:  # pad by repeating row 0 (idempotent)
                pad = b - len(chunk_rows)
                chunk_rows = np.concatenate(
                    [chunk_rows, np.repeat(chunk_rows[:1], pad)]
                )
                chunk_vals = np.concatenate(
                    [chunk_vals, np.repeat(chunk_vals[:1], pad, axis=0)]
                )
            # mesh case: place the update operands replicated so the
            # scatter onto the row-sharded catalog has unambiguous
            # shardings (computation follows the sharded operand)
            rep = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as PS

                rep = NamedSharding(self.mesh, PS())
            rows_dev = jax.device_put(chunk_rows, rep)
            # cast host-side: a bf16 catalog ships half the bytes (and
            # halves the relay client's per-byte H2D staging leak)
            vals_dev = jax.device_put(
                chunk_vals.astype(self.catalog_dev.dtype), rep
            )
            self.catalog_dev = _scatter_rows(
                self.catalog_dev, rows_dev, vals_dev
            )
            if self._qcat is not None:
                vals_f32 = jax.device_put(chunk_vals, rep)
                values, scales, sq_norms = _scatter_quant_rows(
                    self._qcat.values,
                    self._qcat.scales,
                    self._qcat.sq_norms,
                    rows_dev,
                    vals_f32,
                )
                self._qcat = dataclasses.replace(
                    self._qcat,
                    values=values, scales=scales, sq_norms=sq_norms,
                )

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

    def cp_score_batch(self, outfits: List[List[int]]) -> List[float]:
        """Sigmoid scores for many outfits in ONE device program.

        Batched serving surface (beyond the reference demo, whose UI scores
        one outfit per click): outfits are padded to L, and the batch is
        processed in chunks padded to exactly ``cp_batch_bucket`` — ONE
        compiled batch program for every request size (warmed at startup;
        pad outfits score garbage and are sliced away).
        """
        if self.mock:
            return [float(self._rng.random()) for _ in outfits]
        if not outfits:
            return []
        for ids in outfits:
            for i in ids:
                self.lookup_row(i)
        rows, mask = _pad_outfits(
            self.catalog, [list(ids) for ids in outfits],
            self.model_cfg.max_outfit_len,
        )
        rows = np.asarray(rows, dtype=np.int32)
        mask = np.asarray(mask)
        out: List[float] = []
        for sel, padded in _bucket_chunks(
            range(len(outfits)), self.cp_batch_bucket
        ):
            scores = np.asarray(
                self._run(
                    self._cp_task, self.cp_params, rows[padded], mask[padded]
                )
            )
            out.extend(float(s) for s in scores[: len(sel)])
        return out

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

    def cir_top10_batch(
        self, requests: List  # [(item_ids, target_item_id), ...]
    ) -> List[List[Dict]]:
        """Top-10 retrieval for many (outfit, target) requests in fused
        batch programs — the coalesced form of ``cir_top10``. Requests are
        grouped by route (target category has a pool vs whole catalog),
        each group processed in chunks padded to exactly
        ``cp_batch_bucket`` (one compiled program per route, warmed at
        startup). Results keep request order."""
        if self.mock:
            return [
                [
                    self._item_info(int(r), 1.0)
                    for r in self._rng.choice(
                        self.catalog.n_items, 10, replace=False
                    )
                ]
                for _ in requests
            ]
        if not requests:
            return []
        l = self.model_cfg.max_outfit_len
        rows = np.zeros((len(requests), l), dtype=np.int32)
        mask = np.zeros((len(requests), l), dtype=bool)
        trows = np.zeros(len(requests), dtype=np.int32)
        pool_idx: List[int] = []  # request indices per route
        cat_idx: List[int] = []
        pools_of: Dict[int, np.ndarray] = {}
        for i, (item_ids, target_id) in enumerate(requests):
            r, m = self._pad(list(item_ids))
            rows[i], mask[i] = r[0], m[0]
            trow = self.lookup_row(target_id)
            trows[i] = trow
            cid = int(self.catalog.category_id[trow])
            pr = self.pools.pools.get(cid) if self.pools is not None else None
            if pr is None:
                cat_idx.append(i)
            else:
                pool_idx.append(i)
                pools_of[i] = np.asarray(pr, dtype=np.int32)
        out: List = [None] * len(requests)
        bucket = self.cp_batch_bucket

        for sel, padded in _bucket_chunks(cat_idx, bucket):
            d2, idx = self._run(
                self._cir_task, self.cir_params,
                rows[padded], mask[padded], trows[padded],
            )
            d2, idx = np.asarray(d2), np.asarray(idx)
            for j, i in enumerate(sel):
                out[i] = [
                    self._item_info(int(r), float(dd))
                    for r, dd in zip(idx[j], d2[j])
                    if int(r) < self.catalog.n_items  # skip spare sentinels
                ]
        for sel, padded in _bucket_chunks(pool_idx, bucket):
            prows = np.stack([pools_of[int(i)] for i in padded])
            d2, idx = self._run(
                self._cir_pool_task, self.cir_params,
                rows[padded], mask[padded], trows[padded], prows,
            )
            d2, idx = np.asarray(d2), np.asarray(idx)
            for j, i in enumerate(sel):
                out[i] = [
                    self._item_info(int(pools_of[i][p]), float(dd))
                    for p, dd in zip(idx[j], d2[j])
                ]
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

    def similar_items_batch(
        self, item_ids: List[int], k: int = 10
    ) -> List[List[Dict]]:
        """Nearest neighbours for many query items in fused batch programs
        (the coalesced form of ``similar_items``): chunks padded to exactly
        ``cp_batch_bucket`` — one compiled program, warmed at startup."""
        if self.mock:
            return [self.similar_items(i, k) for i in item_ids]
        if not item_ids:
            return []
        qrows = np.asarray(
            [self.lookup_row(i) for i in item_ids], dtype=np.int32
        )
        out: List[List[Dict]] = []
        for sel, padded in _bucket_chunks(
            range(len(qrows)), self.cp_batch_bucket
        ):
            chunk = qrows[padded]
            d2, idx = self._run(self._sim_task, chunk, k + 1)
            d2, idx = np.asarray(d2), np.asarray(idx)
            for j in range(len(sel)):
                row = int(chunk[j])
                items = [
                    self._item_info(int(i), float(dd))
                    for i, dd in zip(idx[j], d2[j])
                    if int(i) != row and int(i) < self.catalog.n_items
                ]
                out.append(items[:k])
        return out

    def sample_outfit(self, n: int = 4) -> List[int]:
        rows = self._rng.choice(self.catalog.n_items, n, replace=False)
        return [int(self.catalog.item_ids[r]) for r in rows]

    # ------------------------------------- dataset-sample browsing views --
    # The reference demo's core UX: sample test-split rows and render the
    # ground truth next to the model's prediction (app.py:121-232).
    def _row_ids(self, rows, mask_row) -> List[int]:
        return [
            int(self.catalog.item_ids[r])
            for r, pad in zip(rows, mask_row)
            if not pad
        ]

    def sample_cp(self, n: int = 4) -> List[Dict]:
        """n random CP test rows: outfit items + true label + predicted
        probability (reference run_cp_demo, app.py:120-144)."""
        if self.cp_split is None:
            raise ValueError("no CP test split loaded")
        idx = self._rng.choice(len(self.cp_split), min(n, len(self.cp_split)),
                               replace=False)
        outfits = [
            self._row_ids(self.cp_split.item_rows[i], self.cp_split.mask[i])
            for i in idx
        ]
        probs = self.cp_score_batch(outfits)
        return [
            {
                "items": [
                    self._item_info(self.lookup_row(i), p) for i in ids
                ],
                "label": int(self.cp_split.labels[i_row]),
                "prob": p,
                "predicted": int(p > 0.5),
            }
            for ids, p, i_row in zip(outfits, probs, idx)
        ]

    def sample_cir(self, n: int = 4) -> List[Dict]:
        """n random CIR test rows: pop an eligible positive out of the
        outfit (the gt), retrieve top-10 for it, mark whether the gt was
        recovered (reference run_cir_demo, app.py:167-200)."""
        if self.cir_split is None:
            raise ValueError("no CIR test split loaded")
        s = self.cir_split
        idx = self._rng.choice(len(s), min(n, len(s)), replace=False)
        out = []
        for i in idx:
            eligible = np.flatnonzero(s.pos_eligible[i])
            pos_slot = int(self._rng.choice(eligible))
            rows = s.item_rows[i][: s.lengths[i]]
            gt_row = int(rows[pos_slot])
            partial = [
                int(self.catalog.item_ids[r])
                for j, r in enumerate(rows)
                if j != pos_slot
            ]
            gt_id = int(self.catalog.item_ids[gt_row])
            retrieved = (
                [self._item_info(int(self._rng.integers(self.catalog.n_items)), 1.0)
                 for _ in range(10)]
                if self.mock
                else self.cir_top10(partial, gt_id)
            )
            out.append(
                {
                    "partial_outfit": [
                        self._item_info(self.lookup_row(i2), 0.0)
                        for i2 in partial
                    ],
                    "gt_item": self._item_info(gt_row, 0.0),
                    "retrieved": retrieved,
                    "gt_in_top10": any(
                        r["item_id"] == gt_id for r in retrieved
                    ),
                }
            )
        return out

    def sample_fitb(self, n: int = 4) -> List[Dict]:
        """n random FITB test rows: question outfit, 4 candidates, answer
        index vs predicted index (reference run_fitb_demo, app.py:205-232)."""
        if self.fitb_split is None:
            raise ValueError("no FITB test split loaded")
        s = self.fitb_split
        idx = self._rng.choice(len(s), min(n, len(s)), replace=False)
        out = []
        for i in idx:
            question = self._row_ids(s.item_rows[i], s.mask[i])
            cand_ids = [int(self.catalog.item_ids[r]) for r in s.cand_rows[i]]
            pick = self.fitb_pick(question, cand_ids)
            answer = int(s.answer_idx[i])
            out.append(
                {
                    "partial_outfit": [
                        self._item_info(self.lookup_row(q), 0.0)
                        for q in question
                    ],
                    "candidates": [
                        self._item_info(self.lookup_row(c), 0.0)
                        for c in cand_ids
                    ],
                    "answer_index": answer,
                    "predicted_index": pick,
                    "correct": pick == answer,
                }
            )
        return out
