"""Jitted task-program construction + startup warmup for the serving
engine.

One jitted program per task, taking catalog ROW INDICES. Each eager op is
a round-trip to the device (tens of ms through a remote-relay deployment
— measured 44-84 ms/call p50 with the gather/slice/forward/top-k chain
dispatched op by op at 250k-item scale). Fusing gather + forward +
retrieval into a single program leaves exactly one dispatch and one small
D2H per request. Routing (quantized / chunked / mesh-sharded) is static
per engine config, so it is baked in at trace time.

Split out of the engine core as the ``TaskPrograms`` mixin; the engine
dispatches the built programs through ``ServingEngine._run``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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


class TaskPrograms:
    """Engine mixin: build + warm the per-task fused device programs."""

    def _build_task_programs(self):
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
