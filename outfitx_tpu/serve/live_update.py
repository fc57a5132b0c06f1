"""Live catalog updates/appends for the serving engine.

The reference demo loads its catalog once at import and can never change
it (app.py:51-75); a production catalog gets corrected / re-embedded
items AND new ones. Every task program takes the catalog as an ARGUMENT
(never a baked constant), so swapping `catalog_dev` / `_qcat` between
requests needs NO recompilation; appends fill reserved sentinel rows
(`spare_capacity`), so shapes never change either.

``LiveCatalogUpdates`` is the engine mixin carrying the write path; the
donated scatter programs live at module level (one compile per catalog
shape/dtype + bucket for the engine's lifetime). Concurrency contract:
every mutation runs under ``self._update_lock``; request threads capture
catalog refs under the same lock in ``ServingEngine._run``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import numpy as np


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


class LiveCatalogUpdates:
    """Engine mixin: the live-update/append write path (donated scatters,
    reserve/remap). Mixed into ``ServingEngine``; uses its catalog refs,
    lock, and counters."""

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
