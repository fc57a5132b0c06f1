"""Int8 catalog quantization for retrieval.

Serving-scale catalogs (millions of items x 1536d) are HBM-hungry at f32;
per-row symmetric int8 cuts residency 4x and runs the distance matmul on
the MXU's int8 path. Ranking quality is preserved by computing
||q - p||^2 = ||q||^2 + ||p||^2 - 2 q.p with exact per-row dequant scales
(pool norms are precomputed from the *quantized* values, so the distance is
exact w.r.t. the quantized pool — the only error source is the original
row quantization).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class QuantizedCatalog:
    values: jax.Array  # (N, D) int8
    scales: jax.Array  # (N,) f32 per-row dequant scale
    sq_norms: jax.Array  # (N,) f32 ||row||^2 after dequant

    @property
    def nbytes(self) -> int:
        return self.values.size + 8 * self.scales.size


# Pytree registration so a QuantizedCatalog can cross a jit boundary as an
# ARGUMENT. Closure-capturing it instead bakes the whole int8 catalog into
# the compiled program as a constant — at serving scale that means a
# multi-hundred-MB executable (and a rejected remote-compile request).
jax.tree_util.register_dataclass(
    QuantizedCatalog,
    data_fields=["values", "scales", "sq_norms"],
    meta_fields=[],
)


@jax.jit
def _quantize_block(x: jax.Array) -> tuple:
    """Per-row symmetric int8 for one (C, D) block: scale = max|row| / 127.

    Row-independent math, so quantizing a catalog block-by-block is
    bit-identical to quantizing it in one shot."""
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    values = jnp.clip(
        jnp.round(x / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    deq_norms = jnp.sum(
        (values.astype(jnp.float32) * scales[:, None]) ** 2, axis=-1
    )
    return values, scales, deq_norms


def quantize_catalog(
    embeddings: jax.Array, *, n_rows: int | None = None,
    block_rows: int = 131_072,
) -> QuantizedCatalog:
    """Per-row symmetric int8: scale = max|row| / 127.

    Quantizes ``embeddings[:n_rows]`` (default: all rows) in fixed-size
    blocks. The one-shot eager version materialized several catalog-sized
    f32 temporaries at once (the f32 upcast, the round/clip chain, the
    dequant-norm product) — at 1M items x 1536 that is 3-4 live 6.1 GB
    arrays, which OOMs a 16 GB chip before serving even starts (seen:
    parity_artifacts/measure_r6/serving_1m_*.out). Blocking bounds peak
    extra HBM to one jitted block's temporaries (~1.6 GB f32 at the default
    block) + the int8 outputs, and the per-row math makes the result
    bit-identical to the one-shot computation (golden-tested).

    ``n_rows`` exists so callers with a trailing PAD row (serve/engine.py)
    can exclude it WITHOUT creating a catalog-sized slice copy here; blocks
    are cut with ``lax.dynamic_slice_in_dim``, which copies one block, not
    the catalog. The final block is cut overlapping from ``n - block`` so
    every block has the same shape (one compiled program); the overlap rows
    are dropped when assembling.
    """
    n = int(embeddings.shape[0]) if n_rows is None else int(n_rows)
    if n <= block_rows:
        values, scales, deq_norms = _quantize_block(embeddings[:n])
        return QuantizedCatalog(
            values=values, scales=scales, sq_norms=deq_norms
        )
    vals, scls, nrms = [], [], []
    done = 0  # rows already emitted
    while done < n:
        start = min(done, n - block_rows)  # tail block overlaps backwards
        block = jax.lax.dynamic_slice_in_dim(embeddings, start, block_rows, 0)
        v, s, m = _quantize_block(block)
        off = done - start  # rows of this block already covered by the prior
        vals.append(v[off:])
        scls.append(s[off:])
        nrms.append(m[off:])
        done = start + block_rows
    return QuantizedCatalog(
        values=jnp.concatenate(vals),
        scales=jnp.concatenate(scls),
        sq_norms=jnp.concatenate(nrms),
    )


def retrieve_quantized(
    queries: jax.Array, catalog: QuantizedCatalog, k: int,
    *, approx: bool = False
):
    """Top-k nearest rows by L2 against the int8 catalog.

    The cross term runs as one int8-friendly matmul: (Q, D) x (D, N) with
    the per-row scale applied to the f32 accumulator.
    Returns (dists2 (Q, k), indices (Q, k)).
    """
    q = queries.astype(jnp.float32)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # (Q, 1)
    # int8 stays int8 in HBM; XLA fuses the widening convert into the matmul
    # read, so the bandwidth win (4x vs f32) is realized.
    cross = jnp.dot(
        q,
        catalog.values.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * catalog.scales[None, :]
    d2 = jnp.maximum(q2 + catalog.sq_norms[None, :] - 2.0 * cross, 0.0)
    from outfitx_tpu.ops.retrieval import topk_smallest

    return topk_smallest(d2, k, approx=approx)


def retrieve_quantized_chunked(
    queries: jax.Array, catalog: QuantizedCatalog, k: int,
    *, chunk_size: int = 65_536, approx: bool = False
):
    """Top-k against the int8 catalog with the pool streamed in chunks.

    The multi-million-item serving case `chunk_threshold` exists for:
    int8 rows cut HBM traffic 4x AND the (Q, N) distance matrix is never
    materialized — a `lax.scan` over int8 chunks keeps a running (Q, k)
    best set (exact incumbent merge; see ops/retrieval._chunked_topk_scan).
    Returns (dists2 (Q, k), global indices (Q, k)).
    """
    from outfitx_tpu.ops.retrieval import _chunked_topk_scan

    n, d = catalog.values.shape
    n_chunks = -(-n // chunk_size)
    pad_n = n_chunks * chunk_size
    values, scales, sq_norms = catalog.values, catalog.scales, catalog.sq_norms
    if pad_n != n:
        values = jnp.pad(values, ((0, pad_n - n), (0, 0)))
        scales = jnp.pad(scales, (0, pad_n - n))
        sq_norms = jnp.pad(sq_norms, (0, pad_n - n))
    v_chunks = values.reshape(n_chunks, chunk_size, d)
    s_chunks = scales.reshape(n_chunks, chunk_size)
    n_chunks_arr = sq_norms.reshape(n_chunks, chunk_size)

    q = queries.astype(jnp.float32)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)

    def chunk_dists(xs):
        vals, scl, nrm = xs
        cross = jnp.dot(
            q, vals.T.astype(jnp.float32), preferred_element_type=jnp.float32
        ) * scl[None, :]
        return jnp.maximum(q2 + nrm[None, :] - 2.0 * cross, 0.0)

    init, body, starts = _chunked_topk_scan(
        q, k, n, chunk_size, n_chunks, chunk_dists, approx=approx
    )
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (v_chunks, s_chunks, n_chunks_arr, starts)
    )
    return best_d, best_i
