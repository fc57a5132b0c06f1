"""Mesh-sharded whole-catalog retrieval: rows sharded over devices,
local top-k per shard, one tiny all_gather + exact merge.

The reference's demo serves from a single GPU and has no answer once the
catalog outgrows one device (its retrieval is torch.cdist on the full
pool, demo/app.py + complementary_item_retrieval_trainer.py:192-249).
The TPU-native scale-out: place the (N, D) catalog row-sharded over the
mesh's data axis, run the distance matmul + top-k per shard where the
rows already live, and merge the per-shard (Q, k) candidate sets after
one `all_gather` of k-sized lists — the only collective is O(devices *
Q * k), riding ICI, regardless of catalog size. Aggregate HBM for the
catalog scales with the mesh: 8 x 16 GB chips hold a ~40M-item bf16
catalog.

Correctness: the global top-k is contained in the union of per-shard
top-k sets whenever every shard holds >= k rows (each global winner is
one of its own shard's k best) — asserted at trace time. The merge is
exact `lax.top_k` over (devices * k) candidates, so with exact local
top-k the result is identical to single-device retrieval; with
``approx`` local top-k, recall matches the single-device approx path
(the merge never drops an incumbent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from outfitx_tpu.core.mesh import DATA_AXIS
from outfitx_tpu.ops.retrieval import pairwise_l2, topk_smallest

_BIG = jnp.float32(3.4e38)


def catalog_row_sharding(mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Row-sharded placement for a (N, D) catalog (or the int8 values /
    (N,) scales of a QuantizedCatalog) over ``axis``."""
    return NamedSharding(mesh, P(axis))


def pad_rows_to_shards(n_rows: int, n_shards: int) -> int:
    """Rows after padding so the leading axis divides the shard count."""
    return -(-n_rows // n_shards) * n_shards


def _merge_local_topk(d2, gidx, k, axis, *, approx):
    """Local (Q, shard) distances + global row ids -> exact-merged global
    (Q, k). Runs inside shard_map."""
    local_d, local_pos = topk_smallest(d2, k, approx=approx)
    local_i = jnp.take(gidx, local_pos)
    d_all = jax.lax.all_gather(local_d, axis)  # (nd, Q, k)
    i_all = jax.lax.all_gather(local_i, axis)
    q = d2.shape[0]
    d_all = jnp.moveaxis(d_all, 0, 1).reshape(q, -1)
    i_all = jnp.moveaxis(i_all, 0, 1).reshape(q, -1)
    neg, pos = jax.lax.top_k(-d_all, k)  # exact merge over nd*k
    return -neg, jnp.take_along_axis(i_all, pos, axis=1)


def retrieve_sharded(
    queries, pool, k: int, *, mesh, n_rows: int | None = None,
    axis: str = DATA_AXIS, approx: bool = False,
):
    """Top-k nearest rows by squared L2 with the pool row-sharded over
    ``mesh``'s ``axis``. Returns replicated (dists2 (Q, k), indices (Q, k))
    — identical to ``retrieve`` (exact) on the first ``n_rows`` rows.

    ``pool``'s leading dim must divide the axis size (pad with
    ``pad_rows_to_shards``); ``n_rows`` marks the real rows, padded rows
    never win. Place ``pool`` with ``catalog_row_sharding`` ahead of time
    to avoid a reshard on every call.
    """
    n_shards = mesh.shape[axis]
    n_pad, d = pool.shape
    if n_pad % n_shards:
        raise ValueError(
            f"pool rows {n_pad} must divide the '{axis}' axis ({n_shards}); "
            f"pad to {pad_rows_to_shards(n_pad, n_shards)} first"
        )
    n = n_pad if n_rows is None else int(n_rows)
    shard_n = n_pad // n_shards
    if k > shard_n:
        # union-of-local-top-k containment needs every shard to hold >= k
        raise ValueError(f"k={k} exceeds shard rows {shard_n}")

    def local(q, shard):
        base = jax.lax.axis_index(axis) * shard_n
        gidx = base + jnp.arange(shard_n, dtype=jnp.int32)
        d2 = pairwise_l2(q, shard, squared=True)
        d2 = jnp.where((gidx < n)[None, :], d2, _BIG)
        return _merge_local_topk(d2, gidx, k, axis, approx=approx)

    # check_vma=False: every device computes the identical merge from the
    # identical all_gather'd candidates, but the static varying-mesh-axes
    # inference cannot see through the collective to prove it.
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis)), out_specs=(P(), P()),
        check_vma=False,
    )(queries, pool)


def retrieve_quantized_sharded(
    queries, catalog, k: int, *, mesh, n_rows: int | None = None,
    axis: str = DATA_AXIS, approx: bool = False,
):
    """`retrieve_sharded` against a row-sharded int8 ``QuantizedCatalog``
    (values/scales/sq_norms all sharded on rows): int8 HBM residency AND
    mesh-aggregate capacity compose — 8 chips hold an ~80M-item int8
    catalog. Distance math matches ``retrieve_quantized`` exactly."""
    n_shards = mesh.shape[axis]
    n_pad = catalog.values.shape[0]
    if n_pad % n_shards:
        raise ValueError(
            f"catalog rows {n_pad} must divide the '{axis}' axis "
            f"({n_shards}); pad to {pad_rows_to_shards(n_pad, n_shards)}"
        )
    n = n_pad if n_rows is None else int(n_rows)
    shard_n = n_pad // n_shards
    if k > shard_n:
        raise ValueError(f"k={k} exceeds shard rows {shard_n}")

    def local(q, values, scales, sq_norms):
        base = jax.lax.axis_index(axis) * shard_n
        gidx = base + jnp.arange(shard_n, dtype=jnp.int32)
        qf = q.astype(jnp.float32)
        q2 = jnp.sum(qf * qf, axis=-1, keepdims=True)
        cross = jnp.dot(
            qf, values.T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scales[None, :]
        d2 = jnp.maximum(q2 + sq_norms[None, :] - 2.0 * cross, 0.0)
        d2 = jnp.where((gidx < n)[None, :], d2, _BIG)
        return _merge_local_topk(d2, gidx, k, axis, approx=approx)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)), out_specs=(P(), P()),
        check_vma=False,  # see retrieve_sharded
    )(queries, catalog.values, catalog.scales, catalog.sq_norms)
