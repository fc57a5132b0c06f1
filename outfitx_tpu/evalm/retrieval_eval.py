"""Batched per-category retrieval evaluation (CIR Recall@k).

Reference protocol (complementary_item_retrieval_trainer.py:192-249): group
queries by target category, pad to a common query count, batched cdist
against each category's 3000-item pool, top-k smallest, hit iff the
positive's pool position appears in the top k. That padding trick is already
XLA-shaped (SURVEY.md 7) — here the whole thing is one jitted batched matmul
+ top-k on device; only the final hit-counting returns to host.

H2D hygiene: the per-epoch host->device payload is int32 indices only (the
(C, max_q) query-selection map and, first call per pool set, the (C, P)
pool rows — cached on the CandidatePools object afterwards). The padded
(C, max_q, D) f32 query tensor is assembled ON DEVICE from y_hats by
`jnp.take`; shipping it from host (~56 MB/epoch at envelope scale) both
wasted relay bandwidth and leaked host RSS 1:1 in the relay client
(scripts/probe_rss_leak.py — the envelope OOM root cause).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.data.sampler import CandidatePools
from outfitx_tpu.parallel import gather_global


@jax.jit
def _streamed_topk_50(catalog, y_hats, sel, pool_rows):
    """y_hats (n, D), sel (C, Q) i32 rows into y_hats (n = padding row),
    pool_rows (C, P) i32 -> top-min(50, P) pool-position indices.

    The padded (C, Q, D) query tensor is gathered from y_hats in-jit (one
    appended zero row serves the pad slots), and the pools are gathered
    from the catalog ONE CATEGORY AT A TIME inside a `lax.scan`, so recall
    eval adds O(one pool) HBM — ~18 MB at reference scale — instead of
    materializing a (C, P, D) copy next to the catalog (~1.1 GB at 60
    pools x 3000 x 1536 f32; VERDICT r3 item 7). Each scan step is still
    one (Q, D) x (D, P) MXU matmul + top-k."""
    d = y_hats.shape[-1]
    y_pad = jnp.concatenate(
        [y_hats.astype(jnp.float32), jnp.zeros((1, d), jnp.float32)]
    )
    queries = jnp.take(y_pad, sel, axis=0)  # (C, Q, D), on device

    def body(_, xs):
        q, rows = xs  # (Q, D), (P,)
        pool = jnp.take(catalog, rows, axis=0)  # (P, D) — one pool in HBM
        pf = pool.astype(jnp.float32)
        q2 = jnp.sum(q * q, axis=-1)[:, None]
        p2 = jnp.sum(pf * pf, axis=-1)[None, :]
        cross = jnp.dot(q, pf.T, preferred_element_type=jnp.float32)
        d2 = q2 + p2 - 2.0 * cross
        _, idx = jax.lax.top_k(-d2, min(50, pool.shape[0]))
        return (), idx

    _, idx = jax.lax.scan(body, (), (queries, pool_rows))
    return idx


def _device_pool_rows(pools: CandidatePools, cats: list) -> jax.Array:
    """Device copy of the stacked (C, P) pool rows, cached on the pools
    object per category tuple — the rows are immutable, so re-shipping
    them every eval epoch (0.7 MB leaked per epoch at envelope scale)
    bought nothing."""
    cache = getattr(pools, "_device_rows", None)
    if cache is None:
        cache = pools._device_rows = {}
    key = tuple(cats)
    rows = cache.get(key)
    if rows is None:
        rows = cache[key] = jax.device_put(
            np.stack([pools.pools[cid] for cid in cats]).astype(np.int32)
        )
    return rows


def recall_over_pools(
    y_hats,  # (n, D) predicted target embeddings — np.ndarray or jax.Array
    pos_rows: np.ndarray,  # (n,) catalog row of the true target
    pos_cats: np.ndarray,  # (n,) category_id of the true target
    pools: CandidatePools,
    catalog_embeddings: jax.Array,  # (N+1, D) device catalog
    ks: Sequence[int] = (1, 5, 10, 15, 30, 50),
) -> Dict[str, float]:
    by_cat = defaultdict(list)
    for i, cid in enumerate(pos_cats):
        if int(cid) in pools.pools:
            by_cat[int(cid)].append(i)
    if not by_cat:
        return {f"recall@{k}": float("nan") for k in ks}
    cats = sorted(by_cat)
    max_q = max(len(v) for v in by_cat.values())
    c = len(cats)
    n = y_hats.shape[0]
    # sel row n = the in-jit zero pad row; gt -1 never matches a top index
    sel = np.full((c, max_q), n, dtype=np.int32)
    gt = np.full((c, max_q), -1, dtype=np.int64)
    valid = np.zeros((c, max_q), dtype=bool)
    for ci, cid in enumerate(cats):
        # first-occurrence position of each row in this category's pool
        pos_map: Dict[int, int] = {}
        for p, row in enumerate(pools.pools[cid]):
            pos_map.setdefault(int(row), p)
        for qi, i in enumerate(by_cat[cid]):
            sel[ci, qi] = i
            gt[ci, qi] = pos_map.get(int(pos_rows[i]), -1)
            valid[ci, qi] = True

    if not isinstance(y_hats, jax.Array):
        y_hats = jax.device_put(np.ascontiguousarray(y_hats, np.float32))
    top_idx = np.asarray(
        gather_global(
            _streamed_topk_50(
                catalog_embeddings,
                y_hats,
                jax.device_put(sel),
                _device_pool_rows(pools, cats),
            )
        )
    )

    n_valid = valid.sum()
    out = {}
    for k in ks:
        hits = (top_idx[:, :, :k] == gt[:, :, None]).any(axis=-1) & valid
        out[f"recall@{k}"] = float(hits.sum()) / max(int(n_valid), 1)
    return out
