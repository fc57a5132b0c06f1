"""Batched per-category retrieval evaluation (CIR Recall@k).

Reference protocol (complementary_item_retrieval_trainer.py:192-249): group
queries by target category, pad to a common query count, batched cdist
against each category's 3000-item pool, top-k smallest, hit iff the
positive's pool position appears in the top k. That padding trick is already
XLA-shaped (SURVEY.md 7) — here the whole thing is one jitted batched matmul
+ top-k on device; only the final hit-counting returns to host.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.data.sampler import CandidatePools


@jax.jit
def _streamed_topk_50(catalog, queries, pool_rows):
    """queries (C, Q, D), pool_rows (C, P) i32 -> top-min(50, P) indices.

    The pools are gathered from the catalog ONE CATEGORY AT A TIME inside a
    `lax.scan`, so recall eval adds O(one pool) HBM — ~18 MB at reference
    scale — instead of materializing a (C, P, D) copy next to the catalog
    (~1.1 GB at 60 pools x 3000 x 1536 f32; VERDICT r3 item 7). Each scan
    step is still one (Q, D) x (D, P) MXU matmul + top-k."""

    def body(_, xs):
        q, rows = xs  # (Q, D), (P,)
        pool = jnp.take(catalog, rows, axis=0)  # (P, D) — one pool in HBM
        qf = q.astype(jnp.float32)
        pf = pool.astype(jnp.float32)
        q2 = jnp.sum(qf * qf, axis=-1)[:, None]
        p2 = jnp.sum(pf * pf, axis=-1)[None, :]
        cross = jnp.dot(qf, pf.T, preferred_element_type=jnp.float32)
        d2 = q2 + p2 - 2.0 * cross
        _, idx = jax.lax.top_k(-d2, min(50, pool.shape[0]))
        return (), idx

    _, idx = jax.lax.scan(body, (), (queries, pool_rows))
    return idx


def recall_over_pools(
    y_hats: np.ndarray,  # (n, D) predicted target embeddings
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
    d = y_hats.shape[-1]
    queries = np.zeros((c, max_q, d), dtype=np.float32)
    gt = np.full((c, max_q), -1, dtype=np.int64)
    valid = np.zeros((c, max_q), dtype=bool)
    pool_rows = np.stack([pools.pools[cid] for cid in cats])  # (C, P)
    for ci, cid in enumerate(cats):
        # first-occurrence position of each row in this category's pool
        pos_map: Dict[int, int] = {}
        for p, row in enumerate(pools.pools[cid]):
            pos_map.setdefault(int(row), p)
        for qi, i in enumerate(by_cat[cid]):
            queries[ci, qi] = y_hats[i]
            gt[ci, qi] = pos_map.get(int(pos_rows[i]), -1)
            valid[ci, qi] = True

    top_idx = np.asarray(
        _streamed_topk_50(
            catalog_embeddings,
            jnp.asarray(queries),
            jnp.asarray(pool_rows, dtype=jnp.int32),
        )
    )

    n_valid = valid.sum()
    out = {}
    for k in ks:
        hits = (top_idx[:, :, :k] == gt[:, :, None]).any(axis=-1) & valid
        out[f"recall@{k}"] = float(hits.sum()) / max(int(n_valid), 1)
    return out
