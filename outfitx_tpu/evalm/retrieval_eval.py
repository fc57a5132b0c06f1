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
def _batched_topk_50(queries, pools):
    """queries (C, Q, D), pools (C, P, D) -> top-min(50, P) indices."""
    qf = queries.astype(jnp.float32)
    pf = pools.astype(jnp.float32)
    q2 = jnp.sum(qf * qf, axis=-1)[:, :, None]
    p2 = jnp.sum(pf * pf, axis=-1)[:, None, :]
    cross = jnp.einsum("cqd,cpd->cqp", qf, pf, preferred_element_type=jnp.float32)
    d2 = q2 + p2 - 2.0 * cross
    _, idx = jax.lax.top_k(-d2, min(50, pools.shape[1]))
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

    pool_emb = jnp.take(catalog_embeddings, jnp.asarray(pool_rows), axis=0)
    top_idx = np.asarray(_batched_topk_50(jnp.asarray(queries), pool_emb))

    n_valid = valid.sum()
    out = {}
    for k in ks:
        hits = (top_idx[:, :, :k] == gt[:, :, None]).any(axis=-1) & valid
        out[f"recall@{k}"] = float(hits.sum()) / max(int(n_valid), 1)
    return out
