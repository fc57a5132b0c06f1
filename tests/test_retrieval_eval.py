"""recall_over_pools vs a brute-force reference implementation."""

import jax.numpy as jnp
import numpy as np

from outfitx_tpu.data.sampler import CandidatePools
from outfitx_tpu.evalm.retrieval_eval import recall_over_pools


def test_matches_bruteforce(rng):
    n, d = 200, 16
    emb = rng.standard_normal((n + 1, d)).astype(np.float32)
    emb[-1] = 0
    cats = rng.integers(0, 3, n).astype(np.int32)
    pools = CandidatePools(
        pools={
            c: np.flatnonzero(cats == c).astype(np.int32)[:64]
            for c in range(3)
        },
        pool_size=64,
    )
    # pad pools to equal size (builder guarantees this; done by resize here)
    pools.pools = {c: np.resize(v, 64) for c, v in pools.pools.items()}

    q = 30
    pos_rows = np.asarray(
        [pools.pools[int(c)][rng.integers(0, 64)] for c in rng.integers(0, 3, q)],
        dtype=np.int32,
    )
    pos_cats = cats[pos_rows]
    y_hats = emb[pos_rows] + 0.4 * rng.standard_normal((q, d)).astype(np.float32)

    got = recall_over_pools(
        y_hats, pos_rows, pos_cats, pools, jnp.asarray(emb), ks=(1, 5, 10)
    )

    # brute force
    hits = {k: 0 for k in (1, 5, 10)}
    for i in range(q):
        pool = pools.pools[int(pos_cats[i])]
        dists = ((emb[pool] - y_hats[i]) ** 2).sum(-1)
        order = np.argsort(dists, kind="stable")
        gt_positions = np.flatnonzero(pool == pos_rows[i])
        for k in hits:
            if np.isin(order[:k], gt_positions).any():
                hits[k] += 1
    for k in hits:
        np.testing.assert_allclose(got[f"recall@{k}"], hits[k] / q, atol=1e-6)


def test_unknown_category_queries_ignored(rng):
    emb = rng.standard_normal((50, 8)).astype(np.float32)
    pools = CandidatePools(pools={0: np.arange(20, dtype=np.int32)}, pool_size=20)
    y = emb[:4]
    pos = np.arange(4, dtype=np.int32)
    cats = np.asarray([0, 0, 7, 7], dtype=np.int32)  # 7 has no pool
    out = recall_over_pools(y, pos, cats, pools, jnp.asarray(emb), ks=(1,))
    # only the two category-0 queries count; both are exact matches
    np.testing.assert_allclose(out["recall@1"], 1.0)
