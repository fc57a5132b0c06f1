"""Set-wise ranking loss for CIR (reference src/losses/set_wise_ranking_loss.py:5-37).

L_all: hinge(d_pos - d_neg_i + margin) summed over valid negatives, divided by
the *global* valid-negative count (not per-row). L_hard: hinge against the
nearest valid negative (padded negatives -> +inf), averaged over the batch.
Total = L_all + L_hard. CIR training uses margin=2
(complementary_item_retrieval_trainer.py:459-460).
"""

from __future__ import annotations

import jax.numpy as jnp

_PAIR_EPS = 1e-6  # torch F.pairwise_distance default eps


def set_wise_ranking_loss(
    positive: jnp.ndarray,  # (B, D) ground-truth target embedding
    predicted: jnp.ndarray,  # (B, D) model output
    negatives: jnp.ndarray,  # (B, K, D)
    negative_mask: jnp.ndarray,  # (B, K) bool, True = pad/invalid
    *,
    margin: float = 2.0,
) -> jnp.ndarray:
    pos = positive.astype(jnp.float32)
    pred = predicted.astype(jnp.float32)
    negs = negatives.astype(jnp.float32)

    # torch F.pairwise_distance adds eps to the difference before the norm.
    pos_dist = jnp.linalg.norm(pred - pos + _PAIR_EPS, axis=-1)  # (B,)
    neg_dists = jnp.linalg.norm(pred[:, None, :] - negs, axis=-1)  # (B,K)

    valid = (~negative_mask).astype(jnp.float32)  # (B,K)
    valid_count = jnp.maximum(jnp.sum(valid), 1.0)

    hinge = jnp.maximum(pos_dist[:, None] - neg_dists + margin, 0.0)
    l_all = jnp.sum(hinge * valid) / valid_count

    neg_inf = jnp.where(negative_mask, jnp.inf, neg_dists)
    hardest = jnp.min(neg_inf, axis=1)  # (B,)
    l_hard = jnp.mean(jnp.maximum(pos_dist - hardest + margin, 0.0))

    return l_all + l_hard
