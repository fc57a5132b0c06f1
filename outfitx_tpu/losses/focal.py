"""Focal loss on logits (reference src/losses/focal_loss.py:7-42).

CP training uses alpha=0.75, gamma=2 (reference
compatibility_prediction_trainer.py:370)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    alpha: float = 0.75,
    gamma: float = 2.0,
    reduction: str = "mean",
) -> jax.Array:
    """Binary focal loss: BCE-with-logits weighted by (1 - p_t)^gamma and
    alpha_t = alpha*y + (1-alpha)*(1-y)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    # Stable BCE with logits: max(x,0) - x*y + log1p(exp(-|x|))
    ce = (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    p = jax.nn.sigmoid(logits)
    p_t = p * labels + (1.0 - p) * (1.0 - labels)
    loss = ce * jnp.power(1.0 - p_t, gamma)
    if alpha >= 0:
        alpha_t = alpha * labels + (1.0 - alpha) * (1.0 - labels)
        loss = alpha_t * loss
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.mean(loss)
