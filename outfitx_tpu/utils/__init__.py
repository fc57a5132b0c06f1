"""Utility functions mirroring the reference's src/utils/model_utils.py API
(:8-48) so migrating code finds familiar names. `freeze_model` becomes
`freeze` (stop_gradient — JAX has no in-place requires_grad); 'sum'
aggregation actually works here (the reference advertises but raises on it,
model_utils.py:44-45)."""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp


def freeze(tree):
    """Gradient-stop a parameter pytree (reference freeze_model :8-12)."""
    return jax.lax.stop_gradient(tree)


def mean_pooling(token_states: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Attention-mask-weighted mean over tokens (reference :15-24)."""
    w = attention_mask.astype(token_states.dtype)[..., None]
    return jnp.sum(token_states * w, axis=-2) / jnp.maximum(
        jnp.sum(w, axis=-2), 1e-9
    )


def aggregate_embeddings(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    aggregation_method: str = "concat",
) -> jax.Array:
    """Cross-modal fusion (reference :26-48)."""
    if aggregation_method == "concat":
        return jnp.concatenate([image_embeddings, text_embeddings], axis=-1)
    if aggregation_method == "mean":
        return 0.5 * (image_embeddings + text_embeddings)
    if aggregation_method == "sum":
        return image_embeddings + text_embeddings
    raise ValueError(f"aggregation_method {aggregation_method!r}")


def flatten_seq_to_one_dim(nested: Iterable) -> list:
    """Flatten one nesting level (reference :47-48 flattens (B, L) lists)."""
    return [x for seq in nested for x in seq]
