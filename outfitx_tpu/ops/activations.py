"""Activations. The reference uses F.mish in the set transformer
(reference transformer_config.py:18)."""

from __future__ import annotations

import jax.numpy as jnp
import jax


def mish(x):
    """mish(x) = x * tanh(softplus(x)); numerically-stable softplus."""
    return x * jnp.tanh(jax.nn.softplus(x))


def resolve_activation(name: str):
    """Map TransformerConfig.activation to a callable (torch
    TransformerEncoderLayer accepts relu/gelu/callable; the reference
    passes F.mish)."""
    table = {"mish": mish, "relu": jax.nn.relu, "gelu": jax.nn.gelu}
    try:
        return table[name]
    except KeyError:
        raise ValueError(
            f"unknown activation {name!r}; expected one of {sorted(table)}"
        ) from None
