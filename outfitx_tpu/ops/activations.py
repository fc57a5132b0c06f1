"""Activations. The reference uses F.mish in the set transformer
(reference transformer_config.py:18)."""

from __future__ import annotations

import jax.numpy as jnp
import jax


def mish(x):
    """mish(x) = x * tanh(softplus(x)); numerically-stable softplus."""
    return x * jnp.tanh(jax.nn.softplus(x))
