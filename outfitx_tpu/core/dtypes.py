"""Dtype policy: f32 parameters, bf16 compute.

Replaces the reference's fp16 autocast + GradScaler (SURVEY.md 5: "No
GradScaler on TPU" — bf16's exponent range makes loss scaling unnecessary;
accumulation and clipping semantics are preserved in the optimizer).
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def resolve(name: str):
    return _DTYPES[name]


def cast_compute(tree, compute_dtype=jnp.bfloat16):
    """Cast floating-point leaves to the compute dtype (params stay f32 in the
    optimizer state; this cast happens on entry to the forward pass)."""
    import jax

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(compute_dtype)
        return x

    return jax.tree.map(_cast, tree)
