"""Dropout RNG policy.

Dropout is the single biggest non-matmul cost of the flagship train step:
~1.6B bernoulli draws per microbatch (three dropout sites x 6 layers at
B=3072, d=1536, ffn=2024). With JAX's default threefry generator those draws
are VPU-bound (measured ~20% of the 517 ms step, BENCHMARKS.md); the TPU's
hardware RNG ('rbg' implementation, XLA RngBitGenerator) generates the same
mask volume at a fraction of the cost.

`fast_dropout_key` converts a threefry key into an rbg-typed key at the top
of the jitted train step: key *derivation* (fold_in/split down the layer
stack) stays threefry-quality — `jax.random.bits` of the source key seeds the
rbg key, and the rbg impl itself derives subkeys soundly — while mask *bit
generation* (the expensive part) runs on the hardware generator. Checkpointed
state keeps the raw threefry key, so resume semantics and the on-disk format
are unchanged.

Default ON; set OUTFITX_FAST_PRNG=0 to force threefry everywhere (bitwise
reproducibility of dropout masks across backends).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def fast_prng_enabled() -> bool:
    return os.environ.get("OUTFITX_FAST_PRNG", "1") != "0"


def fast_dropout_key(key: jax.Array) -> jax.Array:
    """Derive an rbg-typed key from ``key`` (hardware-RNG mask bits), or
    return ``key`` unchanged when OUTFITX_FAST_PRNG=0."""
    if not fast_prng_enabled():
        return key
    data = jax.random.bits(key, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl="rbg")


def keep_mask(key: jax.Array, rate: float, shape) -> tuple:
    """(keep_mask bool, actual keep probability) for dropout at ``rate``.

    Default (OUTFITX_DROPOUT_BITS=8): threshold uint8 random bits — 4x
    fewer RNG words than bernoulli's 32-bit draws (measured 470 -> 440 ms
    on the flagship train step). The keep probability quantizes to t/256
    (rate 0.3 -> keep 179/256 = 0.69921875 instead of 0.7, a 0.08% rate
    shift); the returned probability is the *actual* one so the 1/q
    inverted-dropout scale stays unbiased.

    OUTFITX_DROPOUT_BITS=exact: torch-exact ``bernoulli(1 - rate)``.
    """
    if os.environ.get("OUTFITX_DROPOUT_BITS", "8") == "8":
        t = int(round((1.0 - rate) * 256))
        # uint8 `bits < t` wraps for t outside [0, 255] (t=256 evaluates
        # all-False, silently zeroing every activation for rates in
        # (0, 1/512)); at the corners the quantized threshold is also
        # degenerate (keep-all / drop-all), so fall through to the exact
        # bernoulli branch there.
        if 0 < t < 256:
            return jax.random.bits(key, shape, jnp.uint8) < t, t / 256.0
    return jax.random.bernoulli(key, 1.0 - rate, shape), 1.0 - rate
