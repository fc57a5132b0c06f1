"""Shared helpers for the Pallas kernel set."""

from __future__ import annotations

import functools
import os

import jax


@functools.cache
def use_interpret() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (CPU tests/CI)."""
    if os.environ.get("OUTFITX_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
