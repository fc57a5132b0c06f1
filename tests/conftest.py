"""Test harness: force CPU backend with 8 fake devices so multi-chip SPMD
(data+model mesh) is exercised without TPU hardware — the JAX idiom the
reference has no equivalent of (SURVEY.md 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may import jax and register a TPU backend
# before this conftest runs; override at the config level too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from outfitx_tpu.core.config import (  # noqa: E402
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)


@pytest.fixture(scope="session")
def tiny_cfg() -> OutfitXConfig:
    """A small config (d=64, 2 layers) for fast CPU tests."""
    return OutfitXConfig(
        item_encoder=ItemEncoderConfig(encoder_type="siglip", dim_per_modality=32),
        transformer=TransformerConfig(
            n_heads=4, d_ffn=96, n_layers=2, dropout=0.3
        ),
        max_outfit_len=8,
        compute_dtype="float32",  # deterministic CPU numerics in tests
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
