"""Parallelism surface: meshes, shardings, and multi-host init.

One import point for everything SPMD (implementation lives in core.mesh and
the model's partition specs):

- ``make_mesh(MeshSpec(data, model))`` — 2-D device mesh (DP x TP)
- ``shard_params`` / ``shard_batch`` / ``constrain`` — placement helpers
- ``OutfitXModel.param_partition_specs(fsdp=...)`` — Megatron TP + ZeRO-3
- ``maybe_initialize_distributed()`` — multi-host bring-up

The reference's parallelism was DDP-only over NCCL
(distributed_trainer.py:276-329; SURVEY.md 2.8); here DP, TP, and FSDP are
all expressed as shardings over one mesh and XLA inserts the collectives.
"""

from __future__ import annotations

import os

from outfitx_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    batch_sharding,
    constrain,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)


def maybe_initialize_distributed() -> bool:
    """Multi-host SPMD bring-up: `jax.distributed.initialize()` when the
    standard coordinator env vars are present (the moral equivalent of the
    reference's torchrun env:// rendezvous, distributed_trainer.py:630-639;
    single-host runs are a no-op)."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        return True
    return False
