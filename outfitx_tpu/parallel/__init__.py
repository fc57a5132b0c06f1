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


def gather_global(tree):
    """Host-side value of (a pytree of) possibly multi-process-sharded arrays.

    Single-process (the common case, incl. the 8-fake-device test mesh):
    plain ``jax.device_get`` — the one process addresses every shard.
    Multi-process SPMD (``jax.distributed.initialize`` ran): each host
    addresses only its local shards, so a bare ``device_get`` of a
    globally-sharded metric array would fail or silently drop remote data;
    ``multihost_utils.process_allgather(tiled=True)`` reassembles the full
    global value on every host. This replaces the reference's explicit
    ``dist.all_gather`` of prediction tensors for epoch metrics
    (compatibility_prediction_trainer.py:384-399).
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


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
