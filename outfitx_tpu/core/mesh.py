"""Device-mesh construction and sharding helpers.

The reference's distributed substrate is torch.distributed DDP over NCCL
(reference distributed_trainer.py:276-329, SURVEY.md 2.8). The TPU-native
replacement is a `jax.sharding.Mesh` with a ``data`` axis (batch / DP) and a
``model`` axis (tensor parallel); gradients are reduced by XLA-inserted
collectives over ICI rather than explicit NCCL all-reduce.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int
    model: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.model


def make_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh.

    Defaults to all local devices on the data axis (pure DP, the only
    parallelism the reference supports — SURVEY.md 2.8).
    """
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices), model=1)
    if spec.n_devices > len(devices):
        raise ValueError(
            f"mesh {spec} needs {spec.n_devices} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[: spec.n_devices]).reshape(
        spec.data, spec.model
    )
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, sharded on axis 0 over 'data'.

    Replaces the reference's per-rank DistributedSampler + H2D copies
    (compatibility_prediction_trainer.py:262-275, :59-62).
    """
    sh = batch_sharding(mesh)

    def _put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(_put, batch)


def shard_params(mesh: Mesh, params, specs):
    """Place a parameter pytree per its PartitionSpec tree (TP/FSDP layouts).

    Replaces the reference's DDP broadcast of replicated weights
    (distributed_trainer.py:318-329): here layout is explicit and XLA
    inserts the gathers/reductions each layout implies."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def constrain(x, spec: P):
    """`with_sharding_constraint` that is a no-op outside a mesh context."""
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (ValueError, RuntimeError):
        return x
