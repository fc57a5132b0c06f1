"""Train state: a single pytree carried through the jitted train step."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar, optimizer steps taken
    params: Any
    opt_state: optax.OptState
    rng: jax.Array  # threaded dropout key

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
        )
