import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.utils import (
    aggregate_embeddings,
    flatten_seq_to_one_dim,
    freeze,
    mean_pooling,
)


def test_freeze_stops_gradients():
    p = {"w": jnp.ones((3,))}
    g = jax.grad(lambda p: jnp.sum(freeze(p)["w"] ** 2))(p)
    assert float(jnp.abs(g["w"]).sum()) == 0.0


def test_mean_pooling_ignores_masked(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 8)), dtype=jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]])
    got = mean_pooling(x, mask)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(x[0, :2].mean(0)), atol=1e-6
    )


def test_aggregations(rng):
    a = jnp.asarray(rng.standard_normal((2, 4)), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 4)), dtype=jnp.float32)
    assert aggregate_embeddings(a, b, "concat").shape == (2, 8)
    np.testing.assert_allclose(
        np.asarray(aggregate_embeddings(a, b, "sum")), np.asarray(a + b)
    )
    np.testing.assert_allclose(
        np.asarray(aggregate_embeddings(a, b, "mean")), np.asarray((a + b) / 2)
    )


def test_flatten():
    assert flatten_seq_to_one_dim([[1, 2], [3]]) == [1, 2, 3]
