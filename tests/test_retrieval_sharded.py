"""Mesh-sharded retrieval == single-device retrieval (8 fake devices)."""

import jax.numpy as jnp
import numpy as np
import pytest

from outfitx_tpu.core.mesh import MeshSpec, make_mesh
from outfitx_tpu.ops.quantization import quantize_catalog, retrieve_quantized
from outfitx_tpu.ops.retrieval import retrieve
from outfitx_tpu.ops.retrieval_sharded import (
    catalog_row_sharding,
    pad_rows_to_shards,
    retrieve_quantized_sharded,
    retrieve_sharded,
)

pytestmark = pytest.mark.usefixtures("rng")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshSpec(data=8, model=1))


def _pool(rng, n, d):
    # distinct continuous values => no ties, so exact comparisons are
    # permutation-free
    return rng.standard_normal((n, d)).astype(np.float32)


def _padded(x, n_shards):
    n_pad = pad_rows_to_shards(x.shape[0], n_shards)
    return np.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))


class TestDenseSharded:
    def test_matches_single_device(self, rng, mesh):
        import jax

        n, d, q, k = 777, 64, 16, 10  # ragged: pads to 8 x 98 = 784
        pool = _pool(rng, n, d)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        d_ref, i_ref = retrieve(jnp.asarray(queries), jnp.asarray(pool), k)
        padded = jax.device_put(_padded(pool, 8), catalog_row_sharding(mesh))
        d_sh, i_sh = retrieve_sharded(
            jnp.asarray(queries), padded, k, mesh=mesh, n_rows=n
        )
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))
        np.testing.assert_allclose(
            np.asarray(d_ref), np.asarray(d_sh), rtol=1e-5, atol=1e-5
        )
        # padded rows (global ids >= n) must never appear
        assert int(np.asarray(i_sh).max()) < n

    def test_exact_fit_no_padding(self, rng, mesh):
        n, d, k = 512, 32, 5
        pool = _pool(rng, n, d)
        queries = rng.standard_normal((4, d)).astype(np.float32)
        d_ref, i_ref = retrieve(jnp.asarray(queries), jnp.asarray(pool), k)
        d_sh, i_sh = retrieve_sharded(
            jnp.asarray(queries), jnp.asarray(pool), k, mesh=mesh
        )
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))

    def test_bf16_pool(self, rng, mesh):
        """Row-sharded + bf16 storage compose (the serving headroom path)."""
        n, d, k = 512, 32, 5
        pool = jnp.asarray(_pool(rng, n, d), dtype=jnp.bfloat16)
        queries = rng.standard_normal((4, d)).astype(np.float32)
        d_ref, i_ref = retrieve(jnp.asarray(queries), pool, k)
        d_sh, i_sh = retrieve_sharded(jnp.asarray(queries), pool, k, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))

    def test_rejects_undivisible_and_big_k(self, rng, mesh):
        pool = jnp.asarray(_pool(rng, 100, 16))  # 100 % 8 != 0
        q = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
        with pytest.raises(ValueError, match="pad to 104"):
            retrieve_sharded(q, pool, 5, mesh=mesh)
        pool = jnp.asarray(_pool(rng, 64, 16))  # 8 rows/shard
        with pytest.raises(ValueError, match="exceeds shard rows"):
            retrieve_sharded(q, pool, 9, mesh=mesh)


class TestQuantizedSharded:
    def test_matches_single_device_quantized(self, rng, mesh):
        n, d, q, k = 777, 64, 8, 10
        pool = _pool(rng, n, d)
        queries = rng.standard_normal((q, d)).astype(np.float32)
        qc = quantize_catalog(jnp.asarray(pool))
        d_ref, i_ref = retrieve_quantized(jnp.asarray(queries), qc, k)
        qc_pad = quantize_catalog(jnp.asarray(_padded(pool, 8)))
        d_sh, i_sh = retrieve_quantized_sharded(
            jnp.asarray(queries), qc_pad, k, mesh=mesh, n_rows=n
        )
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))
        np.testing.assert_allclose(
            np.asarray(d_ref), np.asarray(d_sh), rtol=1e-5, atol=1e-5
        )
        assert int(np.asarray(i_sh).max()) < n

    def test_approx_local_topk_runs(self, rng, mesh):
        """approx=True (serving default) stays well-formed on the sharded
        path; CPU lowers approx_max_k to exact, so results match here."""
        n, d, k = 512, 32, 10
        pool = _pool(rng, n, d)
        queries = rng.standard_normal((4, d)).astype(np.float32)
        qc = quantize_catalog(jnp.asarray(pool))
        d_ref, i_ref = retrieve_quantized(jnp.asarray(queries), qc, k)
        d_sh, i_sh = retrieve_quantized_sharded(
            jnp.asarray(queries), qc, k, mesh=mesh, approx=True
        )
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))
