"""Int8 quantized retrieval: dequant exactness + ranking agreement with f32."""

import jax.numpy as jnp
import numpy as np

from outfitx_tpu.ops.quantization import quantize_catalog, retrieve_quantized
from outfitx_tpu.ops.retrieval import retrieve


def test_quantize_roundtrip_error_bounded(rng):
    x = rng.standard_normal((100, 64)).astype(np.float32)
    qc = quantize_catalog(jnp.asarray(x))
    deq = np.asarray(qc.values, dtype=np.float32) * np.asarray(qc.scales)[:, None]
    # max error per element <= scale/2
    err = np.abs(deq - x)
    bound = np.asarray(qc.scales)[:, None] * 0.5 + 1e-6
    assert (err <= bound).all()
    # precomputed squared norms match the dequantized rows exactly
    np.testing.assert_allclose(
        np.asarray(qc.sq_norms), (deq**2).sum(-1), rtol=1e-5
    )


def test_ranking_agrees_with_f32(rng):
    n, d, q = 2000, 128, 32
    # clustered data so that ranking is meaningful (not all-equidistant)
    centers = rng.standard_normal((20, d)).astype(np.float32)
    pool = centers[rng.integers(0, 20, n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    queries = pool[rng.integers(0, n, q)] + 0.1 * rng.standard_normal(
        (q, d)
    ).astype(np.float32)

    _, idx_f32 = retrieve(jnp.asarray(queries), jnp.asarray(pool), k=10)
    qc = quantize_catalog(jnp.asarray(pool))
    assert qc.values.dtype == jnp.int8
    _, idx_q = retrieve_quantized(jnp.asarray(queries), qc, k=10)

    # top-10 overlap must be high (quantization noise is tiny vs cluster gaps)
    overlaps = [
        len(set(np.asarray(idx_f32[i]).tolist())
            & set(np.asarray(idx_q[i]).tolist())) / 10
        for i in range(q)
    ]
    assert np.mean(overlaps) > 0.9, np.mean(overlaps)
    # top-1 matches almost always
    top1 = np.mean(np.asarray(idx_f32[:, 0]) == np.asarray(idx_q[:, 0]))
    assert top1 > 0.9, top1


def test_memory_is_quarter(rng):
    x = jnp.asarray(rng.standard_normal((1000, 256)).astype(np.float32))
    qc = quantize_catalog(x)
    assert qc.values.size == x.size  # int8: 1 byte/element vs 4


def test_quantized_chunked_matches_dense_quantized(rng):
    """Streaming int8 retrieval == materialized int8 retrieval, including a
    ragged final chunk (n not divisible by chunk_size) whose padded rows
    must never win."""
    from outfitx_tpu.ops.quantization import retrieve_quantized_chunked

    n, d, q, k = 777, 64, 8, 10  # 777 = 3 chunks of 256 + ragged 9
    pool = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    qc = quantize_catalog(jnp.asarray(pool))
    d_ref, i_ref = retrieve_quantized(jnp.asarray(queries), qc, k)
    for approx in (False, True):  # approx falls back to exact on CPU
        d_chk, i_chk = retrieve_quantized_chunked(
            jnp.asarray(queries), qc, k, chunk_size=256, approx=approx
        )
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_chk))
        np.testing.assert_allclose(
            np.asarray(d_ref), np.asarray(d_chk), rtol=1e-5, atol=1e-5
        )
    assert int(np.asarray(i_chk).max()) < n


def test_blocked_quantize_bit_identical(rng):
    """Blocked quantization (bounded-HBM path for serving-scale catalogs)
    is bit-identical to one-shot, including a ragged tail block (overlap
    rows dropped) and the n_rows trailing-PAD exclusion."""
    n, d = 777, 32
    x = jnp.asarray(rng.standard_normal((n + 1, d)).astype(np.float32))
    ref = quantize_catalog(x, n_rows=n)  # one-shot (n <= default block)
    for block in (256, 300, 777):  # ragged tail / overlap / exact fit
        qc = quantize_catalog(x, n_rows=n, block_rows=block)
        assert qc.values.shape == (n, d)
        np.testing.assert_array_equal(
            np.asarray(ref.values), np.asarray(qc.values)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.scales), np.asarray(qc.scales)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.sq_norms), np.asarray(qc.sq_norms)
        )


def test_chunked_dense_approx_matches_exact(rng):
    """retrieve_chunked honors approx (exact merge keeps incumbents)."""
    from outfitx_tpu.ops.retrieval import retrieve_chunked

    n, d, q, k = 500, 32, 4, 7
    pool = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    d_ref, i_ref = retrieve(jnp.asarray(queries), jnp.asarray(pool), k)
    d_chk, i_chk = retrieve_chunked(
        jnp.asarray(queries), jnp.asarray(pool), k, chunk_size=128, approx=True
    )
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_chk))
    np.testing.assert_allclose(
        np.asarray(d_ref), np.asarray(d_chk), rtol=1e-5, atol=1e-5
    )
