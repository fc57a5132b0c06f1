"""Hardware-RNG dropout key policy (core/rng.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.core.rng import fast_dropout_key, fast_prng_enabled


def test_default_on_returns_rbg_key(monkeypatch):
    monkeypatch.delenv("OUTFITX_FAST_PRNG", raising=False)
    assert fast_prng_enabled()
    k = fast_dropout_key(jax.random.PRNGKey(7))
    assert jnp.issubdtype(k.dtype, jax.dtypes.prng_key)
    # derivation + masks work down the usual dropout call chain
    sub = jax.random.split(jax.random.fold_in(k, 3), 4)
    keep = jax.random.bernoulli(sub[0], 0.7, (1000,))
    assert 0.6 < float(jnp.mean(keep)) < 0.8


def test_deterministic_per_source_key(monkeypatch):
    monkeypatch.delenv("OUTFITX_FAST_PRNG", raising=False)
    a = jax.random.bernoulli(fast_dropout_key(jax.random.PRNGKey(0)), 0.5, (64,))
    b = jax.random.bernoulli(fast_dropout_key(jax.random.PRNGKey(0)), 0.5, (64,))
    c = jax.random.bernoulli(fast_dropout_key(jax.random.PRNGKey(1)), 0.5, (64,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_opt_out_keeps_threefry(monkeypatch):
    monkeypatch.setenv("OUTFITX_FAST_PRNG", "0")
    src = jax.random.PRNGKey(7)
    k = fast_dropout_key(src)
    np.testing.assert_array_equal(np.asarray(k), np.asarray(src))


def test_keep_mask_rate_and_scale(monkeypatch):
    from outfitx_tpu.core.rng import keep_mask

    key = jax.random.PRNGKey(0)
    # default: uint8-bit thresholding with the ACTUAL keep prob returned
    monkeypatch.delenv("OUTFITX_DROPOUT_BITS", raising=False)
    keep, q = keep_mask(key, 0.3, (200_000,))
    assert q == 179 / 256
    assert abs(float(jnp.mean(keep)) - q) < 0.005
    # exact mode: torch-exact bernoulli rate
    monkeypatch.setenv("OUTFITX_DROPOUT_BITS", "exact")
    keep, q = keep_mask(key, 0.3, (200_000,))
    assert q == 0.7
    assert abs(float(jnp.mean(keep)) - 0.7) < 0.005


def test_keep_mask_tiny_and_extreme_rates(monkeypatch):
    """Rates whose uint8 threshold would wrap (t>=256) or degenerate (t<=0)
    must fall through to exact bernoulli — regression for the all-dropped
    silent-zeroing bug at rates in (0, 1/512)."""
    from outfitx_tpu.core.rng import keep_mask

    key = jax.random.PRNGKey(0)
    monkeypatch.delenv("OUTFITX_DROPOUT_BITS", raising=False)
    # tiny nonzero rate: nearly everything must be KEPT, and q matches rate
    keep, q = keep_mask(key, 1e-3, (200_000,))
    assert q == 1.0 - 1e-3
    assert float(jnp.mean(keep)) > 0.99
    # rate ~1: nearly everything dropped, q tiny but correct (no wrap to keep-all)
    keep, q = keep_mask(key, 1.0 - 1e-3, (200_000,))
    assert abs(q - 1e-3) < 1e-12
    assert float(jnp.mean(keep)) < 0.01
    # rate 0 exactly: keep everything
    keep, q = keep_mask(key, 0.0, (1024,))
    assert q == 1.0
    assert bool(jnp.all(keep))


def test_apply_env_flags_respects_opt_out(monkeypatch):
    """OUTFITX_FAST_PRNG=0 must NOT flip the global default impl to rbg."""
    import jax as _jax

    from outfitx_tpu.core import runtime

    calls = []
    monkeypatch.setattr(runtime, "enable_fast_prng", lambda: calls.append(1))
    monkeypatch.setenv("OUTFITX_FAST_PRNG", "0")
    runtime.apply_env_flags()
    assert calls == []
    monkeypatch.setenv("OUTFITX_FAST_PRNG", "1")
    runtime.apply_env_flags()
    assert calls == [1]
    monkeypatch.delenv("OUTFITX_FAST_PRNG", raising=False)
    runtime.apply_env_flags()
    assert calls == [1]
    del _jax


def test_keep_mask_deterministic_per_key():
    from outfitx_tpu.core.rng import keep_mask

    a, _ = keep_mask(jax.random.PRNGKey(5), 0.3, (1024,))
    b, _ = keep_mask(jax.random.PRNGKey(5), 0.3, (1024,))
    c, _ = keep_mask(jax.random.PRNGKey(6), 0.3, (1024,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
