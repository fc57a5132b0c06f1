"""Golden tests for the Pallas kernel set vs XLA reference implementations.

Off-TPU the Pallas kernels run in interpreter mode (ops/common.py), so these
tests validate kernel logic itself, not just the XLA fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outfitx_tpu.ops import layer_norm, masked_mha, mish, pairwise_l2
from outfitx_tpu.ops.retrieval import fitb_pick, retrieve, topk_smallest


def test_mish_matches_torch():
    import torch

    x = np.linspace(-6, 6, 101, dtype=np.float32)
    got = np.asarray(mish(jnp.asarray(x)))
    want = torch.nn.functional.mish(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


class TestLayerNorm:
    @pytest.mark.parametrize("shape", [(4, 64), (3, 7, 96), (1, 128)])
    def test_pallas_matches_xla(self, shape, rng):
        x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
        d = shape[-1]
        scale = jnp.asarray(rng.standard_normal(d), dtype=jnp.float32)
        bias = jnp.asarray(rng.standard_normal(d), dtype=jnp.float32)
        got = layer_norm(x, scale, bias, impl="pallas")
        want = layer_norm(x, scale, bias, impl="xla")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_matches_torch(self, rng):
        import torch

        x = rng.standard_normal((5, 48)).astype(np.float32)
        scale = rng.standard_normal(48).astype(np.float32)
        bias = rng.standard_normal(48).astype(np.float32)
        want = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (48,), torch.from_numpy(scale),
            torch.from_numpy(bias),
        ).numpy()
        got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), impl="pallas"))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_grad_matches_xla(self, rng):
        x = jnp.asarray(rng.standard_normal((6, 32)), dtype=jnp.float32)
        scale = jnp.ones((32,))
        bias = jnp.zeros((32,))

        def loss(impl, x, s, b):
            return jnp.sum(jnp.sin(layer_norm(x, s, b, impl=impl)))

        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(x, scale, bias)
        gx = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


class TestMaskedMHA:
    def _inputs(self, rng, b=5, h=4, l=9, dh=16):
        q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        lengths = rng.integers(1, l + 1, size=b)
        mask = np.zeros((b, l), dtype=bool)
        for i, n in enumerate(lengths):
            mask[i, n:] = True
        return q, k, v, jnp.asarray(mask)

    def test_pallas_matches_xla(self, rng):
        q, k, v, mask = self._inputs(rng)
        got = masked_mha(q, k, v, mask, impl="pallas")
        want = masked_mha(q, k, v, mask, impl="xla")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_matches_torch_sdpa(self, rng):
        import torch

        q, k, v, mask = self._inputs(rng)
        tq, tk, tv = (torch.from_numpy(np.asarray(t)) for t in (q, k, v))
        tmask = torch.from_numpy(np.asarray(mask))  # True = pad
        attn_mask = ~tmask[:, None, None, :]  # SDPA: True = attend
        want = torch.nn.functional.scaled_dot_product_attention(
            tq, tk, tv, attn_mask=attn_mask
        ).numpy()
        got = np.asarray(masked_mha(q, k, v, mask, impl="xla"))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_masked_keys_have_no_influence(self, rng):
        q, k, v, mask = self._inputs(rng)
        # Perturb fully-masked key/value rows; output must not change.
        big = jnp.where(mask[:, None, :, None], 1e3, 0.0)
        got0 = masked_mha(q, k, v, mask, impl="pallas")
        got1 = masked_mha(q, k + big, v + big, mask, impl="pallas")
        np.testing.assert_allclose(np.asarray(got0), np.asarray(got1), atol=1e-5)

    def test_grad_flows(self, rng):
        q, k, v, mask = self._inputs(rng, b=2, l=5)

        def loss(q, k, v):
            return jnp.sum(masked_mha(q, k, v, mask, impl="pallas") ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref = jax.grad(
            lambda q, k, v: jnp.sum(masked_mha(q, k, v, mask, impl="xla") ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(grads, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_pallas_bwd_kernel_matches_xla_chain(self, rng, monkeypatch):
        """The fused Pallas backward kernel and the XLA-recompute backward
        (OUTFITX_MHA_BWD=xla escape hatch) must agree, including through the
        batch-padding path (b not a multiple of the backward tile)."""
        q, k, v, mask = self._inputs(rng, b=37, h=2, l=9, dh=16)
        g = jnp.asarray(
            np.random.default_rng(1).standard_normal(q.shape), dtype=q.dtype
        )

        def grads_with(route):
            monkeypatch.setenv("OUTFITX_MHA_BWD", route)
            _, vjp = jax.vjp(
                lambda q, k, v: masked_mha(q, k, v, mask, impl="pallas"),
                q, k, v,
            )
            return vjp(g)

        got = grads_with("pallas")
        want = grads_with("xla")
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )

    def test_masked_key_grads_are_zero(self, rng):
        q, k, v, mask = self._inputs(rng)

        def loss(q, k, v):
            return jnp.sum(masked_mha(q, k, v, mask, impl="pallas") ** 2)

        _, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        m = np.asarray(mask)[:, None, :, None]
        assert np.all(np.asarray(dk)[np.broadcast_to(m, dk.shape)] == 0)
        assert np.all(np.asarray(dv)[np.broadcast_to(m, dv.shape)] == 0)

    def test_pallas_bwd_bf16(self, rng):
        q, k, v, mask = self._inputs(rng, b=4, l=7)
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))

        def loss(impl):
            def f(q, k, v):
                return jnp.sum(
                    masked_mha(q, k, v, mask, impl=impl).astype(jnp.float32) ** 2
                )
            return f

        got = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(got, want):
            assert a.dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32),
                np.asarray(b, dtype=np.float32),
                atol=0.15, rtol=0.1,
            )


class TestPackedMHA:
    """Outfit packing (pack outfits along the sequence dim with a
    compile-time block-diagonal mask) must be numerically equivalent to
    the unpacked kernel — cross-outfit scores underflow to exactly 0.0
    through the f32 softmax (ops/attention._mha_pallas_packed)."""

    def _inputs(self, rng, b, h=4, l=17, dh=32, dtype=jnp.float32):
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=dtype)
            for _ in range(3)
        )
        mask = jnp.asarray(
            np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
        )
        return q, k, v, mask

    @pytest.mark.parametrize("b", [37, 23])  # multiple of pack and not
    def test_forward_matches_reference(self, rng, b):
        from outfitx_tpu.ops.attention import (
            _mha_pallas_packed, _mha_reference,
        )

        q, k, v, mask = self._inputs(rng, b)
        got = _mha_pallas_packed(q, k, v, mask, 7)
        want = _mha_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_forward_bf16_bitwise_vs_unpacked(self, rng):
        # The packed kernel's extra contraction terms are exact 0.0 adds,
        # so at matching dtypes it reproduces the unpacked kernel
        # bitwise in interpret mode.
        from outfitx_tpu.ops.attention import _mha_pallas, _mha_pallas_packed

        q, k, v, mask = self._inputs(rng, 14, dtype=jnp.bfloat16)
        got = _mha_pallas_packed(q, k, v, mask, 7)
        want = _mha_pallas(q, k, v, mask)
        assert got.dtype == want.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )

    @pytest.mark.parametrize("bwd", ["pallas", "xla"])
    def test_grads_match_reference(self, rng, bwd, monkeypatch):
        from outfitx_tpu.ops.attention import (
            _mha_pallas_packed, _mha_reference,
        )

        monkeypatch.setenv("OUTFITX_MHA_BWD", bwd)
        q, k, v, mask = self._inputs(rng, 23)

        def loss(fn):
            return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

        got = jax.grad(
            loss(lambda q, k, v: _mha_pallas_packed(q, k, v, mask, 7)),
            argnums=(0, 1, 2),
        )(q, k, v)
        want = jax.grad(
            loss(lambda q, k, v: _mha_reference(q, k, v, mask)),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )

    def test_pack_route_is_opt_in(self, rng, monkeypatch):
        # Packing measured NEGATIVE on v5e (probe_mha_pack.py) so the
        # default route must NOT pack; OUTFITX_MHA_PACK=auto opts in.
        from outfitx_tpu.ops import attention as attn_mod

        q, k, v, mask = self._inputs(rng, 21)
        calls = {}
        orig = attn_mod._mha_pallas_packed

        def spy(q, k, v, m, pack):
            calls["pack"] = pack
            return orig(q, k, v, m, pack)

        monkeypatch.setattr(attn_mod, "_mha_pallas_packed", spy)
        attn_mod.masked_mha(q, k, v, mask, impl="pallas")
        assert "pack" not in calls
        monkeypatch.setenv("OUTFITX_MHA_PACK", "auto")
        out = attn_mod.masked_mha(q, k, v, mask, impl="pallas")
        assert calls["pack"] == 128 // 17
        want = attn_mod._mha_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    @pytest.mark.parametrize("env", ["off", "", "none"])
    def test_pack_env_garbage_is_off_not_crash(self, rng, monkeypatch, env):
        # A user disabling the opt-in with OUTFITX_MHA_PACK=off (or a
        # shell leaving it empty) must fall back to the unpacked route,
        # not ValueError inside every forward pass.
        from outfitx_tpu.ops import attention as attn_mod

        q, k, v, mask = self._inputs(rng, 21)
        monkeypatch.setenv("OUTFITX_MHA_PACK", env)
        out = attn_mod.masked_mha(q, k, v, mask, impl="pallas")
        want = attn_mod._mha_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_masked_key_grads_are_zero(self, rng):
        from outfitx_tpu.ops.attention import _mha_pallas_packed

        q, k, v, mask = self._inputs(rng, 14)

        def loss(q, k, v):
            return jnp.sum(_mha_pallas_packed(q, k, v, mask, 7) ** 2)

        _, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        m = np.broadcast_to(np.asarray(mask)[:, None, :, None], dk.shape)
        assert np.all(np.asarray(dk)[m] == 0)
        assert np.all(np.asarray(dv)[m] == 0)


class TestRetrieval:
    def test_pairwise_l2_matches_torch_cdist(self, rng):
        import torch

        q = rng.standard_normal((7, 24)).astype(np.float32)
        p = rng.standard_normal((50, 24)).astype(np.float32)
        want = torch.cdist(torch.from_numpy(q), torch.from_numpy(p)).numpy()
        got = np.asarray(pairwise_l2(jnp.asarray(q), jnp.asarray(p)))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_retrieve_topk(self, rng):
        q = rng.standard_normal((4, 16)).astype(np.float32)
        p = rng.standard_normal((100, 16)).astype(np.float32)
        d2, idx = retrieve(jnp.asarray(q), jnp.asarray(p), k=10)
        # brute force
        bf = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        want_idx = np.argsort(bf, axis=1, kind="stable")[:, :10]
        want_d = np.take_along_axis(bf, want_idx, axis=1)
        np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), np.sort(want_d, axis=1), atol=1e-3, rtol=1e-3)
        # Same set of retrieved ids (order may differ on near-ties).
        for r_got, r_want in zip(np.asarray(idx), want_idx):
            assert set(r_got.tolist()) == set(r_want.tolist())

    def test_topk_smallest(self):
        d = jnp.asarray([[3.0, 1.0, 2.0, 0.5]])
        vals, idx = topk_smallest(d, 2)
        np.testing.assert_array_equal(np.asarray(idx), [[3, 1]])
        np.testing.assert_allclose(np.asarray(vals), [[0.5, 1.0]])

    def test_fitb_pick(self, rng):
        q = rng.standard_normal((3, 8)).astype(np.float32)
        c = rng.standard_normal((3, 4, 8)).astype(np.float32)
        got = np.asarray(fitb_pick(jnp.asarray(q), jnp.asarray(c)))
        want = np.argmin(((c - q[:, None, :]) ** 2).sum(-1), axis=1)
        np.testing.assert_array_equal(got, want)


class TestChunkedRetrieval:
    def test_matches_dense_retrieve(self, rng):
        from outfitx_tpu.ops.retrieval import retrieve, retrieve_chunked

        q = jnp.asarray(rng.standard_normal((6, 24)), dtype=jnp.float32)
        pool = jnp.asarray(rng.standard_normal((1000, 24)), dtype=jnp.float32)
        d_dense, i_dense = retrieve(q, pool, k=12)
        # chunk size that does NOT divide the pool exercises padding
        d_chunk, i_chunk = retrieve_chunked(q, pool, k=12, chunk_size=192)
        np.testing.assert_allclose(
            np.sort(np.asarray(d_chunk), axis=1),
            np.sort(np.asarray(d_dense), axis=1),
            atol=1e-3, rtol=1e-3,
        )
        for a, b in zip(np.asarray(i_chunk), np.asarray(i_dense)):
            assert set(a.tolist()) == set(b.tolist())

    def test_k_larger_than_pool(self, rng):
        from outfitx_tpu.ops.retrieval import retrieve_chunked

        q = jnp.asarray(rng.standard_normal((2, 8)), dtype=jnp.float32)
        pool = jnp.asarray(rng.standard_normal((5, 8)), dtype=jnp.float32)
        d, i = retrieve_chunked(q, pool, k=10, chunk_size=4)
        assert d.shape == (2, 5)  # clamped to pool size
        assert set(np.asarray(i)[0].tolist()) == set(range(5))


class TestApproxTopK:
    """Serving-path approximate top-k (lax.approx_max_k): same contract as
    the exact path; recall vs exact is ~1.0 on CPU and >=0.99 on TPU at
    serving scale (scripts/bench_retrieval_topk.py)."""

    def test_approx_matches_exact_contract(self):
        import numpy as np

        from outfitx_tpu.ops.retrieval import retrieve

        rng = np.random.default_rng(3)
        pool = jnp.asarray(rng.standard_normal((500, 64)).astype(np.float32))
        qs = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
        de, ie = retrieve(qs, pool, 10)
        da, ia = retrieve(qs, pool, 10, approx=True)
        assert ia.shape == (16, 10) and da.shape == (16, 10)
        overlap = np.mean(
            [len(set(a) & set(b)) / 10
             for a, b in zip(np.asarray(ie), np.asarray(ia))]
        )
        assert overlap >= 0.9
        # distances are sorted ascending in both
        assert (np.diff(np.asarray(da), axis=1) >= -1e-6).all()

    def test_quantized_approx_route(self):
        import numpy as np

        from outfitx_tpu.ops.quantization import (
            quantize_catalog,
            retrieve_quantized,
        )

        rng = np.random.default_rng(4)
        pool = jnp.asarray(rng.standard_normal((400, 64)).astype(np.float32))
        qcat = quantize_catalog(pool)
        qs = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
        de, ie = retrieve_quantized(qs, qcat, 10)
        da, ia = retrieve_quantized(qs, qcat, 10, approx=True)
        overlap = np.mean(
            [len(set(a) & set(b)) / 10
             for a, b in zip(np.asarray(ie), np.asarray(ia))]
        )
        assert overlap >= 0.9


def test_flash_impl_falls_back_off_tpu(rng):
    """impl='flash' is TPU-only; off-TPU it must route to the XLA
    reference and still produce correct masked attention."""
    import numpy as np

    from outfitx_tpu.ops.attention import masked_mha

    b, h, l, dh = 2, 2, 40, 8
    q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
    mask = jnp.zeros((b, l), dtype=bool)
    got = masked_mha(q, k, v, mask, impl="flash")
    want = masked_mha(q, k, v, mask, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


class TestTowerPallasAttention:
    """The L=17-winning kernel applied at tower sequence lengths via
    lane-multiple padding with masked geometric keys (_mha_pallas_padded):
    forward and backward must match XLA exactly (interpret mode here; the
    compiled path is checked by scripts/tpu_smoke.py on hardware)."""

    @pytest.mark.parametrize("l", [50, 197])
    def test_padded_forward_matches_xla(self, rng, l):
        b, h, dh = 3, 2, 16
        q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        mask = jnp.zeros((b, l), dtype=bool)  # ViT: no semantic key mask
        got = masked_mha(q, k, v, mask, impl="pallas")
        want = masked_mha(q, k, v, mask, impl="xla")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_direct_kernel_text_shape_with_pad_mask(self, rng):
        """32 < l <= 128 routes the DIRECT (unpadded) kernel under
        impl='pallas'; real key-padding masks (text towers, L=64) must be
        honored exactly."""
        b, h, l, dh = 4, 2, 64, 16
        q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        lengths = rng.integers(5, l + 1, size=(b, 1))
        mask = jnp.asarray(np.arange(l)[None, :] >= lengths)
        got = masked_mha(q, k, v, mask, impl="pallas")
        want = masked_mha(q, k, v, mask, impl="xla")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_padded_grad_matches_xla(self, rng):
        b, h, l, dh = 2, 2, 50, 16
        q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        mask = jnp.zeros((b, l), dtype=bool)

        def loss(impl, *a):
            return jnp.sum(masked_mha(*a, mask, impl=impl) ** 2)

        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4
            )

    def test_tower_attn_env_routes(self, rng, monkeypatch):
        """OUTFITX_TOWER_ATTN=pallas routes ViT-shaped apply_encoder
        attention through the padded Pallas kernel with identical numerics."""
        from outfitx_tpu.models.towers.common import (
            apply_encoder,
            init_encoder_layers,
        )

        key = jax.random.PRNGKey(0)
        layers = init_encoder_layers(key, d=32, n_heads=4, d_mlp=64, n_layers=2)
        x = jnp.asarray(rng.standard_normal((2, 50, 32)), dtype=jnp.float32)
        monkeypatch.delenv("OUTFITX_TOWER_ATTN", raising=False)
        want = apply_encoder(layers, x, n_heads=4, act="quick_gelu")
        monkeypatch.setenv("OUTFITX_TOWER_ATTN", "pallas")
        got = apply_encoder(layers, x, n_heads=4, act="quick_gelu")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    @pytest.mark.parametrize(
        "s,causal,expect_block",
        [
            # Winning band from the 2026-08-18 on-chip study: non-causal,
            # sublane-aligned 32 < L <= 64 (siglip text L=64 is the user).
            (48, False, True),
            (64, False, True),
            # Losing shapes must fall through to the 'auto' decomposed
            # route: L not a sublane multiple (ViT-B/32 S=50 measured
            # 0.87x) and causal (CLIP text L=77 measured 0.82x).
            (50, False, False),
            (48, True, False),
        ],
    )
    def test_tower_attn_block_route(self, rng, monkeypatch, s, causal,
                                    expect_block):
        """OUTFITX_TOWER_ATTN=block routes the whole attention block
        (qkv proj + attention + out-proj) through ops/attn_block ONLY at
        the shapes where it measured a win (non-causal, sublane-aligned
        32 < L <= 64), with identical numerics under a key-padding mask;
        losing shapes fall through to the decomposed route."""
        from outfitx_tpu.models.towers.common import (
            apply_encoder,
            init_encoder_layers,
        )
        from outfitx_tpu.ops import attn_block as attn_block_mod

        key = jax.random.PRNGKey(1)
        layers = init_encoder_layers(key, d=32, n_heads=4, d_mlp=64, n_layers=2)
        x = jnp.asarray(rng.standard_normal((3, s, 32)), dtype=jnp.float32)
        mask = jnp.asarray(
            np.arange(s)[None, :] >= rng.integers(5, s + 1, size=(3, 1))
        )
        monkeypatch.delenv("OUTFITX_TOWER_ATTN", raising=False)
        want = apply_encoder(
            layers, x, n_heads=4, act="quick_gelu", pad_mask=mask,
            causal=causal,
        )
        calls = []
        real = attn_block_mod.attn_block

        def spy(*a, **k):
            calls.append(1)
            return real(*a, **k)

        monkeypatch.setattr(attn_block_mod, "attn_block", spy)
        monkeypatch.setenv("OUTFITX_TOWER_ATTN", "block")
        got = apply_encoder(
            layers, x, n_heads=4, act="quick_gelu", pad_mask=mask,
            causal=causal,
        )
        assert bool(calls) == expect_block
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )


class TestFusedMLP:
    """ops/mlp.mlp_fused vs the XLA fc1 -> act -> fc2 chain."""

    @pytest.mark.parametrize("act", ["quick_gelu", "gelu_tanh"])
    def test_matches_xla(self, rng, act):
        from outfitx_tpu.ops.mlp import mlp_fused

        d, dm = 32, 128
        x = jnp.asarray(rng.standard_normal((3, 50, d)), dtype=jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((d, dm)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(dm) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((dm, d)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)

        got = mlp_fused(x, w1, b1, w2, b2, act=act, tile_rows=64)
        if act == "quick_gelu":
            mid = x @ w1 + b1
            want = (mid * jax.nn.sigmoid(1.702 * mid)) @ w2 + b2
        else:
            want = jax.nn.gelu(x @ w1 + b1, approximate=True) @ w2 + b2
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )

    def test_env_routes_apply_encoder(self, rng, monkeypatch):
        from outfitx_tpu.models.towers.common import (
            apply_encoder,
            init_encoder_layers,
        )

        layers = init_encoder_layers(
            jax.random.PRNGKey(0), d=32, n_heads=4, d_mlp=64, n_layers=2
        )
        x = jnp.asarray(rng.standard_normal((2, 50, 32)), dtype=jnp.float32)
        monkeypatch.delenv("OUTFITX_TOWER_MLP", raising=False)
        want = apply_encoder(layers, x, n_heads=4, act="quick_gelu")
        monkeypatch.setenv("OUTFITX_TOWER_MLP", "pallas")
        got = apply_encoder(layers, x, n_heads=4, act="quick_gelu")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )


class TestVMEMTileGuard:
    """_tile_cap sizes the batch tile so the per-program f32 score block
    fits the scoped-VMEM budget, and the router degrades to XLA (never a
    Mosaic compile failure) when nothing fits (ADVICE r3)."""

    def test_validated_corners(self):
        from outfitx_tpu.ops.attention import _tile_cap

        assert _tile_cap(17) == 128  # flagship set attention
        assert _tile_cap(64) == 16  # direct text-tower band
        assert _tile_cap(196) == 16  # ViT-B/16 direct (measured compiles)
        assert _tile_cap(256) == 16  # padded route (measured compiles)
        # tile 32 at L=196 is the measured Mosaic OOM -> cap must be < 32
        assert _tile_cap(196) < 32
        assert _tile_cap(384) < 16  # future tower: tile scales down
        assert _tile_cap(384) >= 1

    def test_huge_l_returns_zero_and_routes_xla(self, rng):
        from outfitx_tpu.ops import attention as A

        assert A._tile_cap(4096) == 0
        q = jnp.asarray(rng.standard_normal((1, 1, 4096, 8)), jnp.float32)
        mask = jnp.zeros((1, 4096), dtype=bool)
        # 'auto' on any backend must not attempt a Pallas call at this L;
        # the result must match the XLA reference exactly (same path).
        out = A.masked_mha(q, q, q, mask, impl="auto")
        ref = A._mha_reference(q, q, q, mask)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestCausalPallasAttention:
    """Compile-time causal branch in the direct/padded Pallas kernels
    (VERDICT r3 item 4 — the CLIP text tower, L=77, causal + key-pad
    mask): forward and backward must match the XLA causal reference."""

    @pytest.mark.parametrize("l", [17, 77, 197])
    def test_causal_forward_matches_xla(self, rng, l):
        b, h, dh = 3, 2, 16
        q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        lengths = rng.integers(3, l + 1, size=(b, 1))
        mask = jnp.asarray(np.arange(l)[None, :] >= lengths)
        got = masked_mha(q, k, v, mask, causal=True, impl="pallas")
        want = masked_mha(q, k, v, mask, causal=True, impl="xla")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_causal_grad_matches_xla(self, rng):
        b, h, l, dh = 2, 2, 77, 16
        q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        mask = jnp.zeros((b, l), dtype=bool)

        def loss(impl, *a):
            return jnp.sum(masked_mha(*a, mask, causal=True, impl=impl) ** 2)

        gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4
            )

    def test_causal_future_keys_have_no_influence(self, rng):
        """Perturbing key/value at positions after query position t must
        not change the output at t (the causal contract itself)."""
        b, h, l, dh = 2, 2, 64, 16
        q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)
        k = np.asarray(rng.standard_normal((b, h, l, dh)), dtype=np.float32)
        v = np.asarray(rng.standard_normal((b, h, l, dh)), dtype=np.float32)
        mask = jnp.zeros((b, l), dtype=bool)
        t = 20
        out = masked_mha(q, jnp.asarray(k), jnp.asarray(v), mask,
                         causal=True, impl="pallas")
        k2, v2 = k.copy(), v.copy()
        k2[:, :, t + 1:] += 50.0
        v2[:, :, t + 1:] -= 50.0
        out2 = masked_mha(q, jnp.asarray(k2), jnp.asarray(v2), mask,
                          causal=True, impl="pallas")
        np.testing.assert_array_equal(
            np.asarray(out[:, :, : t + 1]), np.asarray(out2[:, :, : t + 1])
        )

    def test_clip_text_tower_env_route(self, rng, monkeypatch):
        """OUTFITX_TOWER_ATTN=pallas now covers the causal path too."""
        from outfitx_tpu.models.towers.common import (
            apply_encoder,
            init_encoder_layers,
        )

        key = jax.random.PRNGKey(0)
        layers = init_encoder_layers(key, d=32, n_heads=4, d_mlp=64, n_layers=2)
        x = jnp.asarray(rng.standard_normal((2, 77, 32)), dtype=jnp.float32)
        lengths = rng.integers(3, 78, size=(2, 1))
        pad = jnp.asarray(np.arange(77)[None, :] >= lengths)
        monkeypatch.delenv("OUTFITX_TOWER_ATTN", raising=False)
        monkeypatch.setenv("OUTFITX_TOWER_ATTN", "xla")
        want = apply_encoder(
            layers, x, n_heads=4, act="quick_gelu", pad_mask=pad, causal=True
        )
        monkeypatch.setenv("OUTFITX_TOWER_ATTN", "pallas")
        got = apply_encoder(
            layers, x, n_heads=4, act="quick_gelu", pad_mask=pad, causal=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )


class TestFusedAttnBlock:
    """One-kernel QKV-projection + attention + out-projection
    (ops/attn_block.py, OUTFITX_ATTN_BLOCK=fused): must reproduce the
    decomposed eval path numerically (interpret mode here; on-chip checks
    in scripts/tpu_smoke.py)."""

    def _decomposed(self, y, wqkv, bqkv, wo, mask, h):
        from outfitx_tpu.ops.attention import _mha_reference

        b, l, d = y.shape
        dh = d // h
        qkv = jnp.dot(y, wqkv.reshape(d, 3 * d)).reshape(b, l, 3, d) + bqkv
        qkv = qkv.reshape(b, l, 3, h, dh).transpose(2, 0, 3, 1, 4)
        o = _mha_reference(qkv[0], qkv[1], qkv[2], mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
        return jnp.dot(o, wo)

    @pytest.mark.parametrize("tile_b", [4, 32])
    def test_matches_decomposed(self, rng, tile_b):
        from outfitx_tpu.ops.attn_block import attn_block

        b, l, d, h = 6, 9, 64, 4
        y = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((d, 3, d)) * 0.1, jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3, d)) * 0.1, jnp.float32)
        wo = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        lengths = rng.integers(2, l + 1, size=(b, 1))
        mask = jnp.asarray(np.arange(l)[None, :] >= lengths)
        got = attn_block(y, wqkv, bqkv, wo, mask, h, tile_b=tile_b)
        want = self._decomposed(y, wqkv, bqkv, wo, mask, h)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )

    def test_model_eval_route_matches(self, rng, monkeypatch):
        """OUTFITX_ATTN_BLOCK=fused gives the same cp_forward as the
        decomposed eval path on the full model."""
        import dataclasses

        from outfitx_tpu.core.config import (
            ItemEncoderConfig,
            OutfitXConfig,
            TransformerConfig,
        )
        from outfitx_tpu.models import OutfitXModel
        from outfitx_tpu.ops import attn_block as AB

        cfg = OutfitXConfig(
            item_encoder=ItemEncoderConfig(dim_per_modality=32),
            transformer=TransformerConfig(n_heads=4, d_ffn=96, n_layers=2),
            max_outfit_len=8,
            compute_dtype="float32",
        )
        model = OutfitXModel(cfg)
        params = model.init(jax.random.PRNGKey(0))
        emb = jnp.asarray(rng.standard_normal((5, 8, 64)), jnp.float32)
        lengths = rng.integers(1, 9, size=(5, 1))
        mask = jnp.asarray(np.arange(8)[None, :] >= lengths)
        want = model.cp_forward(params, emb, mask)
        monkeypatch.setenv("OUTFITX_ATTN_BLOCK", "fused")
        AB.fused_attn_block_enabled.cache_clear()
        try:
            got = model.cp_forward(params, emb, mask)
        finally:
            monkeypatch.delenv("OUTFITX_ATTN_BLOCK")
            AB.fused_attn_block_enabled.cache_clear()
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )

    def test_padded_dh_weights_inert(self, rng):
        """Per-head Dh zero-padding (lane-packing probe, bench_dh_pack.py)
        is exactly inert: zero q/k columns add 0 to scores, zero wo rows
        discard the padded ctx columns."""
        from outfitx_tpu.ops.attn_block import attn_block

        b, l, d, h, dh, dhp = 5, 7, 64, 4, 16, 32
        y = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((d, 3, d)) * 0.1, jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3, d)) * 0.1, jnp.float32)
        wo = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        mask = jnp.asarray(
            np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
        )
        base = attn_block(y, wqkv, bqkv, wo, mask, h)

        w4 = np.zeros((d, 3, h, dhp), np.float32)
        w4[..., :dh] = np.asarray(wqkv).reshape(d, 3, h, dh)
        b4 = np.zeros((3, h, dhp), np.float32)
        b4[..., :dh] = np.asarray(bqkv).reshape(3, h, dh)
        wo4 = np.zeros((h, dhp, d), np.float32)
        wo4[:, :dh] = np.asarray(wo).reshape(h, dh, d)
        got = attn_block(
            y,
            jnp.asarray(w4.reshape(d, 3, h * dhp)),
            jnp.asarray(b4.reshape(3, h * dhp)),
            jnp.asarray(wo4.reshape(h * dhp, d)),
            mask,
            h,
            scale=1.0 / (dh**0.5),  # the REAL head dim's scale
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base), atol=1e-5, rtol=1e-5
        )

    def test_causal_matches_decomposed(self, rng):
        """Compile-time causal branch (CLIP text tower, reference
        clip_text_encoder.py:42-47) against the decomposed causal path."""
        from outfitx_tpu.ops.attention import _mha_reference
        from outfitx_tpu.ops.attn_block import attn_block

        b, l, d, h = 4, 11, 48, 4
        dh = d // h
        y = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((d, 3, d)) * 0.1, jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3, d)) * 0.1, jnp.float32)
        wo = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        mask = jnp.asarray(
            np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
        )
        qkv = (
            jnp.dot(y, wqkv.reshape(d, 3 * d)).reshape(b, l, 3, d) + bqkv
        ).reshape(b, l, 3, h, dh).transpose(2, 0, 3, 1, 4)
        o = _mha_reference(qkv[0], qkv[1], qkv[2], mask, causal=True)
        want = jnp.dot(o.transpose(0, 2, 1, 3).reshape(b, l, d), wo)
        got = attn_block(y, wqkv, bqkv, wo, mask, h, causal=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
        )
