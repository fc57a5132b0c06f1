"""Model tests: shapes, mask semantics, determinism, task dispatch, SPMD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from outfitx_tpu.core.mesh import MeshSpec, make_mesh, shard_batch
from outfitx_tpu.models import OutfitXModel, Task


@pytest.fixture(scope="module")
def model(tiny_cfg_module):
    return OutfitXModel(tiny_cfg_module)


@pytest.fixture(scope="module")
def tiny_cfg_module():
    from outfitx_tpu.core.config import (
        ItemEncoderConfig,
        OutfitXConfig,
        TransformerConfig,
    )

    return OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=32),
        transformer=TransformerConfig(n_heads=4, d_ffn=96, n_layers=2, dropout=0.3),
        max_outfit_len=8,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0))


def _batch(rng, b, l, d):
    emb = jnp.asarray(rng.standard_normal((b, l, d)), dtype=jnp.float32)
    lengths = rng.integers(1, l + 1, size=b)
    mask = np.zeros((b, l), dtype=bool)
    for i, n in enumerate(lengths):
        mask[i, n:] = True
    return emb, jnp.asarray(mask)


class TestForward:
    def test_cp_shape_and_dtype(self, model, params, rng):
        emb, mask = _batch(rng, 6, 8, model.cfg.d_embed)
        scores = model.cp_forward(params, emb, mask)
        assert scores.shape == (6,)
        assert scores.dtype == jnp.float32

    def test_cir_shape(self, model, params, rng):
        emb, mask = _batch(rng, 6, 8, model.cfg.d_embed)
        text = jnp.asarray(
            rng.standard_normal((6, model.cfg.d_embed // 2)), dtype=jnp.float32
        )
        out = model.cir_forward(params, emb, mask, text)
        assert out.shape == (6, model.cfg.d_embed)

    def test_task_dispatch(self, model, params, rng):
        emb, mask = _batch(rng, 3, 8, model.cfg.d_embed)
        text = jnp.zeros((3, model.cfg.d_embed // 2))
        cir = model.forward(params, Task.CIR, emb, mask, text)
        fitb = model.forward(params, Task.FITB, emb, mask, text)
        np.testing.assert_allclose(np.asarray(cir), np.asarray(fitb))

    def test_padded_items_have_no_influence(self, model, params, rng):
        emb, mask = _batch(rng, 5, 8, model.cfg.d_embed)
        a = model.cp_forward(params, emb, mask)
        emb2 = jnp.where(np.asarray(mask)[:, :, None], 7.7, emb)
        b = model.cp_forward(params, emb2, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_deterministic_eval(self, model, params, rng):
        emb, mask = _batch(rng, 4, 8, model.cfg.d_embed)
        a = model.cp_forward(params, emb, mask)
        b = model.cp_forward(params, emb, mask)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dropout_changes_output_in_train(self, model, params, rng):
        emb, mask = _batch(rng, 4, 8, model.cfg.d_embed)
        a = model.cp_forward(
            params, emb, mask, deterministic=False, rng=jax.random.PRNGKey(1)
        )
        b = model.cp_forward(
            params, emb, mask, deterministic=False, rng=jax.random.PRNGKey(2)
        )
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_grad_nonzero_all_params(self, model, params, rng):
        emb, mask = _batch(rng, 4, 8, model.cfg.d_embed)
        text = jnp.asarray(rng.standard_normal((4, model.cfg.d_embed // 2)), dtype=jnp.float32)

        def loss(p):
            s = model.cp_forward(p, emb, mask)
            c = model.cir_forward(p, emb, mask, text)
            return jnp.sum(s**2) + jnp.sum(c**2)

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves_with_path(g)
        for path, leaf in flat:
            assert np.isfinite(np.asarray(leaf)).all(), path
            assert np.abs(np.asarray(leaf)).sum() > 0, f"zero grad at {path}"


class TestSPMD:
    def test_dp_tp_mesh_forward(self, model, params, rng):
        """CP forward under jit on a (data=2, model=4) mesh — TP shardings on
        params, DP on batch; XLA inserts the collectives."""
        mesh = make_mesh(MeshSpec(data=2, model=4))
        specs = model.param_partition_specs()
        sharded_params = jax.tree.map(
            lambda x, s: jax.device_put(x, jax.sharding.NamedSharding(mesh, s)),
            params,
            specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        emb, mask = _batch(rng, 8, 8, model.cfg.d_embed)
        with jax.set_mesh(mesh):
            batch = shard_batch(mesh, {"emb": emb, "mask": mask})
            fn = jax.jit(lambda p, e, m: model.cp_forward(p, e, m))
            out = fn(sharded_params, batch["emb"], batch["mask"])
        ref = model.cp_forward(params, emb, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_pure_dp_mesh(self, model, params, rng):
        mesh = make_mesh(MeshSpec(data=8, model=1))
        emb, mask = _batch(rng, 16, 8, model.cfg.d_embed)
        with jax.set_mesh(mesh):
            batch = shard_batch(mesh, {"emb": emb, "mask": mask})
            out = jax.jit(lambda p, e, m: model.cp_forward(p, e, m))(
                params, batch["emb"], batch["mask"]
            )
        ref = model.cp_forward(params, emb, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


class TestFFNLanePad:
    """`TransformerConfig(ffn_pad_to=N)` zero-pads the FFN hidden dim at
    apply time for MXU lane alignment (d_ffn=2024 is 15*128+104 at the
    flagship shape). The pad terms are exactly zero, so outputs/grads agree
    to f32 accumulation order (the pad can shift matmul tiling; ~1 ULP on
    CPU, bit-identical where XLA already tiles the contraction to 128);
    the dropout stream matches exactly (mask drawn at the real width) and
    params stay unpadded."""

    def _pad_model(self, model):
        import dataclasses

        cfg = model.cfg
        return OutfitXModel(
            dataclasses.replace(
                cfg,
                transformer=dataclasses.replace(
                    cfg.transformer, ffn_pad_to=128
                ),
            )
        )

    def test_eval_exact(self, model, params, rng):
        emb, mask = _batch(rng, 6, 8, model.cfg.d_embed)
        s0 = model.cp_forward(params, emb, mask)
        s1 = self._pad_model(model).cp_forward(params, emb, mask)
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-6
        )

    def test_train_mode_and_grads_exact(self, model, params, rng):
        emb, mask = _batch(rng, 6, 8, model.cfg.d_embed)
        padded = self._pad_model(model)
        k = jax.random.PRNGKey(7)

        def loss(m):
            return lambda p: jnp.sum(
                m.cp_forward(p, emb, mask, deterministic=False, rng=k) ** 2
            )

        (l0, g0) = jax.value_and_grad(loss(model))(params)
        (l1, g1) = jax.value_and_grad(loss(padded))(params)
        np.testing.assert_allclose(
            np.asarray(l0), np.asarray(l1), rtol=1e-5, atol=1e-6
        )
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
        # grad shapes match the UNpadded params (pad is apply-time only)
        assert jax.tree.structure(g1) == jax.tree.structure(params)

    def test_cir_exact(self, model, params, rng):
        emb, mask = _batch(rng, 4, 8, model.cfg.d_embed)
        text = jnp.asarray(
            rng.standard_normal((4, model.cfg.d_embed // 2)),
            dtype=jnp.float32,
        )
        o0 = model.cir_forward(params, emb, mask, text)
        o1 = self._pad_model(model).cir_forward(params, emb, mask, text)
        np.testing.assert_allclose(
            np.asarray(o0), np.asarray(o1), rtol=1e-5, atol=1e-6
        )
