"""Multi-host-safe metric gathering (VERDICT r1 #9).

Under multi-process SPMD each host addresses only its local shards, so the
epoch-metric paths must reassemble global prediction arrays before computing
AUC/recall (the reference does this with dist.all_gather,
compatibility_prediction_trainer.py:384-399). `gather_global` is the single
choke point: device_get on one process, process_allgather beyond.
"""

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.parallel import gather_global


def test_single_process_is_device_get():
    x = jnp.arange(12.0).reshape(3, 4)
    out = gather_global(x)
    np.testing.assert_array_equal(np.asarray(out), np.arange(12.0).reshape(3, 4))


def test_pytrees_and_lists_pass_through():
    tree = {
        "losses": [jnp.float32(1.5), jnp.float32(2.5)],
        "scores": jnp.ones((2, 3)),
    }
    out = gather_global(tree)
    assert float(out["losses"][0]) == 1.5
    assert float(out["losses"][1]) == 2.5
    np.testing.assert_array_equal(out["scores"], np.ones((2, 3)))


def test_sharded_array_gathers_fully():
    # Single-process multi-device: a 'data'-sharded output must come back
    # whole (all 8 device shards).
    from jax.sharding import NamedSharding, PartitionSpec as P

    from outfitx_tpu.parallel import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=8, model=1))
    x = jnp.arange(16.0).reshape(16, 1)
    x = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    out = gather_global(x)
    np.testing.assert_array_equal(
        np.asarray(out), np.arange(16.0).reshape(16, 1)
    )


def test_multi_process_routes_to_process_allgather(monkeypatch):
    # Fake a 2-process world and verify the process_allgather branch is
    # taken with tiled=True (full-array semantics, not stacked-per-host).
    calls = {}

    def fake_allgather(tree, tiled=False):
        calls["tiled"] = tiled
        return jax.tree.map(lambda t: np.asarray(t) * 2, tree)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    from jax.experimental import multihost_utils

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    out = gather_global(jnp.ones((2, 2)))
    assert calls == {"tiled": True}
    np.testing.assert_array_equal(out, 2 * np.ones((2, 2)))
