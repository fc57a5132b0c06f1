"""Two-process SPMD CP TRAINING equivalence (extends test_multihost_2proc's
gather check to the full train step).

Topology: 2 processes x 2 fake CPU devices = one 4-device ('data',) mesh.
Each process feeds its local half of the global batch; params/catalog are
replicated via jit out-shardings. The per-step losses printed by both
processes must agree with each other AND with a single-process 4-device run
of the identical program — the SPMD guarantee the trainers rely on.
"""

import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={ndev}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

mode = sys.argv[1]  # 'dist' or 'single'
if mode == "dist":
    coord, pid, nproc = sys.argv[2], int(sys.argv[3]), 2
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid,
        local_device_ids=[0, 1],
    )
else:
    pid, nproc = 0, 1

sys.path.insert(0, os.environ["OUTFITX_REPO"])
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from outfitx_tpu.core.config import (
    ItemEncoderConfig, OptimizerConfig, OutfitXConfig, TransformerConfig,
)
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.train.optim import make_optimizer
from outfitx_tpu.train.state import TrainState
from outfitx_tpu.train.steps import make_cp_train_step

# NB: plain Mesh (Auto axis types) — jax.make_mesh defaults to Explicit
# sharding-in-types, which demands out_sharding on every gather.
mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("data",))
cfg = OutfitXConfig(
    item_encoder=ItemEncoderConfig(dim_per_modality=16),
    transformer=TransformerConfig(n_heads=4, d_ffn=32, n_layers=2, dropout=0.0),
    max_outfit_len=8,
    compute_dtype="float32",
)
model = OutfitXModel(cfg)
tx = make_optimizer(OptimizerConfig(), total_steps=4)

rep = NamedSharding(mesh, P())
with jax.set_mesh(mesh):
    params = jax.jit(model.init, out_shardings=rep)(jax.random.PRNGKey(0))
    state = TrainState.create(params, tx, jax.random.PRNGKey(1))
    # the catalog is data-independent: build identically on every process
    host_rng = np.random.default_rng(7)
    catalog_np = host_rng.standard_normal((65, cfg.d_embed)).astype(np.float32)
    catalog = jax.jit(lambda: jnp.asarray(catalog_np), out_shardings=rep)()

    # global batch: A=2, B=8, L=8 — identical on every process, then each
    # contributes its local quarter-rows (2 devices/proc of 4)
    A, B, L = 2, 8, cfg.max_outfit_len
    idx = host_rng.integers(0, 64, (A, B, L)).astype(np.int32)
    msk = np.zeros((A, B, L), dtype=bool)
    lbl = (host_rng.random((A, B)) > 0.5).astype(np.float32)

    def shard_batch(x):
        per = B // nproc
        local = x[:, pid * per : (pid + 1) * per]
        return multihost_utils.host_local_array_to_global_array(
            local, mesh, P(None, "data")
        )

    if mode == "dist":
        batch = {k: shard_batch(v) for k, v in
                 {"item_idx": idx, "mask": msk, "label": lbl}.items()}
    else:
        data = NamedSharding(mesh, P(None, "data"))
        batch = {k: jax.device_put(v, data) for k, v in
                 {"item_idx": idx, "mask": msk, "label": lbl}.items()}

    step = make_cp_train_step(model, tx)
    losses = []
    for _ in range(3):
        state, out = step(state, catalog, batch)
        losses.append(float(jax.device_get(out["loss"])))
print(f"LOSSES proc{pid} " + " ".join(f"{x:.8f}" for x in losses), flush=True)
"""


def _run(args, env):
    return subprocess.Popen(
        [sys.executable, "-c", _WORKER.replace("{ndev}", args[0]), *args[1:]],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )


def test_two_process_training_matches_single_process():
    import os

    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
    }
    env["OUTFITX_REPO"] = os.path.dirname(os.path.dirname(__file__))
    # exact dropout/threefry so the three runs are bitwise comparable
    env["OUTFITX_FAST_PRNG"] = "0"
    env["OUTFITX_DROPOUT_BITS"] = "exact"

    procs = [
        _run(("2", "dist", coord, "0"), env),
        _run(("2", "dist", coord, "1"), env),
        _run(("4", "single"), env),
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    def losses(out):
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES")][-1]
        return [float(x) for x in line.split()[2:]]

    l0, l1, ls = (losses(o) for o in outs)
    assert len(ls) == 3
    assert l0 == l1, (l0, l1)  # both processes observe the same global loss
    for a, b in zip(l0, ls):
        assert abs(a - b) < 1e-6, (l0, ls)  # distributed == single-process
    # training actually progressed
    assert ls[-1] != ls[0]
