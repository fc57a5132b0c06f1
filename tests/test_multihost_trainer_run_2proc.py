"""Two-process SPMD through the REAL ``Trainer.run()`` loop.

test_multihost_train_2proc proves the raw train *step* under 2-process
SPMD; THIS test drives the full harness path the reference runs under
torchrun (run.sh:31, distributed_trainer.py:318-329): ``CPTrainer.run()``
for 2 epochs (epoch loop + host-generator batches + eval sweep +
best-metric save) chained into ``CIRTrainer.run()`` for 2 epochs with the
curriculum switch at epoch 1 (warm start + multihost recall-eval gather).
It executes the multihost branches that are cold everywhere else:

  - cp_trainer.setup_data: ``device_batches and process_count == 1`` is
    False -> the host np generator feeds the global mesh,
  - cir_trainer.setup_data/:223: no device-staged eval batches -> the
    ``gather_global`` (process_allgather) eval fallback,
  - checkpoint.save: the multi-process orbax branch.

Both processes must report identical metric trajectories (SPMD: same
program, same global data), and the 2-process run must match a
single-process 4-device run of the identical chain.
"""

import json
import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys, json, pathlib
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={ndev}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

mode = sys.argv[1]  # 'dist' or 'single'
base = pathlib.Path(sys.argv[2])
if mode == "dist":
    coord, pid = sys.argv[3], int(sys.argv[4])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid,
        local_device_ids=[0, 1],
    )
else:
    pid = 0

sys.path.insert(0, os.environ["OUTFITX_REPO"])
from outfitx_tpu.core.config import (
    CIRTrainConfig, CPTrainConfig, ItemEncoderConfig, MeshConfig,
    OptimizerConfig, OutfitXConfig, TransformerConfig,
)
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.train.cir_trainer import CIRTrainer
from outfitx_tpu.train.cp_trainer import CPTrainer

model_cfg = OutfitXConfig(
    item_encoder=ItemEncoderConfig(dim_per_modality=16),
    transformer=TransformerConfig(n_heads=4, d_ffn=32, n_layers=2, dropout=0.0),
    max_outfit_len=8,
    compute_dtype="float32",
)
data = make_synthetic(n_items=300, d_embed=32, n_outfits=192, max_len=8, seed=5)
# ONE shared checkpoint dir across processes (the production layout: a
# shared filesystem; orbax's multihost save coordinates through barriers
# keyed by the path, so per-process dirs would deadlock) but per-process
# log dirs (each host writes its own log files, reference rank-0-style).
ckpt = str(base / "ckpt")
logs = str(base / f"logs_p{pid}")
mesh_cfg = MeshConfig(data=4, model=1)

cp_cfg = CPTrainConfig(
    n_epochs=2, batch_size=32, accumulation_steps=2,
    optimizer=OptimizerConfig(learning_rate=1e-3),
    mesh=mesh_cfg, checkpoint_dir=ckpt, log_dir=logs,
)
with CPTrainer(
    cp_cfg, model_cfg,
    catalog=data.catalog, train_split=data.cp_train,
    valid_split=data.cp_valid,
) as t:
    cp_final = t.run()
    cp_name = t.model_name
    assert t._train_split_dev is None or jax.process_count() == 1, (
        "multihost must use the host batch generator"
    )

cir_cfg = CIRTrainConfig(
    n_epochs=2, batch_size=32, accumulation_steps=1,
    switch_to_hard_epoch=1, recall_every=1, candidate_pool_size=48,
    mesh=mesh_cfg, checkpoint_dir=ckpt, log_dir=logs,
    warm_start_from=str(pathlib.Path(ckpt) / cp_name / "best_auc"),
)
with CIRTrainer(
    cir_cfg, model_cfg,
    catalog=data.catalog, train_split=data.cir_train,
    valid_split=data.cir_valid, pool_threshold=1,
) as t:
    cir_final = t.run()
    cir_name = t.model_name

rows = [
    json.loads(line)
    for line in (pathlib.Path(logs) / f"{cir_name}_metrics.jsonl")
    .read_text().splitlines()
]
best = pathlib.Path(ckpt) / cir_name / "best_recall@1"
print("RESULT " + json.dumps({
    "pid": pid,
    "cp_final": {k: round(float(v), 6) for k, v in cp_final.items()},
    "cir_final": {k: round(float(v), 6) for k, v in cir_final.items()},
    "cir_train_loss": [
        round(float(r["loss"]), 6) for r in rows if r["split"] == "train"
    ],
    "neg_mode": [
        r["neg_mode"] for r in rows if r["split"] == "train"
    ],
    "best_saved": best.exists(),
}), flush=True)
"""


def _run(ndev, args, env):
    return subprocess.Popen(
        [sys.executable, "-c", _WORKER.replace("{ndev}", ndev), *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )


def test_trainer_run_two_process_matches_single(tmp_path):
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
    env["OUTFITX_FAST_PRNG"] = "0"
    env["OUTFITX_DROPOUT_BITS"] = "exact"

    # the dist pair must run concurrently; the single-process baseline runs
    # AFTER them (3 heavy JAX processes on one CPU core skews the pair's
    # relative progress enough to trip the distributed shutdown barrier)
    procs = [
        _run("2", ("dist", str(tmp_path / "d"), coord, "0"), env),
        _run("2", ("dist", str(tmp_path / "d"), coord, "1"), env),
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    single = _run("4", ("single", str(tmp_path / "s")), env)
    outs.append(single.communicate(timeout=900)[0])
    procs.append(single)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    def result(out):
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        return json.loads(line[len("RESULT "):])

    r0, r1, rs = (result(o) for o in outs)
    # SPMD: both processes observe identical global metrics
    assert r0["cp_final"] == r1["cp_final"]
    assert r0["cir_train_loss"] == r1["cir_train_loss"]
    assert r0["cir_final"] == r1["cir_final"]
    # the curriculum switched at epoch 1 and the best save happened
    assert r0["neg_mode"] == [0.0, 1.0]
    assert r0["best_saved"] and r1["best_saved"] and rs["best_saved"]
    # 2-process == 1-process on the same 4-device program (tolerance: the
    # collective reduction order may differ across topologies)
    for key in ("cp_final", "cir_final"):
        for k, v in rs[key].items():
            dv = r0[key][k]
            assert abs(v - dv) < 5e-3, (key, k, v, dv)
    assert rs["cir_train_loss"] and all(
        abs(a - b) < 5e-3
        for a, b in zip(rs["cir_train_loss"], r0["cir_train_loss"])
    )
