"""The full CP -> CIR(curriculum switch) -> FITB chain through the REAL
Trainer classes on a multi-device mesh.

The reference's production path is multi-GPU training through its harness
(run.sh:31 `torchrun --nproc_per_node=$CARD`, distributed_trainer.py:318-329).
The step-level equivalents here were proven earlier (dryrun, test_fsdp,
test_multihost_train_2proc); THIS test drives `Trainer.run()` itself —
epoch loops, eval sweeps, best-metric saves, the easy->hard switch, and
cross-task checkpoint chaining — end to end over mesh(data=4, model=2,
fsdp=True) on the 8-fake-device harness, and asserts the loss/metric
trajectories match the single-device run (tolerance for the sharded
matmuls' different reduction order).
"""

import json
import pathlib

import jax
import numpy as np
import pytest

from outfitx_tpu.core.config import (
    CIRTrainConfig,
    CPTrainConfig,
    FITBTrainConfig,
    ItemEncoderConfig,
    MeshConfig,
    OptimizerConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.train.cir_trainer import CIRTrainer
from outfitx_tpu.train.cp_trainer import CPTrainer
from outfitx_tpu.train.fitb_trainer import FITBTrainer

CP_EPOCHS = 3
CIR_EPOCHS = 6
SWITCH = 3


@pytest.fixture(scope="module")
def pieces():
    data = make_synthetic(
        n_items=400, d_embed=64, n_outfits=256, max_len=8, seed=11
    )
    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(
            encoder_type="siglip", dim_per_modality=32
        ),
        transformer=TransformerConfig(
            n_heads=4, d_ffn=96, n_layers=2, dropout=0.0
        ),
        max_outfit_len=8,
        compute_dtype="float32",  # isolate reduction-order drift only
    )
    return data, model_cfg


def _read_traj(log_dir: pathlib.Path, name: str):
    rows = [
        json.loads(line)
        for line in (log_dir / f"{name}_metrics.jsonl").read_text().splitlines()
    ]
    return rows


def run_chain(mesh_cfg: MeshConfig, base: pathlib.Path, data, model_cfg):
    ckpt, logs = str(base / "ckpt"), base / "logs"
    out = {}

    cp_cfg = CPTrainConfig(
        n_epochs=CP_EPOCHS,
        batch_size=64,
        accumulation_steps=2,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        mesh=mesh_cfg,
        checkpoint_dir=ckpt,
        log_dir=str(logs),
    )
    with CPTrainer(
        cp_cfg,
        model_cfg,
        catalog=data.catalog,
        train_split=data.cp_train,
        valid_split=data.cp_valid,
    ) as t:
        t.run()
        cp_name = t.model_name
        out["cp_sharded_leaves"] = sum(
            len(x.sharding.device_set) > 1
            for x in jax.tree.leaves(t.state.params)
        )

    cir_cfg = CIRTrainConfig(
        n_epochs=CIR_EPOCHS,
        batch_size=64,
        accumulation_steps=1,
        switch_to_hard_epoch=SWITCH,
        recall_every=2,
        candidate_pool_size=64,
        mesh=mesh_cfg,
        checkpoint_dir=ckpt,
        log_dir=str(logs),
        warm_start_from=str(pathlib.Path(ckpt) / cp_name / "best_auc"),
    )
    with CIRTrainer(
        cir_cfg,
        model_cfg,
        catalog=data.catalog,
        train_split=data.cir_train,
        valid_split=data.cir_valid,
        pool_threshold=1,
    ) as t:
        t.run()
        cir_name = t.model_name
        out["cir_sharded_leaves"] = sum(
            len(x.sharding.device_set) > 1
            for x in jax.tree.leaves(t.state.params)
        )

    fitb_cfg = FITBTrainConfig(
        checkpoint_dir=ckpt,
        log_dir=str(logs),
        checkpoint_from=str(pathlib.Path(ckpt) / cir_name / "best_recall@1"),
    )
    with FITBTrainer(
        fitb_cfg,
        model_cfg,
        "test",
        catalog=data.catalog,
        test_split=data.fitb_test,
    ) as t:
        out["fitb"] = t.run()

    cp_rows = _read_traj(logs, cp_name)
    cir_rows = _read_traj(logs, cir_name)
    out["cp_train_loss"] = [
        r["loss"] for r in cp_rows if r["split"] == "train"
    ]
    out["cp_valid_auc"] = [r["auc"] for r in cp_rows if r["split"] == "valid"]
    out["cir_train_loss"] = [
        r["loss"] for r in cir_rows if r["split"] == "train"
    ]
    out["cir_neg_mode"] = {
        int(r["epoch"]): r["neg_mode"]
        for r in cir_rows
        if r["split"] == "train"
    }
    out["cir_recall_epochs"] = sorted(
        int(r["epoch"])
        for r in cir_rows
        if r["split"] == "valid" and "recall@1" in r
    )
    out["cir_recall1"] = [
        r["recall@1"]
        for r in cir_rows
        if r["split"] == "valid" and "recall@1" in r
    ]
    best_meta = json.loads(
        (pathlib.Path(ckpt) / cir_name / "best_recall@1" / "meta.json")
        .read_text()
    )
    out["cir_best_epoch"] = int(best_meta["epoch"])
    return out


@pytest.fixture(scope="module")
def single(pieces, tmp_path_factory):
    data, model_cfg = pieces
    return run_chain(
        MeshConfig(data=1, model=1),
        tmp_path_factory.mktemp("single"),
        data,
        model_cfg,
    )


@pytest.fixture(scope="module")
def meshed(pieces, tmp_path_factory):
    data, model_cfg = pieces
    return run_chain(
        MeshConfig(data=4, model=2, fsdp=True),
        tmp_path_factory.mktemp("meshed"),
        data,
        model_cfg,
    )


def test_mesh_run_actually_sharded(meshed, single):
    assert meshed["cp_sharded_leaves"] > 0
    # warm start must NOT silently re-replicate: CIR keeps sharded params
    assert meshed["cir_sharded_leaves"] > 0
    assert single["cp_sharded_leaves"] == 0


def test_cp_trajectory_matches(single, meshed):
    assert len(single["cp_train_loss"]) == CP_EPOCHS
    np.testing.assert_allclose(
        single["cp_train_loss"], meshed["cp_train_loss"], rtol=2e-3
    )
    np.testing.assert_allclose(
        single["cp_valid_auc"], meshed["cp_valid_auc"], atol=2e-3
    )


def test_cir_trajectory_and_curriculum_match(single, meshed):
    assert len(single["cir_train_loss"]) == CIR_EPOCHS
    np.testing.assert_allclose(
        single["cir_train_loss"], meshed["cir_train_loss"], rtol=5e-3
    )
    # curriculum switch at the same epoch on both topologies
    for traj in (single, meshed):
        assert all(
            v == (0.0 if e < SWITCH else 1.0)
            for e, v in traj["cir_neg_mode"].items()
        )
    # recall cadence identical: every recall_every pre-switch, every epoch post
    assert single["cir_recall_epochs"] == meshed["cir_recall_epochs"]
    np.testing.assert_allclose(
        single["cir_recall1"], meshed["cir_recall1"], atol=0.05
    )
    # best checkpoint only after the switch, on both
    assert single["cir_best_epoch"] >= SWITCH
    assert meshed["cir_best_epoch"] >= SWITCH


def test_fitb_chained_result_matches(single, meshed):
    acc_s = single["fitb"]["accuracy"]
    acc_m = meshed["fitb"]["accuracy"]
    assert 0.0 <= acc_s <= 1.0
    assert abs(acc_s - acc_m) < 0.05, (acc_s, acc_m)
