"""Loss-curve equivalence of the performance paths (VERDICT r1 #4).

With the dropout PRNG pinned to threefry (OUTFITX_FAST_PRNG=0) the ONLY
difference between OUTFITX_MHA_BWD=pallas and =xla is the attention backward
kernel; training trajectories must agree to numerical tolerance. The rbg
dropout path draws different masks by construction, so its check is
statistical: same data, same epochs, must reach the same AUC band.
"""

import numpy as np
import pytest

from outfitx_tpu.core.config import CPTrainConfig, OptimizerConfig
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.train.cp_trainer import CPTrainer


@pytest.fixture(scope="module")
def synth():
    return make_synthetic(n_items=300, d_embed=64, n_outfits=512, seed=11)


def _train(tmp_path, tiny_cfg, synth, tag, epochs=3):
    cfg = CPTrainConfig(
        n_epochs=epochs,
        batch_size=64,
        accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=2e-3),
        checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        log_dir=str(tmp_path / f"logs_{tag}"),
    )
    losses = []
    with CPTrainer(
        cfg,
        tiny_cfg,
        catalog=synth.catalog,
        train_split=synth.cp_train,
        valid_split=synth.cp_valid,
    ) as t:
        for epoch in range(epochs):
            m = t.train_epoch(epoch)
            losses.append(m["loss"])
        valid = t.valid_epoch(epochs - 1)
    return np.asarray(losses), valid


def test_pallas_and_xla_backward_same_trajectory(
    tmp_path, tiny_cfg, synth, monkeypatch
):
    monkeypatch.setenv("OUTFITX_FAST_PRNG", "0")  # identical dropout masks
    monkeypatch.setenv("OUTFITX_MHA_BWD", "pallas")
    lp, vp = _train(tmp_path, tiny_cfg, synth, "pallas")
    monkeypatch.setenv("OUTFITX_MHA_BWD", "xla")
    lx, vx = _train(tmp_path, tiny_cfg, synth, "xla")
    np.testing.assert_allclose(lp, lx, rtol=2e-3, atol=2e-3)
    assert abs(vp["auc"] - vx["auc"]) < 0.02


def test_rbg_dropout_reaches_same_quality(tmp_path, tiny_cfg, synth, monkeypatch):
    monkeypatch.setenv("OUTFITX_FAST_PRNG", "0")
    _, v_tf = _train(tmp_path, tiny_cfg, synth, "threefry", epochs=4)
    monkeypatch.setenv("OUTFITX_FAST_PRNG", "1")
    _, v_rbg = _train(tmp_path, tiny_cfg, synth, "rbg", epochs=4)
    assert v_tf["auc"] > 0.85 and v_rbg["auc"] > 0.85
    assert abs(v_tf["auc"] - v_rbg["auc"]) < 0.05
