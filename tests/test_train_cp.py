"""End-to-end CP training on synthetic data: the harness must actually learn.

The synthetic generator plants a set-compatibility signal (style-coherent
outfits are labeled positive); a working model+loss+optimizer pipeline
separates the classes within a few epochs. The reference has no trainable
test like this (SURVEY.md 4)."""

import numpy as np
import pytest

from outfitx_tpu.core.config import (
    CPTrainConfig,
    ItemEncoderConfig,
    MeshConfig,
    OptimizerConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.train.cp_trainer import CPTrainer


@pytest.fixture(scope="module")
def synth():
    return make_synthetic(n_items=500, d_embed=32, n_outfits=512, seed=7)


@pytest.fixture(scope="module")
def cfgs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cp")
    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=2, dropout=0.1),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    train_cfg = CPTrainConfig(
        n_epochs=6,
        batch_size=64,
        accumulation_steps=2,
        optimizer=OptimizerConfig(learning_rate=2e-3),
        mesh=MeshConfig(data=4, model=2),
        checkpoint_dir=str(tmp / "ckpt"),
        log_dir=str(tmp / "logs"),
    )
    return model_cfg, train_cfg


class TestCPTraining:
    def test_learns_and_checkpoints(self, synth, cfgs):
        model_cfg, train_cfg = cfgs
        with CPTrainer(
            train_cfg,
            model_cfg,
            catalog=synth.catalog,
            train_split=synth.cp_train,
            valid_split=synth.cp_valid,
        ) as t:
            final_metrics = t.run()

        assert final_metrics["auc"] > 0.85, final_metrics
        assert np.isfinite(final_metrics["loss"])

        # best-AUC + final checkpoints exist and restore cleanly
        assert t.ckpt.exists("best_auc")
        assert t.ckpt.exists("final")
        payload = t.ckpt.restore("best_auc")
        assert "params" in payload
        assert payload["meta"]["metrics"]["auc"] > 0.85
        # restored params numerically match a live forward
        import jax.numpy as jnp

        restored = payload["params"]
        got = t.model.cp_forward(
            restored,
            jnp.asarray(synth.catalog.embeddings[synth.cp_valid.item_rows[:4]]),
            jnp.asarray(synth.cp_valid.mask[:4]),
        )
        assert np.isfinite(np.asarray(got)).all()

    def test_deterministic_given_seed(self, synth, cfgs):
        model_cfg, train_cfg = cfgs
        import dataclasses

        cfg = dataclasses.replace(train_cfg, n_epochs=1)

        def run_once():
            with CPTrainer(
                cfg,
                model_cfg,
                catalog=synth.catalog,
                train_split=synth.cp_train,
                valid_split=synth.cp_valid,
            ) as t:
                return t.run()

        a = run_once()
        b = run_once()
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-4)
        np.testing.assert_allclose(a["auc"], b["auc"], rtol=1e-4)

    def test_device_batches_match_host_generator(self, synth, cfgs):
        """The device-gather batch path (split staged on device, batches
        sliced by the shuffle order in one jitted program) must reproduce
        the host np generator's training EXACTLY — same stateless shuffle,
        same data, same dropout stream."""
        model_cfg, train_cfg = cfgs
        import dataclasses

        cfg = dataclasses.replace(train_cfg, n_epochs=2)

        def run_once(device_batches):
            with CPTrainer(
                cfg,
                model_cfg,
                catalog=synth.catalog,
                train_split=synth.cp_train,
                valid_split=synth.cp_valid,
                device_batches=device_batches,
            ) as t:
                return t.run()

        a = run_once(True)
        b = run_once(False)
        for k in ("loss", "auc", "acc"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_train_epoch_h2d_is_explicit_only(self, synth, cfgs):
        """Relay-leak hygiene for the CP loop (see the CIR counterpart in
        test_train_cir_fitb.py): with the split device-staged, a train +
        valid epoch ships only explicit `jax.device_put` payloads (the
        int32 shuffle order), so implicit H2D is banned outright."""
        import dataclasses

        import jax

        model_cfg, train_cfg = cfgs
        cfg = dataclasses.replace(train_cfg, n_epochs=1)
        with CPTrainer(
            cfg,
            model_cfg,
            catalog=synth.catalog,
            train_split=synth.cp_train,
            valid_split=synth.cp_valid,
        ) as t:
            t.run()  # warm every program outside the guard
            with jax.transfer_guard_host_to_device("disallow"):
                train_m = t.train_epoch(epoch=1)
                valid_m = t._eval_split(t._valid_split)
        assert np.isfinite(train_m["loss"])
        assert np.isfinite(valid_m["loss"]) and "auc" in valid_m

    def test_eval_loss_ignores_padded_rows(self, synth, cfgs):
        """eval_batches pads the last batch by wrap-around; the reported
        eval loss must exclude those rows exactly like the score metrics —
        identical loss whatever the eval batch size."""
        import dataclasses

        model_cfg, train_cfg = cfgs
        cfg = dataclasses.replace(train_cfg, n_epochs=0)
        n_valid = len(synth.cp_valid)
        uneven = 48  # n_valid=? guarantee a partial final batch
        if n_valid % uneven == 0:
            uneven += 1

        def eval_once(bs):
            with CPTrainer(
                cfg,
                model_cfg,
                catalog=synth.catalog,
                train_split=synth.cp_train,
                valid_split=synth.cp_valid,
                eval_batch_size=bs,
            ) as t:
                return t._eval_split(t._valid_split)

        a = eval_once(n_valid)  # one exact batch, no padding
        b = eval_once(uneven)  # partial final batch, padded rows
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)
        np.testing.assert_allclose(a["auc"], b["auc"], rtol=1e-6)

    def test_second_inprocess_trainer_still_logs_to_file(self, synth, cfgs):
        """Trainer exit must close only ITS OWN logger handlers: a second
        trainer with the same model_name (chained runs, repeated tests in
        one process) re-attaches fresh handlers and keeps writing its log
        file — a global logging.shutdown() would silently drop them."""
        import dataclasses
        import pathlib

        model_cfg, train_cfg = cfgs
        cfg = dataclasses.replace(train_cfg, n_epochs=1)

        def run_once():
            with CPTrainer(
                cfg,
                model_cfg,
                catalog=synth.catalog,
                train_split=synth.cp_train,
                valid_split=synth.cp_valid,
            ) as t:
                t.run()
                return t

        t1 = run_once()
        log_file = pathlib.Path(cfg.log_dir) / f"{t1.model_name}.log"
        size_after_first = log_file.stat().st_size
        run_once()
        assert log_file.stat().st_size > size_after_first
