"""End-to-end CIR training + FITB eval on synthetic data, including the
curriculum switch and CP->CIR->FITB checkpoint chaining."""

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


@pytest.fixture(scope="module")
def synth():
    return make_synthetic(n_items=500, d_embed=32, n_outfits=512, seed=11)


@pytest.fixture(scope="module")
def model_cfg():
    return OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=2, dropout=0.1),
        max_outfit_len=8,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cir")


class TestCIRTraining:
    def test_curriculum_train_recall_and_chain(self, synth, model_cfg, workdir):
        cfg = CIRTrainConfig(
            n_epochs=6,
            batch_size=64,
            accumulation_steps=1,
            optimizer=OptimizerConfig(learning_rate=2e-3),
            mesh=MeshConfig(data=4, model=1),
            switch_to_hard_epoch=3,  # curriculum switch mid-run
            recall_every=2,
            candidate_pool_size=128,
            checkpoint_dir=str(workdir / "ckpt"),
            log_dir=str(workdir / "logs"),
        )
        with CIRTrainer(
            cfg,
            model_cfg,
            catalog=synth.catalog,
            train_split=synth.cir_train,
            valid_split=synth.cir_valid,
            pool_threshold=1,  # tiny synthetic categories all qualify
        ) as t:
            metrics = t.run()

        # After the switch epoch, recall metrics are always computed.
        assert "recall@1" in metrics
        # 128-item pools; random recall@10 ~= 10/128. Demand a clear margin.
        assert metrics["recall@10"] > 0.25, metrics
        assert np.isfinite(metrics["loss"])
        # best checkpoint saved after switch epoch
        assert t.ckpt.exists("best_recall@1")
        self.__class__.cir_ckpt = str(t.ckpt.path("best_recall@1"))

    def test_valid_epoch_runs_one_eval_sweep(self, synth, model_cfg, workdir):
        """valid_epoch shares ONE `_predict_targets` sweep between loss and
        recall (the eval forward used to run twice on recall epochs)."""
        cfg = CIRTrainConfig(
            n_epochs=1,
            batch_size=64,
            accumulation_steps=1,
            mesh=MeshConfig(data=4, model=1),
            switch_to_hard_epoch=0,  # recall path always active
            recall_every=1,
            candidate_pool_size=128,
            checkpoint_dir=str(workdir / "ckpt_sweep"),
            log_dir=str(workdir / "logs_sweep"),
        )
        with CIRTrainer(
            cfg,
            model_cfg,
            catalog=synth.catalog,
            train_split=synth.cir_train,
            valid_split=synth.cir_valid,
            pool_threshold=1,
        ) as t:
            calls = []
            orig = t._predict_targets
            t._predict_targets = lambda: (calls.append(1), orig())[1]
            metrics = t.valid_epoch(epoch=0)
        assert "recall@1" in metrics and "loss" in metrics
        assert len(calls) == 1, f"eval forward ran {len(calls)}x per epoch"

    def test_valid_epoch_h2d_is_explicit_indices_only(
        self, synth, model_cfg, workdir
    ):
        """Relay-leak hygiene (envelope OOM root cause): the axon relay
        client leaks host RSS 1:1 with every byte shipped host->device
        (scripts/probe_rss_leak.py), so the eval epoch must ship ONLY
        small, explicitly `jax.device_put` index/mask arrays — never
        host-gathered embedding tensors (~450 MB/epoch at envelope scale,
        which OOM-killed the campaign's CIR phase at anon-rss 130.9 GB).

        `transfer_guard_host_to_device("disallow")` blocks implicit H2D
        while allowing explicit device_put, so any reintroduced host-side
        gather or np->jnp coercion in valid_epoch fails this test."""
        import jax

        cfg = CIRTrainConfig(
            n_epochs=1,
            batch_size=64,
            accumulation_steps=1,
            mesh=MeshConfig(data=4, model=1),
            switch_to_hard_epoch=0,  # recall path always active
            recall_every=1,
            candidate_pool_size=128,
            checkpoint_dir=str(workdir / "ckpt_h2d"),
            log_dir=str(workdir / "logs_h2d"),
        )
        with CIRTrainer(
            cfg,
            model_cfg,
            catalog=synth.catalog,
            train_split=synth.cir_train,
            valid_split=synth.cir_valid,
            pool_threshold=1,
        ) as t:
            # epoch 0 outside the guard: compile-time constant uploads are
            # one-time costs, not per-epoch leaks
            warm = t.valid_epoch(epoch=0)
            with jax.transfer_guard_host_to_device("disallow"):
                metrics = t.valid_epoch(epoch=1)
        assert "recall@1" in metrics and "loss" in metrics
        assert np.isfinite(metrics["loss"])
        # the guarded epoch resamples negatives but sees identical queries
        assert metrics["recall@1"] == warm["recall@1"]

    def test_fitb_from_cir_checkpoint(self, synth, model_cfg, workdir):
        cfg = FITBTrainConfig(
            checkpoint_dir=str(workdir / "ckpt"),
            log_dir=str(workdir / "logs"),
            checkpoint_from=self.cir_ckpt,
        )
        with FITBTrainer(
            cfg,
            model_cfg,
            catalog=synth.catalog,
            test_split=synth.fitb_test,
        ) as t:
            metrics = t.run()
        # 4 candidates: random = 0.25; a trained CIR model must beat it.
        assert metrics["accuracy"] > 0.4, metrics

    def test_fitb_rejects_train_mode(self, synth, model_cfg, workdir):
        cfg = FITBTrainConfig(
            checkpoint_dir=str(workdir / "ckpt"), log_dir=str(workdir / "logs")
        )
        with pytest.raises(ValueError, match="test"):
            FITBTrainer(cfg, model_cfg, run_mode="train-valid")


class TestWarmStartChain:
    def test_cp_to_cir_warm_start(self, synth, model_cfg, workdir):
        cp_cfg = CPTrainConfig(
            n_epochs=2,
            batch_size=64,
            accumulation_steps=1,
            optimizer=OptimizerConfig(learning_rate=2e-3),
            checkpoint_dir=str(workdir / "ckpt2"),
            log_dir=str(workdir / "logs"),
        )
        with CPTrainer(
            cp_cfg,
            model_cfg,
            catalog=synth.catalog,
            train_split=synth.cp_train,
            valid_split=synth.cp_valid,
        ) as t:
            t.run()
            cp_best = str(t.ckpt.path("best_auc"))

        cir_cfg = CIRTrainConfig(
            n_epochs=1,
            batch_size=64,
            accumulation_steps=1,
            switch_to_hard_epoch=0,  # hard negatives from the start
            candidate_pool_size=128,
            checkpoint_dir=str(workdir / "ckpt2"),
            log_dir=str(workdir / "logs"),
            warm_start_from=cp_best,
        )
        with CIRTrainer(
            cir_cfg,
            model_cfg,
            catalog=synth.catalog,
            train_split=synth.cir_train,
            valid_split=synth.cir_valid,
            pool_threshold=1,
        ) as t:
            metrics = t.run()
        assert "recall@1" in metrics
