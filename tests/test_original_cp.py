"""End-to-end original-CP: raw images+texts through resnet18+MiniLM inside
the train step, frozen backbones outside the optimizer."""

import jax
import numpy as np
import pytest

from outfitx_tpu.core.config import (
    CPTrainConfig,
    ItemEncoderConfig,
    OptimizerConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.models.item_encoder import ItemEncoderModel
from outfitx_tpu.models.towers.minilm import MiniLMConfig
from outfitx_tpu.models.towers.resnet import ResNet18Config
from outfitx_tpu.train.original_cp_trainer import OriginalCPTrainer, RawItemSource


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ocp")
    n_items = 200
    synth = make_synthetic(n_items=n_items, d_embed=16, n_outfits=128, seed=9)
    enc = ItemEncoderModel(
        ItemEncoderConfig(encoder_type="resnet_sbert", dim_per_modality=8),
        vision_cfg=ResNet18Config(d_out=8, image_size=32),
        text_cfg=MiniLMConfig(
            vocab_size=120, max_len=12, d_model=24, n_heads=4, d_mlp=48,
            n_layers=1, d_out=8,
        ),
    )
    source = RawItemSource.synthetic(
        n_items=n_items, image_size=32, text_len=12, vocab=120, seed=3
    )
    model_cfg = OutfitXConfig(
        item_encoder=enc.cfg,
        transformer=TransformerConfig(n_heads=4, d_ffn=32, n_layers=1, dropout=0.1),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    cfg = CPTrainConfig(
        n_epochs=1,
        batch_size=16,
        accumulation_steps=2,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        checkpoint_dir=str(tmp / "ckpt"),
        log_dir=str(tmp / "logs"),
    )
    return synth, enc, source, model_cfg, cfg


class TestOriginalCP:
    def test_end_to_end_trains(self, setup):
        """One training run asserts the full contract: finite metrics,
        checkpointing, frozen backbones untouched, trainable heads moving."""
        synth, enc, source, model_cfg, cfg = setup
        with OriginalCPTrainer(
            cfg,
            model_cfg,
            encoder=enc,
            source=source,
            train_split=synth.cp_train,
            valid_split=synth.cp_valid,
        ) as t:
            frozen_before = jax.device_get(t.frozen)
            heads_before = jax.device_get(t.state.params["enc_heads"])
            metrics = t.run()
            frozen_after = jax.device_get(t.frozen)
            heads_after = jax.device_get(t.state.params["enc_heads"])
        assert np.isfinite(metrics["loss"])
        assert "auc" in metrics
        # frozen backbones must be bit-identical after training
        for a, b in zip(
            jax.tree.leaves(frozen_before), jax.tree.leaves(frozen_after)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the trainable fc/proj heads must actually update
        diffs = [
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for a, b in zip(
                jax.tree.leaves(heads_before), jax.tree.leaves(heads_after)
            )
        ]
        assert all(d > 0 for d in diffs), diffs
        assert t.ckpt.exists("best_auc")


class TestOriginalCPMesh:
    def test_mesh_run_matches_single_device(self, setup, tmp_path):
        """The end-to-end path (raw towers inside the step) through the
        real trainer on mesh(data=4, model=2, fsdp) must reproduce the
        single-device loss/AUC (tolerance: sharded reduction order). This
        is the 4th and last task-trainer family driven over a mesh."""
        import dataclasses

        from outfitx_tpu.core.config import MeshConfig

        synth, enc, source, model_cfg, cfg = setup
        results = {}
        for name, mesh_cfg in (
            ("single", MeshConfig(data=1, model=1)),
            ("mesh", MeshConfig(data=4, model=2, fsdp=True)),
        ):
            run_cfg = dataclasses.replace(
                cfg,
                mesh=mesh_cfg,
                checkpoint_dir=str(tmp_path / name / "ckpt"),
                log_dir=str(tmp_path / name / "logs"),
            )
            with OriginalCPTrainer(
                run_cfg,
                model_cfg,
                encoder=enc,
                source=source,
                train_split=synth.cp_train,
                valid_split=synth.cp_valid,
            ) as t:
                results[name] = t.run()
                if name == "mesh":
                    sharded = sum(
                        len(x.sharding.device_set) > 1
                        for x in jax.tree.leaves(t.state.params["model"])
                    )
                    assert sharded > 0  # TP/FSDP actually applied
        s, m = results["single"], results["mesh"]
        assert np.isfinite(m["loss"])
        np.testing.assert_allclose(m["loss"], s["loss"], rtol=5e-3)
        np.testing.assert_allclose(m["auc"], s["auc"], atol=5e-3)
