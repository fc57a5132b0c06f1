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
