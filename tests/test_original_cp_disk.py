"""Original-CP end-to-end from an on-disk dataset: images decoded from
JPEGs, metadata-only catalog, CP splits from JSON, tiny injected towers."""

import subprocess
import sys
import pathlib

import numpy as np
import pytest

from outfitx_tpu.core.config import (
    CPTrainConfig,
    ItemEncoderConfig,
    OptimizerConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.models.item_encoder import ItemEncoderModel
from outfitx_tpu.models.towers.minilm import MiniLMConfig
from outfitx_tpu.models.towers.resnet import ResNet18Config
from outfitx_tpu.train.original_cp_trainer import OriginalCPTrainer

REPO = pathlib.Path(__file__).parent.parent


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("pv_img")
    sys.path.insert(0, str(REPO / "scripts"))
    from make_synthetic_polyvore import generate

    generate(out, items=150, d_embed=16, outfits=96, image_size=32, seed=5)
    return out


def test_original_cp_trains_from_disk(disk_dataset, tmp_path):
    enc = ItemEncoderModel(
        ItemEncoderConfig(encoder_type="resnet_sbert", dim_per_modality=8),
        vision_cfg=ResNet18Config(d_out=8, image_size=32),
        text_cfg=MiniLMConfig(
            vocab_size=30522, max_len=12, d_model=24, n_heads=4, d_mlp=48,
            n_layers=1, d_out=8,
        ),
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
        accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        dataset_dir=str(disk_dataset),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    with OriginalCPTrainer(cfg, model_cfg, encoder=enc) as t:
        # source built from disk: real decoded JPEGs in the bank
        assert t._source.image_bank.shape[0] == 151  # 150 items + pad
        assert t._source.image_bank[:150].sum() > 0
        metrics = t.run()
    assert np.isfinite(metrics["loss"])
    assert "auc" in metrics
