"""Pretrained checkpoint loading: write HF-format safetensors fixtures and
load them through models/pretrained.py, asserting output parity with the
torch source models."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from outfitx_tpu.core.config import ItemEncoderConfig
from outfitx_tpu.models.item_encoder import ItemEncoderModel
from outfitx_tpu.models.pretrained import load_item_encoder_params
from outfitx_tpu.models.towers import TextTowerConfig, VisionTowerConfig


@pytest.fixture(scope="module")
def clip_checkpoint(tmp_path_factory):
    """Tiny CLIP dual-tower checkpoint saved the way HF does."""
    from safetensors.torch import save_file
    from transformers import (
        CLIPTextConfig,
        CLIPTextModelWithProjection,
        CLIPVisionConfig,
        CLIPVisionModelWithProjection,
    )

    torch.manual_seed(0)
    root = tmp_path_factory.mktemp("clip_ckpt")
    vis = CLIPVisionModelWithProjection(
        CLIPVisionConfig(
            hidden_size=64, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=16,
            projection_dim=40,
        )
    ).eval()
    txt = CLIPTextModelWithProjection(
        CLIPTextConfig(
            vocab_size=300, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, projection_dim=40, eos_token_id=299,
        )
    ).eval()
    (root / "vision").mkdir()
    (root / "text").mkdir()
    save_file(vis.state_dict(), root / "vision" / "model.safetensors")
    save_file(txt.state_dict(), root / "text" / "model.safetensors")
    return root, vis, txt


def test_load_clip_checkpoint_matches_torch(clip_checkpoint, rng):
    root, vis, txt = clip_checkpoint
    enc = ItemEncoderModel(
        ItemEncoderConfig(
            encoder_type="clip", dim_per_modality=40, normalize_out=False
        ),
        vision_cfg=VisionTowerConfig(
            variant="clip", image_size=32, patch_size=16, d_model=64,
            n_heads=4, d_mlp=96, n_layers=2, proj_dim=40,
            compute_dtype="float32",
        ),
        text_cfg=TextTowerConfig(
            variant="clip", vocab_size=300, max_len=16, d_model=64,
            n_heads=4, d_mlp=96, n_layers=2, proj_dim=40, eos_token_id=299,
            compute_dtype="float32",
        ),
    )
    params = load_item_encoder_params(enc, root)

    imgs = rng.integers(0, 256, (3, 3, 32, 32), dtype=np.uint8)
    ids = rng.integers(1, 290, (3, 16)).astype(np.int64)
    ids[:, -1] = 299

    # image path parity (including our uint8->normalized preprocessing)
    normalized = np.asarray(enc.normalize_images(jnp.asarray(imgs)))
    with torch.no_grad():
        want_img = vis(
            pixel_values=torch.from_numpy(normalized)
        ).image_embeds.numpy()
        want_txt = txt(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
    got_img = np.asarray(enc.encode_images(params, jnp.asarray(imgs)))
    got_txt = np.asarray(
        enc.encode_texts(params, jnp.asarray(ids.astype(np.int32)))
    )
    np.testing.assert_allclose(got_img, want_img, atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(got_txt, want_txt, atol=3e-4, rtol=1e-3)


def test_missing_checkpoint_is_clear_error(tmp_path):
    enc = ItemEncoderModel(ItemEncoderConfig(encoder_type="clip", dim_per_modality=8),
        vision_cfg=VisionTowerConfig(variant="clip", image_size=32, patch_size=16,
            d_model=32, n_heads=4, d_mlp=48, n_layers=1, proj_dim=8),
        text_cfg=TextTowerConfig(variant="clip", vocab_size=100, max_len=8,
            d_model=32, n_heads=4, d_mlp=48, n_layers=1, proj_dim=8),
    )
    with pytest.raises(FileNotFoundError, match="model.safetensors"):
        load_item_encoder_params(enc, tmp_path)
