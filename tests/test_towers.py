"""Numerical-parity tests: JAX towers vs HF torch architectures.

HF model classes instantiate offline with random weights; porting those
weights through models/convert.py and matching outputs end-to-end proves the
converter + tower are exact — the identical path a real pretrained
checkpoint takes (SURVEY.md 7 'weight porting ... parity tests are
mandatory')."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from outfitx_tpu.models.convert import (
    convert_clip_text,
    convert_clip_vision,
    convert_siglip_text,
    convert_siglip_vision,
    state_dict_from_torch,
)
from outfitx_tpu.models.towers import (
    TextTower,
    TextTowerConfig,
    VisionTower,
    VisionTowerConfig,
)

ATOL = 2e-4


@pytest.fixture(scope="module")
def torch_seed():
    torch.manual_seed(0)
    return 0


class TestCLIPVisionParity:
    def test_matches_hf(self, torch_seed, rng):
        from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

        hf_cfg = CLIPVisionConfig(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            image_size=32,
            patch_size=16,
            projection_dim=48,
        )
        hf = CLIPVisionModelWithProjection(hf_cfg).eval()
        cfg = VisionTowerConfig(
            compute_dtype="float32",
            variant="clip",
            image_size=32,
            patch_size=16,
            d_model=64,
            n_heads=4,
            d_mlp=128,
            n_layers=3,
            proj_dim=48,
        )
        tower = VisionTower(cfg)
        params = convert_clip_vision(state_dict_from_torch(hf), n_layers=3)

        imgs = rng.standard_normal((5, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = hf(pixel_values=torch.from_numpy(imgs)).image_embeds.numpy()
        got = np.asarray(tower(params, jnp.asarray(imgs)))
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


class TestCLIPTextParity:
    def test_matches_hf(self, torch_seed, rng):
        from transformers import CLIPTextConfig, CLIPTextModelWithProjection

        hf_cfg = CLIPTextConfig(
            vocab_size=1000,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            max_position_embeddings=32,
            projection_dim=48,
            eos_token_id=999,
        )
        hf = CLIPTextModelWithProjection(hf_cfg).eval()
        cfg = TextTowerConfig(
            compute_dtype="float32",
            variant="clip",
            vocab_size=1000,
            max_len=32,
            d_model=64,
            n_heads=4,
            d_mlp=128,
            n_layers=3,
            proj_dim=48,
            eos_token_id=999,
        )
        tower = TextTower(cfg)
        params = convert_clip_text(state_dict_from_torch(hf), n_layers=3)

        ids = rng.integers(1, 900, size=(4, 16)).astype(np.int64)
        ids[:, -1] = 999  # eos at end
        ids[1, 10] = 999  # eos mid-sequence: pooling must pick position 10
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
        got = np.asarray(tower(params, jnp.asarray(ids.astype(np.int32))))
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


class TestSigLIPVisionParity:
    def test_matches_hf(self, torch_seed, rng):
        from transformers import SiglipVisionConfig, SiglipVisionModel

        hf_cfg = SiglipVisionConfig(
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            image_size=32,
            patch_size=16,
        )
        hf = SiglipVisionModel(hf_cfg).eval()
        cfg = VisionTowerConfig(
            compute_dtype="float32",
            variant="siglip",
            image_size=32,
            patch_size=16,
            d_model=64,
            n_heads=4,
            d_mlp=128,
            n_layers=3,
            act="gelu_tanh",
            ln_eps=1e-6,
        )
        tower = VisionTower(cfg)
        params = convert_siglip_vision(state_dict_from_torch(hf), n_layers=3)

        imgs = rng.standard_normal((5, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = hf(pixel_values=torch.from_numpy(imgs)).pooler_output.numpy()
        got = np.asarray(tower(params, jnp.asarray(imgs)))
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


class TestSigLIPTextParity:
    def test_matches_hf(self, torch_seed, rng):
        from transformers import SiglipTextConfig, SiglipTextModel

        hf_cfg = SiglipTextConfig(
            vocab_size=1000,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            max_position_embeddings=32,
        )
        hf = SiglipTextModel(hf_cfg).eval()
        cfg = TextTowerConfig(
            compute_dtype="float32",
            variant="siglip",
            vocab_size=1000,
            max_len=32,
            d_model=64,
            n_heads=4,
            d_mlp=128,
            n_layers=3,
            proj_dim=64,
            act="gelu_tanh",
            ln_eps=1e-6,
        )
        tower = TextTower(cfg)
        params = convert_siglip_text(state_dict_from_torch(hf), n_layers=3)

        ids = rng.integers(1, 900, size=(4, 32)).astype(np.int64)
        with torch.no_grad():
            want = hf(input_ids=torch.from_numpy(ids)).pooler_output.numpy()
        got = np.asarray(tower(params, jnp.asarray(ids.astype(np.int32))))
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)
