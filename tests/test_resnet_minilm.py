"""Parity tests for the resnet_sbert tower family.

- MiniLM backbone vs offline-instantiated HF BertModel (random weights
  ported through convert_minilm; mean pooling checked separately).
- ResNet18 vs a torch oracle assembled here with torchvision-compatible
  module names (torchvision itself is not installed), weights ported
  through convert_resnet18.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from outfitx_tpu.models.towers.minilm import MiniLM, MiniLMConfig, convert_minilm
from outfitx_tpu.models.towers.resnet import (
    ResNet18,
    ResNet18Config,
    convert_resnet18,
)


class TestMiniLMParity:
    def test_backbone_matches_bert(self, rng):
        from transformers import BertConfig, BertModel

        torch.manual_seed(0)
        hf = BertModel(
            BertConfig(
                vocab_size=500,
                hidden_size=48,
                num_hidden_layers=2,
                num_attention_heads=4,
                intermediate_size=96,
                max_position_embeddings=64,
            )
        ).eval()
        cfg = MiniLMConfig(
            compute_dtype="float32",
            vocab_size=500, max_len=64, d_model=48, n_heads=4, d_mlp=96,
            n_layers=2, d_out=16,
        )
        model = MiniLM(cfg)
        params = model.init(jax.random.PRNGKey(0))
        params = {
            "backbone": convert_minilm(
                {k: v.numpy() for k, v in hf.state_dict().items()}, n_layers=2
            ),
            "proj": params["proj"],
        }
        ids = rng.integers(1, 400, (3, 20)).astype(np.int64)
        mask = np.ones((3, 20), dtype=np.int64)
        mask[1, 12:] = 0  # padded row
        with torch.no_grad():
            out = hf(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            ).last_hidden_state.numpy()
        # reproduce reference mean pooling (model_utils.py:15-24) on torch out
        w = mask[:, :, None].astype(np.float32)
        want_pooled = (out * w).sum(1) / np.maximum(w.sum(1), 1e-9)

        got = np.asarray(
            model(
                params,
                jnp.asarray(ids.astype(np.int32)),
                jnp.asarray(mask.astype(np.int32)),
            )
        )
        # compare pre-projection pooling by inverting the (fresh) projection:
        # instead, compare pooled through an identity-check: project want
        pw = np.asarray(params["proj"]["w"])
        pb = np.asarray(params["proj"]["b"])
        want = want_pooled @ pw + pb
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def _torch_resnet18(d_out: int):
    """torchvision-compatible resnet18 oracle (standard architecture,
    torchvision state_dict naming)."""

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(idt + y)

    class ResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            chans = [64, 128, 256, 512]
            cin = 64
            for si, c in enumerate(chans):
                blocks = []
                for bi in range(2):
                    stride = 2 if (bi == 0 and si > 0) else 1
                    blocks.append(BasicBlock(cin if bi == 0 else c, c, stride))
                setattr(self, f"layer{si + 1}", tnn.Sequential(*blocks))
                cin = c
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(512, d_out)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(1, 5):
                x = getattr(self, f"layer{i}")(x)
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    return ResNet()


class TestResNet18Parity:
    def test_matches_torch_oracle(self, rng):
        torch.manual_seed(1)
        oracle = _torch_resnet18(d_out=16).eval()
        # randomize BN running stats so the frozen-BN path is actually tested
        for m in oracle.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
        model = ResNet18(ResNet18Config(d_out=16, image_size=64, compute_dtype="float32"))
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        params = convert_resnet18(sd, d_out=16)
        assert "fc" in params  # matching width -> fc converted too

        imgs = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = oracle(torch.from_numpy(imgs)).numpy()
        got = np.asarray(model(params, jnp.asarray(imgs)))
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    def test_fresh_fc_when_width_differs(self):
        torch.manual_seed(1)
        oracle = _torch_resnet18(d_out=1000)
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        params = convert_resnet18(sd, d_out=16)
        assert "fc" not in params  # 1000 != 16 -> head must be re-initialized


class TestResnetSbertEncoder:
    def test_trainable_heads_get_gradients(self, rng):
        from outfitx_tpu.core.config import ItemEncoderConfig
        from outfitx_tpu.models.item_encoder import ItemEncoderModel
        from outfitx_tpu.models.towers.minilm import MiniLMConfig
        from outfitx_tpu.models.towers.resnet import ResNet18Config

        enc = ItemEncoderModel(
            ItemEncoderConfig(encoder_type="resnet_sbert", dim_per_modality=8),
            vision_cfg=ResNet18Config(d_out=8, image_size=32),
            text_cfg=MiniLMConfig(
            compute_dtype="float32",
                vocab_size=100, max_len=16, d_model=24, n_heads=4, d_mlp=48,
                n_layers=1, d_out=8,
            ),
        )
        params = enc.init(jax.random.PRNGKey(0))
        imgs = jnp.asarray(
            rng.integers(0, 256, (2, 3, 32, 32), dtype=np.uint8)
        )
        ids = jnp.asarray(rng.integers(1, 90, (2, 16)).astype(np.int32))
        mask = jnp.ones((2, 16), dtype=jnp.int32)

        def loss(p):
            return jnp.sum(enc.encode(p, imgs, ids, mask) ** 2)

        g = jax.grad(loss)(params)
        fc_g = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["vision"]["fc"]))
        proj_g = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["text"]["proj"]))
        frozen_g = sum(
            float(jnp.abs(x).sum())
            for x in jax.tree.leaves(g["vision"]["backbone"])
        ) + sum(
            float(jnp.abs(x).sum())
            for x in jax.tree.leaves(g["text"]["backbone"])
        )
        assert fc_g > 0 and proj_g > 0  # heads train
        assert frozen_g == 0.0  # backbones frozen
