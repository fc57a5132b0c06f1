"""ResNet-18 image tower in JAX (reference
resnet18_image_encoder.py: torchvision resnet18, frozen except a new
``fc`` -> d_embed head, :31-40).

torchvision-compatible layout: 7x7/2 stem conv + BN + ReLU + 3x3/2 maxpool,
four stages of two BasicBlocks (64/128/256/512, stride-2 downsample between
stages), global average pool, trainable ``fc``. BatchNorm runs in inference
mode on stored running statistics — the whole backbone is frozen in the
reference, so there is no train-mode BN to model; folding BN into an
affine (scale, bias) per channel keeps it one fused multiply-add on TPU.

Weight conversion (convert_resnet18) is keyed to torchvision state_dict
names so real pretrained weights load when available.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResNet18Config:
    d_out: int = 64  # the reference's new fc head width (d_embed)
    image_size: int = 224
    stage_channels: tuple = (64, 128, 256, 512)
    blocks_per_stage: int = 2
    bn_eps: float = 1e-5
    # bf16 MXU-rate convs (reference AMP autocast equivalent); BN is
    # folded-frozen so there are no running-stat precision concerns.
    # "float32" for torchvision parity tests.
    compute_dtype: str = "bfloat16"


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, (cout, cin, kh, kw))


def _bn_init(c):
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def _conv(x, w, stride, padding):
    # x (B, C, H, W), w (Cout, Cin, Kh, Kw) — torch layout end to end.
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn(x, p, eps):
    scale = (p["scale"] * jax.lax.rsqrt(p["var"] + eps)).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * scale).astype(x.dtype)
    return x * scale[None, :, None, None] + bias[None, :, None, None]


@dataclasses.dataclass(frozen=True)
class ResNet18:
    cfg: ResNet18Config = dataclasses.field(default_factory=ResNet18Config)

    def init(self, key: jax.Array) -> Dict:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 64))

        def block(cin, cout, downsample):
            p = {
                "conv1": _conv_init(next(keys), 3, 3, cin, cout),
                "bn1": _bn_init(cout),
                "conv2": _conv_init(next(keys), 3, 3, cout, cout),
                "bn2": _bn_init(cout),
            }
            if downsample:
                p["down_conv"] = _conv_init(next(keys), 1, 1, cin, cout)
                p["down_bn"] = _bn_init(cout)
            return p

        stages = []
        cin = 64
        for si, cout in enumerate(cfg.stage_channels):
            blocks = []
            for bi in range(cfg.blocks_per_stage):
                downsample = bi == 0 and (si > 0)
                blocks.append(block(cin if bi == 0 else cout, cout, downsample))
            stages.append(blocks)
            cin = cout
        bound = 1.0 / (cfg.stage_channels[-1] ** 0.5)
        backbone = {
            "conv1": _conv_init(next(keys), 7, 7, 3, 64),
            "bn1": _bn_init(64),
            "stages": stages,
        }
        fc = {
            "w": jax.random.uniform(
                next(keys), (cfg.stage_channels[-1], cfg.d_out),
                minval=-bound, maxval=bound,
            ),
            "b": jax.random.uniform(
                next(keys), (cfg.d_out,), minval=-bound, maxval=bound
            ),
        }
        return {"backbone": backbone, "fc": fc}

    def _block(self, p, x, stride, eps):
        y = _conv(x, p["conv1"], stride, [(1, 1), (1, 1)])
        y = jax.nn.relu(_bn(y, p["bn1"], eps))
        y = _conv(y, p["conv2"], 1, [(1, 1), (1, 1)])
        y = _bn(y, p["bn2"], eps)
        if "down_conv" in p:
            x = _bn(_conv(x, p["down_conv"], stride, [(0, 0), (0, 0)]), p["down_bn"], eps)
        return jax.nn.relu(x + y)

    def __call__(self, params: Dict, images: jax.Array) -> jax.Array:
        """images (B, 3, H, W) normalized -> (B, d_out)."""
        cfg = self.cfg
        eps = cfg.bn_eps
        bb = params["backbone"]
        images = images.astype(jnp.dtype(cfg.compute_dtype))
        x = _conv(images, bb["conv1"], 2, [(3, 3), (3, 3)])
        x = jax.nn.relu(_bn(x, bb["bn1"], eps))
        x = jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 1, 3, 3),
            window_strides=(1, 1, 2, 2),
            padding=((0, 0), (0, 0), (1, 1), (1, 1)),
        )
        for si, blocks in enumerate(bb["stages"]):
            for bi, bp in enumerate(blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = self._block(bp, x, stride, eps)
        x = jnp.mean(x, axis=(2, 3))  # global average pool
        fc = params["fc"]
        return jnp.dot(x, fc["w"].astype(x.dtype)) + fc["b"].astype(x.dtype)


def convert_resnet18(sd: Dict[str, np.ndarray], d_out: int = 64) -> Dict:
    """torchvision resnet18 state_dict -> params. The torchvision ``fc``
    (512 -> 1000) is replaced by a fresh head in the reference (:31-40), so
    ``fc`` here converts only if the provided fc matches d_out."""

    def arr(name):
        return np.asarray(sd[name], dtype=np.float32)

    def bn(prefix):
        return {
            "scale": arr(f"{prefix}.weight"),
            "bias": arr(f"{prefix}.bias"),
            "mean": arr(f"{prefix}.running_mean"),
            "var": arr(f"{prefix}.running_var"),
        }

    stages = []
    for si in range(4):
        blocks = []
        for bi in range(2):
            p = f"layer{si + 1}.{bi}"
            b = {
                "conv1": arr(f"{p}.conv1.weight"),
                "bn1": bn(f"{p}.bn1"),
                "conv2": arr(f"{p}.conv2.weight"),
                "bn2": bn(f"{p}.bn2"),
            }
            if f"{p}.downsample.0.weight" in sd:
                b["down_conv"] = arr(f"{p}.downsample.0.weight")
                b["down_bn"] = bn(f"{p}.downsample.1")
            blocks.append(b)
        stages.append(blocks)
    params = {
        "backbone": {
            "conv1": arr("conv1.weight"),
            "bn1": bn("bn1"),
            "stages": stages,
        }
    }
    if "fc.weight" in sd and sd["fc.weight"].shape[0] == d_out:
        params["fc"] = {"w": arr("fc.weight").T, "b": arr("fc.bias")}
    return params
