"""Pretrained-weight porting: HF torch state_dicts -> JAX tower pytrees.

Covers the reference's tower families (SURVEY.md 2.1): CLIP
(patrickjohncyh/fashion-clip — CLIPVisionModelWithProjection /
CLIPTextModelWithProjection) and SigLIP (Marqo/marqo-fashionSigLIP —
SiglipVisionModel / SiglipTextModel). Conversion is pure renaming +
transposition (torch Linear stores (out, in); JAX uses (in, out)); parity
is asserted by tests/test_towers.py against offline-instantiated torch
models with random weights — the same path a real checkpoint takes.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def _t(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    return np.asarray(sd[name], dtype=np.float32)


def _lin(sd, prefix, *, bias=True):
    p = {"w": _t(sd, f"{prefix}.weight").T}
    if bias:
        p["b"] = _t(sd, f"{prefix}.bias")
    return p


def _ln(sd, prefix):
    return {"scale": _t(sd, f"{prefix}.weight"), "bias": _t(sd, f"{prefix}.bias")}


def _encoder_layers(sd, prefix, n_layers):
    layers = []
    for i in range(n_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{lp}.layer_norm1"),
                "ln2": _ln(sd, f"{lp}.layer_norm2"),
                "attn": {
                    "q": _lin(sd, f"{lp}.self_attn.q_proj"),
                    "k": _lin(sd, f"{lp}.self_attn.k_proj"),
                    "v": _lin(sd, f"{lp}.self_attn.v_proj"),
                    "o": _lin(sd, f"{lp}.self_attn.out_proj"),
                },
                "mlp": {
                    "fc1": _lin(sd, f"{lp}.mlp.fc1"),
                    "fc2": _lin(sd, f"{lp}.mlp.fc2"),
                },
            }
        )
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def convert_clip_vision(sd: Dict[str, np.ndarray], n_layers: int = 12):
    """CLIPVisionModelWithProjection state_dict -> VisionTower params."""
    pe = _t(sd, "vision_model.embeddings.patch_embedding.weight")  # (D,3,P,P)
    d = pe.shape[0]
    return {
        "patch": {"w": pe.reshape(d, -1).T},  # channel-first flatten matches patchify
        "cls": _t(sd, "vision_model.embeddings.class_embedding"),
        "pos_emb": _t(sd, "vision_model.embeddings.position_embedding.weight"),
        "pre_ln": _ln(sd, "vision_model.pre_layrnorm"),  # HF's typo'd name
        "layers": _encoder_layers(sd, "vision_model.encoder", n_layers),
        "post_ln": _ln(sd, "vision_model.post_layernorm"),
        "proj": _lin(sd, "visual_projection", bias=False),
    }


def convert_clip_text(sd: Dict[str, np.ndarray], n_layers: int = 12):
    return {
        "tok_emb": _t(sd, "text_model.embeddings.token_embedding.weight"),
        "pos_emb": _t(sd, "text_model.embeddings.position_embedding.weight"),
        "layers": _encoder_layers(sd, "text_model.encoder", n_layers),
        "final_ln": _ln(sd, "text_model.final_layer_norm"),
        "proj": _lin(sd, "text_projection", bias=False),
    }


def convert_siglip_vision(sd: Dict[str, np.ndarray], n_layers: int = 12):
    pe = _t(sd, "vision_model.embeddings.patch_embedding.weight")
    d = pe.shape[0]
    # SigLIP MAP head uses torch nn.MultiheadAttention: packed in_proj.
    in_w = _t(sd, "vision_model.head.attention.in_proj_weight")  # (3D, D)
    in_b = _t(sd, "vision_model.head.attention.in_proj_bias")
    qw, kw, vw = np.split(in_w, 3, axis=0)
    qb, kb, vb = np.split(in_b, 3, axis=0)
    return {
        "patch": {
            "w": pe.reshape(d, -1).T,
            "b": _t(sd, "vision_model.embeddings.patch_embedding.bias"),
        },
        "pos_emb": _t(sd, "vision_model.embeddings.position_embedding.weight"),
        "layers": _encoder_layers(sd, "vision_model.encoder", n_layers),
        "post_ln": _ln(sd, "vision_model.post_layernorm"),
        "map": {
            "probe": _t(sd, "vision_model.head.probe").reshape(-1),
            "attn": {
                "q": {"w": qw.T, "b": qb},
                "k": {"w": kw.T, "b": kb},
                "v": {"w": vw.T, "b": vb},
                "o": _lin(sd, "vision_model.head.attention.out_proj"),
            },
            "ln": _ln(sd, "vision_model.head.layernorm"),
            "mlp": {
                "fc1": _lin(sd, "vision_model.head.mlp.fc1"),
                "fc2": _lin(sd, "vision_model.head.mlp.fc2"),
            },
        },
    }


def convert_siglip_text(sd: Dict[str, np.ndarray], n_layers: int = 12):
    return {
        "tok_emb": _t(sd, "text_model.embeddings.token_embedding.weight"),
        "pos_emb": _t(sd, "text_model.embeddings.position_embedding.weight"),
        "layers": _encoder_layers(sd, "text_model.encoder", n_layers),
        "final_ln": _ln(sd, "text_model.final_layer_norm"),
        "proj": _lin(sd, "text_model.head", bias=True),
    }


CONVERTERS: Dict[str, Callable] = {
    "clip_vision": convert_clip_vision,
    "clip_text": convert_clip_text,
    "siglip_vision": convert_siglip_vision,
    "siglip_text": convert_siglip_text,
}


def state_dict_from_torch(module) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def state_dict_from_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)
