"""Pretrained tower-weight loading for the item encoder.

Assembles ItemEncoderModel params from downloaded HF checkpoint
directories (each containing ``model.safetensors`` or
``pytorch_model.bin``), using the converters in models/convert.py. This is
the production path for the reference's pretrained towers
(patrickjohncyh/fashion-clip, Marqo/marqo-fashionSigLIP — SURVEY.md 2.1);
in a network-less environment the encoder falls back to random init.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional

import numpy as np

from outfitx_tpu.models.convert import (
    convert_clip_text,
    convert_clip_vision,
    convert_siglip_text,
    convert_siglip_vision,
)
from outfitx_tpu.models.item_encoder import ItemEncoderModel


def _load_state_dict(path: pathlib.Path) -> Dict[str, np.ndarray]:
    st = path / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return load_file(str(st))
    bin_path = path / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(str(bin_path), map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin under {path}"
    )


def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if any(k.startswith(prefix) for k in sd):
        return {
            (k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in sd.items()
        }
    return sd


def load_item_encoder_params(
    encoder: ItemEncoderModel,
    checkpoint_dir: str | pathlib.Path,
    *,
    init_params: Optional[Dict] = None,
) -> Dict:
    """Params pytree for ``encoder`` with pretrained tower weights.

    ``checkpoint_dir`` holds the HF checkpoint (single dual-tower dir, or
    ``vision/`` + ``text/`` subdirectories). ``init_params`` supplies any
    leaves the checkpoint does not cover (e.g. fresh resnet fc / MiniLM proj
    heads).
    """
    checkpoint_dir = pathlib.Path(checkpoint_dir)
    etype = encoder.cfg.encoder_type
    vis_dir = checkpoint_dir / "vision"
    txt_dir = checkpoint_dir / "text"
    if not vis_dir.exists():
        vis_dir = checkpoint_dir
    if not txt_dir.exists():
        txt_dir = checkpoint_dir

    n_v = encoder.vision.cfg.n_layers
    n_t = encoder.text.cfg.n_layers
    if etype == "clip":
        vsd = _load_state_dict(vis_dir)
        tsd = _load_state_dict(txt_dir)
        vision = convert_clip_vision(vsd, n_layers=n_v)
        text = convert_clip_text(tsd, n_layers=n_t)
    elif etype == "siglip":
        vsd = _load_state_dict(vis_dir)
        tsd = _load_state_dict(txt_dir)
        vision = convert_siglip_vision(vsd, n_layers=n_v)
        text = convert_siglip_text(tsd, n_layers=n_t)
    elif etype == "resnet_sbert":
        from outfitx_tpu.models.towers.minilm import convert_minilm
        from outfitx_tpu.models.towers.resnet import convert_resnet18

        if init_params is None:
            raise ValueError(
                "resnet_sbert needs init_params for its fresh fc/proj heads"
            )
        vsd = _load_state_dict(vis_dir)
        tsd = _strip_prefix(_load_state_dict(txt_dir), "bert.")
        converted = convert_resnet18(vsd, d_out=encoder.cfg.dim_per_modality)
        vision = {
            "backbone": converted["backbone"],
            "fc": converted.get("fc", init_params["vision"]["fc"]),
        }
        text = {
            "backbone": convert_minilm(tsd, n_layers=n_t),
            "proj": init_params["text"]["proj"],
        }
    else:
        raise NotImplementedError(etype)
    return {"vision": vision, "text": text}
