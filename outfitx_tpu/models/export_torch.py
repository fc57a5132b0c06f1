"""Export outfitx_tpu set-transformer params to the reference system's
torch checkpoint format.

Migration is bidirectional: `models/convert.py` ports HF/torch weights in;
this module writes weights OUT in the layout the reference's own
`load_checkpoint(only_load_model=True)` consumes (reference
distributed_trainer.py:456-476 — a ``.pth`` dict whose ``model`` entry is
the ``OutfitX`` state_dict: ``transformer_encoder.layers.{i}.*`` +
``outfit_token`` / ``cp_ffn`` / ``cir_ffn`` / ``target_item_image_emb``,
reference outfit_x.py:41-71). A reference user can therefore train here
and evaluate/serve THERE — validated in PARITY.md §6, where the
reference's own CP and FITB evaluators reproduced our metrics
bit-for-bit on exported weights.

torch is an export-time-only dependency (CPU build is fine).
"""

from __future__ import annotations

import pathlib
from typing import Dict

import jax
import numpy as np


def reference_state_dict(params) -> "Dict[str, object]":
    """Map our fused pytree onto the reference ``OutfitX.state_dict()``.

    Fused layouts are unpacked: ``wqkv (d, 3, d)`` becomes torch's
    stacked ``in_proj_weight (3d, d)``; all matrices transpose to torch's
    (out, in) convention.
    """
    import torch

    def t(x):
        # np.array (copy) not np.asarray: jax arrays surface as read-only
        # buffers, and torch.from_numpy on those is undefined behavior
        return torch.from_numpy(np.array(x, dtype=np.float32))

    sd: Dict[str, object] = {}
    L = params["layers"]
    n_layers = int(jax.tree.leaves(L)[0].shape[0])
    for i in range(n_layers):
        lp = jax.tree.map(lambda x: x[i], L)
        a, f = lp["attn"], lp["ffn"]
        p = f"transformer_encoder.layers.{i}."
        sd[p + "self_attn.in_proj_weight"] = torch.cat(
            [t(a["wqkv"][:, j]).T for j in range(3)], dim=0
        )
        sd[p + "self_attn.in_proj_bias"] = t(a["bqkv"]).reshape(-1)
        sd[p + "self_attn.out_proj.weight"] = t(a["wo"]).T
        sd[p + "self_attn.out_proj.bias"] = t(a["bo"])
        sd[p + "linear1.weight"] = t(f["w1"]).T
        sd[p + "linear1.bias"] = t(f["b1"])
        sd[p + "linear2.weight"] = t(f["w2"]).T
        sd[p + "linear2.bias"] = t(f["b2"])
        sd[p + "norm1.weight"] = t(lp["ln1"]["scale"])
        sd[p + "norm1.bias"] = t(lp["ln1"]["bias"])
        sd[p + "norm2.weight"] = t(lp["ln2"]["scale"])
        sd[p + "norm2.bias"] = t(lp["ln2"]["bias"])
    if "final_ln" in params:
        # reference builds nn.TransformerEncoder(norm=None); a final-LN
        # variant only round-trips into a matching torch stack
        sd["transformer_encoder.norm.weight"] = t(params["final_ln"]["scale"])
        sd["transformer_encoder.norm.bias"] = t(params["final_ln"]["bias"])
    sd["outfit_token"] = t(params["outfit_token"])
    sd["target_item_image_emb"] = t(params["target_image_emb"])
    sd["cp_ffn.1.weight"] = t(params["cp_head"]["w"]).T
    sd["cp_ffn.1.bias"] = t(params["cp_head"]["b"])
    sd["cir_ffn.0.weight"] = t(params["cir_proj"]["w"]).T
    return sd


def export_reference_checkpoint(
    ckpt_path: str | pathlib.Path,
    out: str | pathlib.Path,
    *,
    towers_from: str | pathlib.Path | None = None,
) -> pathlib.Path:
    """Orbax checkpoint -> reference-format ``.pth``.

    The dict shape mirrors the reference's ``save_checkpoint``
    (distributed_trainer.py:427-454); non-model entries are None — the
    reference's ``only_load_model=True`` path (and its demo/eval loaders)
    read only ``model``/``epoch``.

    Strict-loading compatibility: in a stock reference install the frozen
    towers ARE registered nn.Modules, so ``OutfitX.state_dict()`` contains
    ``item_encoder.*`` keys and the reference's loaders call
    ``load_state_dict(ckpt['model'])`` with the strict default
    (distributed_trainer.py:470, demo/app.py:103) — which raises on a
    set-transformer-only export. Two supported paths (MIGRATION.md):

    - ``towers_from``: any reference-side checkpoint containing the
      ``item_encoder.*`` tensors (every checkpoint the reference itself
      saves has them; one can be produced in a stock env with
      ``torch.save({'model': OutfitX(cfg).state_dict()}, 'towers.pth')``).
      Those frozen public-pretrained tensors are merged into the export so
      strict loading succeeds.
    - without it, load with ``strict=False`` — safe here because the
      missing keys are exactly the frozen towers that ``OutfitX.__init__``
      just constructed from their public checkpoints.
    """
    import torch

    from outfitx_tpu.train.checkpoint import CheckpointManager

    p = pathlib.Path(ckpt_path)
    mgr = CheckpointManager(p.parent.parent, p.parent.name)
    payload = mgr.restore(p.name)
    model_sd = reference_state_dict(payload["params"])
    if towers_from is not None:
        donor = torch.load(towers_from, map_location="cpu", weights_only=False)
        donor_sd = donor.get("model", donor) if isinstance(donor, dict) else donor
        towers = {
            k: v
            for k, v in donor_sd.items()
            if k.startswith("item_encoder.")
        }
        if not towers:
            raise ValueError(
                f"{towers_from} holds no item_encoder.* keys to merge"
            )
        model_sd.update(towers)
    out = pathlib.Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save(
        {
            "epoch": int(payload.get("meta", {}).get("epoch", 0)),
            "config": None,
            "model": model_sd,
            "optimizer": None,
            "scheduler": None,
            "scaler": None,
        },
        out,
    )
    return out
