"""Export outfitx_tpu-trained params into a reference-format torch
checkpoint, so the REFERENCE system's own evaluators (FITB test, CP test)
can run on weights trained by this framework — the strongest eval-protocol
parity check: identical weights + identical data, reference evaluator vs
ours.

Usage:
  python scripts/h2h_export_ckpt.py \
      --params /tmp/h2h_ours/ckpt/outfitx-tpu-siglip-d1536-cir/best_recall@1 \
      --out "/tmp/h2h_ref/checkpoints/complementary_item_retrieval/all-MiniLM-L6-v2_best_Recall@1.pth"
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.h2h_reference import install_stubs  # noqa: E402


def fill_state_dict(module, params) -> None:
    """Load our fused-pytree params into the reference OutfitX module
    (layout map mirrors tests/test_reference_parity.export_to_torch)."""
    import jax
    import numpy as np
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    L = params["layers"]
    with torch.no_grad():
        for i, tl in enumerate(module.transformer_encoder.layers):
            lp = jax.tree.map(lambda x: x[i], L)
            a = lp["attn"]
            tl.self_attn.in_proj_weight.copy_(
                torch.cat([t(a["wqkv"][:, j]).T for j in range(3)], dim=0)
            )
            tl.self_attn.in_proj_bias.copy_(t(a["bqkv"]).reshape(-1))
            tl.self_attn.out_proj.weight.copy_(t(a["wo"]).T)
            tl.self_attn.out_proj.bias.copy_(t(a["bo"]))
            tl.linear1.weight.copy_(t(lp["ffn"]["w1"]).T)
            tl.linear1.bias.copy_(t(lp["ffn"]["b1"]))
            tl.linear2.weight.copy_(t(lp["ffn"]["w2"]).T)
            tl.linear2.bias.copy_(t(lp["ffn"]["b2"]))
            tl.norm1.weight.copy_(t(lp["ln1"]["scale"]))
            tl.norm1.bias.copy_(t(lp["ln1"]["bias"]))
            tl.norm2.weight.copy_(t(lp["ln2"]["scale"]))
            tl.norm2.bias.copy_(t(lp["ln2"]["bias"]))
        module.outfit_token.copy_(t(params["outfit_token"]))
        module.target_item_image_emb.copy_(t(params["target_image_emb"]))
        module.cp_ffn[1].weight.copy_(t(params["cp_head"]["w"]).T)
        module.cp_ffn[1].bias.copy_(t(params["cp_head"]["b"]))
        module.cir_ffn[0].weight.copy_(t(params["cir_proj"]["w"]).T)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True, help="orbax checkpoint path")
    ap.add_argument("--out", required=True, help=".pth output path")
    args = ap.parse_args()

    install_stubs(os.devnull)
    sys.path.insert(0, "/root/reference")

    import torch

    from src.models import OutfitX

    from outfitx_tpu.train.checkpoint import CheckpointManager

    p = pathlib.Path(args.params)
    payload = CheckpointManager(p.parent.parent, p.parent.name).restore(p.name)
    module = OutfitX()
    fill_state_dict(module, payload["params"])

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save(
        {
            "epoch": payload.get("meta", {}).get("epoch", 0),
            "config": None,
            "model": module.state_dict(),
            "optimizer": None,
            "scheduler": None,
            "scaler": None,
        },
        out,
    )
    print(f"exported {args.params} -> {out}")


if __name__ == "__main__":
    main()
