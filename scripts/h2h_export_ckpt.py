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
    """Load our params into the reference OutfitX module via the product
    exporter's state_dict (outfitx_tpu/models/export_torch.py) —
    strict=True against the REAL reference module is the layout check."""
    from outfitx_tpu.models.export_torch import reference_state_dict

    missing, unexpected = module.load_state_dict(
        reference_state_dict(params), strict=False
    )
    # the reference module also carries the frozen item-encoder towers;
    # everything the exporter emits must land, nothing else may be missing
    # from the transformer/head surface
    assert not unexpected, unexpected
    assert all(k.startswith("item_encoder") for k in missing), missing


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
