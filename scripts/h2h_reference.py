"""Run the ACTUAL reference trainers (torch, CPU/Gloo) for the head-to-head
quality comparison against outfitx_tpu.

The reference system (/root/reference) runs verbatim — this driver only:
  1. injects a `wandb` stub (absent here; captures every `run.log(...)` call
     to a JSONL so metric trajectories can be compared) and an `open_clip`
     stub (absent + zero egress; the frozen towers are *constructed* by
     `OutfitX.__init__` but never *called* on the precomputed-embedding
     training path — the stub raises if anything ever invokes it),
  2. sets the torchrun env vars for a single-process Gloo group
     (reference distributed_trainer.py:621-639, base_train_config.py:20),
  3. redirects the config's dataset/checkpoint/log paths off the read-only
     reference mount onto a work dir,
  4. shrinks epochs/batch/lr via the config's own dataclass fields.

Usage:
  python scripts/h2h_reference.py --task cp --dataset-dir /tmp/pv_h2h \
      --workdir /tmp/h2h_ref --epochs 16 --batch-size 256 --lr 1e-4 \
      --metrics-out /tmp/h2h_ref/cp_metrics.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import types


def install_stubs(metrics_path: str) -> None:
    import torch

    wandb = types.ModuleType("wandb")

    class _Run:
        def __init__(self, path):
            self._f = open(path, "a")

        def log(self, metrics, **kw):
            self._f.write(json.dumps(metrics, default=str) + "\n")
            self._f.flush()

        def finish(self):
            self._f.close()

    import importlib.machinery as _machinery

    wandb.login = lambda key=None, **kw: None
    wandb.init = lambda **kw: _Run(metrics_path)
    wandb.__spec__ = _machinery.ModuleSpec("wandb", loader=None)
    sys.modules["wandb"] = wandb

    oc = types.ModuleType("open_clip")

    class _StubTower(torch.nn.Module):
        """Stands in for the frozen SigLIP pair. The precomputed-embedding
        path never calls it (reference outfit_x.py only reaches
        item_encoder via precompute_embeddings); any call is a bug."""

        def __init__(self):
            super().__init__()
            self.visual = types.SimpleNamespace(image_size=(224, 224))

        def encode_image(self, x):
            raise RuntimeError("stubbed open_clip tower was called")

        def encode_text(self, x):
            raise RuntimeError("stubbed open_clip tower was called")

    oc.create_model_and_transforms = lambda name, **kw: (
        _StubTower(),
        None,
        lambda im: im,
    )
    oc.create_model = lambda name, **kw: _StubTower()
    oc.get_tokenizer = lambda name, **kw: (
        lambda texts: torch.zeros(len(texts), 1)
    )
    oc.__spec__ = _machinery.ModuleSpec("open_clip", loader=None)
    sys.modules["open_clip"] = oc

    # torchvision: imported at module scope by the resnet encoder family and
    # the base processor (`pad_video` is imported but never called,
    # outfit_x_base_processor.py:7); only the import surface is needed —
    # nothing on the precomputed-embedding path constructs these.
    def _absent(*a, **kw):
        raise RuntimeError("stubbed torchvision was called")

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet18 = _absent
    tv_models.ResNet18_Weights = types.SimpleNamespace(DEFAULT=None)
    tv_tr = types.ModuleType("torchvision.transforms")
    for name in (
        "Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
    ):
        setattr(tv_tr, name, _absent)
    tv_tr.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
    tv_tr.transforms = tv_tr  # `from torchvision.transforms import transforms`
    tv_v2 = types.ModuleType("torchvision.transforms.v2")
    tv_v2f = types.ModuleType("torchvision.transforms.v2.functional")
    tv_v2f.pad_video = _absent
    tv_v2.functional = tv_v2f
    tv_tr.v2 = tv_v2
    tv.models = tv_models
    tv.transforms = tv_tr
    import importlib.machinery

    for mod_name, mod in [
        ("torchvision", tv),
        ("torchvision.models", tv_models),
        ("torchvision.transforms", tv_tr),
        ("torchvision.transforms.v2", tv_v2),
        ("torchvision.transforms.v2.functional", tv_v2f),
    ]:
        # a real ModuleSpec so importlib.util.find_spec works (transformers
        # probes it; a None __spec__ raises ValueError there). The missing
        # dist-info metadata still marks the package "unavailable" to
        # transformers' version check, which is what we want.
        mod.__spec__ = importlib.machinery.ModuleSpec(mod_name, loader=None)
        sys.modules[mod_name] = mod


def redirect_paths(cfg, dataset_dir: pathlib.Path, workdir: pathlib.Path):
    """Point the reference config off the read-only mount. These are plain
    instance attributes set in BaseTrainConfig.__post_init__ (:53-61)."""
    cfg.dataset_dir = dataset_dir
    cfg.precomputed_embedding_dir = dataset_dir / "precomputed_embeddings"
    cfg.checkpoint_dir = workdir / "checkpoints" / cfg.run_name
    cfg.LOG_DIR = workdir / "logs"
    cfg.LOG_DIR.mkdir(parents=True, exist_ok=True)
    return cfg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["cp", "cir", "fitb"], required=True)
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--metrics-out", required=True)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--switch-epoch", type=int, default=8)  # cir curriculum
    # the CIR dataloaders hardcode persistent_workers=True, which torch
    # rejects at num_workers=0 — CIR needs at least 1 worker
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument(
        "--mode", default=None, help="run mode (default train-valid; fitb=test)"
    )
    args = ap.parse_args()

    workdir = pathlib.Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    dataset_dir = pathlib.Path(args.dataset_dir)
    pathlib.Path(args.metrics_out).parent.mkdir(parents=True, exist_ok=True)

    # torchrun -standalone -nproc_per_node=1 equivalent env
    os.environ.setdefault("LOCAL_RANK", "0")
    os.environ.setdefault("RANK", "0")
    os.environ.setdefault("WORLD_SIZE", "1")
    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    os.environ.setdefault("MASTER_PORT", "29517")

    install_stubs(args.metrics_out)
    sys.path.insert(0, "/root/reference")

    # torch >= 2.6 defaults torch.load(weights_only=True), which rejects the
    # reference's own checkpoints (they pickle its config dataclasses and
    # F.mish). These are the reference's own classes from its own save path
    # (save_checkpoint stuffs model_cfg.__dict__ in) — allowlist them.
    import torch
    import torch.nn.functional as F
    from src.models.configs.item_encoder_config import ItemEncoderConfig
    from src.models.configs.outfit_x_config import OutfitXConfig
    from src.models.configs.transformer_config import TransformerConfig

    torch.serialization.add_safe_globals(
        [ItemEncoderConfig, OutfitXConfig, TransformerConfig, F.mish]
    )

    common = dict(
        batch_size=args.batch_size,
        n_epochs=args.epochs,
        learning_rate=args.lr,
        accumulation_steps=args.accum,
        dataloader_workers=args.workers,  # 1 host core; default in-process
    )

    if args.task == "cp":
        from src.trains.configs.compatibility_prediction_train_config import (
            CompatibilityPredictionTrainConfig,
        )
        from src.trains.trainers.compatibility_prediction_trainer import (
            CompatibilityPredictionTrainer,
        )

        cfg = redirect_paths(
            CompatibilityPredictionTrainConfig(**common), dataset_dir, workdir
        )
        trainer = CompatibilityPredictionTrainer(
            cfg=cfg, run_mode=args.mode or "train-valid"
        )
    elif args.task == "cir":
        from src.trains.configs import ComplementaryItemRetrievalTrainConfig
        from src.trains.trainers.complementary_item_retrieval_trainer import (
            ComplementaryItemRetrievalTrainer,
        )

        cfg = redirect_paths(
            ComplementaryItemRetrievalTrainConfig(
                **common, switch_to_hard_n_epochs=args.switch_epoch
            ),
            dataset_dir,
            workdir,
        )
        trainer = ComplementaryItemRetrievalTrainer(
            cfg=cfg, run_mode=args.mode or "train-valid"
        )
    else:  # fitb (test-only in the reference, :29-30)
        from src.trains.configs.fill_in_the_blank_train_config import (
            FillInTheBlankTrainConfig,
        )
        from src.trains.trainers.fill_in_the_blank_trainer import (
            FillInTheBlankTrainer,
        )

        cfg = redirect_paths(
            FillInTheBlankTrainConfig(**common), dataset_dir, workdir
        )
        trainer = FillInTheBlankTrainer(cfg=cfg, run_mode=args.mode or "test")

    with trainer as t:
        # The reference uses `device=self.local_rank` (an int) everywhere,
        # which torch resolves to an *accelerator* index; on a CPU-only host
        # the equivalent device is the CPU. Attribute shim, not a code edit.
        import torch

        if not torch.cuda.is_available():
            t.local_rank = torch.device("cpu")
        t.run()
    print(f"h2h reference {args.task} done; metrics -> {args.metrics_out}")


if __name__ == "__main__":
    main()
