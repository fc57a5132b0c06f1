"""Structured metrics sink.

The reference logs metrics to wandb under `{metric}/{split}/{epoch|batch}`
namespacing (distributed_trainer.py:256-264,497-519; schema prototyped in
wandb_test.py). Here the always-available sink is a JSONL file per run
(machine-readable, greppable); wandb attaches on top when the package and
WANDB_API_KEY are present — never a hard dependency and never a hard-coded
key (the reference ships one in base_train_config.py:11; deliberately not
replicated).
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str | pathlib.Path, run_name: str):
        self.path = pathlib.Path(log_dir) / f"{run_name}_metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")
        self._wandb = None
        try:  # optional wandb attach
            import os

            if os.environ.get("WANDB_API_KEY"):
                import wandb

                self._wandb = wandb.init(project="outfitx-tpu", name=run_name)
        except Exception:
            self._wandb = None

    def log(
        self, split: str, epoch: int, metrics: Dict[str, float], step: Optional[int] = None
    ) -> None:
        rec = {
            "ts": time.time(),
            "split": split,
            "epoch": epoch,
            **({"step": step} if step is not None else {}),
            **{k: float(v) for k, v in metrics.items()},
        }
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(
                {f"{k}/{split}/epoch": v for k, v in metrics.items()},
                step=step,
            )

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
