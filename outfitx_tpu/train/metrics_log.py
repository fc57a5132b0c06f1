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
import logging
import os
import pathlib
import time
from typing import Dict, Optional

log = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, log_dir: str | pathlib.Path, run_name: str):
        self.path = pathlib.Path(log_dir) / f"{run_name}_metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")
        self._wandb = self._attach_wandb(run_name)

    @staticmethod
    def _attach_wandb(run_name: str):
        """Attach the optional wandb sink; a failed attach warns, never raises.

        The attach is opt-in via WANDB_API_KEY. Failure modes are narrowed so a
        typo or API change can't silently disable the reference-parity metric
        sink (distributed_trainer.py:256-264): a missing package is expected and
        logged at debug, anything else (init failure, auth, API drift) warns
        loudly. JSONL remains the always-on sink either way.
        """
        if not os.environ.get("WANDB_API_KEY"):
            return None
        try:
            import wandb
        except ImportError:
            log.debug("WANDB_API_KEY set but the wandb package is unavailable")
            return None
        try:
            return wandb.init(project="outfitx-tpu", name=run_name)
        except Exception as e:  # noqa: BLE001 - wandb.init raises library-specific types
            log.warning("wandb attach failed (%s: %s); metrics go to JSONL only",
                        type(e).__name__, e)
            return None

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
