"""Optimizer: AdamW + OneCycle + global-norm clip via optax.

Matches the reference envelope (compatibility_prediction_trainer.py:351-367):
AdamW lr 2e-5, OneCycleLR(pct_start .3, cosine, div_factor 25, final_div 1e4),
clip-norm 1.0 applied per optimizer step after accumulation. The reference's
GradScaler is dropped — bf16 needs no loss scaling (SURVEY.md 7).
"""

from __future__ import annotations

import optax

from outfitx_tpu.core.config import OptimizerConfig


def make_schedule(cfg: OptimizerConfig, total_steps: int):
    if cfg.schedule == "onecycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 1),
            peak_value=cfg.learning_rate,
            pct_start=cfg.pct_start,
            div_factor=cfg.div_factor,
            final_div_factor=cfg.final_div_factor,
        )
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(
    cfg: OptimizerConfig, total_steps: int
) -> optax.GradientTransformation:
    schedule = make_schedule(cfg, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.b1,
            b2=cfg.b2,
            weight_decay=cfg.weight_decay,
        ),
    )
