"""Compatibility-prediction trainer (reference
compatibility_prediction_trainer.py, rebuilt TPU-native).

Semantics preserved: FocalLoss(alpha .75, gamma 2), AdamW 2e-5 + OneCycle,
grad accumulation + clip 1.0, epoch-level AUC/Acc/P/R/F1 over the *full*
epoch's predictions, best-checkpoint tracking on AUC and loss. Dropped by
design: per-step dist.barrier (:80-81, flagged costly in SURVEY.md), the DDP
all_gather of predictions (under SPMD the host sees globally-sharded outputs
directly), and GradScaler (bf16).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.core.config import CPTrainConfig, OutfitXConfig
from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.sampler import (
    cp_epoch_order,
    cp_train_batches,
    eval_batches,
)
from outfitx_tpu.data.splits import CPSplit
from outfitx_tpu.evalm import binary_classification_metrics
from outfitx_tpu.losses import focal_loss
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.parallel import gather_global
from outfitx_tpu.train.harness import Trainer
from outfitx_tpu.train.optim import make_optimizer
from outfitx_tpu.train.state import TrainState
from outfitx_tpu.train.steps import make_cp_eval_step, make_cp_train_step


def _make_super_batch_gather(accum_steps: int, batch_size: int):
    """ONE jitted program (a single remote compile, reused every step of
    every epoch) that slices a train super-batch out of the device-resident
    split tensors by shuffle order. `start` is a traced scalar so each of
    the epoch's steps hits the same executable."""
    super_b = accum_steps * batch_size

    @jax.jit
    def gather(item_idx, mask, label, order, start):
        sel = jax.lax.dynamic_slice_in_dim(order, start, super_b)
        return (
            jnp.take(item_idx, sel, axis=0).reshape(
                accum_steps, batch_size, -1
            ),
            jnp.take(mask, sel, axis=0).reshape(accum_steps, batch_size, -1),
            jnp.take(label, sel, axis=0).reshape(accum_steps, batch_size),
        )

    return gather


class CPTrainer(Trainer):
    def __init__(
        self,
        cfg: CPTrainConfig,
        model_cfg: Optional[OutfitXConfig] = None,
        run_mode: str = "train-valid",
        *,
        catalog: Optional[Catalog] = None,
        train_split: Optional[CPSplit] = None,
        valid_split: Optional[CPSplit] = None,
        eval_batch_size: Optional[int] = None,
        device_batches: bool = True,
    ):
        super().__init__(cfg, run_mode)
        self.model_cfg = model_cfg or OutfitXConfig()
        self._catalog = catalog
        self._train_split = train_split
        self._valid_split = valid_split
        self.eval_batch_size = eval_batch_size or cfg.batch_size
        # Stage the split on device and gather batches there (single-
        # process only); False forces the host np generator — the
        # multihost path and the equivalence-test baseline.
        self.device_batches = device_batches

    @property
    def model_name(self) -> str:
        return f"{self.model_cfg.model_name}-cp"

    def best_metrics(self) -> Dict[str, str]:
        return {"auc": "max", "loss": "min"}

    # ------------------------------------------------------------ setup --
    def load_model(self) -> None:
        self.model = OutfitXModel(self.model_cfg)
        key = jax.random.PRNGKey(self.cfg.seed)
        pkey, dkey = jax.random.split(key)
        self.init_params = self.model.init(pkey)
        self.init_rng = dkey

    def load_optimizer(self) -> None:
        # total optimizer steps for the OneCycle horizon
        n_train = len(self._train_split) if self._train_split is not None else 0
        super_b = self.cfg.batch_size * self.cfg.accumulation_steps
        steps_per_epoch = max(n_train // super_b, 1)
        self.total_steps = steps_per_epoch * self.cfg.n_epochs
        self.tx = make_optimizer(self.cfg.optimizer, self.total_steps)
        self.init_params = self.shard_model_params(self.model, self.init_params)
        self.state = TrainState.create(self.init_params, self.tx, self.init_rng)
        self.train_step = make_cp_train_step(
            self.model,
            self.tx,
            alpha=self.cfg.focal_alpha,
            gamma=self.cfg.focal_gamma,
        )
        self.eval_step = make_cp_eval_step(self.model)
        # jitted per-example eval loss: one program instead of ~10 eager
        # ufunc dispatches per eval batch (each a remote execution through
        # the relay, and each shipping its Python scalar constants H2D)
        import functools

        self._eval_loss_fn = jax.jit(
            functools.partial(
                focal_loss,
                alpha=self.cfg.focal_alpha,
                gamma=self.cfg.focal_gamma,
                reduction="none",
            )
        )

    def setup_data(self) -> None:
        if self._catalog is None:
            self._catalog = Catalog.from_polyvore(
                self.cfg.dataset_dir, model_name=self.model_cfg.model_name
            )
            self._train_split = CPSplit.load(
                self._catalog, self.cfg.dataset_dir, self.cfg.polyvore_type,
                "train", self.model_cfg.max_outfit_len,
            )
            # test mode evaluates the test split (reference
            # setup_test_dataloader); train-valid uses valid
            eval_mode = "test" if self.run_mode == "test" else "valid"
            self._valid_split = CPSplit.load(
                self._catalog, self.cfg.dataset_dir, self.cfg.polyvore_type,
                eval_mode, self.model_cfg.max_outfit_len,
            )
        self.catalog_dev = jnp.asarray(self._catalog.embeddings)
        self.log(
            f"catalog: {self._catalog.n_items} items x {self._catalog.d_embed}d "
            f"({self.catalog_dev.nbytes / 1e6:.1f} MB on device); "
            f"train {len(self._train_split)}, valid {len(self._valid_split)} outfits"
        )
        # Device-resident splits (relay-leak hygiene, see CIR setup_data /
        # BENCHMARKS.md post-mortem): the split tensors are staged ONCE and
        # batches gathered on device by the shuffle order, so per-epoch H2D
        # is the 0.4 MB int32 order instead of ~34 MB of gathered batch
        # tensors (~1.4 s/epoch of relay time, 6.8 GB leaked RSS over the
        # 200-epoch envelope). Multi-process keeps the host generator.
        self._train_split_dev = None
        self._eval_batches_dev = None
        if self.device_batches and jax.process_count() == 1:
            self._train_split_dev = {
                "item_idx": jax.device_put(self._train_split.item_rows),
                "mask": jax.device_put(self._train_split.mask),
                "label": jax.device_put(self._train_split.labels),
            }
            self._gather_super_batch = _make_super_batch_gather(
                self.cfg.accumulation_steps, self.cfg.batch_size
            )
            # the eval split never changes: device arrays for the step +
            # host labels/valid for the metric accumulation
            self._eval_batches_dev = [
                (
                    {
                        "item_idx": jax.device_put(b["item_idx"]),
                        "mask": jax.device_put(b["mask"]),
                        "label": jax.device_put(b["label"]),
                    },
                    b["label"],
                    b["valid"],
                )
                for b in eval_batches(
                    {
                        "item_idx": self._valid_split.item_rows,
                        "mask": self._valid_split.mask,
                        "label": self._valid_split.labels,
                    },
                    batch_size=self.eval_batch_size,
                )
            ]

    # ------------------------------------------------------------ train --
    def _iter_train_batches(self, epoch: int):
        """Per-epoch super-batches: gathered ON DEVICE from the staged
        split by the (identical) stateless shuffle order when staging is
        active, else the host np generator."""
        if self._train_split_dev is None:
            yield from cp_train_batches(
                self._train_split,
                batch_size=self.cfg.batch_size,
                accum_steps=self.cfg.accumulation_steps,
                epoch=epoch,
                seed=self.cfg.seed,
            )
            return
        n = len(self._train_split)
        super_b = self.cfg.batch_size * self.cfg.accumulation_steps
        order = jax.device_put(
            cp_epoch_order(n, seed=self.cfg.seed, epoch=epoch).astype(
                np.int32
            )
        )
        s = self._train_split_dev
        for start in range(0, n - super_b + 1, super_b):
            item_idx, mask, label = self._gather_super_batch(
                s["item_idx"],
                s["mask"],
                s["label"],
                order,
                jax.device_put(np.int32(start)),
            )
            yield {"item_idx": item_idx, "mask": mask, "label": label}

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        losses, all_scores, all_labels = [], [], []
        log_every = self.cfg.log_every_steps
        for step_i, batch in enumerate(self._iter_train_batches(epoch)):
            self.state, out = self.train_step(
                self.state, self.catalog_dev, batch
            )
            losses.append(out["loss"])
            all_scores.append(out["scores"])
            all_labels.append(out["labels"])
            if log_every and (step_i + 1) % log_every == 0:
                # per-batch stream (reference {metric}/train/batch)
                self.metrics_log.log(
                    "train_batch", epoch,
                    {"loss": float(jax.device_get(out["loss"]))},
                    step=int(jax.device_get(self.state.step)),
                )
        if not losses:
            return {}
        # One host sync at epoch end (losses/scores pulled together);
        # multi-host-safe: gather_global reassembles globally-sharded
        # outputs on every process (reference dist.all_gather :384-399).
        losses = [float(x) for x in gather_global(losses)]
        scores = np.concatenate(
            [np.asarray(s).ravel() for s in gather_global(all_scores)]
        )
        labels = np.concatenate(
            [np.asarray(l).ravel() for l in gather_global(all_labels)]
        )
        metrics = binary_classification_metrics(scores, labels, from_logits=True)
        metrics["loss"] = float(np.mean(losses))
        return metrics

    def _eval_split(self, split: CPSplit) -> Dict[str, float]:
        # the eval split is immutable: use the device-staged batches when
        # they cover this split (H2D-free epochs), else batch from host
        if self._eval_batches_dev is not None and split is self._valid_split:
            batches = iter(self._eval_batches_dev)
        else:
            batches = (
                (batch, batch["label"], batch["valid"])
                for batch in eval_batches(
                    {
                        "item_idx": split.item_rows,
                        "mask": split.mask,
                        "label": split.labels,
                    },
                    batch_size=self.eval_batch_size,
                )
            )
        scores_all, labels_all, valid_all, losses = [], [], [], []
        for batch, label_host, valid in batches:
            s = self.eval_step(
                self.state.params,
                self.catalog_dev,
                batch["item_idx"],
                batch["mask"],
            )
            # per-example loss so the final batch's wrap-around pad rows
            # (eval_batches 'valid' mask) are excluded from the mean too,
            # not only from the score metrics
            losses.append(
                np.asarray(gather_global(self._eval_loss_fn(s, batch["label"])))
            )
            scores_all.append(np.asarray(gather_global(s)))
            labels_all.append(label_host)
            valid_all.append(valid)
        if not scores_all:
            return {}
        valid = np.concatenate(valid_all)
        scores = np.concatenate(scores_all)[valid]
        labels = np.concatenate(labels_all)[valid]
        metrics = binary_classification_metrics(scores, labels, from_logits=True)
        metrics["loss"] = float(np.mean(np.concatenate(losses)[valid]))
        return metrics

    def valid_epoch(self, epoch: int) -> Dict[str, float]:
        metrics = self._eval_split(self._valid_split)
        if metrics:
            self.maybe_save_best(metrics, params=self.state.params, epoch=epoch)
        return metrics

    def test(self) -> Dict[str, float]:
        return self._eval_split(self._valid_split)
