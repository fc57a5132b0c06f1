"""Complementary-item-retrieval trainer (reference
complementary_item_retrieval_trainer.py, rebuilt TPU-native).

Semantics preserved: warm start from the CP best-AUC checkpoint (:344-359),
curriculum switch easy -> hard negatives at epoch 150 (:47-65), set-wise
ranking loss margin 2 (:459-460), Recall@{1,5,10,15,30,50} against
per-category 3000-item pools computed every 5 epochs or after the switch
(:173-181), checkpoints only after the switch epoch (:297-310).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.core.config import CIRTrainConfig, OutfitXConfig
from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.sampler import (
    CandidatePools,
    NegativeSampler,
    cir_eval_queries,
    cir_train_batches,
    eval_batches,
    sample_negatives_batch,
)
from outfitx_tpu.data.splits import OutfitSplit
from outfitx_tpu.evalm.retrieval_eval import recall_over_pools
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.parallel import gather_global
from outfitx_tpu.train.harness import Trainer
from outfitx_tpu.train.optim import make_optimizer
from outfitx_tpu.train.state import TrainState
from outfitx_tpu.train.steps import (
    make_cir_eval_loss_step,
    make_cir_eval_step,
    make_cir_train_step,
)


class CIRTrainer(Trainer):
    def __init__(
        self,
        cfg: CIRTrainConfig,
        model_cfg: Optional[OutfitXConfig] = None,
        run_mode: str = "train-valid",
        *,
        catalog: Optional[Catalog] = None,
        train_split: Optional[OutfitSplit] = None,
        valid_split: Optional[OutfitSplit] = None,
        eval_batch_size: Optional[int] = None,
        pool_threshold: Optional[int] = None,
    ):
        super().__init__(cfg, run_mode)
        self.model_cfg = model_cfg or OutfitXConfig()
        self._catalog = catalog
        self._train_split = train_split
        self._valid_split = valid_split
        self.eval_batch_size = eval_batch_size or cfg.batch_size
        # pool-eligibility threshold; tests shrink it for tiny catalogs
        self.pool_threshold = (
            pool_threshold
            if pool_threshold is not None
            else cfg.candidate_pool_size
        )

    @property
    def model_name(self) -> str:
        return f"{self.model_cfg.model_name}-cir"

    def best_metrics(self) -> Dict[str, str]:
        return {"recall@1": "max", "loss": "min"}

    # ------------------------------------------------------------ setup --
    def load_model(self) -> None:
        self.model = OutfitXModel(self.model_cfg)
        key = jax.random.PRNGKey(self.cfg.seed)
        pkey, dkey = jax.random.split(key)
        self.init_params = self.model.init(pkey)
        self.init_rng = dkey

    def load_optimizer(self) -> None:
        n_train = len(self._train_split) if self._train_split is not None else 0
        super_b = self.cfg.batch_size * self.cfg.accumulation_steps
        steps_per_epoch = max(n_train // super_b, 1)
        self.total_steps = steps_per_epoch * self.cfg.n_epochs
        self.tx = make_optimizer(self.cfg.optimizer, self.total_steps)
        self.init_params = self.shard_model_params(self.model, self.init_params)
        self.state = TrainState.create(self.init_params, self.tx, self.init_rng)
        self.train_step = make_cir_train_step(
            self.model, self.tx, margin=self.cfg.margin
        )
        self.eval_step = make_cir_eval_step(self.model)
        self.eval_loss_step = make_cir_eval_loss_step(margin=self.cfg.margin)

    def setup_data(self) -> None:
        if self._catalog is None:
            self._catalog = Catalog.from_polyvore(
                self.cfg.dataset_dir, model_name=self.model_cfg.model_name
            )
            self._train_split = OutfitSplit.load(
                self._catalog, self.cfg.dataset_dir, self.cfg.polyvore_type,
                "train", self.model_cfg.max_outfit_len,
            )
            eval_mode = "test" if self.run_mode == "test" else "valid"
            # the positive-eligibility rule shares the pool threshold: a
            # lowered --pool-threshold (small datasets) must free BOTH the
            # pool build and the eval-query eligibility, or every eval
            # query dies on the 3000-item large-category rule and recall
            # is NaN (default equals the reference's 3000 either way)
            self._valid_split = OutfitSplit.load(
                self._catalog, self.cfg.dataset_dir, self.cfg.polyvore_type,
                eval_mode, self.model_cfg.max_outfit_len,
                large_category_threshold=self.pool_threshold,
            )
        self.catalog_dev = jnp.asarray(self._catalog.embeddings)
        self._samplers = {
            "easy": NegativeSampler(self._catalog, "easy"),
            "hard": NegativeSampler(self._catalog, "hard"),
        }
        self._eval_queries = cir_eval_queries(
            self._valid_split,
            self._catalog,
            seed=self.cfg.seed,
            max_len=self.model_cfg.max_outfit_len,
        )
        self._pools = CandidatePools.build(
            self._catalog,
            self._valid_split,
            pool_size=self.cfg.candidate_pool_size,
            threshold=self.pool_threshold,
            seed=self.cfg.seed,
        )
        # Stage the (immutable) eval queries on device ONCE. Re-shipping
        # them every valid epoch — and worse, host-gathering pos/neg
        # EMBEDDINGS for the eval loss (~450 MB/epoch at envelope scale) —
        # leaks host RSS 1:1 in the axon relay's H2D path
        # (scripts/probe_rss_leak.py), which OOM-killed the envelope CIR
        # phase at ~epoch 261 (anon-rss 130.9 GB, dmesg). Per-epoch eval
        # H2D is now ~300 KB of fresh negative indices, nothing else.
        q = self._eval_queries
        self._eval_pos_idx_dev = jax.device_put(
            q["pos_idx"].astype(np.int32)
        )
        self._eval_batches_dev = None
        if jax.process_count() == 1:  # multihost uses the host branch
            self._eval_batches_dev = [
                (
                    {
                        k: jax.device_put(b[k])
                        for k in ("item_idx", "mask", "pos_idx")
                    },
                    b["valid"],
                )
                for b in eval_batches(
                    {
                        "item_idx": q["item_idx"],
                        "mask": q["mask"],
                        "pos_idx": q["pos_idx"],
                    },
                    batch_size=self.eval_batch_size,
                )
            ]
            valid = (
                np.concatenate([v for _, v in self._eval_batches_dev])
                if self._eval_batches_dev
                else np.zeros(0, dtype=bool)
            )
            self._eval_valid_idx_dev = jax.device_put(
                np.nonzero(valid)[0].astype(np.int32)
            )
        self.log(
            f"CIR data: train {len(self._train_split)} outfits, valid "
            f"{len(self._valid_split)}; {len(self._pools.pools)} candidate "
            f"pools x {self._pools.pool_size}"
        )

    def hook_after_setup(self) -> None:
        """Warm start from CP best-AUC params (reference :344-359)."""
        path = self.cfg.warm_start_from
        if path:
            payload = self.ckpt.restore(path)
            # Re-place restored host arrays onto the live params' shardings
            # (TP/FSDP): a plain replace() would silently re-replicate every
            # leaf over the mesh and forfeit the sharded-memory budget.
            params = jax.tree.map(
                lambda live, x: jax.device_put(x, live.sharding)
                if isinstance(live, jax.Array)
                else x,
                self.state.params,
                payload["params"],
            )
            self.state = self.state.replace(params=params)
            self.log(f"warm-started params from {path}")

    # ------------------------------------------------------------ train --
    def _mode_for_epoch(self, epoch: int) -> str:
        return "easy" if epoch < self.cfg.switch_to_hard_epoch else "hard"

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        mode = self._mode_for_epoch(epoch)
        losses = []
        for batch in cir_train_batches(
            self._train_split,
            self._catalog,
            batch_size=self.cfg.batch_size,
            accum_steps=self.cfg.accumulation_steps,
            epoch=epoch,
            seed=self.cfg.seed,
            n_negatives=self.cfg.n_negatives,
            sample_mode=mode,
            max_len=self.model_cfg.max_outfit_len,
            sampler=self._samplers[mode],
        ):
            self.state, out = self.train_step(self.state, self.catalog_dev, batch)
            losses.append(out["loss"])
        if not losses:
            return {}
        return {
            "loss": float(np.mean(gather_global(losses))),
            "neg_mode": 1.0 if mode == "hard" else 0.0,
        }

    # ------------------------------------------------------------- eval --
    def _predict_targets(self):
        """y_hats (n, D) for all eval queries.

        Single-process: a DEVICE array assembled from the pre-staged device
        batches — zero H2D per epoch (the downstream loss/recall consumers
        gather by index on device too). Multi-process SPMD: each host only
        addresses its local shards, so fall back to the host-reassembled
        np path via ``gather_global``."""
        q = self._eval_queries
        if len(q["pos_idx"]) == 0:  # no eval outfits survived the
            # large-category filter (tiny datasets)
            return np.zeros((0, self._catalog.d_embed), dtype=np.float32)
        if jax.process_count() > 1:
            outs = []
            valids = []
            for batch in eval_batches(
                {
                    "item_idx": q["item_idx"],
                    "mask": q["mask"],
                    "pos_idx": q["pos_idx"],
                },
                batch_size=self.eval_batch_size,
            ):
                y = self.eval_step(
                    self.state.params,
                    self.catalog_dev,
                    batch["item_idx"],
                    batch["mask"],
                    batch["pos_idx"],
                )
                outs.append(np.asarray(gather_global(y)))
                valids.append(batch["valid"])
            valid = np.concatenate(valids)
            return np.concatenate(outs)[valid]
        outs = [
            self.eval_step(
                self.state.params,
                self.catalog_dev,
                b["item_idx"],
                b["mask"],
                b["pos_idx"],
            )
            for b, _ in self._eval_batches_dev
        ]
        y = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        return jnp.take(y, self._eval_valid_idx_dev, axis=0)

    def _eval_loss(self, epoch: int, y_hats) -> float:
        """Ranking loss on eval queries with freshly sampled negatives
        (mirrors reference valid_epoch :122-170). ``y_hats`` is the
        already-computed `_predict_targets()` sweep — one eval forward per
        epoch is shared between loss and recall.

        The pos/neg embeddings are gathered from the device catalog by
        int32 index inside `eval_loss_step`; only the fresh negative
        indices (~300 KB) cross host->device per epoch (relay-leak
        hygiene — see setup_data)."""
        q = self._eval_queries
        mode = self._mode_for_epoch(epoch)
        neg_idx, neg_mask = sample_negatives_batch(
            self._samplers[mode],
            q["pos_idx"],
            k=self.cfg.n_negatives,
            seed=self.cfg.seed,
            epoch=epoch,
        )
        if not isinstance(y_hats, jax.Array):
            y_hats = jax.device_put(
                np.ascontiguousarray(y_hats, dtype=np.float32)
            )
        loss = self.eval_loss_step(
            self.catalog_dev,
            y_hats,
            self._eval_pos_idx_dev,
            jax.device_put(neg_idx.astype(np.int32)),
            jax.device_put(neg_mask),
        )
        return float(loss)

    def valid_epoch(self, epoch: int) -> Dict[str, float]:
        y_hats = self._predict_targets()
        metrics: Dict[str, float] = {"loss": self._eval_loss(epoch, y_hats)}
        if (
            epoch % self.cfg.recall_every == 0
            or epoch >= self.cfg.switch_to_hard_epoch
        ):
            q = self._eval_queries
            metrics.update(
                recall_over_pools(
                    y_hats,
                    q["pos_idx"],
                    q["pos_category"],
                    self._pools,
                    self.catalog_dev,
                    ks=self.cfg.recall_ks,
                )
            )
        # reference: checkpoints only after the curriculum switch (:297-310)
        if epoch >= self.cfg.switch_to_hard_epoch and "recall@1" in metrics:
            self.maybe_save_best(metrics, params=self.state.params, epoch=epoch)
        return metrics

    def test(self) -> Dict[str, float]:
        y_hats = self._predict_targets()
        q = self._eval_queries
        return recall_over_pools(
            y_hats,
            q["pos_idx"],
            q["pos_category"],
            self._pools,
            self.catalog_dev,
            ks=self.cfg.recall_ks,
        )
