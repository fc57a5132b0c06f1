"""Fill-in-the-blank evaluator (reference fill_in_the_blank_trainer.py).

Test-only, as in the reference (:29-30 raises on train-valid); loads the CIR
best-Recall@1 checkpoint (:100-107); accuracy = argmin L2 over the 4
candidate embeddings (:37-64). The answer item's text embedding conditions
the query (the processor passes the answer's text half — reference
outfit_x_fill_in_the_blank_task_processor.py:9-19 builds the CIR input from
the target item).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.core.config import FITBTrainConfig, OutfitXConfig
from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.sampler import eval_batches
from outfitx_tpu.data.splits import FITBSplit
from outfitx_tpu.evalm import fitb_accuracy
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.parallel import gather_global
from outfitx_tpu.train.harness import Trainer
from outfitx_tpu.train.steps import make_fitb_eval_step


class FITBTrainer(Trainer):
    def __init__(
        self,
        cfg: FITBTrainConfig,
        model_cfg: Optional[OutfitXConfig] = None,
        run_mode: str = "test",
        *,
        catalog: Optional[Catalog] = None,
        test_split: Optional[FITBSplit] = None,
        eval_batch_size: int = 512,
    ):
        if run_mode != "test":
            # reference raises for train-valid (:29-30)
            raise ValueError("FITB supports run_mode='test' only")
        super().__init__(cfg, run_mode)
        self.model_cfg = model_cfg or OutfitXConfig()
        self._catalog = catalog
        self._test_split = test_split
        self.eval_batch_size = eval_batch_size

    @property
    def model_name(self) -> str:
        return f"{self.model_cfg.model_name}-fitb"

    def load_model(self) -> None:
        self.model = OutfitXModel(self.model_cfg)
        self.params = self.model.init(jax.random.PRNGKey(self.cfg.seed))

    def load_optimizer(self) -> None:  # eval-only
        self.eval_step = make_fitb_eval_step(self.model)

    def setup_data(self) -> None:
        if self._catalog is None:
            self._catalog = Catalog.from_polyvore(
                self.cfg.dataset_dir, model_name=self.model_cfg.model_name
            )
            self._test_split = FITBSplit.load(
                self._catalog, self.cfg.dataset_dir, self.cfg.polyvore_type,
                "test", self.model_cfg.max_outfit_len,
            )
        self.catalog_dev = jnp.asarray(self._catalog.embeddings)
        self.log(f"FITB: {len(self._test_split)} questions")

    def hook_after_setup(self) -> None:
        path = self.cfg.checkpoint_from
        if path:
            payload = self.ckpt.restore(path)
            self.params = payload["params"]
            self.log(f"loaded params from {path}")

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        raise NotImplementedError("FITB is test-only")

    valid_epoch = train_epoch

    def test(self) -> Dict[str, float]:
        split = self._test_split
        # The answer's row provides the text-embedding conditioning; use the
        # ground-truth answer (reference FITB dataset passes the answer item
        # as target, polyvore_fill_in_the_blank_dataset.py:38-41).
        answer_rows = split.cand_rows[
            np.arange(len(split)), split.answer_idx
        ].astype(np.int32)
        picks, valids, answers = [], [], []
        for batch in eval_batches(
            {
                "item_idx": split.item_rows,
                "mask": split.mask,
                "cand_rows": split.cand_rows,
                "answer_rows": answer_rows,
                "answer_idx": split.answer_idx,
            },
            batch_size=self.eval_batch_size,
        ):
            p = self.eval_step(
                self.params,
                self.catalog_dev,
                batch["item_idx"],
                batch["mask"],
                batch["cand_rows"],
                batch["answer_rows"],
            )
            picks.append(np.asarray(gather_global(p)))
            valids.append(batch["valid"])
            answers.append(batch["answer_idx"])
        valid = np.concatenate(valids)
        picks = np.concatenate(picks)[valid]
        answers = np.concatenate(answers)[valid]
        return {"accuracy": fitb_accuracy(picks, answers)}
