"""Original-CP trainer: end-to-end CP with the item encoder inside the
train step (reference original_cp_trainer.py — resnet18 + MiniLM family,
batch 350 x accum 10, :26-33; images/tokenized texts flow through
OutfitX._cp_forward's encoder_input_dict path, outfit_x.py:125-127).

TPU-native split of parameters:
- ``state.params`` = set-transformer + heads + the encoder's *trainable*
  heads (resnet fc / text proj) — what the optimizer updates;
- frozen tower backbones ride OUTSIDE the optimizer as a separate step
  argument (like the catalog), so AdamW weight decay cannot corrupt frozen
  pretrained weights and optimizer state isn't wasted on them.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import PartitionSpec as P

from outfitx_tpu.core.config import CPTrainConfig, OutfitXConfig
from outfitx_tpu.core.mesh import constrain
from outfitx_tpu.evalm import binary_classification_metrics
from outfitx_tpu.losses import focal_loss
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.models.item_encoder import ItemEncoderModel
from outfitx_tpu.parallel import gather_global
from outfitx_tpu.train.harness import Trainer
from outfitx_tpu.train.optim import make_optimizer
from outfitx_tpu.train.state import TrainState


class RawItemSource:
    """Supplies raw per-item inputs (images uint8 + token ids) by catalog
    row. Synthetic mode keeps banks in host memory; the Polyvore mode loads
    images from disk lazily."""

    def __init__(
        self,
        *,
        image_bank: np.ndarray,  # (N+1, 3, S, S) uint8; last row = pad zeros
        input_ids: np.ndarray,  # (N+1, T) int32
        attn: np.ndarray,  # (N+1, T) int32
    ):
        self.image_bank = image_bank
        self.input_ids = input_ids
        self.attn = attn

    @classmethod
    def synthetic(cls, n_items: int, image_size: int, text_len: int, vocab: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        images = rng.integers(
            0, 256, (n_items + 1, 3, image_size, image_size), dtype=np.uint8
        )
        images[-1] = 0  # pad row
        ids = rng.integers(1, vocab - 2, (n_items + 1, text_len)).astype(np.int32)
        ids[:, -1] = vocab - 1
        ids[-1] = 0
        attn = np.ones_like(ids)
        attn[-1] = 0
        return cls(image_bank=images, input_ids=ids, attn=attn)

    def gather(self, rows: np.ndarray) -> Dict[str, np.ndarray]:
        return {
            "images": self.image_bank[rows],
            "input_ids": self.input_ids[rows],
            "attn": self.attn[rows],
        }

    @classmethod
    def from_polyvore(
        cls,
        catalog,
        dataset_dir,
        *,
        image_size: int,
        tokenizer,
        text_len: int = 16,
        cache_uint8: bool = True,
    ) -> "RawItemSource":
        """Disk-backed source: decodes images/{id}.jpg once into a uint8 bank
        (the reference re-decodes + re-transforms per epoch in DataLoader
        workers, polyvore_item_dataset.py:77-81 — a large host-CPU tax this
        one-time decode avoids; 224px uint8 is ~150 KB/item). Texts are the
        item descriptions, tokenized once."""
        import pathlib

        from outfitx_tpu.data.preprocess import load_image_uint8

        dataset_dir = pathlib.Path(dataset_dir)
        n = catalog.n_items
        images = np.zeros((n + 1, 3, image_size, image_size), dtype=np.uint8)
        for row in range(n):
            path = dataset_dir / "images" / f"{int(catalog.item_ids[row])}.jpg"
            if path.exists():
                images[row] = load_image_uint8(str(path), image_size)
        texts = list(catalog.descriptions or [""] * n) + [""]
        ids, attn = tokenizer(texts, max_length=text_len)
        ids[-1] = 0
        attn[-1] = 0
        return cls(
            image_bank=images,
            input_ids=ids.astype(np.int32),
            attn=attn.astype(np.int32),
        )


class OriginalCPTrainer(Trainer):
    def __init__(
        self,
        cfg: CPTrainConfig,
        model_cfg: Optional[OutfitXConfig] = None,
        run_mode: str = "train-valid",
        *,
        encoder: Optional[ItemEncoderModel] = None,
        source: Optional[RawItemSource] = None,
        train_split=None,
        valid_split=None,
    ):
        super().__init__(cfg, run_mode)
        self.model_cfg = model_cfg or OutfitXConfig(
            item_encoder=__import__(
                "outfitx_tpu.core.config", fromlist=["ItemEncoderConfig"]
            ).ItemEncoderConfig.for_type("resnet_sbert")
        )
        self._encoder = encoder
        self._source = source
        self._train_split = train_split
        self._valid_split = valid_split

    @property
    def model_name(self) -> str:
        return f"{self.model_cfg.model_name}-original-cp"

    def best_metrics(self) -> Dict[str, str]:
        return {"auc": "max", "loss": "min"}

    # ------------------------------------------------------------ setup --
    def load_model(self) -> None:
        self.model = OutfitXModel(self.model_cfg)
        self.encoder = self._encoder or ItemEncoderModel(
            self.model_cfg.item_encoder
        )
        k1, k2, self.init_rng = jax.random.split(
            jax.random.PRNGKey(self.cfg.seed), 3
        )
        enc_params = self.encoder.init(k2)
        # split trainable heads from frozen backbones
        self.frozen = {
            "vision": {
                k: v for k, v in enc_params["vision"].items() if k != "fc"
            },
            "text": {
                k: v for k, v in enc_params["text"].items() if k != "proj"
            },
        }
        trainable_enc = {}
        if self.encoder.has_trainable_heads:
            trainable_enc = {
                "fc": enc_params["vision"]["fc"],
                "proj": enc_params["text"]["proj"],
            }
        self.init_params = {
            "model": self.model.init(k1),
            "enc_heads": trainable_enc,
        }

    def load_optimizer(self) -> None:
        n_train = len(self._train_split) if self._train_split is not None else 0
        super_b = self.cfg.batch_size * self.cfg.accumulation_steps
        steps_per_epoch = max(n_train // super_b, 1)
        self.tx = make_optimizer(
            self.cfg.optimizer, steps_per_epoch * self.cfg.n_epochs
        )
        # TP/FSDP specs apply to the set-transformer subtree; the tiny
        # trainable encoder heads (and the frozen towers) stay replicated —
        # the towers' FLOPs are DP-sharded by the batch constraint in
        # `_build_steps`, which is where the win is at this model's scale.
        self.init_params = {
            "model": self.shard_model_params(
                self.model, self.init_params["model"]
            ),
            "enc_heads": self.init_params["enc_heads"],
        }
        self.state = TrainState.create(self.init_params, self.tx, self.init_rng)
        self._build_steps()

    def _encode_items(self, params, frozen, mb):
        """(B, L, ...) raw inputs -> (B, L, D) item embeddings."""
        b, l = mb["mask"].shape
        enc_params = {
            "vision": dict(frozen["vision"]),
            "text": dict(frozen["text"]),
        }
        if self.encoder.has_trainable_heads:
            enc_params["vision"]["fc"] = params["enc_heads"]["fc"]
            enc_params["text"]["proj"] = params["enc_heads"]["proj"]
        s = mb["images"].shape[-1]
        t = mb["input_ids"].shape[-1]
        emb = self.encoder.encode(
            enc_params,
            mb["images"].reshape(b * l, 3, s, s),
            mb["input_ids"].reshape(b * l, t),
            mb["attn"].reshape(b * l, t),
        )
        return emb.reshape(b, l, -1)

    def _build_steps(self) -> None:
        tx = self.tx
        alpha, gamma = self.cfg.focal_alpha, self.cfg.focal_gamma

        def loss_fn(params, frozen, mb, rng):
            # DP-shard the raw microbatch over the data axis BEFORE the
            # towers, so the resnet/MiniLM forward+backward (the dominant
            # FLOPs of this end-to-end path) runs sharded rather than
            # replicated (no-op on a 1-device mesh)
            mb = {
                k: constrain(v, P("data", *([None] * (v.ndim - 1))))
                for k, v in mb.items()
            }
            emb = self._encode_items(params, frozen, mb)
            scores = self.model.cp_forward(
                params["model"], emb, mb["mask"], deterministic=False, rng=rng
            )
            return (
                focal_loss(scores, mb["label"], alpha=alpha, gamma=gamma),
                scores,
            )

        def train_step(state: TrainState, frozen, batch):
            from outfitx_tpu.core.rng import fast_dropout_key

            rng = fast_dropout_key(jax.random.fold_in(state.rng, state.step))
            a = batch["label"].shape[0]

            def body(carry, xs):
                mb, i = xs
                (loss, scores), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(carry[1], frozen, mb, jax.random.fold_in(rng, i))
                return (carry[0] + loss, carry[1], jax.tree.map(jnp.add, carry[2], grads)), scores

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (tot, _, grads), scores = jax.lax.scan(
                body, (jnp.zeros(()), state.params, zero),
                (batch, jnp.arange(a)),
            )
            grads = jax.tree.map(lambda g: g / a, grads)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1, params=params, opt_state=opt_state
                ),
                {"loss": tot / a, "scores": scores, "labels": batch["label"]},
            )

        def eval_step(params, frozen, batch):
            emb = self._encode_items(params, frozen, batch)
            return self.model.cp_forward(params["model"], emb, batch["mask"])

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(eval_step)

    def setup_data(self) -> None:
        if self._source is None or self._train_split is None:
            from outfitx_tpu.data.catalog import Catalog
            from outfitx_tpu.data.splits import CPSplit
            from outfitx_tpu.data.tokenizer import load_tokenizer

            catalog = Catalog.from_metadata_only(self.cfg.dataset_dir)
            self._train_split = CPSplit.load(
                catalog, self.cfg.dataset_dir, self.cfg.polyvore_type,
                "train", self.model_cfg.max_outfit_len,
            )
            self._valid_split = CPSplit.load(
                catalog, self.cfg.dataset_dir, self.cfg.polyvore_type,
                "valid", self.model_cfg.max_outfit_len,
            )
            tokenizer = load_tokenizer(
                self.model_cfg.item_encoder.text_model_name,
                vocab_size=self.encoder.text.cfg.vocab_size,
            )
            self._source = RawItemSource.from_polyvore(
                catalog, self.cfg.dataset_dir,
                image_size=self.encoder.image_size,
                tokenizer=tokenizer,
                text_len=min(16, self.encoder.text.cfg.max_len),
            )

    # ------------------------------------------------------------ train --
    def _batches(self, split, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng([self.cfg.seed, epoch, 7])
        n = len(split)
        order = rng.permutation(n)
        bsz = self.cfg.batch_size
        a = self.cfg.accumulation_steps
        super_b = bsz * a
        l = split.item_rows.shape[1]
        for start in range(0, n - super_b + 1, super_b):
            sel = order[start : start + super_b]
            rows = split.item_rows[sel]  # (super_b, L)
            raw = self._source.gather(rows.ravel())
            s = raw["images"].shape[-1]
            t = raw["input_ids"].shape[-1]
            yield {
                "images": raw["images"].reshape(a, bsz, l, 3, s, s),
                "input_ids": raw["input_ids"].reshape(a, bsz, l, t),
                "attn": raw["attn"].reshape(a, bsz, l, t),
                "mask": split.mask[sel].reshape(a, bsz, l),
                "label": split.labels[sel].reshape(a, bsz),
            }

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        losses, scores_all, labels_all = [], [], []
        for batch in self._batches(self._train_split, epoch):
            self.state, out = self.train_step(self.state, self.frozen, batch)
            losses.append(out["loss"])
            scores_all.append(out["scores"])
            labels_all.append(out["labels"])
        if not losses:
            return {}
        scores = np.concatenate(
            [np.asarray(s).ravel() for s in gather_global(scores_all)]
        )
        labels = np.concatenate(
            [np.asarray(x).ravel() for x in gather_global(labels_all)]
        )
        m = binary_classification_metrics(scores, labels, from_logits=True)
        m["loss"] = float(np.mean(gather_global(losses)))
        return m

    def valid_epoch(self, epoch: int) -> Dict[str, float]:
        from outfitx_tpu.data.sampler import eval_batches

        split = self._valid_split
        scores_all, labels_all, valids = [], [], []
        bsz = self.cfg.batch_size
        l = split.item_rows.shape[1]
        for eb in eval_batches(
            {
                "item_rows": split.item_rows,
                "mask": split.mask,
                "label": split.labels,
            },
            batch_size=bsz,
        ):
            raw = self._source.gather(eb["item_rows"].ravel())
            s = raw["images"].shape[-1]
            t = raw["input_ids"].shape[-1]
            batch = {
                "images": raw["images"].reshape(bsz, l, 3, s, s),
                "input_ids": raw["input_ids"].reshape(bsz, l, t),
                "attn": raw["attn"].reshape(bsz, l, t),
                "mask": eb["mask"],
            }
            scores_all.append(np.asarray(gather_global(
                self.eval_step(self.state.params, self.frozen, batch)
            )))
            labels_all.append(eb["label"])
            valids.append(eb["valid"])
        if not scores_all:
            return {}
        valid = np.concatenate(valids)
        scores = np.concatenate(scores_all)[valid]
        labels = np.concatenate(labels_all)[valid]
        m = binary_classification_metrics(scores, labels, from_logits=True)
        m["loss"] = float(
            focal_loss(
                jnp.asarray(scores),
                jnp.asarray(labels),
                alpha=self.cfg.focal_alpha,
                gamma=self.cfg.focal_gamma,
            )
        )
        self.maybe_save_best(m, params=self.state.params, epoch=epoch)
        return m

    def test(self) -> Dict[str, float]:
        return self.valid_epoch(self.epoch)
