"""Jitted train/eval steps with a device-resident catalog.

TPU-first data path: the precomputed item-embedding catalog (N, D) lives in
HBM; host batches are *index arrays* (int32) and embeddings are gathered on
device inside the jitted step. This replaces the reference's Python-side
pydantic collate of embedding dicts (reference
outfit_x_base_processor.py:20-43, polyvore_compatibility_dataset.py:35-42) —
the usual host-input bottleneck — with an on-device gather that XLA fuses
into the forward pass.

Gradient accumulation: batches carry a leading accumulation axis A; grads are
averaged over microbatches with `lax.scan` inside ONE jitted step (the
reference's deferred optimizer step, compatibility_prediction_trainer.py:68-79,
without the per-step dist.barrier it also does — SURVEY.md flags that as a
cost not to replicate).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from outfitx_tpu.core.mesh import constrain
from outfitx_tpu.core.rng import fast_dropout_key
from outfitx_tpu.losses import focal_loss, set_wise_ranking_loss
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.train.state import TrainState


def _accumulate(loss_fn, params, batches, rng):
    """Scan microbatches; returns (mean_loss, mean_grads, stacked_aux)."""
    a = jax.tree.leaves(batches)[0].shape[0]

    def body(carry, xs):
        mb, i = xs
        mb_rng = jax.random.fold_in(rng, i)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, mb_rng
        )
        acc_loss, acc_grads = carry
        acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
        return (acc_loss + loss, acc_grads), aux

    zero_grads = jax.tree.map(jnp.zeros_like, params)
    (total_loss, total_grads), aux = jax.lax.scan(
        body, (jnp.zeros(()), zero_grads), (batches, jnp.arange(a))
    )
    scale = 1.0 / a
    grads = jax.tree.map(lambda g: g * scale, total_grads)
    return total_loss * scale, grads, aux


def make_cp_train_step(
    model: OutfitXModel,
    tx: optax.GradientTransformation,
    *,
    alpha: float = 0.75,
    gamma: float = 2.0,
    donate: bool = True,
) -> Callable:
    """CP train step.

    batch: {'item_idx': (A,B,L) i32, 'mask': (A,B,L) bool, 'label': (A,B) f32}
    Returns (new_state, {'loss', 'scores' (A,B), 'labels' (A,B)}).
    """

    def step(state: TrainState, catalog, batch):
        rng = fast_dropout_key(jax.random.fold_in(state.rng, state.step))

        def loss_with_cat(params, mb, mb_rng):
            emb = jnp.take(catalog, mb["item_idx"], axis=0)
            emb = constrain(emb, P("data", None, None))
            scores = model.cp_forward(
                params, emb, mb["mask"], deterministic=False, rng=mb_rng
            )
            return (
                focal_loss(scores, mb["label"], alpha=alpha, gamma=gamma),
                scores,
            )

        loss, grads, scores = _accumulate(loss_with_cat, state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, {
            "loss": loss,
            "scores": scores,
            "labels": batch["label"],
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_cp_eval_step(model: OutfitXModel) -> Callable:
    """Deterministic CP scoring: batch {'item_idx' (B,L), 'mask' (B,L)}."""

    def step(params, catalog, item_idx, mask):
        emb = jnp.take(catalog, item_idx, axis=0)
        emb = constrain(emb, P("data", None, None))
        return model.cp_forward(params, emb, mask, deterministic=True)

    return jax.jit(step)


def make_cir_train_step(
    model: OutfitXModel,
    tx: optax.GradientTransformation,
    *,
    margin: float = 2.0,
    donate: bool = True,
) -> Callable:
    """CIR train step.

    batch (leading accumulation axis A):
      'item_idx'  (A,B,L) i32  partial-outfit item indices
      'mask'      (A,B,L) bool pad mask
      'pos_idx'   (A,B)   i32  ground-truth target item
      'neg_idx'   (A,B,K) i32  negative items
      'neg_mask'  (A,B,K) bool True = padded negative
    The target-item *text* embedding is the second half of the catalog row
    (reference polyvore_item_dataset.py:57-92: text_embedding = emb[d//2:]).
    """

    def step(state: TrainState, catalog, batch):
        rng = fast_dropout_key(jax.random.fold_in(state.rng, state.step))
        d = catalog.shape[-1]

        def loss_fn(params, mb, mb_rng):
            emb = jnp.take(catalog, mb["item_idx"], axis=0)
            emb = constrain(emb, P("data", None, None))
            pos = jnp.take(catalog, mb["pos_idx"], axis=0)  # (B, D)
            negs = jnp.take(catalog, mb["neg_idx"], axis=0)  # (B, K, D)
            text_emb = pos[:, d // 2 :]
            pred = model.cir_forward(
                params, emb, mb["mask"], text_emb,
                deterministic=False, rng=mb_rng,
            )
            loss = set_wise_ranking_loss(
                pos, pred, negs, mb["neg_mask"], margin=margin
            )
            return loss, loss

        loss, grads, _ = _accumulate(loss_fn, state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_cir_eval_loss_step(*, margin: float = 2.0) -> Callable:
    """Eval-epoch ranking loss with DEVICE-side embedding gathers.

    The positives/negatives are gathered from the device-resident catalog
    by int32 row index, so the per-epoch host->device payload is ~300 KB of
    indices instead of the ~450 MB of f32 embeddings a host-side gather
    would ship. That volume matters beyond bandwidth: the axon relay
    client never frees H2D staging buffers (measured 1.000 MB RSS leaked
    per MB transferred, scripts/probe_rss_leak.py), which is what
    OOM-killed the envelope CIR phase at epoch ~261 (anon-rss 130.9 GB).

    Mirrors reference valid_epoch loss
    (complementary_item_retrieval_trainer.py:122-170)."""

    def step(catalog, y_hats, pos_idx, neg_idx, neg_mask):
        pos = jnp.take(catalog, pos_idx, axis=0)
        negs = jnp.take(catalog, neg_idx, axis=0)
        return set_wise_ranking_loss(
            pos, y_hats, negs, neg_mask, margin=margin
        )

    return jax.jit(step)


def make_cir_eval_step(model: OutfitXModel) -> Callable:
    """Predict target embeddings for retrieval eval: (B, D)."""

    def step(params, catalog, item_idx, mask, pos_idx):
        d = catalog.shape[-1]
        emb = jnp.take(catalog, item_idx, axis=0)
        emb = constrain(emb, P("data", None, None))
        text_emb = jnp.take(catalog, pos_idx, axis=0)[:, d // 2 :]
        return model.cir_forward(params, emb, mask, text_emb, deterministic=True)

    return jax.jit(step)


def make_fitb_eval_step(model: OutfitXModel) -> Callable:
    """FITB: argmin L2 between CIR output and 4 candidate embeddings.

    candidates come as catalog indices (B, C)."""

    def step(params, catalog, item_idx, mask, cand_idx, answer_text_idx):
        from outfitx_tpu.ops.retrieval import fitb_pick

        d = catalog.shape[-1]
        emb = jnp.take(catalog, item_idx, axis=0)
        emb = constrain(emb, P("data", None, None))
        text_emb = jnp.take(catalog, answer_text_idx, axis=0)[:, d // 2 :]
        pred = model.cir_forward(params, emb, mask, text_emb, deterministic=True)
        cands = jnp.take(catalog, cand_idx, axis=0)  # (B, C, D)
        return fitb_pick(pred, cands)

    return jax.jit(step)
