"""The OutfitX set-transformer: outfit encoder + task heads, TPU-first.

Functional re-design of the reference model (reference src/models/outfit_x.py):

- parameters are a plain pytree; the 6 encoder layers are *stacked* along a
  leading axis and applied with `lax.scan` (one trace/compile per layer type,
  optionally rematerialized);
- pre-LN residual blocks, 16 heads, d_ffn 2024, mish, dropout 0.3, and no
  final LayerNorm — matching the reference's live hyperparameters
  (transformer_config.py:7-24, outfit_x.py:32-45). Dropout placement:
  attention-output, FFN-inner, and FFN-output dropout match torch's
  TransformerEncoderLayer; the attention-*probability* dropout inside
  torch MHA is deliberately folded into the output dropout instead (same
  rate, kernel-friendly — the fused Pallas core never materializes probs).
  Eval-mode numerics are identical either way (parity-tested);
- task heads (outfit_x.py:46-90): CP = learnable prefix `outfit_token` +
  Linear(d -> 1) on its output state (:120-144); CIR/FITB = target token
  concat(learnable image half, given text half) + bias-free Linear(d -> d)
  (:147-172); key-padding mask True = pad, prefix never masked (:133-136);
- tensor-parallel ready: attention heads and FFN hidden shard Megatron-style
  over the 'model' mesh axis, batch over 'data' (replaces the reference's
  DDP-only parallelism, SURVEY.md 2.8).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.sharding import PartitionSpec as P

from outfitx_tpu.core import dtypes
from outfitx_tpu.core import rng as rng_ops
from outfitx_tpu.core.config import OutfitXConfig
from outfitx_tpu.core.mesh import constrain
from outfitx_tpu.ops import layer_norm, masked_mha, resolve_activation

Params = Dict[str, Any]


class Task(enum.Enum):
    """Task dispatch (reference outfit_x.py:84-90 maps task dataclasses to
    forwards; FITB reuses the CIR forward)."""

    CP = "cp"
    CIR = "cir"
    FITB = "fitb"
    PRECOMPUTE = "precompute"


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(
        key, shape, minval=-bound, maxval=bound, dtype=dtype
    )


@dataclasses.dataclass(frozen=True)
class OutfitXModel:
    """Stateless model: `init` builds the param pytree, `*_forward` apply it."""

    cfg: OutfitXConfig = dataclasses.field(default_factory=OutfitXConfig)

    # ------------------------------------------------------------- init --
    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        d = cfg.d_embed
        ffn = cfg.transformer.d_ffn
        n_layers = cfg.transformer.n_layers
        pdt = dtypes.resolve(cfg.param_dtype)
        keys = jax.random.split(key, 8)

        def layer_init(k):
            ks = jax.random.split(k, 6)
            bd = 1.0 / (d**0.5)
            bf = 1.0 / (ffn**0.5)
            return {
                "ln1": {"scale": jnp.ones((d,), pdt), "bias": jnp.zeros((d,), pdt)},
                "ln2": {"scale": jnp.ones((d,), pdt), "bias": jnp.zeros((d,), pdt)},
                "attn": {
                    # Xavier-uniform QKV/out projections (torch MHA default).
                    # Q/K/V are fused into one (d, 3, d) weight — a single
                    # (B*S, d) x (d, 3d) MXU matmul instead of three;
                    # wqkv[:, 0/1/2] are the per-projection slices.
                    "wqkv": jnp.stack(
                        [
                            _uniform(ks[i], (d, d), (6.0 / (2 * d)) ** 0.5, pdt)
                            for i in range(3)
                        ],
                        axis=1,
                    ),
                    "wo": _uniform(ks[3], (d, d), bd, pdt),
                    "bqkv": jnp.zeros((3, d), pdt),
                    "bo": jnp.zeros((d,), pdt),
                },
                "ffn": {
                    "w1": _uniform(ks[4], (d, ffn), bd, pdt),
                    "b1": _uniform(ks[4], (ffn,), bd, pdt),
                    "w2": _uniform(ks[5], (ffn, d), bf, pdt),
                    "b2": _uniform(ks[5], (d,), bf, pdt),
                },
            }

        layer_keys = jax.random.split(keys[0], n_layers)
        layers = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[layer_init(k) for k in layer_keys]
        )
        bd = 1.0 / (d**0.5)
        params = {
            "layers": layers,
            # prefix tokens: randn * 0.02 (outfit_x.py:53-55, :69-71)
            "outfit_token": 0.02 * jax.random.normal(keys[1], (d,), pdt),
            "target_image_emb": 0.02
            * jax.random.normal(keys[2], (d // 2,), pdt),
            "cp_head": {
                "w": _uniform(keys[3], (d, 1), bd, pdt),
                "b": _uniform(keys[4], (1,), bd, pdt),
            },
            "cir_proj": {"w": _uniform(keys[5], (d, d), bd, pdt)},
        }
        if cfg.transformer.final_norm:
            # torch nn.TransformerEncoder(norm=LayerNorm(d)); the reference
            # passes norm=None, so this is opt-in (final_norm=False default).
            params["final_ln"] = {
                "scale": jnp.ones((d,), pdt),
                "bias": jnp.zeros((d,), pdt),
            }
        return params

    # -------------------------------------------------- partition specs --
    def param_partition_specs(self, *, fsdp: bool = False) -> Params:
        """Megatron-style TP: QKV/FFN-in column-sharded, out-proj/FFN-out
        row-sharded over 'model'. Leading stacked-layer axis unsharded.
        With ``fsdp`` the other matrix dimension additionally shards over
        'data' (ZeRO-3); XLA all-gathers weights at each use and
        reduce-scatters their grads."""
        dax = "data" if fsdp else None
        col = P(None, dax, "model")
        row = P(None, "model", dax)
        rep1 = P(None, None)
        specs = {
            "layers": {
                "ln1": {"scale": rep1, "bias": rep1},
                "ln2": {"scale": rep1, "bias": rep1},
                "attn": {
                    # wqkv is (layers, d_in, 3, d_out): column-sharded on
                    # d_out (each of Q/K/V Megatron-split over 'model').
                    "wqkv": P(None, dax, None, "model"),
                    "wo": row,
                    "bqkv": P(None, None, "model"),
                    "bo": rep1,
                },
                "ffn": {
                    "w1": col, "b1": P(None, "model"),
                    "w2": row, "b2": rep1,
                },
            },
            "outfit_token": P(None),
            "target_image_emb": P(None),
            "cp_head": {"w": P(None, None), "b": P(None)},
            "cir_proj": {"w": P(None, None)},
        }
        if self.cfg.transformer.final_norm:
            specs["final_ln"] = {"scale": P(None), "bias": P(None)}
        return specs

    # ---------------------------------------------------------- encoder --
    def _layer(self, lp: Params, x, pad_mask, rng, deterministic: bool):
        cfg = self.cfg
        h = cfg.transformer.n_heads
        b, s, d = x.shape
        dh = d // h
        drop = cfg.transformer.dropout

        def dropout(k, t, pad_tail: int = 0):
            """``pad_tail``: the last ``pad_tail`` units of t's final dim are
            apply-time zero-padding (ffn_pad_to) — the mask is drawn at the
            REAL width so the RNG stream matches the unpadded model, then
            extended with False (the padded entries are zero either way)."""
            if deterministic or drop == 0.0:
                return t
            shape = t.shape[:-1] + (t.shape[-1] - pad_tail,)
            keep, q = rng_ops.keep_mask(k, drop, shape)
            # Named so the 'masks' remat policy can save the masks across
            # the checkpoint boundary instead of regenerating them in the
            # backward pass (bool masks are cheap to hold: ~266 MB/layer at
            # the B=3072 envelope vs regenerating ~1.6B draws).
            keep = checkpoint_name(keep, "dropout_mask")
            if pad_tail:
                keep = jnp.pad(
                    keep, [(0, 0)] * (keep.ndim - 1) + [(0, pad_tail)]
                )
            return jnp.where(keep, t / q, jnp.zeros_like(t))

        k1, k2, k3, k4 = jax.random.split(rng, 4)
        norm_first = cfg.transformer.norm_first
        act = resolve_activation(cfg.transformer.activation)

        # --- self-attention block (pre-LN default; post-LN when
        # norm_first=False, matching torch TransformerEncoderLayer) ---
        y = (
            layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
            if norm_first
            else x
        )
        a = lp["attn"]

        from outfitx_tpu.ops.attn_block import (
            attn_block,
            fused_attn_block_enabled,
        )

        from outfitx_tpu.ops.common import use_interpret

        if (
            deterministic
            and fused_attn_block_enabled()
            and (jax.device_count() == 1 or use_interpret())
        ):
            # OUTFITX_ATTN_BLOCK=fused: QKV projection + attention +
            # out-projection in ONE Pallas kernel — no HBM materialization
            # of the (B, S, 3, d) qkv tensor or its head transposes
            # (ops/attn_block.py). Eval/serving forward only (no VJP);
            # single-program contexts only — the compiled custom call does
            # not partition, so a >1-TPU process (mesh training/eval with
            # the env var exported) keeps the decomposed path. Interpret
            # mode (CPU tests, incl. the 8-fake-device harness) stays
            # routable: there the call is ordinary traced JAX.
            o = attn_block(
                y,
                a["wqkv"].astype(y.dtype),
                a["bqkv"].astype(y.dtype),
                a["wo"].astype(y.dtype),
                pad_mask,
                h,
            ).astype(y.dtype) + a["bo"].astype(y.dtype)
            o = constrain(o, P("data", None, None))
            x = x + o
        else:
            # Fused QKV: one (B*S, d) x (d, 3d) matmul feeding all three
            # heads' projections (better MXU occupancy than three d x d
            # matmuls).
            w = a["wqkv"].astype(y.dtype).reshape(d, 3 * d)
            qkv = jnp.dot(y, w).reshape(b, s, 3, d) + a["bqkv"].astype(y.dtype)
            qkv = constrain(qkv, P("data", None, None, "model"))
            qkv = qkv.reshape(b, s, 3, h, dh).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B,H,S,Dh) each
            o = masked_mha(q, k, v, pad_mask)  # (B,H,S,Dh)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
            o = jnp.dot(o, a["wo"].astype(o.dtype)) + a["bo"].astype(o.dtype)
            o = constrain(o, P("data", None, None))
            x = x + dropout(k1, o)
        if not norm_first:
            x = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])

        # --- FFN block ---
        y = (
            layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
            if norm_first
            else x
        )
        f = lp["ffn"]
        w1 = f["w1"].astype(y.dtype)
        b1 = f["b1"].astype(y.dtype)
        w2 = f["w2"].astype(y.dtype)
        # MXU lane alignment (config.ffn_pad_to): zero-pad the hidden dim at
        # apply time. Exact — mish(0)=0, zero w2 rows, dropout mask drawn at
        # the real width (see `dropout`); params/checkpoints keep d_ffn.
        pad_tail = max(0, cfg.transformer.ffn_pad_to - cfg.transformer.d_ffn)
        if pad_tail:
            w1 = jnp.pad(w1, ((0, 0), (0, pad_tail)))
            b1 = jnp.pad(b1, ((0, pad_tail),))
            w2 = jnp.pad(w2, ((0, pad_tail), (0, 0)))
        hmid = act(jnp.dot(y, w1) + b1)
        hmid = constrain(hmid, P("data", None, "model"))
        hmid = dropout(k3, hmid, pad_tail=pad_tail)
        o = jnp.dot(hmid, w2) + f["b2"].astype(hmid.dtype)
        o = constrain(o, P("data", None, None))
        x = x + dropout(k4, o)
        if not norm_first:
            x = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
        return x

    def encode_set(
        self,
        params: Params,
        tokens: jax.Array,  # (B, S, D)
        pad_mask: jax.Array,  # (B, S) bool, True = pad
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        cdt = dtypes.resolve(cfg.compute_dtype)
        x = tokens.astype(cdt)
        x = constrain(x, P("data", None, None))
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def body(carry, lp_and_idx):
            lp, idx = lp_and_idx
            layer_rng = jax.random.fold_in(rng, idx)
            out = self._layer(lp, carry, pad_mask, layer_rng, deterministic)
            return out, None

        layer_fn = body
        if cfg.transformer.n_layers > 0:
            if cfg.remat:
                if cfg.remat_policy == "dots":
                    policy = jax.checkpoint_policies.dots_saveable
                elif cfg.remat_policy == "masks":
                    policy = jax.checkpoint_policies.save_only_these_names(
                        "dropout_mask"
                    )
                else:
                    policy = None
                layer_fn = jax.checkpoint(body, policy=policy)
            idxs = jnp.arange(cfg.transformer.n_layers)
            x, _ = jax.lax.scan(layer_fn, x, (params["layers"], idxs))
        if cfg.transformer.final_norm:
            fl = params["final_ln"]
            x = layer_norm(x, fl["scale"], fl["bias"])
        return x

    # ------------------------------------------------------- task heads --
    def cp_forward(
        self,
        params: Params,
        outfit_embedding: jax.Array,  # (B, L, D)
        outfit_mask: jax.Array,  # (B, L) bool True=pad
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Compatibility scores (B,) — logits (reference outfit_x.py:120-144)."""
        cdt = dtypes.resolve(self.cfg.compute_dtype)
        b = outfit_embedding.shape[0]
        tok = jnp.broadcast_to(
            params["outfit_token"].astype(cdt)[None, None, :],
            (b, 1, self.cfg.d_embed),
        )
        x = jnp.concatenate([tok, outfit_embedding.astype(cdt)], axis=1)
        mask = jnp.concatenate(
            [jnp.zeros((b, 1), dtype=bool), outfit_mask], axis=1
        )
        states = self.encode_set(
            params, x, mask, deterministic=deterministic, rng=rng
        )
        token_state = states[:, 0, :]
        if not deterministic and self.cfg.transformer.dropout > 0 and rng is not None:
            # Head dropout (reference cp_ffn Dropout, outfit_x.py:57-61)
            # through the same measured keep_mask mechanism as the layer
            # dropouts (uint8 bits by default, OUTFITX_DROPOUT_BITS=exact
            # restores bernoulli) — one dropout surface, one flag.
            hk = jax.random.fold_in(rng, 10_000)
            keep, q = rng_ops.keep_mask(
                hk, self.cfg.transformer.dropout, token_state.shape
            )
            token_state = jnp.where(
                keep, token_state / q, jnp.zeros_like(token_state)
            )
        h = params["cp_head"]
        scores = (
            jnp.dot(token_state, h["w"].astype(cdt)) + h["b"].astype(cdt)
        )
        return scores[:, 0].astype(jnp.float32)

    def cir_forward(
        self,
        params: Params,
        outfit_embedding: jax.Array,  # (B, L, D)
        outfit_mask: jax.Array,  # (B, L)
        target_item_text_embedding: jax.Array,  # (B, D//2)
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Predicted target-item embedding (B, D) (reference outfit_x.py:147-172)."""
        cdt = dtypes.resolve(self.cfg.compute_dtype)
        b = outfit_embedding.shape[0]
        img_half = jnp.broadcast_to(
            params["target_image_emb"].astype(cdt)[None, :],
            (b, self.cfg.d_embed // 2),
        )
        target_tok = jnp.concatenate(
            [img_half, target_item_text_embedding.astype(cdt)], axis=-1
        )[:, None, :]
        x = jnp.concatenate([target_tok, outfit_embedding.astype(cdt)], axis=1)
        mask = jnp.concatenate(
            [jnp.zeros((b, 1), dtype=bool), outfit_mask], axis=1
        )
        states = self.encode_set(
            params, x, mask, deterministic=deterministic, rng=rng
        )
        out = jnp.dot(states[:, 0, :], params["cir_proj"]["w"].astype(cdt))
        return out.astype(jnp.float32)

    # FITB shares the CIR forward (reference outfit_x.py:87).
    fitb_forward = cir_forward

    def forward(self, params: Params, task: Task, *args, **kwargs):
        if task is Task.CP:
            return self.cp_forward(params, *args, **kwargs)
        if task in (Task.CIR, Task.FITB):
            return self.cir_forward(params, *args, **kwargs)
        raise KeyError(f"unsupported task: {task}")

    def n_params(self, params: Params) -> int:
        return sum(x.size for x in jax.tree.leaves(params))
