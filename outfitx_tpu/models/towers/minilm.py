"""MiniLM (BERT-architecture) text tower with mean pooling + trainable
projection (reference hugging_face_text_encoder.py:
sentence-transformers/all-MiniLM-L6-v2 frozen, mean pooling :61-64,
trainable Linear -> d_embed :27-30; pooling math model_utils.py:15-24).

BERT is post-LN (unlike CLIP/SigLIP): attention -> add&LN -> gelu MLP ->
add&LN, with embeddings LayerNorm after word+position+token_type sums.
Weight conversion is keyed to HF BertModel state_dict names; parity is
tested against an offline-instantiated BertModel.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.models.towers.common import init_linear, init_ln, linear
from outfitx_tpu.ops import layer_norm, masked_mha


@dataclasses.dataclass(frozen=True)
class MiniLMConfig:
    vocab_size: int = 30522
    max_len: int = 512
    d_model: int = 384
    n_heads: int = 12
    d_mlp: int = 1536
    n_layers: int = 6
    d_out: int = 64  # trainable projection width (reference d_embed)
    ln_eps: float = 1e-12  # BERT default
    type_vocab_size: int = 2
    # bf16 MXU-rate compute (reference AMP autocast equivalent);
    # "float32" for HF parity tests.
    compute_dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class MiniLM:
    cfg: MiniLMConfig = dataclasses.field(default_factory=MiniLMConfig)

    def init(self, key: jax.Array) -> Dict:
        cfg = self.cfg
        ks = jax.random.split(key, cfg.n_layers + 3)

        def layer_init(k):
            kk = jax.random.split(k, 6)
            return {
                "attn": {
                    "q": init_linear(kk[0], cfg.d_model, cfg.d_model),
                    "k": init_linear(kk[1], cfg.d_model, cfg.d_model),
                    "v": init_linear(kk[2], cfg.d_model, cfg.d_model),
                    "o": init_linear(kk[3], cfg.d_model, cfg.d_model),
                },
                "attn_ln": init_ln(cfg.d_model),
                "mlp": {
                    "fc1": init_linear(kk[4], cfg.d_model, cfg.d_mlp),
                    "fc2": init_linear(kk[5], cfg.d_mlp, cfg.d_model),
                },
                "mlp_ln": init_ln(cfg.d_model),
            }

        layers = [layer_init(k) for k in ks[: cfg.n_layers]]
        backbone = {
            "word_emb": 0.02
            * jax.random.normal(ks[-3], (cfg.vocab_size, cfg.d_model)),
            "pos_emb": 0.02 * jax.random.normal(ks[-2], (cfg.max_len, cfg.d_model)),
            "type_emb": 0.02
            * jax.random.normal(ks[-1], (cfg.type_vocab_size, cfg.d_model)),
            "emb_ln": init_ln(cfg.d_model),
            "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        }
        proj = init_linear(ks[0], cfg.d_model, cfg.d_out)
        return {"backbone": backbone, "proj": proj}

    def __call__(
        self,
        params: Dict,
        input_ids: jax.Array,  # (B, T) int32
        attention_mask: jax.Array,  # (B, T) 1 = real
    ) -> jax.Array:
        cfg = self.cfg
        bb = params["backbone"]
        b, t = input_ids.shape
        x = (
            jnp.take(bb["word_emb"], input_ids, axis=0)
            + bb["pos_emb"][None, :t]
            + bb["type_emb"][0][None, None]
        ).astype(jnp.dtype(cfg.compute_dtype))
        x = layer_norm(x, bb["emb_ln"]["scale"], bb["emb_ln"]["bias"], eps=cfg.ln_eps)
        pad_mask = attention_mask == 0
        h = cfg.n_heads
        dh = cfg.d_model // h

        def block(carry, lp):
            x = carry

            def heads(tns):
                return tns.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

            q = heads(linear(lp["attn"]["q"], x))
            k = heads(linear(lp["attn"]["k"], x))
            v = heads(linear(lp["attn"]["v"], x))
            o = masked_mha(q, k, v, pad_mask)
            o = o.transpose(0, 2, 1, 3).reshape(b, t, cfg.d_model)
            x = layer_norm(
                x + linear(lp["attn"]["o"], o),
                lp["attn_ln"]["scale"],
                lp["attn_ln"]["bias"],
                eps=cfg.ln_eps,
            )
            y = linear(
                lp["mlp"]["fc2"],
                jax.nn.gelu(linear(lp["mlp"]["fc1"], x), approximate=False),
            )
            x = layer_norm(
                x + y, lp["mlp_ln"]["scale"], lp["mlp_ln"]["bias"], eps=cfg.ln_eps
            )
            return x, None

        x, _ = jax.lax.scan(block, x, bb["layers"])
        # mean pooling over real tokens (model_utils.py:15-24)
        w = attention_mask.astype(x.dtype)[:, :, None]
        pooled = jnp.sum(x * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-9)
        return linear(params["proj"], pooled)


def convert_minilm(sd: Dict[str, np.ndarray], n_layers: int = 6) -> Dict:
    """HF BertModel state_dict -> backbone params (proj stays fresh — it is
    the reference's new trainable head)."""

    def arr(name):
        return np.asarray(sd[name], dtype=np.float32)

    def lin(prefix):
        return {"w": arr(f"{prefix}.weight").T, "b": arr(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": arr(f"{prefix}.weight"), "bias": arr(f"{prefix}.bias")}

    layers = []
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "attn": {
                    "q": lin(f"{p}.attention.self.query"),
                    "k": lin(f"{p}.attention.self.key"),
                    "v": lin(f"{p}.attention.self.value"),
                    "o": lin(f"{p}.attention.output.dense"),
                },
                "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
                "mlp": {
                    "fc1": lin(f"{p}.intermediate.dense"),
                    "fc2": lin(f"{p}.output.dense"),
                },
                "mlp_ln": ln(f"{p}.output.LayerNorm"),
            }
        )
    return {
        "word_emb": arr("embeddings.word_embeddings.weight"),
        "pos_emb": arr("embeddings.position_embeddings.weight"),
        "type_emb": arr("embeddings.token_type_embeddings.weight"),
        "emb_ln": ln("embeddings.LayerNorm"),
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
    }
