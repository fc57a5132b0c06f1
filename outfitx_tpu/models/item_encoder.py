"""Cross-modal item encoder: frozen vision + text towers with fusion.

Re-design of the reference ItemEncoder (item_encoder.py:8-60): selects the
tower pair by ``cfg.encoder_type``, encodes both modalities, optionally
L2-normalizes each, and aggregates. The reference's 'sum' aggregation was
advertised but unimplemented (model_utils.py:40-45 raises) — here it works.

Towers are frozen: ``encode`` wraps them in `lax.stop_gradient`, the JAX
equivalent of the reference's requires_grad_(False) + no_grad
(model_utils.py:8-12, clip_image_encoder.py:52).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from outfitx_tpu.core.config import ItemEncoderConfig
from outfitx_tpu.data.preprocess import make_normalizer
from outfitx_tpu.models.towers import (
    TextTower,
    TextTowerConfig,
    VisionTower,
    VisionTowerConfig,
)
from outfitx_tpu.models.towers.minilm import MiniLM, MiniLMConfig
from outfitx_tpu.models.towers.resnet import ResNet18, ResNet18Config


def tower_configs(cfg: ItemEncoderConfig):
    if cfg.encoder_type == "clip":
        return VisionTowerConfig.clip_b32(), TextTowerConfig.clip_b()
    if cfg.encoder_type == "siglip":
        return VisionTowerConfig.siglip_b16(), TextTowerConfig.siglip_b()
    if cfg.encoder_type == "resnet_sbert":
        return (
            ResNet18Config(d_out=cfg.dim_per_modality),
            MiniLMConfig(d_out=cfg.dim_per_modality),
        )
    raise NotImplementedError(
        f"encoder_type {cfg.encoder_type!r} has no JAX tower yet"
    )


@dataclasses.dataclass(frozen=True)
class ItemEncoderModel:
    cfg: ItemEncoderConfig
    # Optional overrides (tests use tiny towers); default derived from cfg.
    vision_cfg: VisionTowerConfig | None = None
    text_cfg: TextTowerConfig | None = None

    def __post_init__(self):
        vc, tc = tower_configs(self.cfg)
        vc = self.vision_cfg or vc
        tc = self.text_cfg or tc
        if self.cfg.encoder_type == "resnet_sbert":
            object.__setattr__(self, "vision", ResNet18(vc))
            object.__setattr__(self, "text", MiniLM(tc))
        else:
            object.__setattr__(self, "vision", VisionTower(vc))
            object.__setattr__(self, "text", TextTower(tc))
        object.__setattr__(self, "normalize_images", make_normalizer(self.cfg.encoder_type))
        # A tower whose output width disagrees with dim_per_modality would
        # silently corrupt the concat layout (the text half MUST be
        # emb[d//2:], polyvore_item_dataset.py:79) — fail loudly instead.
        for name, d_out in (("vision", vc.d_out), ("text", tc.d_out)):
            if d_out != self.cfg.dim_per_modality:
                raise ValueError(
                    f"{name} tower d_out={d_out} != dim_per_modality="
                    f"{self.cfg.dim_per_modality}; for siglip towers note "
                    "d_out == d_model (no output projection)"
                )

    @property
    def has_trainable_heads(self) -> bool:
        """resnet_sbert trains the fresh fc/proj heads (reference
        resnet18_image_encoder.py:31-40, hugging_face_text_encoder.py:27-30);
        clip/siglip are fully frozen."""
        return self.cfg.encoder_type == "resnet_sbert"

    def _freeze(self, tree, trainable_key: str | None):
        """stop_gradient on frozen leaves; resnet_sbert keeps its head live."""
        if trainable_key is None or not self.has_trainable_heads:
            return jax.lax.stop_gradient(tree)
        return {
            k: (v if k == trainable_key else jax.lax.stop_gradient(v))
            for k, v in tree.items()
        }

    @property
    def image_size(self) -> int:
        return self.vision.cfg.image_size

    @property
    def text_vocab_size(self) -> int:
        return self.text.cfg.vocab_size

    def init(self, key: jax.Array) -> Dict:
        kv, kt = jax.random.split(key)
        return {"vision": self.vision.init(kv), "text": self.text.init(kt)}

    def encode_images(self, params, images_uint8: jax.Array) -> jax.Array:
        """(B, 3, H, W) uint8 -> (B, d) L2-normalized image embeddings."""
        x = self.normalize_images(images_uint8)
        emb = self.vision(self._freeze(params["vision"], "fc"), x)
        # Towers compute in bf16 (MXU rate); the catalog contract is f32.
        emb = emb.astype(jnp.float32)
        if self.cfg.normalize_out:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb

    def encode_texts(
        self, params, input_ids: jax.Array, attention_mask: jax.Array | None = None
    ) -> jax.Array:
        tp = self._freeze(params["text"], "proj")
        if self.cfg.encoder_type == "resnet_sbert":
            if attention_mask is None:
                attention_mask = jnp.ones_like(input_ids)
            emb = self.text(tp, input_ids, attention_mask)
        else:
            emb = self.text(tp, input_ids, attention_mask)
        emb = emb.astype(jnp.float32)
        if self.cfg.normalize_out:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb

    def aggregate(self, image_emb: jax.Array, text_emb: jax.Array) -> jax.Array:
        """Fusion (reference aggregate_embeddings, model_utils.py:26-48)."""
        agg = self.cfg.aggregation
        if agg == "concat":
            return jnp.concatenate([image_emb, text_emb], axis=-1)
        if agg == "mean":
            return 0.5 * (image_emb + text_emb)
        if agg == "sum":
            return image_emb + text_emb
        raise ValueError(f"aggregation {agg!r}")

    def encode(
        self,
        params,
        images_uint8: jax.Array,
        input_ids: jax.Array,
        attention_mask: jax.Array | None = None,
    ) -> jax.Array:
        """Full per-item embedding: (B, d_embed). With concat fusion the text
        half is emb[d//2:], the invariant the datasets rely on
        (polyvore_item_dataset.py:79)."""
        img = self.encode_images(params, images_uint8)
        txt = self.encode_texts(params, input_ids, attention_mask)
        return self.aggregate(img, txt)
