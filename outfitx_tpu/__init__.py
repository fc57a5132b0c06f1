"""OutfitX-TPU: a TPU-native (JAX/XLA/Pallas/pjit) outfit-recommendation framework.

A from-scratch rebuild of the capabilities of the reference system
``Krual-T/OutfitX`` (PyTorch, OutfitTransformer family), designed TPU-first:

- frozen CLIP/SigLIP-class image+text item encoders with concat/mean fusion
  (reference: src/models/encoders/item_encoder.py),
- batched on-device embedding precompute over the Polyvore catalog
  (reference: src/trains/trainers/precompute_embedding_script.py),
- a set-transformer outfit encoder with task heads for compatibility
  prediction (CP), complementary item retrieval (CIR) and fill-in-the-blank
  (FITB) (reference: src/models/outfit_x.py),
- SPMD data/tensor-parallel training over a `jax.sharding.Mesh`, bf16 compute,
  gradient accumulation, checkpoint chaining CP->CIR->FITB
  (reference: src/trains/trainers/distributed_trainer.py),
- Pallas kernels for the hot paths: fused LayerNorm, fused masked set-MHA,
  L2-distance + top-k retrieval, image preprocessing.
"""

__version__ = "0.1.0"

from outfitx_tpu.core.config import (  # noqa: F401
    CIRTrainConfig,
    CPTrainConfig,
    FITBTrainConfig,
    ItemEncoderConfig,
    MeshConfig,
    OptimizerConfig,
    OutfitXConfig,
    PrecomputeConfig,
    TrainConfig,
    TransformerConfig,
)

_LAZY = {
    "OutfitXModel": "outfitx_tpu.models",
    "Task": "outfitx_tpu.models",
    "ItemEncoderModel": "outfitx_tpu.models.item_encoder",
    "Catalog": "outfitx_tpu.data.catalog",
    "CPTrainer": "outfitx_tpu.train.cp_trainer",
    "CIRTrainer": "outfitx_tpu.train.cir_trainer",
    "FITBTrainer": "outfitx_tpu.train.fitb_trainer",
    "OriginalCPTrainer": "outfitx_tpu.train.original_cp_trainer",
    "PrecomputeRunner": "outfitx_tpu.train.precompute",
    "ServingEngine": "outfitx_tpu.serve.engine",
}


def __getattr__(name: str):
    """Lazy top-level exports (`from outfitx_tpu import CPTrainer`) without
    paying the heavy jax/model import cost for config-only users."""
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'outfitx_tpu' has no attribute {name!r}")
