"""Configuration dataclasses for the OutfitX-TPU model family.

Mirrors the capability surface of the reference config tree
(`/root/reference/src/models/configs/*.py`) with idiomatic-JAX choices:

- ``ItemEncoderConfig`` <- reference item_encoder_config.py:5-29
- ``TransformerConfig`` <- reference transformer_config.py:7-24 (the reference's
  accidental tuple-valued ``batch_first``/``norm_first`` are NOT replicated;
  here they are honest booleans and batch-major is implicit in JAX layouts)
- ``OutfitXConfig``     <- reference outfit_x_config.py:8-31

All configs are frozen (hashable) so they can be closed over by jitted
functions as static values.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


def _field(**kw):
    return dataclasses.field(**kw)


@dataclasses.dataclass(frozen=True)
class ItemEncoderConfig:
    """Cross-modal item encoder configuration.

    ``encoder_type`` selects the frozen tower pair, matching the reference's
    three families (item_encoder.py:12-37): 'clip' (fashion-CLIP, 512/modality),
    'resnet_sbert' (resnet18 + MiniLM, 64/modality; the reference's
    'resnet_hf_sentence_bert'), 'siglip' (marqo fashionSigLIP, 768/modality;
    the reference's default 'slip').
    """

    encoder_type: str = "siglip"  # {'clip', 'resnet_sbert', 'siglip'}
    aggregation: str = "concat"  # {'concat', 'mean', 'sum'}
    normalize_out: bool = True  # L2-normalize each modality's embedding
    dim_per_modality: int = 768  # 512 clip / 64 resnet_sbert / 768 siglip
    # Pretrained checkpoint identifiers (used by the weight-porting tools).
    image_model_name: str = "Marqo/marqo-fashionSigLIP"
    text_model_name: str = "Marqo/marqo-fashionSigLIP"
    text_max_length: int = 64

    @property
    def d_embed(self) -> int:
        """Fused per-item embedding width (concat doubles the modality dim)."""
        if self.aggregation == "concat":
            return self.dim_per_modality * 2
        return self.dim_per_modality

    @classmethod
    def for_type(cls, encoder_type: str) -> "ItemEncoderConfig":
        dims = {"clip": 512, "resnet_sbert": 64, "siglip": 768}
        names = {
            "clip": ("patrickjohncyh/fashion-clip",) * 2,
            "resnet_sbert": (
                "resnet18",
                "sentence-transformers/all-MiniLM-L6-v2",
            ),
            "siglip": ("Marqo/marqo-fashionSigLIP",) * 2,
        }
        img, txt = names[encoder_type]
        return cls(
            encoder_type=encoder_type,
            dim_per_modality=dims[encoder_type],
            image_model_name=img,
            text_model_name=txt,
        )


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Set-transformer encoder over the outfit sequence.

    Matches the reference's live hyperparameters (transformer_config.py:7-24):
    16 heads, d_ffn 2024, 6 pre-LN layers, dropout 0.3, mish activation, and
    no final LayerNorm (torch ``nn.TransformerEncoder(norm=None)``).
    """

    n_heads: int = 16
    d_ffn: int = 2024
    n_layers: int = 6
    dropout: float = 0.3
    activation: str = "mish"  # {'mish', 'relu', 'gelu'}
    norm_first: bool = True  # False = torch post-LN residual placement
    final_norm: bool = False  # True adds a terminal LN after the stack
    # (torch nn.TransformerEncoder(norm=...)); the reference passes norm=None
    # MXU lane alignment: >d_ffn zero-pads the FFN hidden dim to this many
    # units at APPLY time only (params/checkpoints stay at d_ffn, so export
    # and shared-weights parity are untouched). Numerically inert:
    # mish(0)=0 and the padded w2 rows are zero, so outputs/grads agree to
    # f32 accumulation order (no new nonzero terms; the pad can shift
    # matmul tiling, ~1 ULP) and no gradient flows into the pad; the
    # dropout mask is drawn at the real d_ffn width so training RNG
    # streams match the unpadded model exactly.
    # Motivation: the reference's d_ffn=2024 (transformer_config.py:16) is
    # 15*128+104 — both FFN matmuls end in a partial MXU tile.
    # Default 2048, adopted on the measured train step (2026-08-18 on-chip,
    # scripts/bench_ffn_pad.py --train): 438.6 -> 430.4 ms = 1.019x with
    # exactness diff 0.0; forward alone gained only 1.0074x (below the
    # pre-committed 1.03 forward-rule threshold — BENCHMARKS.md records
    # both). Set 0 to disable (e.g. A/B probes).
    ffn_pad_to: int = 2048


@dataclasses.dataclass(frozen=True)
class OutfitXConfig:
    """Top-level model config (reference outfit_x_config.py:8-31)."""

    item_encoder: ItemEncoderConfig = _field(default_factory=ItemEncoderConfig)
    transformer: TransformerConfig = _field(default_factory=TransformerConfig)
    max_outfit_len: int = 16  # items per outfit after pad/truncate
    # dtype policy: params in f32, compute in bf16 (TPU-native; replaces the
    # reference's fp16 autocast + GradScaler, which bf16 makes unnecessary).
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # jax.checkpoint each encoder layer: recompute activations in backward
    # instead of saving them — required for the reference's batch-3072
    # training envelope to fit in 16 GB HBM.
    remat: bool = False
    # Rematerialization policy when remat=True:
    #   'full'  — save only layer inputs, recompute everything (min memory);
    #   'masks' — additionally save the bool dropout masks so they are not
    #     regenerated in the backward (~266 MB/layer at B=3072; measured
    #     faster than 'full' on v5e — see BENCHMARKS.md);
    #   'dots'  — jax.checkpoint_policies.dots_saveable: save matmul outputs
    #     too (measured SLOWER than 'full' at the flagship shape: the extra
    #     HBM writes cost more than the recompute they avoid).
    remat_policy: str = "full"

    @property
    def d_embed(self) -> int:
        return self.item_encoder.d_embed

    @property
    def model_name(self) -> str:
        return f"outfitx-tpu-{self.item_encoder.encoder_type}-d{self.d_embed}"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical device-mesh layout for SPMD training.

    ``data`` is the batch axis (the reference's DDP world, 2.8 in SURVEY.md);
    ``model`` is the tensor-parallel axis over which attention heads and FFN
    hidden units shard Megatron-style. Set ``model=1`` for pure DP.
    ``fsdp`` additionally shards the large layer weights over the data axis
    (ZeRO-3 style); XLA inserts the per-use all-gathers.
    """

    data: int = -1  # -1: use all remaining devices
    model: int = 1
    fsdp: bool = False

    def resolve(self, n_devices: int) -> Tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        return data, model


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """AdamW + OneCycle + clip, matching the reference training envelope
    (compatibility_prediction_trainer.py:351-367)."""

    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    clip_norm: float = 1.0
    # OneCycleLR(pct_start=0.3, cos anneal, div_factor=25, final_div=1e4)
    schedule: str = "onecycle"
    pct_start: float = 0.3
    div_factor: float = 25.0
    final_div_factor: float = 1e4


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Base training configuration (reference base_train_config.py:14-61)."""

    seed: int = 42
    n_epochs: int = 200
    batch_size: int = 3072  # global batch per optimizer sub-step
    accumulation_steps: int = 4
    optimizer: OptimizerConfig = _field(default_factory=OptimizerConfig)
    mesh: MeshConfig = _field(default_factory=MeshConfig)
    dataset_dir: str = "datasets/polyvore"
    polyvore_type: str = "nondisjoint"  # {'nondisjoint', 'disjoint'}
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "logs"
    # >0: save a rolling 'latest' checkpoint (params + opt_state + epoch)
    # every N epochs so a killed multi-hour run resumes losslessly via
    # `resume('latest')`. The reference has no equivalent (recovery is
    # manual re-launch + load_checkpoint, SURVEY.md §5).
    save_every_epochs: int = 0
    # Mid-run checkpoint saves (best-metric, rolling latest) go through a
    # writer thread. The loop still pays the device->host fetch (a
    # background-thread device_get wedges the relay client — see
    # checkpoint.save_async), but the npz write + fsync + atomic swap
    # run off the loop. The final save and every restore drain the
    # queue first. False = fully synchronous saves.
    async_saves: bool = True
    log_every_steps: int = 0  # >0: per-step train loss to the metrics JSONL
    # (the reference's {metric}/train/batch wandb stream)


@dataclasses.dataclass(frozen=True)
class CPTrainConfig(TrainConfig):
    """Compatibility-prediction training
    (reference compatibility_prediction_train_config.py:8-18)."""

    focal_alpha: float = 0.75
    focal_gamma: float = 2.0


@dataclasses.dataclass(frozen=True)
class CIRTrainConfig(TrainConfig):
    """Complementary-item-retrieval training
    (reference complementary_item_retrieval_train_config.py:8-19)."""

    n_epochs: int = 300
    batch_size: int = 512
    accumulation_steps: int = 1
    margin: float = 2.0
    n_negatives: int = 10
    switch_to_hard_epoch: int = 150  # curriculum: easy -> hard negatives
    recall_every: int = 5
    recall_ks: Tuple[int, ...] = (1, 5, 10, 15, 30, 50)
    candidate_pool_size: int = 3000
    warm_start_from: Optional[str] = None  # path to CP best-AUC checkpoint


@dataclasses.dataclass(frozen=True)
class FITBTrainConfig(TrainConfig):
    """Fill-in-the-blank evaluation
    (reference fill_in_the_blank_train_config.py; test-only)."""

    # reference sets lr 4e-5 (fill_in_the_blank_train_config.py); unused in
    # practice since FITB never trains, but the config tree mirrors it.
    optimizer: OptimizerConfig = _field(
        default_factory=lambda: OptimizerConfig(learning_rate=4e-5)
    )
    n_candidates: int = 4
    checkpoint_from: Optional[str] = None  # path to CIR best-Recall@1 ckpt


@dataclasses.dataclass(frozen=True)
class PrecomputeConfig(TrainConfig):
    """Catalog embedding-precompute sweep
    (reference precompute_embedding_train_config.py; batch 2048)."""

    batch_size: int = 2048
    shard_prefix: str = "embedding_subset_"
