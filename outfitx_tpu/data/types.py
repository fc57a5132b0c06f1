"""Typed task objects: the public data contract.

The reference's datasets, processors, and model communicate through pydantic
objects (src/models/datatypes/: FashionItem, OutfitCompatibilityPredictionTask,
OutfitComplementaryItemRetrievalTask, OutfitFillInTheBlankTask,
OutfitPrecomputeEmbeddingTask). Users coming from the reference get the same
surface here as plain dataclasses; ``processors.ProcessorFactory`` converts
lists of them into the fixed-shape columnar batches the jitted steps consume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import numpy as np


@dataclasses.dataclass
class FashionItem:
    """One catalog item (reference fashion_item.py:10-40)."""

    item_id: int
    category: str = ""
    description: str = ""
    image: Optional[Any] = None  # PIL image or array, when loaded
    metadata: Optional[dict] = None
    embedding: Optional[np.ndarray] = None  # fused (d,) embedding
    text_embedding: Optional[np.ndarray] = None  # = embedding[d//2:]

    def __post_init__(self):
        if self.embedding is not None and self.text_embedding is None:
            d = len(self.embedding)
            self.text_embedding = np.asarray(self.embedding)[d // 2 :]


@dataclasses.dataclass
class OutfitCompatibilityPredictionTask:
    """CP query: a set of items (reference outfit_cp_task.py:6-11)."""

    outfit: List[FashionItem]


@dataclasses.dataclass
class OutfitComplementaryItemRetrievalTask:
    """CIR query: partial outfit + target item (outfit_cir_task.py:6-16)."""

    outfit: List[FashionItem]
    target_item: FashionItem


@dataclasses.dataclass
class OutfitFillInTheBlankTask:
    """FITB query — same shape as CIR, separate type for dispatch
    (outfit_fitb_task.py:7-16)."""

    outfit: List[FashionItem]
    target_item: FashionItem


@dataclasses.dataclass
class OutfitPrecomputeEmbeddingTask:
    """Catalog-sweep unit (outfit_pe_task.py:5)."""

    fashion_item: FashionItem
