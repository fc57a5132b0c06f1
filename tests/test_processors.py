"""Typed task API + processor factory: collate semantics and picklability
(the reference's own processor test asserts picklability,
outfit_x_processor_factory.py:38-79), plus end-to-end through the model."""

import pickle

import jax
import numpy as np
import pytest

from outfitx_tpu.data.processors import (
    CIRProcessor,
    CPProcessor,
    FITBProcessor,
    ProcessorFactory,
)
from outfitx_tpu.data.types import (
    FashionItem,
    OutfitCompatibilityPredictionTask,
    OutfitComplementaryItemRetrievalTask,
    OutfitFillInTheBlankTask,
    OutfitPrecomputeEmbeddingTask,
)


def _item(rng, iid, d=32):
    return FashionItem(
        item_id=iid,
        category="tops",
        description=f"item {iid}",
        embedding=rng.standard_normal(d).astype(np.float32),
    )


class TestTypes:
    def test_text_embedding_is_second_half(self, rng):
        it = _item(rng, 1, d=32)
        np.testing.assert_array_equal(it.text_embedding, it.embedding[16:])


class TestProcessors:
    def test_factory_dispatch_and_picklable(self):
        for task_type in [
            OutfitCompatibilityPredictionTask,
            OutfitComplementaryItemRetrievalTask,
            OutfitFillInTheBlankTask,
            OutfitPrecomputeEmbeddingTask,
        ]:
            proc = ProcessorFactory.get_processor(task_type)
            roundtrip = pickle.loads(pickle.dumps(proc))
            assert type(roundtrip) is type(proc)
        with pytest.raises(KeyError):
            ProcessorFactory.get_processor(int)

    def test_cp_collate(self, rng):
        tasks = [
            (
                OutfitCompatibilityPredictionTask(
                    outfit=[_item(rng, i * 10 + j) for j in range(2 + i)]
                ),
                float(i % 2),
            )
            for i in range(3)
        ]
        out = CPProcessor(max_len=4)(tasks)
        assert out["outfit_embedding"].shape == (3, 4, 32)
        np.testing.assert_array_equal(
            (~out["outfit_mask"]).sum(axis=1), [2, 3, 4]
        )
        # padded slots are zero embeddings (reference pad value, :18)
        assert out["outfit_embedding"][0, 2:].sum() == 0
        np.testing.assert_array_equal(out["label"], [0, 1, 0])

    def test_cir_collate_and_forward(self, rng):
        from outfitx_tpu.core.config import (
            ItemEncoderConfig,
            OutfitXConfig,
            TransformerConfig,
        )
        from outfitx_tpu.losses import set_wise_ranking_loss
        from outfitx_tpu.models import OutfitXModel

        batch = []
        for i in range(2):
            task = OutfitComplementaryItemRetrievalTask(
                outfit=[_item(rng, i * 10 + j) for j in range(3)],
                target_item=_item(rng, 100 + i),
            )
            negs = [rng.standard_normal(32).astype(np.float32) for _ in range(4)]
            batch.append((task, negs))
        out = CIRProcessor(max_len=4, n_negatives=6)(batch)
        assert out["neg_items_embedding"].shape == (2, 6, 32)
        np.testing.assert_array_equal(
            (~out["neg_items_mask"]).sum(axis=1), [4, 4]
        )
        # the collated batch feeds the model + loss directly
        cfg = OutfitXConfig(
            item_encoder=ItemEncoderConfig(dim_per_modality=16),
            transformer=TransformerConfig(n_heads=4, d_ffn=32, n_layers=1, dropout=0.0),
            max_outfit_len=4,
            compute_dtype="float32",
        )
        model = OutfitXModel(cfg)
        params = model.init(jax.random.PRNGKey(0))
        pred = model.cir_forward(
            params,
            out["outfit_embedding"],
            out["outfit_mask"],
            out["target_item_text_embedding"],
        )
        loss = set_wise_ranking_loss(
            out["pos_item_embedding"], pred,
            out["neg_items_embedding"], out["neg_items_mask"],
        )
        assert np.isfinite(float(loss))

    def test_fitb_collate(self, rng):
        batch = []
        for i in range(2):
            task = OutfitFillInTheBlankTask(
                outfit=[_item(rng, j) for j in range(2)],
                target_item=_item(rng, 50 + i),
            )
            cands = rng.standard_normal((4, 32)).astype(np.float32)
            batch.append((task, cands, i % 4))
        out = FITBProcessor(max_len=4)(batch)
        assert out["candidate_item_embedding"].shape == (2, 4, 32)
        np.testing.assert_array_equal(out["answer_index"], [0, 1])
