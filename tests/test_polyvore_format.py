"""On-disk Polyvore format tests: write fixture files in the reference's
exact layout (SURVEY.md 2.3) and load them through the real loaders —
Catalog.from_polyvore + CPSplit/OutfitSplit/FITBSplit.load."""

import json
import pickle

import numpy as np
import pytest

from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.splits import CPSplit, FITBSplit, OutfitSplit


@pytest.fixture(scope="module")
def polyvore_dir(tmp_path_factory):
    """Build a miniature dataset in the reference layout:
    item_metadata.json, categories.json,
    precomputed_embeddings/{model}_embedding_subset_{rank}.pkl,
    {type}/compatibility/{mode}.json, {type}/{mode}.json,
    {type}/fill_in_the_blank/{mode}.json."""
    root = tmp_path_factory.mktemp("polyvore")
    rng = np.random.default_rng(0)
    n = 40
    ids = [200_000 + i for i in range(n)]
    metadata = [
        {
            "item_id": iid,
            "url_name": f"url name {i}",
            "description": "",
            "title": f"title {i}" if i % 2 == 0 else "",
            "category_id": 10 + (i % 4),
            "semantic_category": ["tops", "bottoms", "shoes", "bags"][i % 4],
        }
        for i, iid in enumerate(ids)
    ]
    (root / "item_metadata.json").write_text(json.dumps(metadata))
    (root / "categories.json").write_text(
        json.dumps({str(10 + k): f"cat{k}" for k in range(4)})
    )
    emb_dir = root / "precomputed_embeddings"
    emb_dir.mkdir()
    d = 32
    # two shards, as a multi-rank reference run would write
    half = n // 2
    for rank, chunk in enumerate([ids[:half], ids[half:]]):
        payload = {
            "ids": chunk,
            "embeddings": rng.standard_normal((len(chunk), d)).astype(
                np.float32
            ),
        }
        with open(emb_dir / f"mymodel_embedding_subset_{rank}.pkl", "wb") as f:
            pickle.dump(payload, f)

    t = root / "nondisjoint"
    (t / "compatibility").mkdir(parents=True)
    (t / "fill_in_the_blank").mkdir()
    cp = [
        {"label": i % 2, "question": ids[i : i + 3]} for i in range(0, 12, 3)
    ]
    (t / "compatibility" / "train.json").write_text(json.dumps(cp))
    outfits = [{"item_ids": ids[i : i + 4]} for i in range(0, 20, 4)]
    (t / "train.json").write_text(json.dumps(outfits))
    fitb = [
        {
            "question": ids[i : i + 3],
            "answers": ids[i + 3 : i + 7],
            "label": i % 4,
        }
        for i in range(0, 8, 4)
    ]
    (t / "fill_in_the_blank" / "test.json").write_text(json.dumps(fitb))
    return root


class TestPolyvoreLoading:
    def test_catalog_merges_shards(self, polyvore_dir):
        cat = Catalog.from_polyvore(polyvore_dir, model_name="mymodel")
        assert cat.n_items == 40
        assert cat.d_embed == 32
        assert cat.embeddings.shape == (41, 32)  # +1 pad row
        np.testing.assert_array_equal(cat.embeddings[-1], 0)  # pad = zeros
        # description fallback: title if set else url_name (reference :72)
        assert cat.descriptions[0] == "title 0"
        assert cat.descriptions[1] == "url name 1"
        assert cat.category_names[10] == "cat0"

    def test_cp_split(self, polyvore_dir):
        cat = Catalog.from_polyvore(polyvore_dir, model_name="mymodel")
        split = CPSplit.load(cat, polyvore_dir, "nondisjoint", "train", max_len=8)
        assert len(split) == 4
        assert split.item_rows.shape == (4, 8)
        np.testing.assert_array_equal(split.labels, [0, 1, 0, 1])
        # 3 items per outfit -> 5 padded slots
        assert (~split.mask).sum(axis=1).tolist() == [3, 3, 3, 3]
        assert (split.item_rows[0, 3:] == cat.pad_row).all()

    def test_outfit_split_large_category_filter(self, polyvore_dir):
        cat = Catalog.from_polyvore(polyvore_dir, model_name="mymodel")
        # threshold 0 (train): all outfits kept, all members eligible
        train = OutfitSplit.load(
            cat, polyvore_dir, "nondisjoint", "train", max_len=8,
            large_category_threshold=0,
        )
        assert len(train) == 5
        assert (train.pos_eligible.sum(axis=1) == train.lengths).all()
        # impossible threshold: no eligible positives -> all filtered out
        empty = OutfitSplit.load(
            cat, polyvore_dir, "nondisjoint", "train", max_len=8,
            large_category_threshold=1000,
        )
        assert len(empty) == 0

    def test_fitb_split(self, polyvore_dir):
        cat = Catalog.from_polyvore(polyvore_dir, model_name="mymodel")
        split = FITBSplit.load(cat, polyvore_dir, "nondisjoint", "test", max_len=8)
        assert len(split) == 2
        assert split.cand_rows.shape == (2, 4)
        np.testing.assert_array_equal(split.answer_idx, [0, 0])

    def test_missing_shards_is_clear_error(self, polyvore_dir):
        with pytest.raises(FileNotFoundError, match="no embedding shards"):
            Catalog.from_polyvore(polyvore_dir, model_name="not-a-model")
