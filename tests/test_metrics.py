"""Metric golden tests vs sklearn / brute force."""

import numpy as np

from outfitx_tpu.evalm import (
    binary_classification_metrics,
    fitb_accuracy,
    recall_at_k,
    roc_auc,
)


def test_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    scores = rng.random(500)
    labels = (rng.random(500) > 0.6).astype(int)
    got = roc_auc(scores, labels)
    want = roc_auc_score(labels, scores)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_auc_with_ties(rng):
    from sklearn.metrics import roc_auc_score

    scores = rng.integers(0, 5, size=300).astype(float)  # heavy ties
    labels = (rng.random(300) > 0.5).astype(int)
    np.testing.assert_allclose(
        roc_auc(scores, labels), roc_auc_score(labels, scores), atol=1e-12
    )


def test_classification_metrics(rng):
    scores = np.array([0.9, 0.8, 0.3, 0.2])
    labels = np.array([1, 0, 1, 0])
    m = binary_classification_metrics(scores, labels)
    assert m["acc"] == 0.5
    np.testing.assert_allclose(m["precision"], 0.5, atol=1e-5)
    np.testing.assert_allclose(m["recall"], 0.5, atol=1e-5)


def test_recall_at_k():
    retrieved = np.array([[5, 3, 1], [9, 9, 9], [2, 7, 4]])
    positives = np.array([3, 1, 4])
    r = recall_at_k(retrieved, positives, ks=(1, 2, 3))
    np.testing.assert_allclose(r["recall@1"], 0.0)
    np.testing.assert_allclose(r["recall@2"], 1 / 3)
    np.testing.assert_allclose(r["recall@3"], 2 / 3)


def test_recall_with_padded_queries():
    retrieved = np.array([[3, 1], [0, 0]])
    positives = np.array([3, 0])
    valid = np.array([True, False])
    r = recall_at_k(retrieved, positives, ks=(1,), valid=valid)
    np.testing.assert_allclose(r["recall@1"], 1.0)


def test_fitb_accuracy():
    assert fitb_accuracy([0, 1, 2, 3], [0, 1, 0, 3]) == 0.75
