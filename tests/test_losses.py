"""Loss golden tests against independent torch-CPU computations of the same
math (reference formulas: focal_loss.py:24-42, set_wise_ranking_loss.py:14-37)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from outfitx_tpu.losses import focal_loss, set_wise_ranking_loss


def _torch_focal(logits, labels, alpha, gamma, reduction):
    x = torch.from_numpy(logits)
    y = torch.from_numpy(labels)
    ce = F.binary_cross_entropy_with_logits(x, y, reduction="none")
    p = torch.sigmoid(x)
    p_t = p * y + (1 - p) * (1 - y)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * y + (1 - alpha) * (1 - y)) * loss
    return {"none": loss, "sum": loss.sum(), "mean": loss.mean()}[reduction]


class TestFocal:
    def test_matches_torch(self, rng):
        logits = rng.standard_normal(64).astype(np.float32) * 3
        labels = (rng.random(64) > 0.5).astype(np.float32)
        for reduction in ["none", "sum", "mean"]:
            got = focal_loss(
                jnp.asarray(logits), jnp.asarray(labels),
                alpha=0.75, gamma=2.0, reduction=reduction,
            )
            want = _torch_focal(logits, labels, 0.75, 2.0, reduction).numpy()
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)

    def test_extreme_logits_stable(self):
        logits = jnp.asarray([100.0, -100.0, 0.0])
        labels = jnp.asarray([0.0, 1.0, 1.0])
        out = focal_loss(logits, labels)
        assert np.isfinite(np.asarray(out))


class TestSetWiseRanking:
    def _torch_ref(self, pos, pred, negs, mask, margin):
        y = torch.from_numpy(pos)
        y_hat = torch.from_numpy(pred)
        n = torch.from_numpy(negs)
        m = torch.from_numpy(mask)
        pos_dist = F.pairwise_distance(y_hat, y)
        neg_dists = torch.norm(y_hat.unsqueeze(1) - n, dim=2)
        valid = (~m).float()
        count = valid.sum().clamp(min=1)
        l_all = (F.relu(pos_dist.unsqueeze(1) - neg_dists + margin) * valid).sum() / count
        neg_inf = neg_dists.masked_fill(m, torch.inf)
        l_hard = F.relu(pos_dist - neg_inf.min(dim=1).values + margin).mean()
        return (l_all + l_hard).numpy()

    def test_matches_torch(self, rng):
        b, k, d = 6, 10, 32
        pos = rng.standard_normal((b, d)).astype(np.float32)
        pred = rng.standard_normal((b, d)).astype(np.float32)
        negs = rng.standard_normal((b, k, d)).astype(np.float32)
        mask = rng.random((b, k)) > 0.7
        mask[:, 0] = False  # at least one valid negative per row
        got = set_wise_ranking_loss(
            jnp.asarray(pos), jnp.asarray(pred), jnp.asarray(negs),
            jnp.asarray(mask), margin=2.0,
        )
        want = self._torch_ref(pos, pred, negs, mask, 2.0)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)

    def test_padded_negatives_ignored(self, rng):
        b, k, d = 4, 6, 16
        pos = rng.standard_normal((b, d)).astype(np.float32)
        pred = rng.standard_normal((b, d)).astype(np.float32)
        negs = rng.standard_normal((b, k, d)).astype(np.float32)
        mask = np.zeros((b, k), dtype=bool)
        mask[:, 3:] = True
        a = set_wise_ranking_loss(jnp.asarray(pos), jnp.asarray(pred), jnp.asarray(negs), jnp.asarray(mask))
        negs2 = negs.copy()
        negs2[:, 3:] = 1e3  # perturb only padded slots
        b_ = set_wise_ranking_loss(jnp.asarray(pos), jnp.asarray(pred), jnp.asarray(negs2), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
