"""Coalesced-batch request forms for the serving engine.

The batched counterparts of the single-request task methods — many
outfits / (outfit, target) pairs / query items per fused device program,
chunked to the engine's pre-warmed ``cp_batch_bucket`` so every request
size hits one compiled program (serve/coalesce.py feeds these from
concurrent HTTP requests). Split out of the engine core as the
``BatchedRequests`` mixin.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from outfitx_tpu.data.splits import _pad_outfits
from outfitx_tpu.serve.programs import _bucket_chunks


class BatchedRequests:
    """Engine mixin: cp_score_batch / cir_top10_batch / similar_items_batch."""

    def cp_score_batch(self, outfits: List[List[int]]) -> List[float]:
        """Sigmoid scores for many outfits in ONE device program.

        Batched serving surface (beyond the reference demo, whose UI scores
        one outfit per click): outfits are padded to L, and the batch is
        processed in chunks padded to exactly ``cp_batch_bucket`` — ONE
        compiled batch program for every request size (warmed at startup;
        pad outfits score garbage and are sliced away).
        """
        if self.mock:
            return [float(self._rng.random()) for _ in outfits]
        if not outfits:
            return []
        for ids in outfits:
            for i in ids:
                self.lookup_row(i)
        rows, mask = _pad_outfits(
            self.catalog, [list(ids) for ids in outfits],
            self.model_cfg.max_outfit_len,
        )
        rows = np.asarray(rows, dtype=np.int32)
        mask = np.asarray(mask)
        out: List[float] = []
        for sel, padded in _bucket_chunks(
            range(len(outfits)), self.cp_batch_bucket
        ):
            scores = np.asarray(
                self._run(
                    self._cp_task, self.cp_params, rows[padded], mask[padded]
                )
            )
            out.extend(float(s) for s in scores[: len(sel)])
        return out

    def cir_top10_batch(
        self, requests: List  # [(item_ids, target_item_id), ...]
    ) -> List[List[Dict]]:
        """Top-10 retrieval for many (outfit, target) requests in fused
        batch programs — the coalesced form of ``cir_top10``. Requests are
        grouped by route (target category has a pool vs whole catalog),
        each group processed in chunks padded to exactly
        ``cp_batch_bucket`` (one compiled program per route, warmed at
        startup). Results keep request order."""
        if self.mock:
            return [
                [
                    self._item_info(int(r), 1.0)
                    for r in self._rng.choice(
                        self.catalog.n_items, 10, replace=False
                    )
                ]
                for _ in requests
            ]
        if not requests:
            return []
        l = self.model_cfg.max_outfit_len
        rows = np.zeros((len(requests), l), dtype=np.int32)
        mask = np.zeros((len(requests), l), dtype=bool)
        trows = np.zeros(len(requests), dtype=np.int32)
        pool_idx: List[int] = []  # request indices per route
        cat_idx: List[int] = []
        pools_of: Dict[int, np.ndarray] = {}
        for i, (item_ids, target_id) in enumerate(requests):
            r, m = self._pad(list(item_ids))
            rows[i], mask[i] = r[0], m[0]
            trow = self.lookup_row(target_id)
            trows[i] = trow
            cid = int(self.catalog.category_id[trow])
            pr = self.pools.pools.get(cid) if self.pools is not None else None
            if pr is None:
                cat_idx.append(i)
            else:
                pool_idx.append(i)
                pools_of[i] = np.asarray(pr, dtype=np.int32)
        out: List = [None] * len(requests)
        bucket = self.cp_batch_bucket

        for sel, padded in _bucket_chunks(cat_idx, bucket):
            d2, idx = self._run(
                self._cir_task, self.cir_params,
                rows[padded], mask[padded], trows[padded],
            )
            d2, idx = np.asarray(d2), np.asarray(idx)
            for j, i in enumerate(sel):
                out[i] = [
                    self._item_info(int(r), float(dd))
                    for r, dd in zip(idx[j], d2[j])
                    if int(r) < self.catalog.n_items  # skip spare sentinels
                ]
        for sel, padded in _bucket_chunks(pool_idx, bucket):
            prows = np.stack([pools_of[int(i)] for i in padded])
            d2, idx = self._run(
                self._cir_pool_task, self.cir_params,
                rows[padded], mask[padded], trows[padded], prows,
            )
            d2, idx = np.asarray(d2), np.asarray(idx)
            for j, i in enumerate(sel):
                out[i] = [
                    self._item_info(int(pools_of[i][p]), float(dd))
                    for p, dd in zip(idx[j], d2[j])
                ]
        return out

    def similar_items_batch(
        self, item_ids: List[int], k: int = 10
    ) -> List[List[Dict]]:
        """Nearest neighbours for many query items in fused batch programs
        (the coalesced form of ``similar_items``): chunks padded to exactly
        ``cp_batch_bucket`` — one compiled program, warmed at startup."""
        if self.mock:
            return [self.similar_items(i, k) for i in item_ids]
        if not item_ids:
            return []
        qrows = np.asarray(
            [self.lookup_row(i) for i in item_ids], dtype=np.int32
        )
        out: List[List[Dict]] = []
        for sel, padded in _bucket_chunks(
            range(len(qrows)), self.cp_batch_bucket
        ):
            chunk = qrows[padded]
            d2, idx = self._run(self._sim_task, chunk, k + 1)
            d2, idx = np.asarray(d2), np.asarray(idx)
            for j in range(len(sel)):
                row = int(chunk[j])
                items = [
                    self._item_info(int(i), float(dd))
                    for i, dd in zip(idx[j], d2[j])
                    if int(i) != row and int(i) < self.catalog.n_items
                ]
                out.append(items[:k])
        return out
