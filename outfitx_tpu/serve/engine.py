"""Serving engine: the reference demo's model-side logic
(src/demo/app.py:80-232) as a reusable library.

Loads up to three task model instances (CP / CIR / FITB-shares-CIR, app.py
:80-116,245-247), keeps the catalog + per-category candidate pools
device-resident, and serves:
- CP: sigmoid compatibility scores (:121-145)
- CIR: top-10 retrieval against the target category's pool (:169-201)
- FITB: argmin over 4 candidates (:205-232)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.core.config import OutfitXConfig
from outfitx_tpu.data.catalog import Catalog
from outfitx_tpu.data.sampler import CandidatePools
from outfitx_tpu.data.splits import _pad_outfits
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.ops.retrieval import fitb_pick, retrieve, retrieve_chunked


class UnknownItemError(KeyError):
    """Raised for item ids absent from the catalog."""


@dataclasses.dataclass
class ServingEngine:
    model_cfg: OutfitXConfig
    catalog: Catalog
    cp_params: Optional[dict] = None
    cir_params: Optional[dict] = None
    pools: Optional[CandidatePools] = None
    mock: bool = False
    quantized: bool = False  # int8 catalog for whole-catalog retrieval
    # Above this catalog size, whole-catalog retrieval streams the pool in
    # chunks (lax.scan running top-k) instead of materialising (Q, N).
    chunk_threshold: int = 262_144
    # Directory holding {item_id}.jpg files (reference demo renders item
    # images, app.py:255-387); None disables image URLs.
    images_dir: Optional[str] = None
    # Serving uses the TPU-native approximate top-k: ~2.3x lower retrieval
    # latency at recall ~0.995 vs exact (ops/retrieval.topk_smallest).
    # Metric-eval code paths (evalm/) are unaffected and stay exact.
    approx_topk: bool = True

    warmup: bool = True

    def __post_init__(self):
        self.model = OutfitXModel(self.model_cfg)
        self.catalog_dev = jnp.asarray(self.catalog.embeddings)
        self._qcat = None
        if self.quantized:
            from outfitx_tpu.ops.quantization import quantize_catalog

            # quantize only real rows; PAD row stays out of retrieval anyway
            self._qcat = quantize_catalog(self.catalog_dev[: self.catalog.n_items])
        self._rng = np.random.default_rng(0)
        if not self.mock:
            self._cp_fn = jax.jit(
                lambda p, e, m: self.model.cp_forward(p, e, m)
            )
            self._cir_fn = jax.jit(
                lambda p, e, m, t: self.model.cir_forward(p, e, m, t)
            )
            if self.warmup:
                # Trigger jit compiles at startup so the first HTTP request
                # doesn't stall for minutes behind XLA compilation.
                ids = self.sample_outfit(2)
                self.cp_score(ids)
                if self.cir_params is not None:
                    self.cir_top10(ids[:1], ids[1])

    def lookup_row(self, item_id: int) -> int:
        row = self.catalog.id_to_row.get(int(item_id))
        if row is None:
            raise UnknownItemError(f"unknown item_id {item_id}")
        return row

    def _retrieve_catalog(self, queries, k: int):
        """Whole-catalog top-k, routed by scale: int8 when quantized,
        chunk-streamed when the catalog is too large for a dense (Q, N)
        distance matrix, dense single-matmul otherwise."""
        if self._qcat is not None:
            from outfitx_tpu.ops.quantization import retrieve_quantized

            return retrieve_quantized(
                queries, self._qcat, k=k, approx=self.approx_topk
            )
        n = self.catalog.n_items
        if n > self.chunk_threshold:
            return retrieve_chunked(
                queries, self.catalog_dev[:n], k, chunk_size=self.chunk_threshold
            )
        return retrieve(
            queries, self.catalog_dev[:n], k=k, approx=self.approx_topk
        )

    # ------------------------------------------------------------ tasks --
    def _pad(self, item_ids: List[int]):
        for i in item_ids:
            self.lookup_row(i)  # clear error for unknown ids
        rows, mask = _pad_outfits(
            self.catalog, [list(item_ids)], self.model_cfg.max_outfit_len
        )
        emb = self.catalog_dev[jnp.asarray(rows)]
        return emb, jnp.asarray(mask)

    def cp_score(self, item_ids: List[int]) -> float:
        """Sigmoid compatibility score for one outfit."""
        if self.mock:
            return float(self._rng.random())
        emb, mask = self._pad(item_ids)
        logit = self._cp_fn(self.cp_params, emb, mask)
        return float(jax.nn.sigmoid(logit)[0])

    def _cir_query(self, item_ids: List[int], target_item_id: Optional[int], target_row: Optional[int] = None):
        emb, mask = self._pad(item_ids)
        if target_row is None:
            target_row = self.lookup_row(target_item_id)
        d = self.catalog.d_embed
        text = self.catalog_dev[target_row][d // 2 :][None, :]
        return self._cir_fn(self.cir_params, emb, mask, text)

    def cir_top10(
        self, item_ids: List[int], target_item_id: int
    ) -> List[Dict]:
        """Top-10 complementary items from the target's category pool."""
        if self.mock:
            rows = self._rng.choice(self.catalog.n_items, 10, replace=False)
            return [self._item_info(int(r), 1.0) for r in rows]
        target_row = self.lookup_row(target_item_id)
        cid = int(self.catalog.category_id[target_row])
        pool_rows = (
            self.pools.pools.get(cid)
            if self.pools is not None
            else None
        )
        if pool_rows is None:  # whole-catalog retrieval
            y = self._cir_query(item_ids, target_item_id)
            d2, idx = self._retrieve_catalog(y, k=10)
            pool_rows = np.arange(self.catalog.n_items, dtype=np.int32)
        else:
            y = self._cir_query(item_ids, target_item_id)
            pool_emb = self.catalog_dev[jnp.asarray(pool_rows)]
            d2, idx = retrieve(y, pool_emb, k=10)
        out = []
        for rank, (i, dist) in enumerate(
            zip(np.asarray(idx)[0], np.asarray(d2)[0])
        ):
            out.append(self._item_info(int(pool_rows[i]), float(dist)))
        return out

    def fitb_pick(
        self, item_ids: List[int], candidate_ids: List[int]
    ) -> int:
        """Index of the best-fitting candidate."""
        if self.mock:
            return int(self._rng.integers(len(candidate_ids)))
        # condition on each candidate's text half? The reference FITB demo
        # uses the answer-agnostic query: candidates share a category, so use
        # the first candidate's text embedding (matches processor semantics
        # of passing the target item's text, app.py:205-232).
        y = self._cir_query(item_ids, candidate_ids[0])
        cand_rows = self.catalog.rows(candidate_ids)
        cands = self.catalog_dev[jnp.asarray(cand_rows)][None]
        return int(np.asarray(fitb_pick(y, cands))[0])

    # ------------------------------------------------------------ util --
    def image_path(self, item_id: int):
        """Filesystem path of the item's jpg, or None (unknown id, no
        images_dir, or file absent)."""
        if self.images_dir is None:
            return None
        import pathlib

        p = pathlib.Path(self.images_dir) / f"{int(item_id)}.jpg"
        return p if p.is_file() else None

    def _item_info(self, row: int, score: float) -> Dict:
        item_id = int(self.catalog.item_ids[row])
        info = {
            "item_id": item_id,
            "score": score,
            "category_id": int(self.catalog.category_id[row]),
            "description": (
                self.catalog.descriptions[row]
                if self.catalog.descriptions
                else ""
            ),
        }
        if self.image_path(item_id) is not None:
            info["image_url"] = f"/images/{item_id}.jpg"
        return info

    def similar_items(self, item_id: int, k: int = 10) -> List[Dict]:
        """Nearest catalog neighbours of an item by embedding L2 (serving
        convenience beyond the reference demo)."""
        row = self.lookup_row(item_id)
        q = self.catalog_dev[row][None, :]
        d2, idx = self._retrieve_catalog(q, k=k + 1)
        out = []
        for i, dist in zip(np.asarray(idx)[0], np.asarray(d2)[0]):
            if int(i) == row:
                continue  # skip the query item itself
            out.append(self._item_info(int(i), float(dist)))
        return out[:k]

    def sample_outfit(self, n: int = 4) -> List[int]:
        rows = self._rng.choice(self.catalog.n_items, n, replace=False)
        return [int(self.catalog.item_ids[r]) for r in rows]
