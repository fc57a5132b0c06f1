"""Catalog embedding-precompute sweep (reference
precompute_embedding_script.py, rebuilt TPU-native).

The reference pushes PIL images through frozen torch towers batch-by-batch
with per-batch H2D copies of f32 tensors (SURVEY.md 3.1 flags host
preprocessing + H2D as the bottleneck). Here: the host decodes/resizes to
uint8 on a background prefetch thread (double buffering), uint8 ships to
HBM (4x smaller), and normalize+encode runs as one jitted device program.
Output shards are pickled {ids, embeddings} files byte-compatible with both
the reference loader and our Catalog.from_polyvore.
"""

from __future__ import annotations

import json
import pathlib
import pickle
import queue
import threading
import time
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from outfitx_tpu.core.config import OutfitXConfig, PrecomputeConfig
from outfitx_tpu.data.preprocess import load_image_uint8
from outfitx_tpu.data.tokenizer import load_tokenizer
from outfitx_tpu.models.item_encoder import ItemEncoderModel


def _prefetch(it: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetcher: overlaps host decode with device work."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for x in it:
                q.put(x)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        x = q.get()
        if x is _END:
            return
        yield x


class PrecomputeRunner:
    def __init__(
        self,
        cfg: PrecomputeConfig,
        model_cfg: Optional[OutfitXConfig] = None,
        *,
        output_dir: Optional[str] = None,
        params=None,
        synthetic_items: int = 0,
        encoder: Optional[ItemEncoderModel] = None,
        n_slices: int = 1,
        slice_index: int = 0,
    ):
        self.cfg = cfg
        self.model_cfg = model_cfg or OutfitXConfig()
        # Catalog slicing for the sharded (multi-process) sweep: this runner
        # only encodes items whose enumeration index i satisfies
        # i % n_slices == slice_index, and writes them as ONE shard named
        # with the slice index — exactly the reference's per-rank layout
        # (precompute_embedding_script.py:35-55), which every loader already
        # merge-globs. Each slice runs in its own child process so the axon
        # relay's 1:1 H2D RSS leak (~150 KB/item) is freed at child exit,
        # removing the ~800k-item single-process ceiling (BENCHMARKS.md).
        if not (0 <= slice_index < n_slices):
            raise ValueError(f"slice {slice_index} not in [0, {n_slices})")
        self.n_slices = n_slices
        self.slice_index = slice_index
        # Precompute is a frozen-tower forward sweep: route tower attention
        # blocks through the fused Pallas kernel where it measured a win
        # (text L=64: 1.19x — towers/common.py shape-guards the choice, so
        # the vision shapes that lose fall through to the direct kernel;
        # parity_artifacts/measure_r5/attn_block.out). An explicit
        # OUTFITX_TOWER_ATTN in the environment still wins.
        import os

        os.environ.setdefault("OUTFITX_TOWER_ATTN", "block")
        self.encoder = encoder or ItemEncoderModel(self.model_cfg.item_encoder)
        self.params = params
        self.output_dir = pathlib.Path(
            output_dir
            or pathlib.Path(cfg.dataset_dir) / "precomputed_embeddings"
        )
        self.synthetic_items = synthetic_items
        self.tokenizer = load_tokenizer(
            self.model_cfg.item_encoder.text_model_name,
            vocab_size=self.encoder.text.cfg.vocab_size,
        )

        @jax.jit
        def _encode(params, images_uint8, input_ids, attention_mask):
            return self.encoder.encode(
                params, images_uint8, input_ids, attention_mask
            )

        self._encode = _encode

    # ------------------------------------------------------------- data --
    def _iter_items(self) -> Iterator[Tuple[int, np.ndarray, str]]:
        """Yields this slice's (item_id, image_uint8 (3,S,S), category_text).

        Slicing is round-robin over the raw item enumeration (cheap:
        non-slice items are skipped before any image decode), so N slices
        partition the catalog exactly."""
        size = self.encoder.image_size
        if self.synthetic_items:
            for i in range(self.synthetic_items):
                if i % self.n_slices != self.slice_index:
                    continue
                # image for item i is seeded by i, not by draw order, so a
                # sliced sweep produces byte-identical embeddings per item
                img = np.random.default_rng([self.cfg.seed, i]).integers(
                    0, 256, (3, size, size), dtype=np.uint8
                )
                yield 10_000 + i, img, f"category {i % 13}"
            return
        dataset_dir = pathlib.Path(self.cfg.dataset_dir)
        with open(dataset_dir / "item_metadata.json", encoding="utf-8") as f:
            metadata = json.load(f)
        with open(dataset_dir / "categories.json", encoding="utf-8") as f:
            categories = json.load(f)
        for i, m in enumerate(metadata):
            if i % self.n_slices != self.slice_index:
                continue
            iid = int(m["item_id"])
            img_path = dataset_dir / "images" / f"{iid}.jpg"
            if not img_path.exists():
                continue
            img = load_image_uint8(str(img_path), size)
            # text = resolved category name (reference PE processor,
            # outfit_x_precompute_embedding_processor.py:8-17)
            text = categories.get(str(m.get("category_id", "")), "")
            yield iid, img, text

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        b = self.cfg.batch_size
        size = self.encoder.image_size
        ids: List[int] = []
        imgs = np.zeros((b, 3, size, size), dtype=np.uint8)
        texts: List[str] = []
        n = 0
        for iid, img, text in self._iter_items():
            ids.append(iid)
            imgs[n] = img
            texts.append(text)
            n += 1
            if n == b:
                yield self._finalize(ids, imgs.copy(), texts, n)
                ids, texts, n = [], [], 0
        if n:
            yield self._finalize(ids, imgs.copy(), texts, n)

    def _finalize(self, ids, imgs, texts, n) -> Dict[str, np.ndarray]:
        max_len = min(
            self.model_cfg.item_encoder.text_max_length,
            self.encoder.text.cfg.max_len,
        )
        # pad the trailing partial batch (static shapes for XLA)
        while len(texts) < imgs.shape[0]:
            texts.append("")
        input_ids, attn = self.tokenizer(texts, max_length=max_len)
        return {
            "ids": np.asarray(ids, dtype=np.int64),
            "n": n,
            "images": imgs,
            "input_ids": input_ids,
            "attention_mask": attn,
        }

    # -------------------------------------------------------------- run --
    def run(self) -> Dict[str, float]:
        if self.params is None:
            self.params = self.encoder.init(jax.random.PRNGKey(self.cfg.seed))
        self.output_dir.mkdir(parents=True, exist_ok=True)
        model_name = self.model_cfg.model_name
        # sliced mode: this slice IS shard `slice_index` (one file per
        # slice, the reference's per-rank layout); single-process mode
        # rolls a new shard every 50k items to bound file sizes
        shard_items = 50_000 if self.n_slices == 1 else (1 << 62)
        shard_base = 0 if self.n_slices == 1 else self.slice_index
        shard_idx, done = 0, 0
        cur_ids: List[np.ndarray] = []
        cur_embs: List[np.ndarray] = []
        t0 = time.perf_counter()
        for batch in _prefetch(self._batches()):
            emb = self._encode(
                self.params,
                jnp.asarray(batch["images"]),
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"]),
            )
            emb = np.asarray(jax.device_get(emb))[: batch["n"]]
            cur_ids.append(batch["ids"])
            cur_embs.append(emb)
            done += batch["n"]
            if sum(len(i) for i in cur_ids) >= shard_items:
                self._write_shard(
                    model_name, shard_base + shard_idx, cur_ids, cur_embs
                )
                shard_idx += 1
                cur_ids, cur_embs = [], []
        if cur_ids:
            self._write_shard(
                model_name, shard_base + shard_idx, cur_ids, cur_embs
            )
            shard_idx += 1
        dt = time.perf_counter() - t0
        import resource

        return {
            "items": done,
            "shards": shard_idx,
            "seconds": round(dt, 2),
            "items_per_sec": round(done / max(dt, 1e-9), 1),
            # peak RSS evidence for the sharded-sweep leak bound
            "max_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
            ),
        }

    def _write_shard(self, model_name, idx, ids, embs):
        path = (
            self.output_dir
            / f"{model_name}_{self.cfg.shard_prefix}{idx}.pkl"
        )
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "ids": np.concatenate(ids).tolist(),
                    "embeddings": np.concatenate(embs),
                },
                f,
            )
