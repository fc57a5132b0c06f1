"""Text tokenization for the frozen text towers.

When local tokenizer files exist (a downloaded fashion-clip / fashionSigLIP
checkpoint directory), the HF tokenizer is used for exact parity with the
reference (clip_text_encoder.py:42-47 tokenizes with max_length 64). In the
zero-egress environment a deterministic hash tokenizer stands in so every
pipeline stays runnable end-to-end; it is NOT vocabulary-compatible with
pretrained weights and is only for synthetic/smoke paths.
"""

from __future__ import annotations

import hashlib
import logging
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class HashTokenizer:
    """Deterministic word-hash tokenizer with BOS/EOS, CLIP-style layout."""

    def __init__(
        self,
        vocab_size: int = 49408,
        bos: int | None = None,
        eos: int | None = None,
    ):
        self.vocab_size = vocab_size
        # specials live at the top of the vocab (CLIP convention), clamped
        # to the actual vocab so small-vocab towers never see OOB ids
        self.bos = bos if bos is not None else vocab_size - 2
        self.eos = eos if eos is not None else vocab_size - 1

    def _word_id(self, w: str) -> int:
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
        return 1 + h % (min(self.bos, self.eos) - 1)

    def __call__(
        self, texts: List[str], max_length: int = 64
    ) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.zeros((len(texts), max_length), dtype=np.int32)
        mask = np.zeros((len(texts), max_length), dtype=np.int32)
        for i, t in enumerate(texts):
            toks = [self.bos] + [
                self._word_id(w) for w in t.lower().split()[: max_length - 2]
            ] + [self.eos]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask


def load_tokenizer(model_name_or_path: Optional[str], vocab_size: int = 49408):
    """HF tokenizer if locally available, else HashTokenizer fallback."""
    if model_name_or_path:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(
                model_name_or_path, local_files_only=True
            )

            def call(texts: List[str], max_length: int = 64):
                out = tok(
                    texts,
                    padding="max_length",
                    truncation=True,
                    max_length=max_length,
                    return_tensors="np",
                )
                return (
                    out["input_ids"].astype(np.int32),
                    out["attention_mask"].astype(np.int32),
                )

            return call
        except Exception as e:
            logger.warning(
                "tokenizer '%s' not available locally (%s); falling back to "
                "HashTokenizer — NOT vocabulary-compatible with pretrained "
                "weights, use only for synthetic/smoke runs",
                model_name_or_path,
                e,
            )
    return HashTokenizer(vocab_size=vocab_size)
