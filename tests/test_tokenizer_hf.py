"""Real-tokenizer branch of load_tokenizer (VERDICT r1 #8).

The reference tokenizes with the actual CLIP tokenizer of the pretrained
checkpoint (clip_text_encoder.py:42-47, max_length 64). In the zero-egress
environment we build a tiny-but-real CLIP BPE tokenizer on disk (vocab.json +
merges.txt, the HF slow-tokenizer format), drive `load_tokenizer` through the
`local_files_only=True` HF branch, and feed its ids end-to-end into the CLIP
text tower — covering the exact code path a downloaded fashion-clip
checkpoint uses.
"""

import json
import logging

import jax
import numpy as np
import pytest

from outfitx_tpu.data.tokenizer import HashTokenizer, load_tokenizer

transformers = pytest.importorskip("transformers")

# Minimal byte-pair vocabulary in the CLIP layout: word-final tokens carry
# "</w>", specials at the end.
VOCAB = [
    "l", "o", "w", "e", "r", "s", "t", "i", "d", "n",
    "lo", "l</w>", "w</w>", "r</w>", "t</w>",
    "low</w>", "er</w>", "lowest</w>", "newer</w>", "wider",
    "<unk>", "<|startoftext|>", "<|endoftext|>",
]
MERGES = ["#version: 0.2", "l o", "lo w</w>", "e r</w>"]


@pytest.fixture(scope="module")
def clip_tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_clip_tok")
    vocab_file = d / "vocab.json"
    merges_file = d / "merges.txt"
    vocab_file.write_text(
        json.dumps({tok: i for i, tok in enumerate(VOCAB)}), encoding="utf-8"
    )
    merges_file.write_text("\n".join(MERGES), encoding="utf-8")
    tok = transformers.CLIPTokenizer(str(vocab_file), str(merges_file))
    tok.save_pretrained(str(d))  # writes tokenizer_config.json for Auto*
    return str(d)


def test_hf_branch_loads_and_matches_direct_tokenizer(clip_tok_dir):
    call = load_tokenizer(clip_tok_dir)
    assert not isinstance(call, HashTokenizer), "HF branch must be taken"

    ids, mask = call(["lower newer", "low"], max_length=16)
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert ids.dtype == np.int32 and mask.dtype == np.int32

    ref = transformers.AutoTokenizer.from_pretrained(
        clip_tok_dir, local_files_only=True
    )(
        ["lower newer", "low"],
        padding="max_length",
        truncation=True,
        max_length=16,
        return_tensors="np",
    )
    np.testing.assert_array_equal(ids, ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, ref["attention_mask"].astype(np.int32))

    # BOS first, EOS present, every id inside the tiny vocab.
    bos, eos = VOCAB.index("<|startoftext|>"), VOCAB.index("<|endoftext|>")
    assert ids[0, 0] == bos and eos in ids[0]
    real = ids[mask.astype(bool)]
    assert real.max() < len(VOCAB) and real.min() >= 0


def test_hf_ids_drive_clip_text_tower(clip_tok_dir):
    """Tokenizer -> CLIP text tower (EOS pooling) end to end."""
    from outfitx_tpu.models.towers.text import TextTower, TextTowerConfig

    call = load_tokenizer(clip_tok_dir)
    ids, mask = call(["lowest wider", "newer lower low"], max_length=12)

    cfg = TextTowerConfig(
        vocab_size=len(VOCAB),
        max_len=12,
        d_model=32,
        n_heads=4,
        d_mlp=64,
        n_layers=2,
        proj_dim=16,
        eos_token_id=VOCAB.index("<|endoftext|>"),
    )
    tower = TextTower(cfg)
    params = tower.init(jax.random.PRNGKey(0))
    out = tower(params, ids, mask)
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))

    # EOS pooling must be insensitive to pad-region ids (True padding path):
    # mutate ids strictly after the EOS position and re-run.
    ids2 = ids.copy()
    for r in range(ids.shape[0]):
        eos_pos = int(np.argmax(ids[r] == cfg.eos_token_id))
        ids2[r, eos_pos + 1 :] = VOCAB.index("<unk>")
    out2 = tower(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-5
    )


def test_hash_fallback_warns_when_checkpoint_missing(caplog):
    with caplog.at_level(logging.WARNING, logger="outfitx_tpu.data.tokenizer"):
        call = load_tokenizer("/nonexistent/fashion-clip", vocab_size=1000)
    assert isinstance(call, HashTokenizer)
    assert any(
        "NOT vocabulary-compatible" in r.message for r in caplog.records
    )
