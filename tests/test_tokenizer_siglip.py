"""SigLIP (sentencepiece-family) tokenizer branch of load_tokenizer.

The DEFAULT encoder family is siglip (core/config.py), whose checkpoint
ships a sentencepiece Unigram tokenizer (reference slip_text_encoder.py:27-32
via open_clip; the HF form is spiece.model + tokenizer.json). The
`sentencepiece` package is not installed in this environment, so the slow
SiglipTokenizer cannot instantiate — instead we build the *fast* equivalent
the HF checkpoints also ship: a Unigram-model `tokenizer.json` with SigLIP's
conventions (lowercase normalizer, metaspace pre-tokenizer, `</s>` eos id 1
appended, `</s>` padding), load it through `load_tokenizer` ->
`AutoTokenizer(local_files_only=True)`, and feed the ids end-to-end into the
siglip-variant text tower (last-token pooling).
"""

import json

import jax
import numpy as np
import pytest

from outfitx_tpu.data.tokenizer import HashTokenizer, load_tokenizer

transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

# id layout matches SigLIP: </s> = 1 (TextTowerConfig.siglip_b eos_token_id)
PIECES = [
    ("<pad>", 0.0),
    ("</s>", 0.0),
    ("<unk>", -10.0),
    ("▁low", -1.0),
    ("▁lower", -1.2),
    ("▁new", -1.1),
    ("er", -1.5),
    ("▁wide", -1.3),
    ("▁dress", -1.0),
    ("▁red", -1.0),
    ("s", -2.0),
]


@pytest.fixture(scope="module")
def siglip_tok_dir(tmp_path_factory):
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
    from tokenizers import decoders, processors

    d = tmp_path_factory.mktemp("tiny_siglip_tok")
    tok = Tokenizer(models.Unigram(PIECES, unk_id=2))
    tok.normalizer = normalizers.Lowercase()
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    # SigLIP appends </s> (eos id 1) to every sequence
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>",
        pair="$A </s> $B </s>",
        special_tokens=[("</s>", 1)],
    )
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "eos_token": "</s>",
                "pad_token": "</s>",
                "unk_token": "<unk>",
                "model_max_length": 64,
            }
        )
    )
    return str(d)


def test_siglip_branch_loads_and_matches_direct_tokenizer(siglip_tok_dir):
    call = load_tokenizer(siglip_tok_dir)
    assert not isinstance(call, HashTokenizer), "HF branch must be taken"

    ids, mask = call(["Red dress", "lower NEW wide dress"], max_length=16)
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert ids.dtype == np.int32 and mask.dtype == np.int32

    ref = transformers.AutoTokenizer.from_pretrained(
        siglip_tok_dir, local_files_only=True
    )(
        ["Red dress", "lower NEW wide dress"],
        padding="max_length",
        truncation=True,
        max_length=16,
        return_tensors="np",
    )
    np.testing.assert_array_equal(ids, ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, ref["attention_mask"].astype(np.int32))

    # sentencepiece-convention checks: lowercased pieces resolved (no <unk>
    # for in-vocab words), </s> terminates each sequence, </s> pads.
    piece_ids = {p: i for i, (p, _) in enumerate(PIECES)}
    row0 = ids[0][mask[0].astype(bool)]
    assert row0.tolist() == [
        piece_ids["▁red"], piece_ids["▁dress"], piece_ids["</s>"]
    ]
    assert (ids[0][~mask[0].astype(bool)] == piece_ids["</s>"]).all()
    assert piece_ids["<unk>"] not in ids


def test_siglip_ids_drive_siglip_text_tower(siglip_tok_dir):
    """Tokenizer -> siglip text tower (bidirectional, last-token pooling)."""
    import dataclasses

    from outfitx_tpu.models.towers.text import TextTower, TextTowerConfig

    call = load_tokenizer(siglip_tok_dir)
    ids, mask = call(["red dress", "new lower wides"], max_length=12)

    cfg = dataclasses.replace(
        TextTowerConfig.siglip_b(),
        vocab_size=len(PIECES),
        max_len=12,
        d_model=32,
        n_heads=4,
        d_mlp=64,
        n_layers=2,
        proj_dim=16,
        compute_dtype="float32",
    )
    assert cfg.eos_token_id == 1 == ids[0][mask[0].astype(bool)][-1]
    tower = TextTower(cfg)
    params = tower.init(jax.random.PRNGKey(0))
    out = tower(params, ids, mask)
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))

    # Bidirectional tower + True-pad masking: mutating PAD-position ids must
    # not change the pooled output (attention ignores them; last-token
    # pooling reads position -1 whose *content* is pad — SigLIP's real
    # checkpoints pad with </s> so position -1 is always </s>; mutate only
    # non-final pad slots to honor that).
    ids2 = ids.copy()
    for r in range(ids.shape[0]):
        n_real = int(mask[r].sum())
        ids2[r, n_real:-1] = 2  # <unk> garbage in interior pad slots
    out2 = tower(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out2), rtol=1e-4, atol=1e-5
    )
