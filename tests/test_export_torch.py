"""Torch-checkpoint export (models/export_torch.py): the emitted
state_dict must load strict into the reference's module surface
(reference outfit_x.py:30-71) and reproduce our forwards numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from outfitx_tpu.core.config import (
    ItemEncoderConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.models import OutfitXModel
from outfitx_tpu.models.export_torch import (
    export_reference_checkpoint,
    reference_state_dict,
)


class _RefStack(nn.Module):
    """The reference OutfitX's trainable surface, name-for-name
    (outfit_x.py: transformer_encoder :41, outfit_token :53, cp_ffn :57,
    cir_ffn :65, target_item_image_emb :69); frozen item-encoder towers
    omitted — they carry no exported weights."""

    def __init__(self, cfg: OutfitXConfig):
        super().__init__()
        d = cfg.d_embed
        layer = nn.TransformerEncoderLayer(
            d_model=d,
            nhead=cfg.transformer.n_heads,
            dim_feedforward=cfg.transformer.d_ffn,
            dropout=0.0,
            activation=F.mish,
            batch_first=True,
            norm_first=True,
        )
        self.transformer_encoder = nn.TransformerEncoder(
            layer, cfg.transformer.n_layers
        )
        self.outfit_token = nn.Parameter(torch.zeros(d))
        self.cp_ffn = nn.Sequential(nn.Dropout(0.0), nn.Linear(d, 1))
        self.cir_ffn = nn.Sequential(nn.Linear(d, d, bias=False))
        self.target_item_image_emb = nn.Parameter(torch.zeros(d // 2))


@pytest.fixture(scope="module")
def setup():
    cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=32),
        transformer=TransformerConfig(
            n_heads=4, d_ffn=96, n_layers=3, dropout=0.3
        ),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(7))
    ref = _RefStack(cfg).eval()
    missing, unexpected = ref.load_state_dict(
        reference_state_dict(params), strict=True
    )
    assert not missing and not unexpected
    return cfg, model, params, ref


class TestReferenceStateDict:
    def test_cp_forward_matches(self, setup, rng):
        cfg, model, params, ref = setup
        b, l, d = 5, cfg.max_outfit_len, cfg.d_embed
        emb = rng.standard_normal((b, l, d)).astype(np.float32)
        mask = np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
        ours = np.asarray(model.cp_forward(params, jnp.asarray(emb), jnp.asarray(mask)))
        with torch.no_grad():
            x = torch.cat(
                [
                    ref.outfit_token.expand(b, 1, d),
                    torch.from_numpy(emb),
                ],
                dim=1,
            )
            m = torch.cat(
                [torch.zeros(b, 1, dtype=torch.bool), torch.from_numpy(mask)],
                dim=1,
            )
            out = ref.transformer_encoder(x, src_key_padding_mask=m)
            theirs = ref.cp_ffn(out[:, 0]).squeeze(-1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=2e-5)

    def test_cir_forward_matches(self, setup, rng):
        cfg, model, params, ref = setup
        b, l, d = 4, cfg.max_outfit_len, cfg.d_embed
        emb = rng.standard_normal((b, l, d)).astype(np.float32)
        mask = np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
        text = rng.standard_normal((b, d // 2)).astype(np.float32)
        ours = np.asarray(
            model.cir_forward(
                params, jnp.asarray(emb), jnp.asarray(mask), jnp.asarray(text)
            )
        )
        with torch.no_grad():
            tok = torch.cat(
                [
                    ref.target_item_image_emb.expand(b, d // 2),
                    torch.from_numpy(text),
                ],
                dim=1,
            )[:, None, :]
            x = torch.cat([tok, torch.from_numpy(emb)], dim=1)
            m = torch.cat(
                [torch.zeros(b, 1, dtype=torch.bool), torch.from_numpy(mask)],
                dim=1,
            )
            out = ref.transformer_encoder(x, src_key_padding_mask=m)
            theirs = ref.cir_ffn(out[:, 0]).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=2e-5)

    def test_final_norm_variant_exports(self, rng):
        cfg = OutfitXConfig(
            item_encoder=ItemEncoderConfig(dim_per_modality=16),
            transformer=TransformerConfig(
                n_heads=2, d_ffn=32, n_layers=2, dropout=0.0, final_norm=True
            ),
            max_outfit_len=4,
            compute_dtype="float32",
        )
        params = OutfitXModel(cfg).init(jax.random.PRNGKey(0))
        sd = reference_state_dict(params)
        assert "transformer_encoder.norm.weight" in sd


class TestCheckpointExport:
    def test_pth_roundtrip(self, setup, tmp_path):
        cfg, model, params, _ = setup
        from outfitx_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(tmp_path, "run")
        mgr.save("best_auc", params=params, epoch=7)
        out = export_reference_checkpoint(
            tmp_path / "run" / "best_auc", tmp_path / "export" / "best.pth"
        )
        payload = torch.load(out, weights_only=True)
        assert payload["epoch"] == 7
        assert payload["optimizer"] is None
        ref = _RefStack(cfg)
        missing, unexpected = ref.load_state_dict(
            payload["model"], strict=True
        )
        assert not missing and not unexpected

    def test_cli_export_torch(self, setup, tmp_path):
        cfg, model, params, _ = setup
        from click.testing import CliRunner

        from outfitx_tpu.cli.main import cli
        from outfitx_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(tmp_path, "run")
        mgr.save("final", params=params, epoch=1)
        out = tmp_path / "ref.pth"
        res = CliRunner().invoke(
            cli,
            [
                "export-torch",
                "--params", str(tmp_path / "run" / "final"),
                "--out", str(out),
            ],
        )
        assert res.exit_code == 0, res.output
        assert out.exists()

    def test_towers_from_merges_frozen_tower_keys(self, setup, tmp_path):
        """ADVICE r3 (medium): a stock reference install registers the
        frozen towers as submodules, so its default-strict
        load_state_dict needs item_encoder.* keys. --towers-from merges
        them from any reference-side checkpoint."""
        cfg, model, params, _ = setup
        from outfitx_tpu.train.checkpoint import CheckpointManager

        class _RefWithTowers(_RefStack):
            def __init__(self, cfg):
                super().__init__(cfg)
                # stand-in for the frozen tower submodules (SigLIP etc.)
                self.item_encoder = nn.Sequential(nn.Linear(4, 4))

        donor = _RefWithTowers(cfg)
        donor_path = tmp_path / "towers.pth"
        torch.save({"model": donor.state_dict()}, donor_path)

        mgr = CheckpointManager(tmp_path, "run2")
        mgr.save("best_auc", params=params, epoch=3)
        out = export_reference_checkpoint(
            tmp_path / "run2" / "best_auc",
            tmp_path / "export" / "merged.pth",
            towers_from=donor_path,
        )
        payload = torch.load(out, weights_only=True)
        target = _RefWithTowers(cfg)
        missing, unexpected = target.load_state_dict(
            payload["model"], strict=True
        )
        assert not missing and not unexpected
        # the merged tower tensors are the donor's, bit-for-bit
        np.testing.assert_array_equal(
            payload["model"]["item_encoder.0.weight"].numpy(),
            donor.state_dict()["item_encoder.0.weight"].numpy(),
        )

    def test_towers_from_without_tower_keys_raises(self, setup, tmp_path):
        cfg, model, params, _ = setup
        from outfitx_tpu.train.checkpoint import CheckpointManager

        donor_path = tmp_path / "no_towers.pth"
        torch.save({"model": _RefStack(cfg).state_dict()}, donor_path)
        mgr = CheckpointManager(tmp_path, "run3")
        mgr.save("final", params=params, epoch=0)
        with pytest.raises(ValueError, match="item_encoder"):
            export_reference_checkpoint(
                tmp_path / "run3" / "final",
                tmp_path / "export" / "x.pth",
                towers_from=donor_path,
            )
