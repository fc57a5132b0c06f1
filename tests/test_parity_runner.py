"""Unit coverage for the parity-runner checks (scripts/run_parity.py) and
the compile-pack freshness canary (scripts/probe_pack_freshness.py).

The end-to-end paths run on the TPU (`run_parity.sh --smoke`,
`probe_pack_freshness.py` in the measurement batch); these tests pin the
host-side decision logic on CPU.
"""

import json
import os
import pathlib
import pickle
import sys

import numpy as np
import pytest

SCRIPTS = pathlib.Path(__file__).resolve().parents[1] / "scripts"
sys.path.insert(0, str(SCRIPTS))

from run_parity import check_layout, check_shards, check_tokenizer  # noqa: E402


class TestLayoutCheck:
    def test_missing_files_reported(self, tmp_path):
        r = check_layout(tmp_path, "nondisjoint")
        assert not r["ok"]
        assert "item_metadata.json" in r["missing"]

    def test_complete_layout_passes(self, tmp_path):
        for rel in (
            "item_metadata.json",
            "categories.json",
            "nondisjoint/train.json",
            "nondisjoint/compatibility/train.json",
            "nondisjoint/compatibility/valid.json",
            "nondisjoint/compatibility/test.json",
            "nondisjoint/fill_in_the_blank/test.json",
        ):
            p = tmp_path / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text("[]")
        r = check_layout(tmp_path, "nondisjoint")
        assert r["ok"] and not r["missing"]


class TestTokenizerCheck:
    def test_hash_fallback_fails(self, tmp_path):
        r = check_tokenizer(tmp_path, "siglip")
        assert not r["ok"]
        assert "hash-tokenizer" in r["detail"]

    def test_real_tokenizer_files_pass(self, tmp_path):
        # the HF fixture layout tests/test_tokenizer_hf.py exercises fully;
        # here: a minimal GPT2-style vocab/merges pair must be accepted
        (tmp_path / "vocab.json").write_text(
            json.dumps({"<|endoftext|>": 0, "red": 1, "shirt": 2, "Ġshirt": 3})
        )
        (tmp_path / "merges.txt").write_text("#version: 0.2\n")
        (tmp_path / "tokenizer_config.json").write_text("{}")
        r = check_tokenizer(tmp_path, "clip")
        assert "vocab.json" in r["tokenizer_files"]
        # ok depends on load_tokenizer accepting the stub; either way the
        # files are listed and the verdict is explicit
        assert "detail" in r


class TestShardCheck:
    def _write_ds(self, ds, n_items, d, n_images, model="m"):
        meta = [{"item_id": i, "category_id": 1} for i in range(n_items)]
        (ds / "images").mkdir(parents=True)
        for i in range(n_images):
            (ds / "images" / f"{i}.jpg").write_bytes(b"\xff\xd8fake")
        (ds / "item_metadata.json").write_text(json.dumps(meta))
        emb_dir = ds / "precomputed_embeddings"
        emb_dir.mkdir()
        with open(emb_dir / f"{model}_embedding_subset_0.pkl", "wb") as f:
            pickle.dump(
                {
                    "ids": list(range(n_images)),
                    "embeddings": np.zeros((n_images, d), np.float32),
                },
                f,
            )

    def test_matching_counts_pass(self, tmp_path):
        self._write_ds(tmp_path, n_items=10, d=16, n_images=7)
        r = check_shards(
            tmp_path / "precomputed_embeddings", tmp_path, "m", d_expected=16
        )
        assert r["ok"] and r["n_embeddings"] == 7 == r["n_items_with_images"]

    def test_dim_mismatch_fails(self, tmp_path):
        self._write_ds(tmp_path, n_items=4, d=16, n_images=4)
        r = check_shards(
            tmp_path / "precomputed_embeddings", tmp_path, "m", d_expected=32
        )
        assert not r["ok"]

    def test_no_shards_fails(self, tmp_path):
        (tmp_path / "precomputed_embeddings").mkdir()
        r = check_shards(
            tmp_path / "precomputed_embeddings", tmp_path, "m", d_expected=16
        )
        assert not r["ok"]


class TestFreshnessCanary:
    """compile_canary on the CPU backend: deterministic per cache dir,
    miss-then-hit, and the probe's fresh/stale decision."""

    @pytest.fixture()
    def cpu_env(self, monkeypatch):
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        # the child must not inherit a cache-seeding or device-count var
        monkeypatch.delenv("XLA_FLAGS", raising=False)

    def test_miss_then_hit_same_dir(self, tmp_path, cpu_env):
        from probe_pack_freshness import compile_canary

        d = tmp_path / "cache"
        name1, wrote1 = compile_canary(d)
        assert wrote1 and name1.startswith("jit_outfitx_pack_canary_v1-")
        name2, wrote2 = compile_canary(d)
        assert name2 == name1
        assert not wrote2  # second run hits the persisted entry

    def test_probe_verdict_against_pack(self, tmp_path, cpu_env):
        import subprocess

        from probe_pack_freshness import compile_canary

        cache = tmp_path / "cache"
        pack = tmp_path / "pack"
        pack.mkdir()
        name, _ = compile_canary(cache)

        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            JAX_COMPILATION_CACHE_DIR=str(cache),
        )
        env.pop("XLA_FLAGS", None)

        def probe():
            r = subprocess.run(
                [sys.executable, str(SCRIPTS / "probe_pack_freshness.py"),
                 "--pack", str(pack)],
                capture_output=True, text=True, env=env, timeout=300,
            )
            line = [
                ln for ln in r.stdout.splitlines() if ln.startswith("{")
            ][-1]
            return r.returncode, json.loads(line)

        rc, out = probe()  # canary not in pack -> stale, exit 3
        assert rc == 3 and not out["fresh"]
        (pack / name).write_bytes((cache / name).read_bytes())
        rc, out = probe()  # canary in pack -> fresh
        assert rc == 0 and out["fresh"]
        assert out["canary_entry"] == name
        assert not out["canary_compiled_now"]  # warm cache dir: a hit
