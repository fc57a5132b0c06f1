"""Unit coverage for support modules: configs, mesh resolution, metric
logging, best-metric tracking, batching edges, tokenizer determinism."""

import json
import pathlib

import numpy as np
import pytest

from outfitx_tpu.core.config import (
    CIRTrainConfig,
    ItemEncoderConfig,
    MeshConfig,
    OutfitXConfig,
)
from outfitx_tpu.core.mesh import MeshSpec, make_mesh
from outfitx_tpu.data.sampler import eval_batches
from outfitx_tpu.data.tokenizer import HashTokenizer, load_tokenizer
from outfitx_tpu.train.checkpoint import BestMetricTracker
from outfitx_tpu.train.metrics_log import MetricsLogger


class TestConfigs:
    def test_d_embed_derivation(self):
        assert ItemEncoderConfig.for_type("siglip").d_embed == 1536
        assert ItemEncoderConfig.for_type("clip").d_embed == 1024
        assert ItemEncoderConfig.for_type("resnet_sbert").d_embed == 128
        assert (
            ItemEncoderConfig(dim_per_modality=64, aggregation="mean").d_embed
            == 64
        )

    def test_model_name_scheme(self):
        assert OutfitXConfig().model_name == "outfitx-tpu-siglip-d1536"

    def test_configs_hashable(self):
        # frozen configs must be usable as jit static args
        hash(OutfitXConfig())
        hash(CIRTrainConfig())

    def test_mesh_resolve(self):
        assert MeshConfig(data=-1, model=2).resolve(8) == (4, 2)
        assert MeshConfig(data=3, model=1).resolve(8) == (3, 1)
        assert MeshConfig().resolve(1) == (1, 1)

    def test_make_mesh_too_many_devices(self):
        with pytest.raises(ValueError, match="devices"):
            make_mesh(MeshSpec(data=64, model=4))


class TestBestMetricTracker:
    def test_max_and_min_modes(self):
        t = BestMetricTracker(auc="max", loss="min")
        assert t.update("auc", 0.5) and t.update("loss", 1.0)
        assert not t.update("auc", 0.4)
        assert t.update("auc", 0.6)
        assert t.update("loss", 0.9)
        assert not t.update("loss", 2.0)
        assert t.best == {"auc": 0.6, "loss": 0.9}


class TestEvalBatches:
    def test_exact_multiple_has_no_padding(self):
        arrays = {"x": np.arange(8)}
        batches = list(eval_batches(arrays, batch_size=4))
        assert len(batches) == 2
        assert all(b["valid"].all() for b in batches)

    def test_wraparound_marked_invalid(self):
        arrays = {"x": np.arange(5)}
        batches = list(eval_batches(arrays, batch_size=4))
        assert len(batches) == 2
        assert batches[1]["valid"].tolist() == [True, False, False, False]
        # every original element appears exactly once among valid rows
        seen = np.concatenate(
            [b["x"][b["valid"]] for b in batches]
        )
        np.testing.assert_array_equal(np.sort(seen), np.arange(5))


class TestTokenizer:
    def test_hash_tokenizer_deterministic_and_shaped(self):
        tok = HashTokenizer(vocab_size=1000, bos=997, eos=998)
        ids1, mask1 = tok(["red shirt", "blue jeans and boots"], max_length=8)
        ids2, _ = tok(["red shirt", "blue jeans and boots"], max_length=8)
        np.testing.assert_array_equal(ids1, ids2)
        assert ids1.shape == (2, 8)
        assert ids1[0, 0] == 997  # bos
        assert 998 in ids1[0]  # eos
        assert mask1[0].sum() == 4  # bos + 2 words + eos

    def test_load_tokenizer_falls_back(self):
        tok = load_tokenizer("definitely/not-a-local-model", vocab_size=500)
        assert isinstance(tok, HashTokenizer)


class TestMetricsLogger:
    def test_jsonl_records(self, tmp_path):
        ml = MetricsLogger(tmp_path, "runx")
        ml.log("train", 0, {"loss": 1.5})
        ml.log("valid", 0, {"auc": 0.9})
        ml.close()
        lines = [
            json.loads(x)
            for x in (tmp_path / "runx_metrics.jsonl").read_text().splitlines()
        ]
        assert lines[0]["split"] == "train" and lines[0]["loss"] == 1.5
        assert lines[1]["auc"] == 0.9
        assert all("ts" in rec for rec in lines)

    def test_wandb_attach_flows_metrics(self, tmp_path, monkeypatch):
        """With WANDB_API_KEY set and a working wandb, metrics reach the run."""
        import sys
        import types

        calls = []

        class FakeRun:
            def log(self, metrics, step=None):
                calls.append((metrics, step))

            def finish(self):
                calls.append("finished")

        fake = types.ModuleType("wandb")
        fake.init = lambda project, name: FakeRun()
        monkeypatch.setitem(sys.modules, "wandb", fake)
        monkeypatch.setenv("WANDB_API_KEY", "k")
        ml = MetricsLogger(tmp_path, "runw")
        ml.log("valid", 3, {"auc": 0.8})
        ml.close()
        assert calls[0] == ({"auc/valid/epoch": 0.8}, None)
        assert calls[-1] == "finished"

    def test_wandb_attach_failure_warns_and_jsonl_survives(
        self, tmp_path, monkeypatch, caplog
    ):
        """A broken wandb.init logs a warning; the JSONL sink still works."""
        import logging
        import sys
        import types

        fake = types.ModuleType("wandb")

        def boom(project, name):
            raise RuntimeError("api drift")

        fake.init = boom
        monkeypatch.setitem(sys.modules, "wandb", fake)
        monkeypatch.setenv("WANDB_API_KEY", "k")
        with caplog.at_level(logging.WARNING, logger="outfitx_tpu.train.metrics_log"):
            ml = MetricsLogger(tmp_path, "runf")
        assert ml._wandb is None
        assert any("wandb attach failed" in r.message for r in caplog.records)
        ml.log("train", 0, {"loss": 2.0})
        ml.close()
        rec = json.loads((tmp_path / "runf_metrics.jsonl").read_text().splitlines()[0])
        assert rec["loss"] == 2.0

    def test_no_key_means_no_attach(self, tmp_path, monkeypatch):
        monkeypatch.delenv("WANDB_API_KEY", raising=False)
        ml = MetricsLogger(tmp_path, "runn")
        assert ml._wandb is None
        ml.close()


class TestPerStepLogging:
    def test_cp_trainer_batch_stream(self, tmp_path):
        import dataclasses

        from outfitx_tpu.core.config import (
            CPTrainConfig,
            OptimizerConfig,
            TransformerConfig,
        )
        from outfitx_tpu.data.synthetic import make_synthetic
        from outfitx_tpu.train.cp_trainer import CPTrainer

        synth = make_synthetic(n_items=200, d_embed=32, n_outfits=128, seed=2)
        model_cfg = OutfitXConfig(
            item_encoder=ItemEncoderConfig(dim_per_modality=16),
            transformer=TransformerConfig(n_heads=4, d_ffn=32, n_layers=1, dropout=0.0),
            max_outfit_len=8,
            compute_dtype="float32",
        )
        cfg = CPTrainConfig(
            n_epochs=1, batch_size=32, accumulation_steps=1,
            optimizer=OptimizerConfig(learning_rate=1e-3),
            log_every_steps=2,
            checkpoint_dir=str(tmp_path / "c"), log_dir=str(tmp_path / "l"),
        )
        with CPTrainer(cfg, model_cfg, catalog=synth.catalog,
                       train_split=synth.cp_train,
                       valid_split=synth.cp_valid) as t:
            t.run()
            name = t.model_name
        text = (tmp_path / "l" / f"{name}_metrics.jsonl").read_text()
        assert '"split": "train_batch"' in text


class TestRestoreShadowedSiteDirs:
    """A user PYTHONPATH override (PYTHONPATH=. python bench.py) replaces
    the ambient path whose sitecustomize registers the TPU plugin; the
    runtime helper detects and repairs the env before re-exec."""

    def test_restores_missing_site_dir(self, monkeypatch, tmp_path):
        from outfitx_tpu.core import runtime

        site = tmp_path / "plugin_site"
        site.mkdir()
        (site / "sitecustomize.py").write_text("")
        monkeypatch.setattr(runtime, "_PLUGIN_SITE_DIRS", (str(site),))
        env = {"PYTHONPATH": "."}
        fixed = runtime.restore_shadowed_site_dirs(env)
        assert fixed == [str(site)]
        assert env["PYTHONPATH"].split(":") == [".", str(site)]
        # idempotent: already present -> nothing to fix
        assert runtime.restore_shadowed_site_dirs(env) == []

    def test_noop_without_site_dir(self, monkeypatch, tmp_path):
        from outfitx_tpu.core import runtime

        monkeypatch.setattr(
            runtime, "_PLUGIN_SITE_DIRS", (str(tmp_path / "absent"),)
        )
        env = {}
        assert runtime.restore_shadowed_site_dirs(env) == []
        assert "PYTHONPATH" not in env

    def test_empty_pythonpath_set_directly(self, monkeypatch, tmp_path):
        from outfitx_tpu.core import runtime

        site = tmp_path / "s"
        site.mkdir()
        (site / "sitecustomize.py").write_text("")
        monkeypatch.setattr(runtime, "_PLUGIN_SITE_DIRS", (str(site),))
        env = {}
        assert runtime.restore_shadowed_site_dirs(env) == [str(site)]
        assert env["PYTHONPATH"] == str(site)


class TestForcePlatformFromEnv:
    """JAX_PLATFORMS in the environment must win even when a sitecustomize
    imported jax (and pinned a platform) before user code ran — observed
    with the axon relay: `JAX_PLATFORMS=cpu python -m outfitx_tpu.cli`
    still initialized the TPU backend until the CLI applied the env choice
    at the config level (the same reason conftest.py calls config.update)."""

    def test_env_choice_applied_at_config_level(self, monkeypatch):
        import jax

        from outfitx_tpu.core import runtime

        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        runtime.force_platform_from_env()
        assert jax.config.jax_platforms == "cpu"
        # idempotent when config already matches
        runtime.force_platform_from_env()
        assert jax.config.jax_platforms == "cpu"

    def test_noop_when_unset(self, monkeypatch):
        import jax

        from outfitx_tpu.core import runtime

        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        before = jax.config.jax_platforms
        runtime.force_platform_from_env()
        assert jax.config.jax_platforms == before


class TestDevicesProbe:
    """The relay has two outage modes: registration raises, or device init
    hangs indefinitely (2026-08-18). The child-interpreter probe converts a
    hang into a bounded failure so retry_if_backend_down can ride it out."""

    def test_timeout_reported_as_hang(self, monkeypatch):
        import subprocess

        from outfitx_tpu.core import runtime

        def fake_run(*a, **kw):
            raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw["timeout"])

        monkeypatch.setattr(subprocess, "run", fake_run)
        ok, why = runtime._devices_probe_ok(1.0)
        assert not ok and "hung" in why

    def test_failure_reports_last_stderr_line(self, monkeypatch):
        import subprocess
        import types

        from outfitx_tpu.core import runtime

        def fake_run(*a, **kw):
            return types.SimpleNamespace(
                returncode=1,
                stderr="trace\nRuntimeError: Backend 'axon' is not known\n",
                stdout="",
            )

        monkeypatch.setattr(subprocess, "run", fake_run)
        ok, why = runtime._devices_probe_ok(1.0)
        assert not ok and "axon" in why

    def test_success_short_circuits_retry(self, monkeypatch):
        from outfitx_tpu.core import runtime

        monkeypatch.setattr(
            runtime, "_devices_probe_ok", lambda t: (True, "")
        )
        # must return without re-exec'ing or sleeping (jax.devices() on the
        # cpu test platform succeeds)
        runtime.retry_if_backend_down(probe_timeout_s=1.0)

    def test_down_backend_counts_and_reexecs(self, monkeypatch):
        from outfitx_tpu.core import runtime

        monkeypatch.setattr(
            runtime, "_devices_probe_ok", lambda t: (False, "down")
        )
        monkeypatch.setenv("OUTFITX_BENCH_RETRY", "10")
        with pytest.raises(RuntimeError, match="after 10 retries"):
            runtime.retry_if_backend_down(max_retries=10, probe_timeout_s=1.0)


class TestCompilationCachePack:
    """The committed compile-cache pack (compile_cache/) seeds fresh local
    caches so same-compiler-version processes skip 1-7 min remote compiles
    (core/runtime.seed_compilation_cache; built by
    scripts/build_cache_pack.py)."""

    def test_seeds_missing_entries_only(self, tmp_path):
        from outfitx_tpu.core import runtime

        pack = tmp_path / "pack"
        cache = tmp_path / "cache"
        pack.mkdir()
        (pack / "jit_a-1111-cache").write_bytes(b"A" * 64)
        (pack / "jit_b-2222-cache").write_bytes(b"B" * 64)
        (pack / "MANIFEST.tsv").write_text("ignored\n")
        cache.mkdir()
        (cache / "jit_a-1111-cache").write_bytes(b"LOCAL")  # never touched

        seeded = runtime.seed_compilation_cache(cache, pack)
        assert seeded == ["jit_b-2222-cache"]
        assert (cache / "jit_a-1111-cache").read_bytes() == b"LOCAL"
        assert (cache / "jit_b-2222-cache").read_bytes() == b"B" * 64
        assert not (cache / "MANIFEST.tsv").exists()
        # idempotent: second seed copies nothing
        assert runtime.seed_compilation_cache(cache, pack) == []
        # no temp droppings — only the seeded-cache marker
        dots = [p.name for p in cache.iterdir() if p.name.startswith(".")]
        assert dots == [".seeded_from_pack"]

    def test_unreadable_entry_skipped_not_fatal(self, tmp_path, capsys):
        """One bad pack entry (here: a directory, so copyfile raises an
        OSError) must not abort the process or the rest of the seeding —
        seeding is an optimization and can never be worse than an empty
        cache."""
        from outfitx_tpu.core import runtime

        pack = tmp_path / "pack"
        cache = tmp_path / "cache"
        pack.mkdir()
        (pack / "jit_bad-0-cache").mkdir()  # IsADirectoryError on copy
        (pack / "jit_ok-1-cache").write_bytes(b"OK")
        seeded = runtime.seed_compilation_cache(cache, pack)
        assert seeded == ["jit_ok-1-cache"]
        assert (cache / "jit_ok-1-cache").read_bytes() == b"OK"
        assert "failed to copy" in capsys.readouterr().err
        # the failed copy left no temp droppings
        dots = [p.name for p in cache.iterdir() if p.name.startswith(".")]
        assert dots == [".seeded_from_pack"]

    def test_env_pack_path_typo_warns_and_disables(self, tmp_path,
                                                   monkeypatch, capsys):
        from outfitx_tpu.core import runtime

        monkeypatch.setenv("OUTFITX_CACHE_PACK", str(tmp_path / "nope"))
        assert runtime.default_cache_pack() is None
        assert "not a directory" in capsys.readouterr().err
        monkeypatch.setenv("OUTFITX_CACHE_PACK", "1")  # not an on/off flag
        assert runtime.default_cache_pack() is None
        assert "seeding DISABLED" in capsys.readouterr().err

    def test_env_override_and_disable(self, tmp_path, monkeypatch):
        from outfitx_tpu.core import runtime

        pack = tmp_path / "p"
        pack.mkdir()
        (pack / "jit_x-0-cache").write_bytes(b"X")
        monkeypatch.setenv("OUTFITX_CACHE_PACK", str(pack))
        assert runtime.default_cache_pack() == pack
        monkeypatch.setenv("OUTFITX_CACHE_PACK", "0")
        assert runtime.default_cache_pack() is None
        cache = tmp_path / "c"
        assert runtime.seed_compilation_cache(cache) == []

    def test_build_script_caps_and_manifest(self, tmp_path):
        import subprocess
        import sys

        cache = tmp_path / "cache"
        pack = tmp_path / "pack"
        cache.mkdir()
        (cache / "jit_small-1-cache").write_bytes(b"s" * 100)
        (cache / "jit_big-2-cache").write_bytes(b"b" * (3 * 2**20))
        (cache / "jit_chained-3-cache").write_bytes(b"c")  # bench_cache's
        r = subprocess.run(
            [
                sys.executable,
                "scripts/build_cache_pack.py",
                "--cache-dir", str(cache),
                "--pack", str(pack),
                "--max-entry-mb", "1",
                "--no-canary",  # a real device compile has no place here
            ],
            capture_output=True,
            text=True,
            cwd=str(pathlib.Path(__file__).resolve().parents[1]),
        )
        assert r.returncode == 0, r.stderr
        names = sorted(p.name for p in pack.glob("*-cache"))
        assert names == ["jit_small-1-cache"]  # big over cap, chained excluded
        assert "jit_small-1-cache\t100" in (pack / "MANIFEST.tsv").read_text()

    def _run_build(self, cache, pack, *extra):
        import subprocess
        import sys

        return subprocess.run(
            [
                sys.executable, "scripts/build_cache_pack.py",
                "--cache-dir", str(cache), "--pack", str(pack),
                "--no-canary", *extra,
            ],
            capture_output=True,
            text=True,
            cwd=str(pathlib.Path(__file__).resolve().parents[1]),
        )

    def test_prune_refused_on_seeded_cache(self, tmp_path):
        """A pack-seeded cache contains every pack entry by construction, so
        --prune there can never identify a superseded key — the script must
        refuse rather than silently no-op while dead entries ratchet the
        pack toward its size cap."""
        from outfitx_tpu.core import runtime

        pack = tmp_path / "pack"
        pack.mkdir()
        (pack / "jit_dead-0-cache").write_bytes(b"D")
        cache = tmp_path / "cache"
        runtime.seed_compilation_cache(cache, pack)

        r = self._run_build(cache, pack, "--prune")
        assert r.returncode == 2
        assert "refused" in r.stderr
        assert (pack / "jit_dead-0-cache").exists()  # nothing deleted

        # an UNSEEDED cache (OUTFITX_CACHE_PACK=0 rebuild) prunes fine
        fresh = tmp_path / "fresh"
        fresh.mkdir()
        (fresh / "jit_live-1-cache").write_bytes(b"L")
        r = self._run_build(fresh, pack, "--prune")
        assert r.returncode == 0, r.stderr
        assert not (pack / "jit_dead-0-cache").exists()
        assert (pack / "jit_live-1-cache").exists()

    def test_overwrite_budgets_on_size_delta(self, tmp_path):
        """Re-packing a recompiled key (same name, new size) must replace
        the old copy's bytes in the total-size budget, not double-count
        them — otherwise later valid entries are skipped as 'over caps'
        while the pack is actually under the cap."""
        cache = tmp_path / "cache"
        pack = tmp_path / "pack"
        cache.mkdir()
        pack.mkdir()
        # pack holds 0.9 MB under the old codegen; cache has the 0.8 MB
        # recompile. Cap 1.0 MB: fits only if the old 0.9 leaves the budget.
        (pack / "jit_k-1-cache").write_bytes(b"o" * int(0.9 * 2**20))
        (cache / "jit_k-1-cache").write_bytes(b"n" * int(0.8 * 2**20))
        r = self._run_build(cache, pack, "--max-total-mb", "1.0")
        assert r.returncode == 0, r.stderr
        assert "pack jit_k-1-cache" in r.stdout
        assert (pack / "jit_k-1-cache").stat().st_size == int(0.8 * 2**20)


class TestSoakPercentiles:
    def test_empty_window_is_json_null_not_nan(self):
        """A saturated thread-sweep window can end with zero successful
        requests of a kind; the percentile must serialize as JSON null
        (NaN is not RFC JSON and breaks the sweep's consumers)."""
        import importlib.util
        import json as _json

        spec = importlib.util.spec_from_file_location(
            "soak_serving",
            pathlib.Path(__file__).resolve().parents[1]
            / "scripts" / "soak_serving.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod._pct([], 0.5) is None
        assert mod._pct([3.14159], 0.99) == 3.1
        assert _json.loads(_json.dumps({"p50": mod._pct([], 0.5)})) == {
            "p50": None
        }
