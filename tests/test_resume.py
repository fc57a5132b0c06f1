"""Checkpoint resume: params + optimizer state + epoch counter round-trip
through orbax (the reference has no auto-resume — SURVEY.md 5)."""

import dataclasses

import numpy as np

from outfitx_tpu.core.config import (
    CPTrainConfig,
    ItemEncoderConfig,
    OptimizerConfig,
    OutfitXConfig,
    TransformerConfig,
)
from outfitx_tpu.data.synthetic import make_synthetic
from outfitx_tpu.train.cp_trainer import CPTrainer


def test_resume_continues_training(tmp_path):
    synth = make_synthetic(n_items=300, d_embed=32, n_outfits=256, seed=13)
    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=2, dropout=0.1),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    cfg = CPTrainConfig(
        n_epochs=2,
        batch_size=64,
        accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    kw = dict(
        catalog=synth.catalog,
        train_split=synth.cp_train,
        valid_split=synth.cp_valid,
    )
    with CPTrainer(cfg, model_cfg, **kw) as t:
        t.run()
        step_after_2 = int(t.state.step)

    # resume from 'final' and run 2 more epochs
    cfg2 = dataclasses.replace(cfg, n_epochs=4)
    with CPTrainer(cfg2, model_cfg, **kw) as t2:
        t2.resume("final")
        assert t2.epoch == 2  # continues AFTER the saved epoch
        assert int(t2.state.step) == step_after_2  # optimizer step restored
        # opt_state restored into proper optax structure (not raw dicts)
        leaves = [np.asarray(x) for x in __import__("jax").tree.leaves(t2.state.opt_state)]
        assert any(np.abs(x).sum() > 0 for x in leaves if x.dtype.kind == "f")
        metrics = t2.run()
    assert int(t2.state.step) > step_after_2
    assert np.isfinite(metrics["loss"])
    # metrics JSONL sink recorded all epochs
    jsonl = (tmp_path / "logs" / f"{t2.model_name}_metrics.jsonl").read_text()
    assert jsonl.count('"split": "valid"') >= 4


def test_resume_preserves_best_metric_state(tmp_path):
    """A resumed run must not overwrite a better best_* checkpoint with a
    worse model (VERDICT r1 weak #4: tracker restarted empty after resume)."""
    import json

    synth = make_synthetic(n_items=300, d_embed=32, n_outfits=256, seed=13)
    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=2),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    cfg = CPTrainConfig(
        n_epochs=1,
        batch_size=64,
        accumulation_steps=1,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    kw = dict(
        catalog=synth.catalog,
        train_split=synth.cp_train,
        valid_split=synth.cp_valid,
    )
    with CPTrainer(cfg, model_cfg, **kw) as t:
        t.run()
        best_auc = t.best.best["auc"]
        name = t.model_name
    meta_path = tmp_path / "ckpt" / name / "best_auc" / "meta.json"
    saved = json.loads(meta_path.read_text())

    cfg2 = dataclasses.replace(cfg, n_epochs=2)
    with CPTrainer(cfg2, model_cfg, **kw) as t2:
        t2.resume("final")
        # tracker state restored from checkpoint meta
        assert t2.best.best["auc"] == best_auc
        # a worse eval right after resume must NOT trigger a best save
        t2.maybe_save_best(
            {"auc": best_auc - 0.1}, params=t2.state.params, epoch=99
        )
        t2.ckpt.wait()  # saves are async by default; settle before reading
        assert json.loads(meta_path.read_text()) == saved
        # a better one still does
        t2.maybe_save_best(
            {"auc": best_auc + 0.1}, params=t2.state.params, epoch=100
        )
        t2.ckpt.wait()
        assert json.loads(meta_path.read_text())["epoch"] == 100
        t2.run()


def test_legacy_unfused_checkpoint_restores(tmp_path):
    """Checkpoints saved before the QKV fusion (per-projection wq/wk/wv)
    must keep restoring: the manager stacks them into wqkv/bqkv at restore
    time and the forward matches the fused original exactly."""
    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core.config import ItemEncoderConfig, TransformerConfig
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.train.checkpoint import CheckpointManager

    cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=2, dropout=0.0),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # rewrite the attn subtree in the legacy (pre-fusion) layout
    legacy = jax.tree.map(np.asarray, params)
    attn = legacy["layers"]["attn"]
    wqkv = attn.pop("wqkv")  # (L, d, 3, d)
    bqkv = attn.pop("bqkv")  # (L, 3, d)
    for j, (w, b) in enumerate(zip("qkv", "qkv")):
        attn[f"w{w}"] = wqkv[:, :, j, :]
        attn[f"b{b}"] = bqkv[:, j, :]

    mgr = CheckpointManager(tmp_path, "legacy")
    mgr.save("old", params=legacy, epoch=3)
    payload = mgr.restore("old", template={"params": params})
    restored = payload["params"]
    assert "wqkv" in restored["layers"]["attn"]
    assert "wq" not in restored["layers"]["attn"]

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((4, 8, cfg.d_embed)), jnp.float32)
    mask = jnp.zeros((4, 8), bool)
    a = model.cp_forward(params, emb, mask)
    b = model.cp_forward(restored, emb, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_save_every_latest_rolling_resume(tmp_path):
    """cfg.save_every_epochs writes a rolling 'latest' (params + opt_state
    + epoch + best-so-far) that a killed multi-hour campaign resumes from
    losslessly (the envelope runner's crash-recovery path)."""
    synth = make_synthetic(n_items=300, d_embed=32, n_outfits=256, seed=17)
    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(dim_per_modality=16),
        transformer=TransformerConfig(n_heads=4, d_ffn=64, n_layers=2, dropout=0.1),
        max_outfit_len=8,
        compute_dtype="float32",
    )
    cfg = CPTrainConfig(
        n_epochs=3,
        batch_size=64,
        accumulation_steps=1,
        save_every_epochs=2,
        optimizer=OptimizerConfig(learning_rate=1e-3),
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
    )
    kw = dict(
        catalog=synth.catalog,
        train_split=synth.cp_train,
        valid_split=synth.cp_valid,
    )
    with CPTrainer(cfg, model_cfg, **kw) as t:
        t.run()
        # 'latest' exists and was written at epoch 1 (the 2nd epoch)
        assert t.ckpt.exists("latest")

    # a "crashed" run resumes from latest: epoch 2, best-so-far restored
    with CPTrainer(dataclasses.replace(cfg, n_epochs=4), model_cfg, **kw) as t2:
        t2.resume("latest")
        assert t2.epoch == 2
        assert int(t2.state.step) > 0
        # best-so-far (as of the save epoch) restored, so the first
        # post-resume eval cannot clobber a better best_* checkpoint
        assert t2.best.best and all(
            np.isfinite(v) for v in t2.best.best.values()
        )
        metrics = t2.run()
    assert np.isfinite(metrics["loss"])


def test_async_save_snapshot_survives_donation(tmp_path):
    """save_async must capture the state AS OF the save call: the trainer
    keeps training (donating its old param buffers) while the writer
    thread is still transferring — a bare reference would be invalidated
    by donation, so the manager snapshots on device first."""
    import jax.numpy as jnp

    from outfitx_tpu.train.checkpoint import CheckpointManager

    import jax

    donate_step = jax.jit(
        lambda p: jax.tree.map(lambda x: x + 1.0, p), donate_argnums=0
    )

    params = {"w": jnp.arange(8.0), "b": jnp.ones((3, 3))}
    expected = {k: np.asarray(v) for k, v in params.items()}
    cm = CheckpointManager(tmp_path, "m")
    cm.save_async("snap", params=params, epoch=0)
    for _ in range(3):  # donates the old buffers while the save is queued
        params = donate_step(params)
    cm.wait()
    out = cm.restore("snap")
    for k, v in expected.items():
        np.testing.assert_array_equal(np.asarray(out["params"][k]), v)
    # and the trainer's state kept evolving independently
    np.testing.assert_array_equal(
        np.asarray(params["w"]), expected["w"] + 3.0
    )


def test_async_saves_fifo_same_tag(tmp_path):
    """Consecutive async saves to one tag land in order: the last write
    wins, exactly like the sync rolling-'latest' semantics."""
    import jax.numpy as jnp

    from outfitx_tpu.train.checkpoint import CheckpointManager

    cm = CheckpointManager(tmp_path, "m")
    for i in range(4):
        cm.save_async("latest", params={"w": jnp.full((4,), float(i))}, epoch=i)
    cm.wait()
    out = cm.restore("latest")
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), np.full(4, 3.0))
    assert out["meta"]["epoch"] == 3


def test_async_saves_coalesce_same_tag(tmp_path):
    """A queued-but-not-started save of a tag is superseded by a newer
    one (the directory would be overwritten anyway); distinct tags keep
    FIFO order. Guards the backpressure fix for early-training best-metric
    churn."""
    import threading

    import jax.numpy as jnp

    from outfitx_tpu.train.checkpoint import CheckpointManager

    cm = CheckpointManager(tmp_path, "m")
    gate = threading.Event()
    orig_write = cm._np_write
    writes = []

    def slow_write(path, staged, meta):
        gate.wait(10)
        writes.append(path.name)
        orig_write(path, staged, meta)

    cm._np_write = slow_write
    # first save occupies the writer at the gate; the next two 'latest'
    # coalesce while queued
    cm.save_async("best_auc", params={"w": jnp.zeros(2)}, epoch=0)
    for i in (1, 2, 3):
        cm.save_async("latest", params={"w": jnp.full((2,), float(i))}, epoch=i)
    gate.set()
    cm.wait()
    assert writes == ["best_auc", "latest"], writes  # one coalesced write
    out = cm.restore("latest")
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), np.full(2, 3.0))
    assert out["meta"]["epoch"] == 3


def test_async_save_byte_backpressure_no_deadlock(tmp_path, monkeypatch):
    """With a tiny staged-bytes bound, distinct-tag saves must block and
    drain rather than deadlock, and every tag still lands on disk; a
    single save larger than the bound is admitted (no livelock)."""
    import jax.numpy as jnp

    from outfitx_tpu.train import checkpoint as ck

    monkeypatch.setattr(ck, "_ASYNC_STAGED_BYTES_MAX", 64)  # bytes
    cm = ck.CheckpointManager(tmp_path, "m")
    for i in range(4):  # each save stages 4 KB >> the 64 B bound
        cm.save_async(f"tag{i}", params={"w": jnp.full((1024,), float(i))}, epoch=i)
    cm.wait()
    for i in range(4):
        out = cm.restore(f"tag{i}")
        np.testing.assert_array_equal(
            np.asarray(out["params"]["w"]), np.full(1024, float(i))
        )


def test_sync_save_drains_async_queue(tmp_path):
    """A synchronous save() must not race a queued async save of the same
    tag: the stale queued snapshot would otherwise land AFTER (and silently
    overwrite) the newer sync write. save() drains the queue first."""
    import threading
    import time

    import jax.numpy as jnp

    from outfitx_tpu.train.checkpoint import CheckpointManager

    cm = CheckpointManager(tmp_path, "m")
    gate = threading.Event()
    orig_write = cm._np_write
    writes = []

    def slow_write(path, staged, meta):
        gate.wait(10)
        writes.append(meta["epoch"])
        orig_write(path, staged, meta)

    cm._np_write = slow_write
    cm.save_async("latest", params={"w": jnp.zeros(2)}, epoch=0)
    threading.Timer(0.2, gate.set).start()
    t0 = time.perf_counter()
    cm.save("latest", params={"w": jnp.ones(2)}, epoch=1)
    assert time.perf_counter() - t0 >= 0.15  # it actually waited
    cm.wait()
    assert writes == [0, 1], writes  # async landed first, sync last
    out = cm.restore("latest")
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), np.ones(2))
    assert out["meta"]["epoch"] == 1


def test_overwrite_never_deletes_before_swap(tmp_path):
    """Overwriting a tag must never rmtree the live checkpoint dir before
    the replacement is in place (a crash mid-delete would destroy the only
    resume point); the swap goes rename-aside -> rename-in -> delete-aside,
    and leaves no .tmp/.old litter behind."""
    import shutil

    import jax.numpy as jnp

    from outfitx_tpu.train import checkpoint as ck

    cm = ck.CheckpointManager(tmp_path, "m")
    cm.save("latest", params={"w": jnp.zeros(2)}, epoch=0)
    live = cm.path("latest")
    removed = []
    orig_rmtree = shutil.rmtree

    def spy_rmtree(p, *a, **k):
        removed.append(str(p))
        return orig_rmtree(p, *a, **k)

    shutil.rmtree = spy_rmtree
    try:
        cm.save("latest", params={"w": jnp.ones(2)}, epoch=1)
    finally:
        shutil.rmtree = orig_rmtree
    assert str(live) not in removed, removed  # only aside/tmp dirs deleted
    out = cm.restore("latest")
    assert out["meta"]["epoch"] == 1
    litter = [p.name for p in live.parent.iterdir() if p.name != "latest"]
    assert litter == [], litter


def test_final_save_survives_async_write_error(tmp_path):
    """An earlier async-writer failure must not abort a later synchronous
    save (the final state is healthy regardless); the stored error still
    surfaces on the next explicit wait()."""
    import jax.numpy as jnp
    import pytest

    from outfitx_tpu.train.checkpoint import CheckpointManager

    cm = CheckpointManager(tmp_path, "m")
    orig_write = cm._np_write
    fail_once = [True]

    def flaky_write(path, staged, meta):
        if fail_once[0]:
            fail_once[0] = False
            raise OSError("transient ENOSPC")
        orig_write(path, staged, meta)

    cm._np_write = flaky_write
    cm.save_async("best_auc", params={"w": jnp.zeros(2)}, epoch=0)
    cm._drain()  # writer consumed the failure
    cm.save("final", params={"w": jnp.ones(2)}, epoch=5)  # must not raise
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        cm.wait()  # the stored error still surfaces once
    out = cm.restore("final")
    assert out["meta"]["epoch"] == 5
