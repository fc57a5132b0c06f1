"""Full-horizon envelope semantics on CPU at tiny model scale.

The reference's training envelope is 200-epoch CP -> 300-epoch CIR with the
curriculum switch at epoch 150 -> FITB, chained through best-metric
checkpoints (compatibility_prediction_train_config.py:9-18,
complementary_item_retrieval_train_config.py:16-19,
fill_in_the_blank_trainer.py:100-107). The production-scale run of that
envelope needs the TPU for hours; THIS script proves the *schedule
semantics* over the complete horizon in minutes on CPU at d=64:

  - the OneCycle schedule is consumed at exactly the configured rate
    (state.step == epochs x steps_per_epoch optimizer steps; warmup peak
    and final annealed lr hit the configured values),
  - the easy->hard switch happens at its real epoch 150 (neg_mode in the
    metric trajectory),
  - recall cadence: every `recall_every` epochs before the switch, every
    epoch after (reference :173-181),
  - CIR checkpoints only after the switch (reference try_save_checkpoint
    :297-310), warm start from CP best-AUC, FITB from CIR best-Recall@1.

Artifacts: parity_artifacts/mini_envelope.json + the per-epoch metric
trajectories. Run: python scripts/mini_envelope.py [--cp-epochs 200]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import sys
import time

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cp-epochs", type=int, default=200)
    ap.add_argument("--cir-epochs", type=int, default=300)
    ap.add_argument("--switch", type=int, default=150)
    ap.add_argument("--ckpt-dir", default="/tmp/mini_envelope_ckpt")
    ap.add_argument("--log-dir", default="/tmp/mini_envelope_logs")
    ap.add_argument(
        "--mesh-data", type=int, default=1,
        help="data-axis size: >1 runs the WHOLE horizon through the real "
        "trainers on a fake multi-device CPU mesh (DP/FSDP)",
    )
    ap.add_argument("--mesh-model", type=int, default=1,
                    help="tensor-parallel axis size")
    ap.add_argument("--fsdp", action="store_true",
                    help="shard layer weights over the data axis too")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    n_dev = max(1, args.mesh_data) * max(1, args.mesh_model)
    if n_dev > 1 and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from outfitx_tpu.core.config import (
        CIRTrainConfig,
        CPTrainConfig,
        FITBTrainConfig,
        ItemEncoderConfig,
        MeshConfig,
        OutfitXConfig,
        TransformerConfig,
    )
    from outfitx_tpu.data.synthetic import make_synthetic
    from outfitx_tpu.train.cir_trainer import CIRTrainer
    from outfitx_tpu.train.cp_trainer import CPTrainer
    from outfitx_tpu.train.fitb_trainer import FITBTrainer
    from outfitx_tpu.train.optim import make_schedule

    model_cfg = OutfitXConfig(
        item_encoder=ItemEncoderConfig(
            encoder_type="siglip", dim_per_modality=32
        ),
        transformer=TransformerConfig(
            n_heads=4, d_ffn=96, n_layers=2, dropout=0.3
        ),
        max_outfit_len=8,
        compute_dtype="float32",  # deterministic CPU numerics
    )
    data = make_synthetic(
        n_items=2000,
        d_embed=model_cfg.d_embed,
        n_outfits=2048,
        max_len=model_cfg.max_outfit_len,
        seed=0,
    )
    for d in (args.ckpt_dir, args.log_dir):
        shutil.rmtree(d, ignore_errors=True)
        pathlib.Path(d).mkdir(parents=True)

    report: dict = {
        "model": "tiny d=64 (schedule semantics, not quality)",
        "mesh": {
            "data": args.mesh_data, "model": args.mesh_model,
            "fsdp": bool(args.fsdp),
        },
    }

    # ---------------------------------------------------------- CP 200 --
    mesh_cfg = MeshConfig(
        data=args.mesh_data, model=args.mesh_model, fsdp=args.fsdp
    )
    cp_cfg = CPTrainConfig(
        mesh=mesh_cfg,
        n_epochs=args.cp_epochs,
        batch_size=256,
        accumulation_steps=4,  # exercise the reference's accumulation
        checkpoint_dir=args.ckpt_dir,
        log_dir=args.log_dir,
        save_every_epochs=15,
    )
    t0 = time.perf_counter()
    with CPTrainer(
        cp_cfg,
        model_cfg,
        "train-valid",
        catalog=data.catalog,
        train_split=data.cp_train,
        valid_split=data.cp_valid,
    ) as t:
        cp_metrics = t.run()
        cp_steps = int(t.state.step)
        cp_name = t.model_name
        # steps/epoch = ceil(n/global_batch) optimizer steps
        n_train = len(data.cp_train.labels)
        global_batch = cp_cfg.batch_size * cp_cfg.accumulation_steps
        expect = args.cp_epochs * ((n_train + global_batch - 1) // global_batch)
        sched = make_schedule(cp_cfg.optimizer, expect)
        report["cp"] = {
            "epochs": args.cp_epochs,
            "seconds": round(time.perf_counter() - t0, 1),
            "optimizer_steps": cp_steps,
            "expected_steps": expect,
            "schedule_consumed_exactly": cp_steps == expect,
            "onecycle_lr": {
                "start": float(sched(0)),
                "peak": float(
                    sched(int(expect * cp_cfg.optimizer.pct_start))
                ),
                "end": float(sched(expect - 1)),
                "peak_is_configured": abs(
                    float(sched(int(expect * cp_cfg.optimizer.pct_start)))
                    - cp_cfg.optimizer.learning_rate
                )
                < 1e-9,
            },
            "final_metrics": {k: round(v, 5) for k, v in cp_metrics.items()},
        }

    # --------------------------------------------------------- CIR 300 --
    cir_cfg = CIRTrainConfig(
        mesh=mesh_cfg,
        n_epochs=args.cir_epochs,
        batch_size=256,
        switch_to_hard_epoch=args.switch,
        candidate_pool_size=256,
        checkpoint_dir=args.ckpt_dir,
        log_dir=args.log_dir,
        save_every_epochs=15,
        warm_start_from=str(
            pathlib.Path(args.ckpt_dir) / f"{cp_name}" / "best_auc"
        ),
    )
    t0 = time.perf_counter()
    with CIRTrainer(
        cir_cfg,
        model_cfg,
        "train-valid",
        catalog=data.catalog,
        train_split=data.cir_train,
        valid_split=data.cir_valid,
        pool_threshold=1,
    ) as t:
        cir_metrics = t.run()
        cir_name = t.model_name

    # trajectory checks from the metrics JSONL
    traj = [
        json.loads(line)
        for line in (
            pathlib.Path(args.log_dir) / f"{cir_name}_metrics.jsonl"
        ).read_text()
        .splitlines()
    ]
    train_rows = [r for r in traj if r.get("split") == "train"]
    switch_seen = {
        int(r["epoch"]): r.get("neg_mode") for r in train_rows
    }
    pre = all(switch_seen[e] == 0.0 for e in switch_seen if e < args.switch)
    post = all(switch_seen[e] == 1.0 for e in switch_seen if e >= args.switch)
    valid_rows = [
        r for r in traj if r.get("split") == "valid" and "recall@1" in r
    ]
    recall_epochs = sorted(
        {int(r["epoch"]) for r in valid_rows if not np_isnan(r["recall@1"])}
    )
    cadence_pre = [
        e for e in recall_epochs if e < args.switch if e % cir_cfg.recall_every
    ]
    post_expected = set(range(args.switch, args.cir_epochs))
    cadence_post_missing = sorted(post_expected - set(recall_epochs))
    ckpt_best = pathlib.Path(args.ckpt_dir) / cir_name / "best_recall@1"
    best_meta = json.loads((ckpt_best / "meta.json").read_text())
    report["cir"] = {
        "epochs": args.cir_epochs,
        "seconds": round(time.perf_counter() - t0, 1),
        "warm_started_from_cp_best_auc": True,
        "switch_epoch": args.switch,
        "easy_before_switch": pre,
        "hard_from_switch": post,
        "recall_cadence_violations_pre_switch": cadence_pre,
        "recall_epochs_missing_post_switch": cadence_post_missing,
        "best_recall@1_saved_at_epoch": int(best_meta.get("epoch", -1)),
        "best_saved_after_switch_only": int(best_meta.get("epoch", -1))
        >= args.switch,
        "final_metrics": {k: round(v, 5) for k, v in cir_metrics.items()},
    }

    # ------------------------------------------------------------ FITB --
    fitb_cfg = FITBTrainConfig(
        mesh=mesh_cfg,
        checkpoint_dir=args.ckpt_dir,
        log_dir=args.log_dir,
        checkpoint_from=str(ckpt_best),
    )
    t0 = time.perf_counter()
    with FITBTrainer(
        fitb_cfg,
        model_cfg,
        "test",
        catalog=data.catalog,
        test_split=data.fitb_test,
    ) as t:
        fitb_metrics = t.run()
    report["fitb"] = {
        "seconds": round(time.perf_counter() - t0, 1),
        "chained_from": "cir best_recall@1",
        "final_metrics": {k: round(v, 5) for k, v in fitb_metrics.items()},
    }

    ok = (
        report["cp"]["schedule_consumed_exactly"]
        and report["cp"]["onecycle_lr"]["peak_is_configured"]
        and report["cir"]["easy_before_switch"]
        and report["cir"]["hard_from_switch"]
        and not report["cir"]["recall_cadence_violations_pre_switch"]
        and not report["cir"]["recall_epochs_missing_post_switch"]
        and report["cir"]["best_saved_after_switch_only"]
    )
    report["ok"] = ok

    art = REPO / "parity_artifacts" / "mini_envelope"
    art.mkdir(parents=True, exist_ok=True)
    (art / "mini_envelope.json").write_text(json.dumps(report, indent=1))
    for f in pathlib.Path(args.log_dir).glob("*_metrics.jsonl"):
        shutil.copy2(f, art / f.name)
    print(json.dumps(report, indent=1))
    print("MINI ENVELOPE", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


def np_isnan(x) -> bool:
    return x != x


if __name__ == "__main__":
    main()
