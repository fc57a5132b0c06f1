"""CLI entry points (reference src/trains/run/*.py + run.sh).

The reference exposes click commands cp/cir/fitb/original_cp/pes launched
under torchrun (run.sh:31). Here a single `python -m outfitx_tpu.cli`
multi-command CLI covers the same tasks; there is no torchrun equivalent to
wrap — SPMD runs in-process over the device mesh, and multi-host launch is
`jax.distributed.initialize()` driven by the environment.

``--synthetic`` runs any task on generated data (no Polyvore download
needed) — useful for smoke tests and benchmarking.
"""

from __future__ import annotations

import dataclasses
import json

import click

from outfitx_tpu.core.config import (
    CIRTrainConfig,
    CPTrainConfig,
    FITBTrainConfig,
    MeshConfig,
    OptimizerConfig,
    OutfitXConfig,
)


def _synth(model_cfg: OutfitXConfig, n_outfits: int = 2048, seed: int = 0):
    from outfitx_tpu.data.synthetic import make_synthetic

    return make_synthetic(
        n_items=max(2000, n_outfits),
        d_embed=model_cfg.d_embed,
        n_outfits=n_outfits,
        max_len=model_cfg.max_outfit_len,
        seed=seed,
    )


_common = [
    click.option("--mode", type=click.Choice(["train-valid", "test"]), default=None,
                 help="default: train-valid (fitb: test)"),
    click.option("--synthetic", is_flag=True, help="use generated data"),
    click.option("--dataset-dir", default="datasets/polyvore"),
    click.option("--polyvore-type", type=click.Choice(["nondisjoint", "disjoint"]),
                 default="nondisjoint"),
    click.option("--checkpoint-dir", default="checkpoints"),
    click.option("--epochs", type=int, default=None),
    click.option("--batch-size", type=int, default=None),
    click.option("--accum", type=int, default=None,
                 help="gradient-accumulation steps"),
    click.option("--lr", type=float, default=None),
    click.option("--log-dir", default=None, help="metrics/log output dir"),
    click.option("--mesh-data", type=int, default=-1),
    click.option("--mesh-model", type=int, default=1),
    click.option("--encoder", type=click.Choice(["siglip", "clip", "resnet_sbert"]), default="siglip"),
    click.option("--resume", default=None, help="checkpoint tag/path to resume from"),
    click.option("--profile-dir", default=None, help="write a jax.profiler trace of epoch 1"),
    click.option("--remat", is_flag=True,
                 help="jax.checkpoint the encoder layers (required for the "
                 "reference batch-3072 envelope on 16 GB HBM)"),
    click.option("--save-every", type=int, default=None,
                 help="save a rolling 'latest' resume checkpoint every N epochs"),
]


def common_options(f):
    for opt in reversed(_common):
        f = opt(f)
    return f


def _resolve_mode(kw, default="train-valid"):
    return kw["mode"] or default


def _build_cfg(cls, kw, **extra):
    overrides = dict(
        dataset_dir=kw["dataset_dir"],
        polyvore_type=kw["polyvore_type"],
        checkpoint_dir=kw["checkpoint_dir"],
        mesh=MeshConfig(data=kw["mesh_data"], model=kw["mesh_model"]),
        **extra,
    )
    if kw["epochs"] is not None:
        overrides["n_epochs"] = kw["epochs"]
    if kw["batch_size"] is not None:
        overrides["batch_size"] = kw["batch_size"]
    if kw.get("accum") is not None:
        overrides["accumulation_steps"] = kw["accum"]
    if kw.get("log_dir") is not None:
        overrides["log_dir"] = kw["log_dir"]
    if kw.get("save_every") is not None:
        overrides["save_every_epochs"] = kw["save_every"]
    cfg = cls(**overrides)
    if kw["lr"] is not None:
        cfg = dataclasses.replace(
            cfg, optimizer=dataclasses.replace(cfg.optimizer, learning_rate=kw["lr"])
        )
    return cfg


def _model_cfg(kw) -> OutfitXConfig:
    from outfitx_tpu.core.config import ItemEncoderConfig

    return OutfitXConfig(
        item_encoder=ItemEncoderConfig.for_type(kw["encoder"]),
        remat=bool(kw.get("remat")),
    )


@click.group()
def cli() -> None:
    """OutfitX-TPU command line."""
    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        force_platform_from_env,
    )

    force_platform_from_env()
    enable_compilation_cache()


@cli.command()
@common_options
def cp(**kw):
    """Compatibility-prediction training/eval (reference run/cp.py)."""
    from outfitx_tpu.train.cp_trainer import CPTrainer

    model_cfg = _model_cfg(kw)
    cfg = _build_cfg(CPTrainConfig, kw)
    kwargs = {}
    if kw["synthetic"]:
        data = _synth(model_cfg)
        kwargs = dict(
            catalog=data.catalog,
            train_split=data.cp_train,
            valid_split=data.cp_valid,
        )
    with CPTrainer(cfg, model_cfg, _resolve_mode(kw), **kwargs) as t:
        t.profile_dir = kw["profile_dir"]
        if kw["resume"]:
            t.resume(kw["resume"])
        result = t.run()
    click.echo(json.dumps(result))


@cli.command()
@common_options
@click.option("--warm-start-from", default=None, help="CP checkpoint path")
@click.option("--switch-to-hard-epoch", type=int, default=None)
@click.option(
    "--pool-threshold", type=int, default=None,
    help="large-category eligibility threshold for retrieval eval "
    "(default: candidate_pool_size=3000, the reference rule; small "
    "datasets need a lower bar or no outfit yields eval queries)",
)
def cir(warm_start_from, switch_to_hard_epoch, pool_threshold, **kw):
    """Complementary-item-retrieval training/eval (reference run/cir.py)."""
    from outfitx_tpu.train.cir_trainer import CIRTrainer

    model_cfg = _model_cfg(kw)
    extra = {"warm_start_from": warm_start_from}
    if switch_to_hard_epoch is not None:
        extra["switch_to_hard_epoch"] = switch_to_hard_epoch
    cfg = _build_cfg(CIRTrainConfig, kw, **extra)
    kwargs = {}
    if kw["synthetic"]:
        data = _synth(model_cfg)
        kwargs = dict(
            catalog=data.catalog,
            train_split=data.cir_train,
            valid_split=data.cir_valid,
            pool_threshold=1,  # tiny generated catalog default
        )
    # an explicit --pool-threshold wins in BOTH modes (set after the
    # synthetic block so it is never silently overwritten)
    if pool_threshold is not None:
        kwargs["pool_threshold"] = pool_threshold
    with CIRTrainer(cfg, model_cfg, _resolve_mode(kw), **kwargs) as t:
        t.profile_dir = kw["profile_dir"]
        if kw["resume"]:
            t.resume(kw["resume"])
        result = t.run()
    click.echo(json.dumps(result))


@cli.command()
@common_options
@click.option("--checkpoint-from", default=None, help="CIR checkpoint path")
def fitb(checkpoint_from, **kw):
    """Fill-in-the-blank evaluation (reference run/fitb.py; test-only)."""
    from outfitx_tpu.train.fitb_trainer import FITBTrainer

    if _resolve_mode(kw, default="test") != "test":
        raise click.UsageError("fitb supports --mode=test only")
    model_cfg = _model_cfg(kw)
    cfg = _build_cfg(FITBTrainConfig, kw, checkpoint_from=checkpoint_from)
    kwargs = {}
    if kw["synthetic"]:
        data = _synth(model_cfg)
        kwargs = dict(catalog=data.catalog, test_split=data.fitb_test)
    with FITBTrainer(cfg, model_cfg, "test", **kwargs) as t:
        result = t.run()
    click.echo(json.dumps(result))


@cli.command()
@common_options
def original_cp(**kw):
    """End-to-end CP: raw images+texts through resnet18+MiniLM inside the
    train step (reference run/original_cp.py)."""
    from outfitx_tpu.data.synthetic import make_synthetic
    from outfitx_tpu.models.item_encoder import ItemEncoderModel
    from outfitx_tpu.core.config import ItemEncoderConfig
    from outfitx_tpu.train.original_cp_trainer import (
        OriginalCPTrainer,
        RawItemSource,
    )

    enc_cfg = ItemEncoderConfig.for_type("resnet_sbert")
    model_cfg = OutfitXConfig(item_encoder=enc_cfg)
    # reference original-CP envelope: batch 350, accum 10 (:26-33)
    cfg = _build_cfg(CPTrainConfig, kw)
    if kw["batch_size"] is None:
        cfg = dataclasses.replace(cfg, batch_size=350, accumulation_steps=10)
    kwargs = {}
    if kw["synthetic"]:
        enc = ItemEncoderModel(enc_cfg)
        data = _synth(model_cfg, n_outfits=512)
        source = RawItemSource.synthetic(
            n_items=data.catalog.n_items,
            image_size=enc.image_size,
            text_len=16,
            vocab=enc.text_vocab_size,
        )
        kwargs = dict(
            encoder=enc,
            source=source,
            train_split=data.cp_train,
            valid_split=data.cp_valid,
        )
    with OriginalCPTrainer(cfg, model_cfg, _resolve_mode(kw), **kwargs) as t:
        result = t.run()
    click.echo(json.dumps(result))


@cli.command()
@common_options
@click.option("--output-dir", default=None, help="embedding shard output dir")
@click.option(
    "--weights", default=None,
    help="HF checkpoint dir with pretrained tower weights (safetensors)",
)
@click.option(
    "--shards", type=int, default=1,
    help="split the sweep over N sequential child processes, each writing "
    "shard {model}_embedding_subset_{k}.pkl (the reference per-rank "
    "layout). Bounds parent RSS: the relay client's H2D staging leak "
    "(~150 KB/item, BENCHMARKS.md) is freed at each child's exit, removing "
    "the ~800k-item single-process catalog ceiling.",
)
@click.option(
    "--slice-index", type=int, default=None, hidden=True,
    help="internal: run as the child sweeping slice K of --shards",
)
@click.option(
    "--synthetic-items", type=int, default=4096,
    help="catalog size for --synthetic sweeps (scale tests / leak probes)",
)
def pes(output_dir, weights, shards, slice_index, synthetic_items, **kw):
    """Precompute-embedding sweep over the item catalog (reference run/pes.py)."""
    from outfitx_tpu.core.config import PrecomputeConfig
    from outfitx_tpu.train.precompute import PrecomputeRunner

    if shards > 1 and slice_index is None:
        click.echo(json.dumps(_pes_sharded_parent(shards)))
        return

    model_cfg = _model_cfg(kw)
    cfg = _build_cfg(PrecomputeConfig, kw)
    params = None
    if weights:
        import jax

        from outfitx_tpu.models.item_encoder import ItemEncoderModel
        from outfitx_tpu.models.pretrained import load_item_encoder_params

        enc = ItemEncoderModel(model_cfg.item_encoder)
        init = enc.init(jax.random.PRNGKey(cfg.seed))
        params = load_item_encoder_params(enc, weights, init_params=init)
    runner = PrecomputeRunner(
        cfg,
        model_cfg,
        output_dir=output_dir,
        params=params,
        synthetic_items=synthetic_items if kw["synthetic"] else 0,
        n_slices=shards,
        slice_index=slice_index or 0,
    )
    result = runner.run()
    click.echo(json.dumps(result))


def _pes_sharded_parent(shards: int) -> dict:
    """Run the sweep as N sequential child processes (one per slice).

    The parent never touches the device, so its RSS stays flat no matter
    the catalog size; each child re-invokes this exact command line with
    its hidden --slice-index and inherits every other flag unchanged.
    """
    import resource
    import subprocess
    import sys
    import time as _time

    t0 = _time.perf_counter()
    totals = {"items": 0, "shards": 0}
    peaks = []
    for k in range(shards):
        cmd = (
            [sys.executable, "-m", "outfitx_tpu.cli"]
            + sys.argv[1:]
            + ["--slice-index", str(k)]
        )
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise click.ClickException(
                f"pes slice {k}/{shards} failed:\n{proc.stderr[-2000:]}"
            )
        line = proc.stdout.strip().splitlines()[-1]
        child = json.loads(line)
        totals["items"] += child.get("items", 0)
        totals["shards"] += child.get("shards", 0)
        peaks.append(child.get("max_rss_mb"))
    dt = _time.perf_counter() - t0
    return {
        **totals,
        "seconds": round(dt, 2),
        "items_per_sec": round(totals["items"] / max(dt, 1e-9), 1),
        "child_max_rss_mb": peaks,
        "parent_max_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
    }


@cli.command()
@click.option("--port", type=int, default=6006)
@click.option("--synthetic", is_flag=True)
@click.option("--dataset-dir", default="datasets/polyvore")
@click.option("--polyvore-type", type=click.Choice(["nondisjoint", "disjoint"]),
              default="nondisjoint")
@click.option("--checkpoint-dir", default="checkpoints",
              help="dir holding the trained best_auc / best_recall@1 "
              "checkpoints to serve")
@click.option("--mock", is_flag=True, help="UI smoke test with fake predictions")
@click.option("--quantized", is_flag=True, help="int8 catalog for whole-catalog retrieval")
@click.option(
    "--quantize-model", is_flag=True,
    help="int8 W8A8 transformer forward on the MXU's 2x-rate int8 path "
    "(models/quantized.py; scores shift by the quantization error)",
)
@click.option(
    "--exact-topk", is_flag=True,
    help="exact lax.top_k retrieval (default: TPU-native approx, ~0.995 recall, 2.3x faster)",
)
@click.option(
    "--coalesce-ms", type=float, default=None,
    help="coalesce concurrent /api/cp requests into one fused device "
    "program within this window (serve/coalesce.py)",
)
@click.option(
    "--catalog-dtype", type=click.Choice(["float32", "bfloat16"]),
    default="float32",
    help="device catalog storage dtype; bfloat16 halves catalog HBM and "
    "H2D staging (compute is bf16 either way; ~1e-3 score shift)",
)
@click.option(
    "--spare-capacity", type=int, default=0,
    help="reserve this many spare catalog rows so POST /api/add_items can "
    "append new items at runtime without recompiling any program",
)
@click.option(
    "--shard-catalog", is_flag=True,
    help="row-shard the catalog over ALL local devices and retrieve via "
    "per-shard top-k + merge (ops/retrieval_sharded.py); aggregate HBM "
    "scales with the device count",
)
@click.option(
    "--max-rss-gb", type=float, default=None,
    help="replica recycling: when host RSS exceeds this, stop accepting "
    "connections, drain in-flight requests, and exit 81 so a supervisor "
    "restarts the replica warm from the compile-cache pack (the relay "
    "client leaks ~2.3 KB RSS/request — BENCHMARKS.md soak)",
)
@click.option(
    "--max-age", "max_age_s", type=float, default=None,
    help="replica recycling by wall-clock age in seconds (same drain+exit-81 "
    "contract as --max-rss-gb)",
)
def demo(port, synthetic, dataset_dir, polyvore_type, checkpoint_dir, mock,
         quantized, quantize_model, exact_topk, coalesce_ms, catalog_dtype,
         spare_capacity, shard_catalog, max_rss_gb, max_age_s):
    """Serving demo (reference src/demo/app.py, port 6006)."""
    from outfitx_tpu.serve.app import build_engine, serve

    engine = build_engine(
        synthetic=synthetic, mock=mock, quantized=quantized,
        dataset_dir=dataset_dir, polyvore_type=polyvore_type,
        checkpoint_dir=checkpoint_dir,
        quantize_model=quantize_model,
        exact_topk=exact_topk, catalog_dtype=catalog_dtype,
        shard_catalog=shard_catalog, spare_capacity=spare_capacity,
    )
    serve(
        port=port, engine=engine, mock=mock, coalesce_ms=coalesce_ms,
        max_rss_mb=None if max_rss_gb is None else max_rss_gb * 1024.0,
        max_age_s=max_age_s,
    )


@cli.command("export-torch")
@click.option("--params", "params_path", required=True,
              help="orbax checkpoint dir (e.g. checkpoints/<run>/best_auc)")
@click.option("--out", "out_path", required=True,
              help=".pth output in the reference's checkpoint format")
@click.option("--towers-from", default=None,
              help="reference-side .pth holding the frozen item_encoder.* "
              "tensors to merge so the reference's strict load_state_dict "
              "succeeds (else load with strict=False; see MIGRATION.md)")
def export_torch(params_path, out_path, towers_from):
    """Export trained params to the reference system's .pth format.

    The reference's own trainers/demo load the result via
    load_checkpoint(only_load_model=True) — train here, evaluate/serve
    there (validated bit-for-bit in PARITY.md §6)."""
    from outfitx_tpu.models.export_torch import export_reference_checkpoint

    out = export_reference_checkpoint(
        params_path, out_path, towers_from=towers_from
    )
    click.echo(json.dumps({"exported": str(out)}))


def main() -> None:
    cli()


if __name__ == "__main__":
    main()
