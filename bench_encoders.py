"""TPU benchmarks for the encoder/precompute paths (BASELINE configs #2/#5)
and int8 quantized retrieval — the three measurements deferred in round 1.

Prints one JSON line per measurement. Timing protocol (see
.claude/skills/verify/SKILL.md): the axon relay's block_until_ready does not
wait for device completion, so loops are serialized by data dependencies and
synced with a tiny scalar D2H before the clock stops.

Usage: python bench_encoders.py (from the repo root) [--only precompute|ocp|int8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync_scalar(x) -> float:
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.ravel()[:8].astype(jnp.float32))))


def bench_precompute(
    n_items: int = 8192, batch: int = 2048, smoke: bool = False
) -> None:
    """Items-embedded/sec/chip: the catalog sweep through the production
    SigLIP-B/16 towers (12L/768d vision @224px/197 patches + 12L text),
    batch 2048, uint8 host staging — the reference's precompute hot loop
    (precompute_embedding_script.py:35-55). Run twice: first pass pays the
    compile, second is the steady-state number."""
    from outfitx_tpu.core.config import OutfitXConfig, PrecomputeConfig
    from outfitx_tpu.train.precompute import PrecomputeRunner

    model_cfg = OutfitXConfig()  # siglip towers at production scale
    encoder = None
    if smoke:  # tiny towers: harness correctness only
        from outfitx_tpu.core.config import ItemEncoderConfig
        from outfitx_tpu.models.item_encoder import ItemEncoderModel
        from outfitx_tpu.models.towers.text import TextTowerConfig
        from outfitx_tpu.models.towers.vision import VisionTowerConfig

        model_cfg = OutfitXConfig(
            item_encoder=ItemEncoderConfig(
                encoder_type="siglip", dim_per_modality=16
            )
        )
        encoder = ItemEncoderModel(
            model_cfg.item_encoder,
            vision_cfg=VisionTowerConfig(
                variant="siglip", image_size=32, patch_size=16, d_model=16,
                n_heads=4, d_mlp=64, n_layers=2,
            ),
            text_cfg=TextTowerConfig(
                variant="siglip", vocab_size=128, max_len=16, d_model=32,
                n_heads=4, d_mlp=64, n_layers=2, proj_dim=16,
            ),
        )
    cfg = PrecomputeConfig(batch_size=batch, dataset_dir="/tmp")
    runner = PrecomputeRunner(
        cfg,
        model_cfg,
        output_dir="/tmp/bench_pes",
        synthetic_items=n_items,
        encoder=encoder,
    )
    first = runner.run()  # compile + first sweep
    steady = runner.run()
    print(
        json.dumps(
            {
                "metric": "items_embedded_per_sec_per_chip",
                "value": steady["items_per_sec"],
                "unit": "items/s",
                "batch": cfg.batch_size,
                "towers": "siglip ViT-B/16 + text-B (d=1536 fused)",
                "first_sweep_s": first["seconds"],
                "steady_sweep_s": steady["seconds"],
            }
        ),
        flush=True,
    )

    # Device-core rate: same jitted uint8-normalize+encode program on one
    # staged batch, iterated with a trailing scalar sync. Separates the
    # tower throughput from what bounds the sweep above on this machine —
    # measured to be the relay's ~25 MB/s H2D path (~12-15 s per 308 MB
    # uint8 batch), not host staging (1.2 s) or the encode (1.5 s).
    import jax
    import jax.numpy as jnp

    b = next(runner._batches())
    images = jnp.asarray(b["images"])
    input_ids = jnp.asarray(b["input_ids"])
    attn = jnp.asarray(b["attention_mask"])
    emb = runner._encode(runner.params, images, input_ids, attn)
    _sync_scalar(emb)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        emb = runner._encode(runner.params, images, input_ids, attn)
    _sync_scalar(emb)
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "metric": "items_encoded_per_sec_device_core",
                "value": round(batch / dt, 1),
                "unit": "items/s",
                "batch_ms": round(dt * 1000, 1),
                "towers": "siglip ViT-B/16 + text-B (d=1536 fused)",
            }
        ),
        flush=True,
    )


def bench_tower_parts(batch: int = 2048) -> None:
    """Bisection of the precompute encode: vision tower alone, text tower
    alone, normalize+patchify alone — to locate the non-matmul bottleneck
    (the full encode measured ~1.5 s/batch both in f32 and bf16, so the
    MXU rate is not the limiter)."""
    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.models.item_encoder import ItemEncoderModel

    enc = ItemEncoderModel(OutfitXConfig().item_encoder)
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 256, (batch, 3, enc.image_size, enc.image_size)),
        dtype=jnp.uint8,
    )
    ids = jnp.asarray(
        rng.integers(2, 1000, (batch, 64)), dtype=jnp.int32
    )
    attn = jnp.ones_like(ids)

    @jax.jit
    def vision_only(params, imgs):
        return enc.encode_images(params, imgs)

    @jax.jit
    def text_only(params, ids, attn):
        return enc.encode_texts(params, ids, attn)

    @jax.jit
    def pre_only(imgs):
        x = enc.normalize_images(imgs)
        return enc.vision.patchify(
            x.astype(jnp.dtype(enc.vision.cfg.compute_dtype))
        )

    for name, fn, args in (
        ("vision_tower", vision_only, (params, imgs)),
        ("text_tower", text_only, (params, ids, attn)),
        ("normalize_patchify", pre_only, (imgs,)),
    ):
        out = fn(*args)
        _sync_scalar(out.astype(jnp.float32))
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync_scalar(out.astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        print(
            json.dumps(
                {
                    "metric": f"encode_part_{name}_ms",
                    "value": round(dt * 1000, 1),
                    "batch": batch,
                    "items_per_sec": round(batch / dt, 1),
                }
            ),
            flush=True,
        )


def bench_original_cp(batch: int = 350, smoke: bool = False) -> None:
    """End-to-end original-CP train step (BASELINE #2): raw 224px images +
    token ids through frozen resnet18 + MiniLM-L6 INSIDE the jitted step
    (reference original_cp_trainer.py batch 350), trainable heads + set
    transformer. Inputs staged on device once; iterations serialized by the
    state dependency."""
    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core.config import (
        CPTrainConfig,
        ItemEncoderConfig,
        OutfitXConfig,
        TransformerConfig,
    )
    from outfitx_tpu.models.item_encoder import ItemEncoderModel
    from outfitx_tpu.train.original_cp_trainer import (
        OriginalCPTrainer,
        RawItemSource,
    )
    from outfitx_tpu.data.synthetic import make_synthetic

    if smoke:
        from outfitx_tpu.models.towers.minilm import MiniLMConfig
        from outfitx_tpu.models.towers.resnet import ResNet18Config

        enc = ItemEncoderModel(
            ItemEncoderConfig(encoder_type="resnet_sbert", dim_per_modality=8),
            vision_cfg=ResNet18Config(d_out=8, image_size=32),
            text_cfg=MiniLMConfig(
                vocab_size=120, max_len=12, d_model=24, n_heads=4, d_mlp=48,
                n_layers=1, d_out=8,
            ),
        )
        model_cfg = OutfitXConfig(
            item_encoder=enc.cfg,
            transformer=TransformerConfig(
                n_heads=4, d_ffn=32, n_layers=1, dropout=0.1
            ),
            max_outfit_len=8,
        )
    else:
        enc = ItemEncoderModel(ItemEncoderConfig(encoder_type="resnet_sbert"))
        model_cfg = OutfitXConfig(
            item_encoder=enc.cfg,
            transformer=TransformerConfig(),
            remat=True,
        )
    l = model_cfg.max_outfit_len
    n_items = 256 if smoke else 2048
    synth = make_synthetic(
        n_items=n_items, d_embed=model_cfg.d_embed, n_outfits=batch * 2, seed=0
    )
    source = RawItemSource.synthetic(
        n_items=n_items,
        image_size=enc.image_size,
        text_len=min(
            model_cfg.item_encoder.text_max_length, enc.text.cfg.max_len
        ),
        vocab=enc.text.cfg.vocab_size,
        seed=1,
    )
    cfg = CPTrainConfig(
        n_epochs=1, batch_size=batch, accumulation_steps=1,
        checkpoint_dir="/tmp/bench_ocp/ckpt", log_dir="/tmp/bench_ocp/logs",
    )
    with OriginalCPTrainer(
        cfg,
        model_cfg,
        encoder=enc,
        source=source,
        train_split=synth.cp_train,
        valid_split=synth.cp_valid,
    ) as t:
        bgen = t._batches(t._train_split, epoch=0)
        host_batch = next(bgen)
        dev_batch = jax.tree.map(jnp.asarray, host_batch)

        t0 = time.perf_counter()
        state, out = t.train_step(t.state, t.frozen, dev_batch)
        _sync_scalar(out["loss"])
        compile_s = time.perf_counter() - t0

        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            state, out = t.train_step(state, t.frozen, dev_batch)
        _sync_scalar(out["loss"])
        dt = (time.perf_counter() - t0) / iters
        t.state = state  # train_step donates its input state
    n_images = batch * l
    print(
        json.dumps(
            {
                "metric": "original_cp_train_step_ms",
                "value": round(dt * 1000, 1),
                "unit": "ms/step",
                "batch_outfits": batch,
                "images_per_step": n_images,
                "images_per_sec": round(n_images / dt, 1),
                "outfits_per_sec": round(batch / dt, 1),
                "compile_plus_first_s": round(compile_s, 1),
                "towers": (
                    f"resnet18@{enc.image_size} + MiniLM-"
                    f"{enc.text.cfg.n_layers}L (end-to-end in-step)"
                ),
            }
        ),
        flush=True,
    )


def bench_int8(n: int = 250_000, d: int = 1536, q: int = 1024, k: int = 10) -> None:
    """int8 quantized whole-catalog retrieval vs f32 (serving path,
    serve/engine.py quantized route)."""
    import jax
    import jax.numpy as jnp

    from outfitx_tpu.ops.quantization import quantize_catalog, retrieve_quantized
    from outfitx_tpu.ops.retrieval import retrieve

    rng = np.random.default_rng(0)
    catalog = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    queries = jnp.asarray(rng.standard_normal((q, d)).astype(np.float32))
    qcat = quantize_catalog(catalog)
    _sync_scalar(qcat.values.astype(jnp.float32))

    # Catalogs are jit ARGUMENTS, not closure captures: a captured array is
    # baked into the program as a constant, and at 250k x 1536 the compile
    # payload blows past the remote compile service's request limit
    # (observed HTTP 413).
    @jax.jit
    def chained_q(queries, qcat):
        d2, idx = retrieve_quantized(queries, qcat, k)
        return d2, idx, queries + (d2[:, :1] * 1e-12)

    @jax.jit
    def chained_f(queries, catalog):
        d2, idx = retrieve(queries, catalog, k)
        return d2, idx, queries + (d2[:, :1] * 1e-12)

    @jax.jit
    def chained_qa(queries, qcat):
        d2, idx = retrieve_quantized(queries, qcat, k, approx=True)
        return d2, idx, queries + (d2[:, :1] * 1e-12)

    results = {}
    for name, fn, cat in (
        ("int8", chained_q, qcat),
        ("f32", chained_f, catalog),
        ("int8_approx", chained_qa, qcat),  # the serving default route
    ):
        d2, idx, qq = fn(queries, cat)
        _sync_scalar(d2)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            d2, idx, qq = fn(qq, cat)
        _sync_scalar(d2)
        results[name] = (time.perf_counter() - t0) / iters
    agree = None
    di, ii, _ = chained_q(queries, qcat)
    df, if_, _ = chained_f(queries, catalog)
    ii, if_ = np.asarray(ii), np.asarray(if_)
    agree = float(
        np.mean([len(set(a) & set(b)) / k for a, b in zip(ii, if_)])
    )
    print(
        json.dumps(
            {
                "metric": "retrieval_top10_ms",
                "pool": f"{n}x{d}",
                "queries": q,
                "int8_ms": round(results["int8"] * 1000, 2),
                "f32_ms": round(results["f32"] * 1000, 2),
                "int8_approx_ms": round(results["int8_approx"] * 1000, 2),
                "speedup": round(results["f32"] / results["int8"], 2),
                "serving_route_speedup_vs_f32_exact": round(
                    results["f32"] / results["int8_approx"], 2
                ),
                "int8_queries_per_sec": round(q / results["int8"], 1),
                "serving_route_queries_per_sec": round(
                    q / results["int8_approx"], 1
                ),
                "top10_agreement_vs_f32": round(agree, 4),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", choices=["precompute", "ocp", "int8", "towers"], default=None
    )
    ap.add_argument(
        "--smoke", action="store_true",
        help="tiny sizes (CPU-runnable correctness check of the harness)",
    )
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    if not args.smoke:
        retry_if_backend_down()
    enable_compilation_cache()
    if args.only in (None, "int8"):
        bench_int8(**({"n": 5000, "q": 64} if args.smoke else {}))
    if args.only in (None, "precompute"):
        if args.smoke:
            bench_precompute(n_items=32, batch=16, smoke=True)
        else:
            bench_precompute()
    if args.only == "towers":
        bench_tower_parts()
    if args.only in (None, "ocp"):
        bench_original_cp(batch=4 if args.smoke else 350, smoke=args.smoke)


if __name__ == "__main__":
    main()
