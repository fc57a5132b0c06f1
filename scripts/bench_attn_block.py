"""Probe: the fully-fused attention BLOCK (ops/attn_block.py) vs the
decomposed path on the flagship CP forward (bench.py shape) — on chip.

The decomposed path pays per layer the HBM materialization of the
(B, L, 3, d) qkv tensor plus its head transposes; the fused block keeps
qkv/attention/out-proj VMEM-resident per (batch-tile, head) program.

    python scripts/bench_attn_block.py [--batch 4096] [--tiles 16,32,64]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--tiles", default="16,32,64")
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.ops import attn_block as AB

    cfg = OutfitXConfig()
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, l, d = args.batch, cfg.max_outfit_len, cfg.d_embed
    emb = jnp.asarray(rng.standard_normal((b, l, d)), dtype=jnp.bfloat16)
    mask = jnp.asarray(
        np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
    )

    def measure(tag):
        AB.fused_attn_block_enabled.cache_clear()

        def chained(params, emb, mask):
            scores = model.cp_forward(params, emb, mask)
            return scores, emb + (scores[:, None, None] * 1e-6).astype(emb.dtype)

        chained.__name__ = f"chained_{tag}"
        fn = jax.jit(chained)
        scores, e = fn(params, emb, mask)
        s0 = np.asarray(scores)
        per_window = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            e = emb
            for _ in range(args.iters):
                scores, e = fn(params, e, mask)
            float(np.asarray(scores[0]))
            per_window.append((time.perf_counter() - t0) / args.iters)
        best = b / min(per_window)
        print(
            json.dumps(
                {"probe": tag, "outfits_per_sec": round(best, 1),
                 "windows": [round(b / w, 1) for w in per_window]}
            ),
            flush=True,
        )
        return best, s0

    os.environ.pop("OUTFITX_ATTN_BLOCK", None)
    base, s_base = measure("decomposed")
    os.environ["OUTFITX_ATTN_BLOCK"] = "fused"
    results = {"decomposed": base}
    for tile in [int(t) for t in args.tiles.split(",") if t]:
        os.environ["OUTFITX_ATTN_TILE"] = str(tile)
        try:
            v, s_fused = measure(f"fused_tile{tile}")
        except Exception as e:  # Mosaic VMEM OOM at too-large tiles
            print(json.dumps({"probe": f"fused_tile{tile}",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        results[f"fused_tile{tile}"] = v
        dev = float(np.max(np.abs(s_base - s_fused)))
        print(json.dumps({"probe": f"fused_tile{tile}_max_dev", "value": dev}),
              flush=True)
    os.environ.pop("OUTFITX_ATTN_BLOCK", None)
    # the tower probes below must use the kernel's VMEM-guarded auto tile,
    # not the last flagship loop value (tile 64 at S=197 cannot compile)
    os.environ.pop("OUTFITX_ATTN_TILE", None)
    best_tag = max(results, key=results.get)
    print(
        json.dumps(
            {
                "probe": "summary",
                "best": best_tag,
                "speedup_vs_decomposed": round(results[best_tag] / base, 4),
            }
        ),
        flush=True,
    )
    bench_tower_shapes(args)


def bench_tower_shapes(args) -> None:
    """Kernel-level probe at TOWER shapes: would routing the frozen towers'
    attention block (per-projection matmuls + masked_mha + out-proj,
    models/towers/common.py block()) through ops/attn_block.attn_block help
    the precompute sweep? Towers are frozen, so their weights could be
    pre-arranged into the fused (d, 3, d) layout ONCE at load — the
    apply-time weight-concat that made fused-QKV lose in towers/common.py
    (measured note at :143-147) would not apply. A win here motivates that
    integration; a loss closes the question."""
    import jax
    import jax.numpy as jnp

    from outfitx_tpu.ops import masked_mha
    from outfitx_tpu.ops.attn_block import attn_block

    rng = np.random.default_rng(1)
    shapes = [
        ("siglip_vision_S197", 256, 197, 768, 12, False),
        ("text_L64", 512, 64, 768, 12, False),
        ("clip_vit32_S50", 512, 50, 768, 12, False),
        ("clip_text_L77_causal", 512, 77, 512, 8, True),
    ]
    for tag, b, s, d, h, causal in shapes:
        y = jnp.asarray(rng.standard_normal((b, s, d)), dtype=jnp.bfloat16)
        wq, wk, wv = (
            jnp.asarray(rng.standard_normal((d, d)) * 0.02, dtype=jnp.bfloat16)
            for _ in range(3)
        )
        bq, bk, bv = (
            jnp.asarray(rng.standard_normal((d,)) * 0.02, dtype=jnp.bfloat16)
            for _ in range(3)
        )
        wo = jnp.asarray(rng.standard_normal((d, d)) * 0.02, dtype=jnp.bfloat16)
        mask = jnp.zeros((b, s), dtype=bool)
        dh = d // h

        def decomposed(y):
            def heads(t):
                return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

            q, k, v = (
                heads(y @ w + bb) for w, bb in ((wq, bq), (wk, bk), (wv, bv))
            )
            o = masked_mha(q, k, v, mask, causal=causal)
            return (o.transpose(0, 2, 1, 3).reshape(b, s, d) @ wo).astype(
                jnp.float32
            )

        # frozen towers: pre-arranged fused layout, built once (not timed)
        wqkv = jnp.stack([wq, wk, wv], axis=1)  # (d, 3, d)
        bqkv = jnp.stack([bq, bk, bv], axis=0)  # (3, d)

        def fused(y):
            return attn_block(y, wqkv, bqkv, wo, mask, n_heads=h, causal=causal)

        def timeit(fn, label):
            out = fn(y)
            float(np.asarray(jnp.sum(out.ravel()[:8])))
            per_window = []
            for _ in range(args.windows):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(y)
                float(np.asarray(jnp.sum(out.ravel()[:8])))
                per_window.append((time.perf_counter() - t0) / args.iters)
            return min(per_window) * 1e3

        try:
            dec_jit, fus_jit = jax.jit(decomposed), jax.jit(fused)
            base_ms = timeit(dec_jit, "decomposed")
            fused_ms = timeit(fus_jit, "fused")
            dev = float(
                np.asarray(jnp.max(jnp.abs(dec_jit(y) - fus_jit(y))))
            )
            print(
                json.dumps(
                    {
                        "probe": f"tower_{tag}",
                        "decomposed_ms": round(base_ms, 3),
                        "fused_ms": round(fused_ms, 3),
                        "speedup": round(base_ms / fused_ms, 4),
                        "max_dev": dev,
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(
                json.dumps(
                    {"probe": f"tower_{tag}",
                     "error": f"{type(e).__name__}: {e}"[:200]}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
