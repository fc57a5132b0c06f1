"""Probe: unrolled layer stack vs lax.scan on the CP forward, under
TODAY'S remote-compiler codegen.

Round-2's attention-formulation study measured unrolled+fused-QKV at
28.3k outfits/s when scan gave 33.3k — under the since-shifted codegen
that now compiles scan to ~28.0k. The ranking may have changed: one
trace-per-layer gives XLA cross-layer scheduling freedom that the scanned
single-trace body denies it. This probe times both formulations on
identical inputs (bench.py protocol: dependency-chained iterations,
scalar D2H sync, best-of-N windows).

Run on the ambient TPU env:  python scripts/bench_unroll_probe.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core import dtypes
    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.models import OutfitXModel

    cfg = OutfitXConfig()
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, l, d = 4096, cfg.max_outfit_len, cfg.d_embed
    emb = jnp.asarray(rng.standard_normal((b, l, d)), dtype=jnp.bfloat16)
    mask = jnp.asarray(
        np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
    )
    cdt = dtypes.resolve(cfg.compute_dtype)

    def cp_forward_unrolled(params, outfit_embedding, outfit_mask):
        bb = outfit_embedding.shape[0]
        tok = jnp.broadcast_to(
            params["outfit_token"].astype(cdt)[None, None, :],
            (bb, 1, cfg.d_embed),
        )
        x = jnp.concatenate([tok, outfit_embedding.astype(cdt)], axis=1)
        m = jnp.concatenate(
            [jnp.zeros((bb, 1), dtype=bool), outfit_mask], axis=1
        )
        key = jax.random.PRNGKey(0)
        for i in range(cfg.transformer.n_layers):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            x = model._layer(lp, x, m, jax.random.fold_in(key, i), True)
        h = params["cp_head"]
        scores = jnp.dot(x[:, 0, :], h["w"].astype(cdt)) + h["b"].astype(cdt)
        return scores[:, 0].astype(jnp.float32)

    def make_chained(fwd):
        def chained(params, emb, mask):
            scores = fwd(params, emb, mask)
            new_emb = emb + (scores[:, None, None] * 1e-6).astype(emb.dtype)
            return scores, new_emb

        return chained

    def measure(fn, windows=4, iters=12):
        scores, e = fn(params, emb, mask)
        float(np.asarray(scores[0]))
        per_window = []
        for _ in range(windows):
            t0 = time.perf_counter()
            e = emb
            for _ in range(iters):
                scores, e = fn(params, e, mask)
            float(np.asarray(scores[0]))
            per_window.append((time.perf_counter() - t0) / iters)
        return b / min(per_window), [round(b / w, 1) for w in per_window]

    # numeric agreement first (same params, deterministic)
    s_scan = np.asarray(model.cp_forward(params, emb, mask))
    s_unroll = np.asarray(
        jax.jit(cp_forward_unrolled)(params, emb, mask)
    )
    max_dev = float(np.max(np.abs(s_scan - s_unroll)))

    v_unroll, w_unroll = measure(jax.jit(make_chained(cp_forward_unrolled)))
    v_scan, w_scan = measure(
        jax.jit(make_chained(lambda p, e, m: model.cp_forward(p, e, m)))
    )
    print(
        json.dumps(
            {
                "scan_outfits_per_s": round(v_scan, 1),
                "unroll_outfits_per_s": round(v_unroll, 1),
                "ratio_unroll_vs_scan": round(v_unroll / v_scan, 3),
                "scan_windows": w_scan,
                "unroll_windows": w_unroll,
                "max_abs_score_dev": max_dev,
            }
        )
    )


if __name__ == "__main__":
    main()
