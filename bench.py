"""Benchmark: outfits-scored/sec/chip on the CP forward path (the
BASELINE.json north-star metric), at reference scale (siglip d=1536,
6 layers, 16 heads, L=16+1).

Baseline: the reference publishes no numbers (BASELINE.md); the CPU
reference is self-measured on this machine — the reference architecture
(torch nn.TransformerEncoder, 6x[MHA16h + FFN2024 + mish, pre-LN] + linear
head) at batch 256, single CPU thread: 33.6 outfits/s (2026-08-16,
torch 2.x CPU, this container). vs_baseline = ours / 33.6.

Timing protocol: the axon TPU tunnel's block_until_ready does not wait for
device completion, so iterations are serialized with a data dependency
(scores fed back into the next input) and a single device-to-host transfer
syncs the chain before the clock stops.
"""

from __future__ import annotations

import json
import time

import numpy as np

TORCH_CPU_BASELINE_OUTFITS_PER_SEC = 33.6


def main() -> None:
    from outfitx_tpu.core.runtime import retry_if_backend_down

    # Bounded re-exec when TPU registration transiently fails (observed
    # 1-2 h outages) or a PYTHONPATH override shadowed the plugin site dir.
    retry_if_backend_down()

    import jax
    import jax.numpy as jnp

    from outfitx_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

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

    @jax.jit
    def chained(params, emb, mask):
        scores = model.cp_forward(params, emb, mask)
        # Data dependency serializes iterations on device.
        new_emb = emb + (scores[:, None, None] * 1e-6).astype(emb.dtype)
        return scores, new_emb

    # Warm-up / compile.
    scores, e = chained(params, emb, mask)
    float(np.asarray(scores[0]))  # full sync

    # Several measurement windows, best taken: the TPU behind the relay is
    # time-shared and a single window can absorb another tenant's burst
    # (observed 15% swings between sessions on an identical cached
    # executable). Best-of-N is the standard throughput protocol under
    # external interference.
    windows, iters = 4, 12
    per_window = []
    for _ in range(windows):
        t0 = time.perf_counter()
        e = emb
        for _ in range(iters):
            scores, e = chained(params, e, mask)
        float(np.asarray(scores[0]))  # sync the chain
        per_window.append((time.perf_counter() - t0) / iters)
    dt = min(per_window)

    value = b / dt
    print(
        json.dumps(
            {
                "metric": "outfits_scored_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "outfits/s",
                "vs_baseline": round(
                    value / TORCH_CPU_BASELINE_OUTFITS_PER_SEC, 2
                ),
                "window_spread": [round(b / w, 1) for w in per_window],
            }
        )
    )


if __name__ == "__main__":
    main()
