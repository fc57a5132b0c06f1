"""Probe: ViT-B/32 (S=50) tower attention — XLA einsum vs the direct
(unpadded) Pallas kernel — on the real chip.

Companion to the L=64 text-tower measurement (BENCHMARKS.md tower-attention
study): 32 < L <= 128 routes the direct kernel since round 3; this measures
the other tower shape in that band (the clip encoder family's ViT-B/32).

Run on the ambient TPU env:  python scripts/bench_vit_b32_attn.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def measure(env_choice: str, batch: int = 2048) -> float:
    os.environ["OUTFITX_TOWER_ATTN"] = env_choice
    import jax
    import jax.numpy as jnp

    from outfitx_tpu.models.towers.vision import VisionTower, VisionTowerConfig

    tower = VisionTower(VisionTowerConfig.clip_b32())
    params = tower.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, 3, 224, 224)), dtype=jnp.bfloat16
    )

    fn = jax.jit(lambda p, x: tower(p, x))
    out = fn(params, x)
    float(np.asarray(jnp.sum(out.ravel()[:8])))  # sync through the relay
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(params, x)
        float(np.asarray(jnp.sum(out.ravel()[:8])))
        best = min(best, (time.perf_counter() - t0) / 4)
    return best * 1000.0


def main() -> None:
    from outfitx_tpu.core.runtime import (
        enable_compilation_cache,
        retry_if_backend_down,
    )

    retry_if_backend_down()
    enable_compilation_cache()

    choice = sys.argv[1] if len(sys.argv) > 1 else "xla"
    ms = measure(choice)
    print(
        json.dumps(
            {"metric": f"vit_b32_tower_ms_{choice}", "value": round(ms, 1),
             "batch": 2048}
        )
    )


if __name__ == "__main__":
    main()
