"""Probe: CLIP text tower (L=77, CAUSAL + key-pad mask) — XLA einsum vs
the direct Pallas kernel's compile-time causal branch — on the real chip.

Closes the last tower path with no Pallas treatment (VERDICT r3 item 4:
`ops/attention.py` used to exempt causal; the siglip text tower's direct
kernel measured 1.33x, this probes the clip family's causal analogue).

Run on the ambient TPU env:
    python scripts/bench_clip_text_attn.py xla
    python scripts/bench_clip_text_attn.py pallas
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

    from outfitx_tpu.models.towers.text import TextTower, TextTowerConfig

    tower = TextTower(TextTowerConfig.clip_b())
    params = tower.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    l = tower.cfg.max_len  # 77
    ids = jnp.asarray(
        rng.integers(1, tower.cfg.vocab_size - 1, (batch, l)), dtype=jnp.int32
    )
    lengths = rng.integers(4, l + 1, size=(batch, 1))
    attn = jnp.asarray(np.arange(l)[None, :] < lengths)  # True = real token

    fn = jax.jit(lambda p, i, a: tower(p, i, a))
    out = fn(params, ids, attn)
    float(np.asarray(jnp.sum(out.ravel()[:8])))  # sync through the relay
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(params, ids, attn)
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
            {
                "metric": f"clip_text_tower_ms_{choice}",
                "value": round(ms, 1),
                "batch": 2048,
                "seq": 77,
            }
        )
    )


if __name__ == "__main__":
    main()
