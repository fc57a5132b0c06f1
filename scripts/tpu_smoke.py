"""TPU smoke test: compiled (non-interpret) Pallas kernels + flagship
forward verified against XLA references on the real chip.

The CPU test suite runs Pallas in interpreter mode; this script is the
companion check that the compiled kernels behave on hardware:

    python scripts/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import sys


def main() -> int:
    from outfitx_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — kernels will use interpret mode")

    from outfitx_tpu.core.config import OutfitXConfig
    from outfitx_tpu.models import OutfitXModel
    from outfitx_tpu.ops.attention import _mha_reference, masked_mha
    from outfitx_tpu.ops.layernorm import layer_norm

    rng = np.random.default_rng(0)
    failures = 0

    def check(tag, got, want, atol):
        nonlocal failures
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
        )
        ok = err <= atol
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {tag}: maxerr {err:.2e}")

    # Pallas MHA vs XLA at the set-transformer shape
    b, h, l, dh = 512, 16, 17, 96
    q = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.bfloat16)
    mask = jnp.asarray(
        np.arange(l)[None, :] >= rng.integers(2, l + 1, size=(b, 1))
    )
    got = jax.jit(lambda q, m: masked_mha(q, q, q, m, impl="pallas"))(q, mask)
    check("pallas MHA (L=17)", got, _mha_reference(q, q, q, mask), 5e-2)

    # Pallas MHA BACKWARD vs the XLA recompute backward, compiled on chip
    # (the CPU suite validates _mha_bwd_kernel only in interpret mode).
    w = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.float32)

    def make_loss(impl):
        def loss(q_, k_, v_):
            o = masked_mha(q_, k_, v_, mask, impl=impl)
            return jnp.sum(o.astype(jnp.float32) * w)

        return loss

    k_in = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.bfloat16)
    v_in = jnp.asarray(rng.standard_normal((b, h, l, dh)), dtype=jnp.bfloat16)
    gp = jax.jit(jax.grad(make_loss("pallas"), argnums=(0, 1, 2)))(q, k_in, v_in)
    gx = jax.jit(jax.grad(make_loss("xla"), argnums=(0, 1, 2)))(q, k_in, v_in)
    for name, a, bb_ in zip(("dq", "dk", "dv"), gp, gx):
        # bf16 grads over L=17 reductions: tolerance scales with magnitude
        scale = float(jnp.max(jnp.abs(bb_.astype(jnp.float32)))) + 1e-6
        check(f"pallas MHA backward {name} (L=17)", a, bb_, 2e-2 * scale)

    # Direct (unpadded) kernel at tower lengths (text L=64 with a real
    # key-padding mask; ViT-B/32 S=50; ViT-B/16 S=197) and the padded
    # kernel (forced via the threshold env) — compiled Mosaic vs XLA.
    os.environ["OUTFITX_MHA_DIRECT_MAX"] = "128"  # route L=197 padded
    for lt, masked in ((197, False),):
        bt, ht, dht = 64, 12, 64
        qt = jnp.asarray(
            rng.standard_normal((bt, ht, lt, dht)), dtype=jnp.bfloat16
        )
        mt = jnp.zeros((bt, lt), dtype=bool)
        got = jax.jit(lambda q, m: masked_mha(q, q, q, m, impl="pallas"))(
            qt, mt
        )
        check(
            f"pallas tower MHA padded (L={lt})",
            got,
            _mha_reference(qt, qt, qt, mt),
            5e-2,
        )
    del os.environ["OUTFITX_MHA_DIRECT_MAX"]  # default: direct to L=256
    for lt, masked in ((64, True), (50, False), (197, False)):
        bt, ht, dht = 64, 12, 64
        qt = jnp.asarray(
            rng.standard_normal((bt, ht, lt, dht)), dtype=jnp.bfloat16
        )
        mt = (
            jnp.asarray(
                np.arange(lt)[None, :] >= rng.integers(5, lt + 1, size=(bt, 1))
            )
            if masked
            else jnp.zeros((bt, lt), dtype=bool)
        )
        got = jax.jit(lambda q, m: masked_mha(q, q, q, m, impl="pallas"))(
            qt, mt
        )
        check(
            f"pallas tower MHA (L={lt}{', masked' if masked else ''})",
            got,
            _mha_reference(qt, qt, qt, mt),
            5e-2,
        )

    # Causal direct kernel (CLIP text tower: L=77, causal + key-pad mask)
    bt, ht, lt, dht = 64, 8, 77, 64
    qt = jnp.asarray(
        rng.standard_normal((bt, ht, lt, dht)), dtype=jnp.bfloat16
    )
    mt = jnp.asarray(
        np.arange(lt)[None, :] >= rng.integers(5, lt + 1, size=(bt, 1))
    )
    got = jax.jit(
        lambda q, m: masked_mha(q, q, q, m, causal=True, impl="pallas")
    )(qt, mt)
    check(
        "pallas causal MHA (L=77, masked)",
        got,
        _mha_reference(qt, qt, qt, mt, causal=True),
        5e-2,
    )

    # Fused attention BLOCK (qkv proj + MHA + out proj in one kernel)
    from outfitx_tpu.ops.attn_block import attn_block

    bb_, lb, db, hb = 256, 17, 1536, 16
    yb = jnp.asarray(
        rng.standard_normal((bb_, lb, db)), dtype=jnp.bfloat16
    )
    wq = jnp.asarray(
        rng.standard_normal((db, 3, db)) * 0.02, dtype=jnp.bfloat16
    )
    bq = jnp.asarray(rng.standard_normal((3, db)) * 0.02, dtype=jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((db, db)) * 0.02, dtype=jnp.bfloat16)
    mb = jnp.asarray(
        np.arange(lb)[None, :] >= rng.integers(2, lb + 1, size=(bb_, 1))
    )

    def block_ref(y, wq, bq, wo, m):
        qkv = jnp.dot(y, wq.reshape(db, 3 * db)).reshape(bb_, lb, 3, db) + bq
        qkv = qkv.reshape(bb_, lb, 3, hb, db // hb).transpose(2, 0, 3, 1, 4)
        o = _mha_reference(qkv[0], qkv[1], qkv[2], m)
        return jnp.dot(
            o.transpose(0, 2, 1, 3).reshape(bb_, lb, db), wo
        ).astype(jnp.float32)

    check(
        "pallas fused attn block (L=17)",
        jax.jit(lambda *a: attn_block(*a, hb))(yb, wq, bq, wo, mb),
        block_ref(yb, wq, bq, wo, mb),
        5e-2,
    )

    # causal fused block at the CLIP-text shape (L=77, d=512, 8 heads)
    bc, lc, dc, hc = 128, 77, 512, 8
    yc = jnp.asarray(rng.standard_normal((bc, lc, dc)), dtype=jnp.bfloat16)
    wqc = jnp.asarray(
        rng.standard_normal((dc, 3, dc)) * 0.02, dtype=jnp.bfloat16
    )
    bqc = jnp.asarray(rng.standard_normal((3, dc)) * 0.02, dtype=jnp.bfloat16)
    woc = jnp.asarray(rng.standard_normal((dc, dc)) * 0.02, dtype=jnp.bfloat16)
    mc = jnp.asarray(
        np.arange(lc)[None, :] >= rng.integers(5, lc + 1, size=(bc, 1))
    )

    def block_ref_causal(y, wq_, bq_, wo_, m):
        qkv = jnp.dot(y, wq_.reshape(dc, 3 * dc)).reshape(bc, lc, 3, dc) + bq_
        qkv = qkv.reshape(bc, lc, 3, hc, dc // hc).transpose(2, 0, 3, 1, 4)
        o = _mha_reference(qkv[0], qkv[1], qkv[2], m, causal=True)
        return jnp.dot(
            o.transpose(0, 2, 1, 3).reshape(bc, lc, dc), wo_
        ).astype(jnp.float32)

    check(
        "pallas fused attn block (causal L=77)",
        jax.jit(lambda *a: attn_block(*a, hc, causal=True))(
            yc, wqc, bqc, woc, mc
        ),
        block_ref_causal(yc, wqc, bqc, woc, mc),
        5e-2,
    )

    # Pallas LayerNorm vs XLA
    x = jnp.asarray(rng.standard_normal((1024, 1536)), dtype=jnp.float32)
    s = jnp.asarray(rng.standard_normal(1536), dtype=jnp.float32)
    bb = jnp.asarray(rng.standard_normal(1536), dtype=jnp.float32)
    check(
        "pallas LayerNorm",
        jax.jit(lambda x: layer_norm(x, s, bb, impl="pallas"))(x),
        layer_norm(x, s, bb, impl="xla"),
        1e-4,
    )

    # flagship forward finite + mask-invariant
    cfg = OutfitXConfig()
    model = OutfitXModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    emb = jnp.asarray(
        rng.standard_normal((256, 16, cfg.d_embed)), dtype=jnp.bfloat16
    )
    m16 = jnp.asarray(np.arange(16)[None, :] >= rng.integers(2, 17, size=(256, 1)))
    f = jax.jit(lambda p, e, m: model.cp_forward(p, e, m))
    s1 = f(params, emb, m16)
    s2 = f(params, jnp.where(m16[:, :, None], 9.9, emb), m16)
    check("flagship mask invariance", s1, s2, 1e-5)
    assert np.isfinite(np.asarray(s1)).all()

    print("SMOKE", "FAILED" if failures else "OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
