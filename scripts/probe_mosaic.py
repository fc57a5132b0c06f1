"""Probe which vector-shape patterns the real Mosaic compiler accepts.

Round-4 on-chip smoke showed the fused attention block fails with
`infer-vector-layout: unsupported shape cast` on the in-kernel split
reshape (tb*l, dh) -> (tb, l, dh) with l=17 (BENCHMARKS.md "Round 4
status"; parity_artifacts/measure_r4/tpu_smoke.out).  This script
AOT-compiles (no device execution) a matrix of tiny kernels so the fix
is designed against the compiler's actual supported set instead of
guesses:

  merge3to2   (32, 17, 96)  -> (544, 96)      (smoke suggests: OK)
  split17     (544, 96)     -> (32, 17, 96)   (smoke says: FAIL)
  split24     (768, 96)     -> (32, 24, 96)   sublane-tile-aligned split
  split8      (256, 96)     -> (32, 8, 96)    exactly one tile per row
  dot3d2d     dot_general((32,17,1536),(1536,96)) contract last x first
  dot3d2d_24  same with l=24
  storesplit  2D -> 3D via 32 static strided stores into a VMEM scratch

Run on the ambient axon platform; compiles go through the remote AOT
service, nothing executes on the chip.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def compile_only(fn, *args):
    shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    jax.jit(fn).lower(*shapes).compile()


def probe(name, fn, *args):
    try:
        compile_only(fn, *args)
        print(f"PASS {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {msg}")
        return False


def reshape_kernel(x_ref, o_ref, *, out_shape):
    o_ref[...] = x_ref[...].reshape(out_shape)


def mk_reshape(in_shape, out_shape, dtype=jnp.bfloat16):
    x = jnp.zeros(in_shape, dtype)

    def f(x):
        return pl.pallas_call(
            functools.partial(reshape_kernel, out_shape=out_shape),
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
        )(x)

    return f, x


def dot3d2d_kernel(y_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        y_ref[...], w_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def mk_dot3d2d(l):
    y = jnp.zeros((32, l, 1536), jnp.bfloat16)
    w = jnp.zeros((1536, 96), jnp.bfloat16)

    def f(y, w):
        return pl.pallas_call(
            dot3d2d_kernel,
            out_shape=jax.ShapeDtypeStruct((32, l, 96), jnp.bfloat16),
        )(y, w)

    return f, y, w


def storesplit_kernel(x_ref, o_ref):
    # (544, 96) -> (32, 17, 96) via 32 static sublane slices
    for b in range(32):
        o_ref[b] = x_ref[b * 17 : (b + 1) * 17, :]


def mk_storesplit():
    x = jnp.zeros((544, 96), jnp.bfloat16)

    def f(x):
        return pl.pallas_call(
            storesplit_kernel,
            out_shape=jax.ShapeDtypeStruct((32, 17, 96), jnp.bfloat16),
        )(x)

    return f, x


def main():
    print("devices:", jax.devices())
    results = {}
    f, x = mk_reshape((32, 17, 96), (544, 96))
    results["merge3to2"] = probe("merge3to2", f, x)
    f, x = mk_reshape((544, 96), (32, 17, 96))
    results["split17"] = probe("split17", f, x)
    f, x = mk_reshape((768, 96), (32, 24, 96))
    results["split24"] = probe("split24", f, x)
    f, x = mk_reshape((256, 96), (32, 8, 96))
    results["split8"] = probe("split8", f, x)
    f, y, w = mk_dot3d2d(17)
    results["dot3d2d"] = probe("dot3d2d_l17", f, y, w)
    f, y, w = mk_dot3d2d(24)
    results["dot3d2d_24"] = probe("dot3d2d_l24", f, y, w)
    f, x = mk_storesplit()
    results["storesplit"] = probe("storesplit", f, x)
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
