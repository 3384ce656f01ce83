"""Feasibility: does Mosaic (Pallas-TPU) lower int8 x int8 -> int32 dots
onto the v5e MXU, and at what rate vs a bf16 Pallas dot?

Gate for an int8 flash-attention kernel on the extraction path: the
XLA-level W8A8 dense already rides the doubled int8 MAC rate
(tools/probe_int8.py); this checks the same primitive INSIDE a Pallas
kernel (Mosaic has historically rejected non-f32 accumulators for some
dot forms — the flash kernels pin preferred_element_type=f32 today).

Usage: python tools/probe_pallas_int8.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchlib import timed  # noqa: E402


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    M = N = K = 1024

    def kern_i8(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def kern_bf16(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K), np.int32), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N), np.int32), jnp.int8)
    a16 = a8.astype(jnp.bfloat16)
    b16 = b8.astype(jnp.bfloat16)

    f_i8 = pl.pallas_call(
        kern_i8, out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))
    f_bf = pl.pallas_call(
        kern_bf16, out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32))

    # correctness first
    try:
        got = np.asarray(jax.jit(f_i8)(a8, b8))
    except Exception as e:
        print(f"int8 pallas dot REJECTED: {str(e)[:300]}")
        return
    want = np.asarray(a8, np.int32) @ np.asarray(b8, np.int32)
    ok = (got == want).all()
    print(f"int8 pallas dot compiles; exact: {ok}")

    # larger shape for rate comparison (amortize overhead); gridded over
    # M so the s32 out tile stays inside the 16M scoped-VMEM budget
    M2, K2, N2, BM = 8192, 1024, 1024, 512
    a8L = jnp.asarray(rng.integers(-127, 127, (M2, K2), np.int32), jnp.int8)
    b8L = jnp.asarray(rng.integers(-127, 127, (K2, N2), np.int32), jnp.int8)
    a16L, b16L = a8L.astype(jnp.bfloat16), b8L.astype(jnp.bfloat16)

    def gridded(kern, out_dtype):
        return pl.pallas_call(
            kern,
            grid=(M2 // BM,),
            in_specs=[pl.BlockSpec((BM, K2), lambda i: (i, 0)),
                      pl.BlockSpec((K2, N2), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((BM, N2), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M2, N2), out_dtype),
        )

    fi = gridded(kern_i8, jnp.int32)
    fb = gridded(kern_bf16, jnp.float32)
    floor = timed(lambda _, x: x * jnp.int8(1), None, a8L, reps=64)
    t8 = timed(lambda _, x: fi(x, b8L), None, a8L, reps=64) - floor
    t16 = timed(lambda _, x: fb(x, b16L), None, a16L, reps=64) - floor
    print(f"pallas dot [8192,1024]x[1024,1024]: "
          f"bf16 {t16:.3f} ms, int8 {t8:.3f} ms ({t16 / t8:.2f}x)")


if __name__ == "__main__":
    main()
