"""Is s8 x s8 -> s32 dot actually 2x bf16 on this chip?

The v5e MXU doubles its MAC rate for int8 operands (394 TOPS vs 197
TFLOPS bf16).  Before building a quantized extraction path, verify the
XLA lowering reaches that rate at the ViT-B extraction shapes, and
measure the cost of the dynamic per-token activation-quant pass that a
W8A8 dense needs.

Usage: python tools/probe_int8.py [M] [reps]
"""

from __future__ import annotations

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

    # extraction hot shape: x [B*N, D] @ w [D, Dout] for the ViT-B qkv
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 64 * 1568
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    D, DOUT = 768, 2304
    rng = np.random.default_rng(0)
    x16 = jax.device_put(jnp.asarray(
        rng.standard_normal((M, D)), jnp.bfloat16))
    w16 = jax.device_put(jnp.asarray(
        rng.standard_normal((D, DOUT)), jnp.bfloat16))
    x8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (M, D)), jnp.int8))
    w8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (D, DOUT)), jnp.int8))
    wscale = jax.device_put(jnp.asarray(
        rng.standard_normal((DOUT,)) ** 2 + 0.01, jnp.float32))

    floor = timed(lambda _, v: v * jnp.bfloat16(1.0001), None, x16, reps=reps)
    print(f"M={M} D={D} DOUT={DOUT} reps={reps} floor={floor:.2f} ms")
    flops = 2 * M * D * DOUT

    def report(name, t):
        t -= floor
        # flops / t[ms] / 1e9 = GFLOP/ms = TOP/s
        print(f"{name:34s} {t:7.2f} ms  {flops / t / 1e9:7.1f} TOP/s")
        return t

    t16 = report("bf16 dot (f32 acc)", timed(
        lambda _, v: jnp.dot(v, w16, preferred_element_type=jnp.float32),
        None, x16, reps=reps))

    t8 = report("s8 dot (s32 acc)", timed(
        lambda _, v: jax.lax.dot_general(
            v, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32),
        None, x8, reps=reps))

    # the full W8A8 dense: dynamic per-token quant + dot + dequant
    def qdense(_, v):
        amax = jnp.max(jnp.abs(v).astype(jnp.float32), axis=-1,
                       keepdims=True)
        xscale = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(v.astype(jnp.float32) / xscale),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xscale
                * wscale[None, :]).astype(jnp.bfloat16)

    tq = report("W8A8 dense (quant+dot+dequant)", timed(
        qdense, None, x16, reps=reps))

    print(f"\ns8/bf16 dot speedup: {t16 / t8:.2f}x; "
          f"full W8A8 vs bf16 dense: {t16 / tq:.2f}x")


if __name__ == "__main__":
    main()
