"""Probe: is the flash-attention softmax VPU wall byte-bound or
element-bound?

The fwd kernel's elementwise passes (rowmax, exp, rowsum, cast) over the
[bq, N] score tile run at ~24 Gelem/s f32 on v5e (PERFORMANCE.md) — the
measured wall for both flash and XLA attention at the JEPA target-encoder
shape.  If that rate is VMEM/VREG *byte* bandwidth, computing the scores
in bf16 (MXU preferred_element_type=bf16, exp/max/sum in bf16) should
nearly double the pass rate; if it is per-*element* issue rate, bf16 buys
nothing.  This probe times self-contained copies of the fwd kernel with
f32 vs bf16 score arithmetic at:

- [64, 12, 392, 64]  — JEPA target-encoder (no-grad, fwd-only: the one
  place reduced-precision scores would be safe to deploy)
- [48, 6, 1568, 64]  — VideoMAE decoder fwd

plus a max-abs-error readout vs the f32 kernel.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from _benchlib import timed as _timed


def timed(fn, args):
    """Adapter onto the shared harness: perturb/chain through the first
    array, treat the rest as params (same pattern as probe_attn.py)."""
    rest = tuple(args[1:])
    return _timed(lambda r, x0: fn(x0, *r), rest, args[0])


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, score_dtype):
    q = q_ref[0, 0]  # [bq, d], bf16, pre-scaled
    k = k_ref[0, 0]  # [N, d]
    v = v_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=score_dtype)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def fwd(q, k, v, bq, score_dtype):
    B, h, N, d = q.shape
    kernel = functools.partial(_fwd_kernel, score_dtype=score_dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, h, N // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
            pl.BlockSpec((1, 1, N, d), lambda b, hh, i: (b, hh, 0, 0)),
            pl.BlockSpec((1, 1, N, d), lambda b, hh, i: (b, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, h, N, d), q.dtype),
    )(q, k, v)


def xla_attn(q, k, v, score_dtype):
    # q/k/v [B, h, N, d]; mirrors ops.attention._xla_attention with a
    # selectable logits dtype (f32 = production; bf16 halves the HBM
    # traffic of the materialised [B,h,N,N] logits)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=score_dtype)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    probs = (p / l.astype(p.dtype)).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=q.dtype)


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    rng = np.random.default_rng(0)
    # XLA path at the REAL (unpadded) JEPA target-encoder shape
    B, h, N, d = 64, 12, 392, 64
    q = jnp.asarray(rng.standard_normal((B, h, N, d)) * 0.125, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, h, N, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, h, N, d)), jnp.bfloat16)
    out = {}
    for name, sd in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        ms = timed(lambda qq, kk, vv: xla_attn(qq, kk, vv, sd), (q, k, v))
        out[name] = round(ms, 3)
    a = xla_attn(q, k, v, jnp.float32)
    b = xla_attn(q, k, v, jnp.bfloat16)
    out["max_abs_err"] = round(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), 5)
    print(json.dumps({"impl": "xla", "shape": [B, h, N, d], **out}), flush=True)
    # N=512 mimics the padded JEPA target shape (392 → 512: bf16 tiles
    # need 16-multiples and 392 has no 16-multiple divisor); 1568 is the
    # VideoMAE decoder divisor path.
    for (B, h, N, d), bq in (((64, 12, 512, 64), 512), ((48, 6, 1568, 64), 784)):
        q = jnp.asarray(rng.standard_normal((B, h, N, d)) * 0.125, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, h, N, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, h, N, d)), jnp.bfloat16)
        out = {}
        for name, sd in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            try:
                ms = timed(lambda qq, kk, vv: fwd(qq, kk, vv, bq, sd), (q, k, v))
                out[name] = round(ms, 3)
            except Exception as e:
                out[name] = f"failed: {e}"
        try:
            a = fwd(q, k, v, bq, jnp.float32)
            b = fwd(q, k, v, bq, jnp.bfloat16)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
            out["max_abs_err"] = round(err, 5)
        except Exception as e:
            out["max_abs_err"] = f"failed: {e}"
        print(json.dumps({"shape": [B, h, N, d], "block_q": bq, **out}),
              flush=True)


if __name__ == "__main__":
    main()
