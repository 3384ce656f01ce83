"""Pallas TPU flash attention (non-causal, no masking).

Online-softmax attention: the ``[N, N]`` score matrix is never
materialised in HBM.  Each grid step owns one query block held in VMEM,
streams key/value blocks, and maintains running max / normaliser / output
accumulator in fp32 (MXU matmuls via ``jnp.dot`` with
``preferred_element_type``).

This replaces the reference's eager ``attn = softmax(q @ k.T) @ v``
(``pretraining/predictive/vision_transformer.py:203-207``) for sequence
lengths where HBM traffic on the score matrix dominates.  For the
reference-scale 1568-token ViT the XLA path in
:mod:`bvc_tpu.ops.attention` is already compute-bound; this kernel is the
scaling path (longer clips / higher resolution).

Grid: ``(B, h, N // block_q)``; within a step, a ``lax.fori_loop`` over
``N // block_k`` key blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; interpret mode is used in tests
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    q = q_ref[0, 0].astype(jnp.float32) * scale  # [block_q, d]
    block_q, d = q.shape
    n_kv = k_ref.shape[2]
    num_kb = n_kv // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _pick_block(n: int, preferred: int) -> int:
    b = min(preferred, n)
    while n % b:
        b //= 2
    return max(b, 1)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention over ``[B, N, h, d]`` q/k/v (same layout as
    :func:`bvc_tpu.ops.attention.multi_head_attention`)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, N, h, d = q.shape
    bq = _pick_block(N, block_q)
    bk = _pick_block(N, block_k)

    # [B, N, h, d] → [B, h, N, d] for contiguous per-head streaming
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (B, h, N // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
            pl.BlockSpec((1, 1, N, d), lambda b, hh, i: (b, hh, 0, 0)),
            pl.BlockSpec((1, 1, N, d), lambda b, hh, i: (b, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, h, N, d), q.dtype),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)
