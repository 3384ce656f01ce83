"""Pallas TPU flash attention (non-causal) with custom VJP.

Online-softmax attention: the ``[N, N]`` score matrix never touches HBM,
in forward *or* backward.  Motivation (measured on v5e, VideoMAE-B
decoder shape ``[16, 1568, 6, 64]``): XLA attention fwd+bwd is ~10.6 ms
per layer — ~50% of the whole train step across the 12+4 layers — and
runs at ~10% MXU because it streams the 16x6x1568^2 probability matrix
through HBM.  Flash blocks keep scores in VMEM.

Two dispatch paths (measured on v5e at the decoder shape
``[32, 1568, 6, 64]``, see PERFORMANCE.md):

- **divisor path** (N divisible by the dtype sublane tile): blocks are
  exact divisors of N — no padding, and therefore NO key masking at all.
  The kernel is VPU-roofline-bound (softmax elementwise at ~24 Gelem/s
  measured), so every removed elementwise pass counts: dropping the
  per-block iota/compare/where mask and folding the softmax scale into q
  outside the kernel took fwd from 6.1 → 4.9 ms.
- **padded fallback** (any other N): inputs padded to a 128 multiple and
  padded *keys* masked with -inf inside the kernel (padded query rows
  produce garbage and are sliced off).

Block sizes MUST divide the (padded) sequence length — pallas grids
truncate silently otherwise; ``_pick_block`` guarantees it on both paths.

Backward uses the standard flash recurrences with residuals (o, lse),
over the PRE-SCALED queries Qs = s*Q (the softmax scale reaches dQ via
the outer autodiff of ``q * scale``, so no kernel touches it):

    D_i  = rowsum(dO_i * O_i)
    P_ij = exp(Qs_i K_j^T - lse_i)
    dQs_i = sum_j (P_ij * (dO_i V_j^T - D_i)) K_j
    dK_j  = sum_i (P_ij * (dO_i V_j^T - D_i))^T Qs_i
    dV_j  = sum_i P_ij^T dO_i

Replaces the reference's eager ``softmax(q@k.T)@v``
(``pretraining/predictive/vision_transformer.py:203-207``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _pick_block(n: int, preferred: int, sub: int = 8) -> int:
    """Largest divisor of ``n`` that is ≤ ``preferred`` and a multiple of
    the sublane tile ``sub`` (pallas grids silently truncate when a block
    does not divide the dim — divisibility is a CORRECTNESS requirement,
    not a performance one).  Falls back to ``n`` itself."""
    best = None
    for b in range(sub, min(preferred, n) + 1, sub):
        if n % b == 0:
            best = b
    return best or n


def _kmask(base_col: int, bk: int, n_valid: int, rows: int):
    """[rows, bk] additive mask: -inf where the key column is padding."""
    col = base_col + jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
    return jnp.where(col < n_valid, 0.0, _NEG_INF)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref, *, block_k):
    """Per-sample key-bias variant: ``b_ref`` is a ``[1, Np]`` f32 row
    (0 valid / -inf masked-or-padded) shared by every query of the batch
    element — JEPA's static-cap mask padding (``models/jepa.py``).  Kept
    separate from :func:`_fwd_kernel` so the maskless divisor path stays
    add-free (the mask add costs ~20% of a VPU-bound kernel)."""
    q = q_ref[0, 0]  # [bq, d]
    bq, d = q.shape
    n_kv = k_ref.shape[2]
    num_kb = n_kv // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + b_ref[0, :, pl.ds(i * block_k, block_k)]  # [1,bk] bcast
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), (bq, 8))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k, n_valid):
    # keep q/k/v in their storage dtype (bf16): MXU runs bf16 inputs with
    # f32 accumulation ~8x faster than f32 inputs.  q arrives PRE-SCALED
    # (scale folded outside the kernel — one O(N*d) pass instead of an
    # O(N^2) one).  n_valid=None ⇒ no padding ⇒ no key mask (the iota/
    # compare/where mask costs ~20% of the VPU-bound kernel).
    q = q_ref[0, 0]  # [bq, d]
    bq, d = q.shape
    n_kv = k_ref.shape[2]
    num_kb = n_kv // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if n_valid is not None:
            s = s + _kmask(i * block_k, block_k, n_valid, bq)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    # lse is stored with a trailing lane dim of 8 (Mosaic block-shape
    # constraint: last dim must be 128-divisible or full-size)
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), (bq, 8))


def _fwd(q, k, v, block_q, block_k, n_valid, interpret, bias=None):
    B, h, Np, d = q.shape
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    bq = _pick_block(Np, block_q, sub)
    bk = _pick_block(Np, block_k, sub)
    grid = (B, h, Np // bq)
    in_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
        pl.BlockSpec((1, 1, Np, d), lambda b, hh, i: (b, hh, 0, 0)),
        pl.BlockSpec((1, 1, Np, d), lambda b, hh, i: (b, hh, 0, 0)),
    ]
    inputs = [q, k, v]
    if bias is not None:
        kernel = functools.partial(_fwd_kernel_bias, block_k=bk)
        in_specs.append(pl.BlockSpec((1, 1, Np), lambda b, hh, i: (b, 0, 0)))
        inputs.append(bias)
    else:
        kernel = functools.partial(_fwd_kernel, block_k=bk, n_valid=n_valid)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
            pl.BlockSpec((1, 1, bq, 8), lambda b, hh, i: (b, hh, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h, Np, d), q.dtype),
            jax.ShapeDtypeStruct((B, h, Np, 8), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel_bias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, b_ref,
                    dq_ref, *, block_k):
    """Key-bias variant of :func:`_dq_kernel` (see :func:`_fwd_kernel_bias`)."""
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]
    bq, d = q.shape
    n_kv = k_ref.shape[2]
    num_kb = n_kv // block_k

    def body(i, acc):
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + b_ref[0, :, pl.ds(i * block_k, block_k)]
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k.dtype)
        return acc + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = acc.astype(dq_ref.dtype)


def _dkv_kernel_bias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, b_ref,
                     dk_ref, dv_ref, *, block_q):
    """Key-bias variant of :func:`_dkv_kernel`; ``b_ref`` holds the full
    ``[1, 1, Np]`` bias row (a ``(1, 1, bk)`` block would violate the
    Mosaic lane-tiling constraint) and this key block's ``[1, bk]`` slice
    is taken in-kernel at a 128-aligned offset."""
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bk, d = k.shape
    n_q = q_ref.shape[2]
    num_qb = n_q // block_q
    # full [1, Np] bias row; this key block's slice (full-row block keeps
    # the lane layout trivial — Np is always lane-aligned here)
    bias = b_ref[0, :, pl.ds(pl.program_id(2) * bk, bk)]  # [1, bk]

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + bias
        p = jnp.exp(s - lse)
        pc = p.astype(do.dtype)
        dv = dv + jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               *, block_k, n_valid):
    # q PRE-SCALED outside the custom_vjp: autodiff chains the softmax
    # scale through the outer ``q * scale``, so this kernel returns plain
    # dL/dqs = ds @ k — no scale anywhere on the O(N^2) tiles.
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]
    bq, d = q.shape
    n_kv = k_ref.shape[2]
    num_kb = n_kv // block_k

    def body(i, acc):
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if n_valid is not None:
            s = s + _kmask(i * block_k, block_k, n_valid, bq)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k.dtype)
        return acc + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = acc.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                *, block_q, n_valid):
    # dL/dk = dsT @ qs needs NO extra scale: qs already carries it.
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bk, d = k.shape
    n_q = q_ref.shape[2]
    num_qb = n_q // block_q
    base_col = pl.program_id(2) * bk

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if n_valid is not None:
            s = s + _kmask(base_col, bk, n_valid, block_q)
        p = jnp.exp(s - lse)
        pc = p.astype(do.dtype)
        dv = dv + jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd(q, k, v, o, lse, do, block_q, block_k, n_valid, interpret, bias=None):
    B, h, Np, d = q.shape
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    bq = _pick_block(Np, block_q, sub)
    bk = _pick_block(Np, block_k, sub)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (8,))  # lane-pad

    dq_specs = [
        pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
        pl.BlockSpec((1, 1, Np, d), lambda b, hh, i: (b, hh, 0, 0)),
        pl.BlockSpec((1, 1, Np, d), lambda b, hh, i: (b, hh, 0, 0)),
        pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
        pl.BlockSpec((1, 1, bq, 8), lambda b, hh, i: (b, hh, i, 0)),
        pl.BlockSpec((1, 1, bq, 8), lambda b, hh, i: (b, hh, i, 0)),
    ]
    dq_inputs = [q, k, v, do, lse, delta]
    if bias is not None:
        dq_kernel = functools.partial(_dq_kernel_bias, block_k=bk)
        dq_specs.append(pl.BlockSpec((1, 1, Np), lambda b, hh, i: (b, 0, 0)))
        dq_inputs.append(bias)
    else:
        dq_kernel = functools.partial(_dq_kernel, block_k=bk, n_valid=n_valid)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, h, Np // bq),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b, hh, i: (b, hh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, h, Np, d), q.dtype),
        interpret=interpret,
    )(*dq_inputs)

    dkv_specs = [
        pl.BlockSpec((1, 1, Np, d), lambda b, hh, j: (b, hh, 0, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b, hh, j: (b, hh, j, 0)),
        pl.BlockSpec((1, 1, bk, d), lambda b, hh, j: (b, hh, j, 0)),
        pl.BlockSpec((1, 1, Np, d), lambda b, hh, j: (b, hh, 0, 0)),
        pl.BlockSpec((1, 1, Np, 8), lambda b, hh, j: (b, hh, 0, 0)),
        pl.BlockSpec((1, 1, Np, 8), lambda b, hh, j: (b, hh, 0, 0)),
    ]
    dkv_inputs = [q, k, v, do, lse, delta]
    if bias is not None:
        dkv_kernel = functools.partial(_dkv_kernel_bias, block_q=bq)
        dkv_specs.append(pl.BlockSpec((1, 1, Np), lambda b, hh, j: (b, 0, 0)))
        dkv_inputs.append(bias)
    else:
        dkv_kernel = functools.partial(_dkv_kernel, block_q=bq, n_valid=n_valid)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, h, Np // bk),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), lambda b, hh, j: (b, hh, j, 0)),
            pl.BlockSpec((1, 1, bk, d), lambda b, hh, j: (b, hh, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h, Np, d), q.dtype),
            jax.ShapeDtypeStruct((B, h, Np, d), q.dtype),
        ],
        interpret=interpret,
    )(*dkv_inputs)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


# _flash takes PRE-SCALED q; ``scale`` is only consumed by the dq
# epilogue (chain rule through qs = q * scale).  n_valid=None ⇒ the
# unpadded maskless divisor path.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(qs, k, v, fwd_bq, fwd_bk, bwd_bq, bwd_bk, n_valid, interpret):
    o, _ = _fwd(qs, k, v, fwd_bq, fwd_bk, n_valid, interpret)
    return o


def _flash_fwd_rule(qs, k, v, fwd_bq, fwd_bk, bwd_bq, bwd_bk,
                    n_valid, interpret):
    o, lse = _fwd(qs, k, v, fwd_bq, fwd_bk, n_valid, interpret)
    return o, (qs, k, v, o, lse)


def _flash_bwd_rule(fwd_bq, fwd_bk, bwd_bq, bwd_bk, n_valid,
                    interpret, res, do):
    qs, k, v, o, lse = res
    dqs, dk, dv = _bwd(qs, k, v, o, lse, do, bwd_bq, bwd_bk,
                       n_valid, interpret)
    return dqs, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# Key-bias variant: ``bias`` [B, Np] f32 (0 = attendable, -inf = masked
# key or padding) is a differentiable-position arg with a structurally
# zero cotangent (the mask is data, not parameters).
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_b(qs, k, v, bias, fwd_bq, fwd_bk, bwd_bq, bwd_bk, interpret):
    o, _ = _fwd(qs, k, v, fwd_bq, fwd_bk, None, interpret, bias=bias)
    return o


def _flash_b_fwd_rule(qs, k, v, bias, fwd_bq, fwd_bk, bwd_bq, bwd_bk,
                      interpret):
    o, lse = _fwd(qs, k, v, fwd_bq, fwd_bk, None, interpret, bias=bias)
    return o, (qs, k, v, bias, o, lse)


def _flash_b_bwd_rule(fwd_bq, fwd_bk, bwd_bq, bwd_bk, interpret, res, do):
    qs, k, v, bias, o, lse = res
    dqs, dk, dv = _bwd(qs, k, v, o, lse, do, bwd_bq, bwd_bk, None,
                       interpret, bias=bias)
    return dqs, dk, dv, jnp.zeros_like(bias)


_flash_b.defvjp(_flash_b_fwd_rule, _flash_b_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 784,
    block_k: int | None = None,
    bwd_block_q: int = 784,
    bwd_block_k: int | None = None,
    interpret: bool = False,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Attention over ``[B, N, h, d]`` q/k/v (the layout of
    :func:`bvc_tpu.ops.attention.multi_head_attention`); differentiable;
    N may be any length (divisor-blocked when N is a sublane multiple,
    padded to a 128 multiple with key masking otherwise).

    ``key_mask`` (``[B, N]`` bool, True = attendable) selects the
    per-sample key-bias kernels — one ``[1, bk]`` f32 add per score tile
    over the maskless path; sequence padding folds into the same bias.
    Semantics match ``_xla_attention(key_mask=...)`` (padded JEPA masks).

    Block preferences are snapped DOWN to exact divisors of the (padded)
    sequence; the defaults are the measured v5e optimum at the VideoMAE-B
    decoder shape ``[32, 1568, 6, 64]`` (PERFORMANCE.md).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, N, h, d = q.shape
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    if key_mask is not None:
        # the bias row must be lane-aligned; pad to a 128 multiple
        pad = (-N) % 128
    else:
        pad = 0 if N % sub == 0 else (-N) % 128
    Np = N + pad
    n_valid = None if pad == 0 else N

    def prep(x):
        x = x.transpose(0, 2, 1, 3)  # [B, h, N, d]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    qt = prep((q * scale).astype(q.dtype))
    kt, vt = prep(k), prep(v)
    # VMEM guard for the fwd q-block: the f32 score tile is bq x bk
    bq_cap = max(sub, (6 * 2**20) // (Np * 4) // sub * sub)
    bq = _pick_block(Np, min(block_q, bq_cap), sub)
    # measured on v5e: keeping the whole K/V in VMEM beats chunked
    # streaming (the fori_loop dynamic slices defeat Mosaic's
    # pipelining); fall back to 1024-chunks when K/V would blow VMEM.
    kv_bytes = 2 * Np * d * qt.dtype.itemsize
    full_kv = Np if kv_bytes <= 4 * 2**20 else 1024
    bk = _pick_block(Np, full_kv if block_k is None else block_k, sub)
    bbq = _pick_block(Np, bwd_block_q, sub)
    if bwd_block_k is None:
        # Backward auto block: full-KV also wins in the backward
        # (block-sweep at the [48, 1568, 6, 64] decoder shape:
        # bwd_bk=1568 beats 784 by ~18% fwd+bwd standalone, and the
        # masked JEPA step gained +12% end-to-end) — BUT on the
        # unmasked path the FULL flagship train-step program with
        # bwd_bk=1568 reproducibly crashes this environment's remote
        # compile helper (HTTP 500, 6/6 attempts across bs 48/32/16,
        # PERFORMANCE.md round-4 addendum) even though the kernel
        # compiles and runs standalone.  So: full-KV where it is
        # proven end-to-end (the masked/bias path), the measured-safe
        # 784 elsewhere; pass bwd_block_k explicitly (or set the
        # BVC_FLASH_BWD_BK env var) to override.
        import os as _os

        env_bk = _os.environ.get("BVC_FLASH_BWD_BK")
        if env_bk:
            bwd_block_k = int(env_bk)
        else:
            bwd_block_k = full_kv if key_mask is not None else 784
    bbk = _pick_block(Np, bwd_block_k, sub)
    if key_mask is not None:
        # the bias kernels dynamically slice the LANE dim of the [1, Np]
        # bias row at key-block offsets — Mosaic requires those to be
        # 128-aligned, so masked key blocks must be 128 multiples (Np is
        # one, so a 128-multiple divisor always exists)
        bk = _pick_block(Np, max(bk, 128), 128)
        bbk = _pick_block(Np, max(bbk, 128), 128)
        bias = jnp.where(key_mask, 0.0, _NEG_INF).astype(jnp.float32)
        if pad:
            bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=_NEG_INF)
        # [B, 1, Np]: Mosaic block shapes must match the array on the
        # sublane dim, so the bias carries an explicit singleton row
        out = _flash_b(qt, kt, vt, bias[:, None, :], bq, bk, bbq, bbk, interpret)
    else:
        out = _flash(qt, kt, vt, bq, bk, bbq, bbk, n_valid, interpret)
    if pad:
        out = out[:, :, :N]
    return out.transpose(0, 2, 1, 3)
