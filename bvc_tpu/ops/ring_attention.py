"""Ring attention over a mesh-sharded sequence axis (context parallelism).

The reference needs no sequence parallelism — its longest sequence is the
1568-token VideoMAE grid and every model fits one accelerator (SURVEY.md
§5 "Long-context / sequence parallelism: none").  This module is the
TPU-native extension point that section names for longer clips: the token
axis lives sharded over a mesh axis, K/V blocks rotate around the ring
with ``lax.ppermute`` (pure neighbor traffic on the ICI torus), and each
hop's partial attention is merged with the numerically-stable online
softmax — the flash-attention recurrence lifted from VMEM tiles to mesh
shards.

Called INSIDE ``shard_map`` with q/k/v already sequence-local
(``[B, n_local, h, d]``); see :mod:`bvc_tpu.parallel.seqpar` for the
model-level wiring.  No chip ever materialises more than the
``[B, h, n_local, n_local]`` per-hop score block, so attention memory per
chip scales as ``(N/S)^2`` instead of ``N^2``.

Backward: each hop is wrapped in ``jax.checkpoint`` so score blocks are
recomputed, not stored; AD differentiates through ``ppermute`` (its
transpose is the inverse permute), so gradients ring back along the same
neighbor links.  Residual memory is therefore O(N·d) (the rotated KV
blocks), never O(N^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # matches bvc_tpu.ops.attention._xla_attention's mask bias


@functools.partial(jax.checkpoint, static_argnums=(5,))
def _block_update(carry, q, k_blk, v_blk, mask_blk, scale):
    """One online-softmax accumulation against a single KV block.

    carry = (m [B,h,nq] running max, l [B,h,nq] running sum-exp,
    o [B,nq,h,d] f32 accumulator).  Checkpointed: the [B,h,nq,nk] score
    block is recomputed in backward instead of stored.
    """
    m, l, o = carry
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_blk, preferred_element_type=jnp.float32
    ) * scale
    if mask_blk is not None:
        s = s + jnp.where(mask_blk[:, None, None, :], 0.0, _NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    # m starts at -inf: exp(-inf - finite) = 0 — the first block simply
    # overwrites the carry.  s is bounded below by _NEG_INF (finite), so
    # m_new is finite after the first block and no nan can form.
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None])
    l = l * alpha + jnp.sum(p, axis=-1)
    o = o * alpha.transpose(0, 2, 1)[..., None] + jnp.einsum(
        "bhqk,bkhd->bqhd", p, v_blk, preferred_element_type=jnp.float32
    )
    return m_new, l, o


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: float | None = None,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact global attention over a sequence sharded on ``axis_name``.

    ``q``, ``k``, ``v``: ``[B, n_local, h, d]`` — this shard's contiguous
    block of the global sequence.  ``key_mask``: optional ``[B, n_local]``
    bool for this shard's keys (True = attendable); it rotates around the
    ring with its KV block.  Returns this shard's output block
    ``[B, n_local, h, d]`` in ``q.dtype``, bitwise-independent of the
    shard count up to float accumulation order (equivalence vs the dense
    path is tested on the 8-device CPU mesh).

    Communication: S−1 ``ppermute`` hops of the local KV (+mask) block;
    each hop's matmuls overlap the next hop's transfer under XLA's async
    collective scheduling.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_shards = jax.lax.axis_size(axis_name)
    B, nq, h, d = q.shape
    m = jnp.full((B, h, nq), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, h, nq), jnp.float32)
    o = jnp.zeros((B, nq, h, d), jnp.float32)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    k_blk, v_blk, mask_blk = k, v, key_mask
    carry = (m, l, o)
    for hop in range(n_shards):
        carry = _block_update(carry, q, k_blk, v_blk, mask_blk, scale)
        if hop < n_shards - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            if mask_blk is not None:
                mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
    _, l, o = carry
    return (o / l.transpose(0, 2, 1)[..., None]).astype(q.dtype)
