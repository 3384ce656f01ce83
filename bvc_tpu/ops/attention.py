"""Multi-head attention for the ViT stacks.

The reference materialises the full ``[B, h, N, N]`` attention matrix in
eager torch (``predictive/vision_transformer.py:198-210``).  Here the
default path is XLA attention (einsum + softmax — XLA fuses the softmax
chain and tiles the matmuls onto the MXU; at the framework's native
sequence lengths, 1568 tokens x 64 head-dim, this is already
compute-bound), and a Pallas flash-attention kernel
(:mod:`bvc_tpu.ops.flash_attention`) is used on TPU for long sequences
where the O(N^2) HBM traffic of the naive path starts to dominate.

Interface is functional: caller supplies already-projected q, k, v of
shape ``[B, N, h, d]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 'auto' routes a MASKED attention to the key-bias flash kernels once the
# XLA path's f32 [B, h, Nq, Nk] score tensor would exceed this many bytes
# per op — below it XLA's fused backward wins on time (212 vs 164 clips/s
# in the real JEPA step at bs 64), above it the replicated score temps
# (x remat copies) are what OOM JEPA at 128 clips/chip (PERFORMANCE.md
# "Masked flash attention").  768 MiB keeps the bs-64 predictor
# ([256,12,209,209] ≈ 536 MB) on XLA and sends bs 128 (≈ 1.07 GB) to
# flash.
MASKED_XLA_SCORE_BYTES_LIMIT = 768 * 2**20


def masked_auto_impl(batch: int, heads: int, n_q: int, n_k: int,
                     on_tpu: bool, bytes_per_elem: int = 4) -> str:
    """Routing rule for masked 'auto'/'xla_bf16' attention
    (unit-testable).  ``bytes_per_elem``: 4 for f32 score storage, 2 for
    bf16 (xla_bf16 halves the score tensor, doubling the batch the XLA
    path can hold)."""
    if not on_tpu:
        return "xla"
    score_bytes = batch * heads * n_q * n_k * bytes_per_elem
    return "flash" if score_bytes > MASKED_XLA_SCORE_BYTES_LIMIT else "xla"


def _xla_attention(q, k, v, scale, key_mask=None, score_dtype=None):
    # score_dtype=bf16 materialises the [B,h,N,N] logits in bf16 (half
    # the HBM traffic of the attention's dominant tensor; softmax math
    # stays f32 in-registers after the fused upcast).  This is the same
    # quantization point torch autocast-bf16 produces — the reference's
    # qk matmul emits bf16 and torch softmax upcasts
    # (pretrain_jepa.py:405-409) — measured 12.4 -> 9.3 ms/layer at the
    # JEPA target shape [64,392,12,64] (tools/probe_softmax_dtype.py).
    sd = score_dtype or jnp.float32
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=sd)
    logits = (logits.astype(jnp.float32) if sd != jnp.float32 else logits) * scale
    if key_mask is not None:
        # [B, Nk] bool, True = attendable; padded keys get -inf
        bias = jnp.where(key_mask[:, None, None, :], 0.0, -1e30)
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=q.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    impl: str = "auto",
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over ``[B, N, h, d]`` tensors.

    ``impl``: 'auto' | 'xla' | 'xla_bf16' | 'flash' | 'ring:<axis>'.
    'auto' picks flash on TPU for long unmasked sequences and XLA
    otherwise.  'ring:<axis>' is sequence-parallel attention for callers
    inside ``shard_map`` whose token axis is sharded over mesh axis
    ``<axis>`` (:mod:`bvc_tpu.ops.ring_attention`).  ``key_mask``
    (``[B, N]`` bool, True = valid) makes padded tokens invisible to
    every query — the static-shape JEPA mask padding; masked 'auto'
    stays on XLA (measured faster end-to-end), while ``impl='flash'``
    opts into the key-bias flash kernels (no f32 [B,h,N,N] HBM temps —
    the memory-bound escape hatch, see PERFORMANCE.md).

    ``'xla_bf16'`` stores the materialised logits in bf16 (softmax math
    still f32; see :func:`_xla_attention`) — only the XLA path can do
    this (Mosaic rejects non-f32 matmul accumulators).  Used by the
    no-grad JEPA target encoder, whose reference runs under torch
    autocast-bf16 and therefore quantizes its logits identically.  At
    long unmasked sequences (the flash regime, n ≥ 512) it defers to
    flash: even bf16 [B,h,N,N] logits are the memory/bandwidth evil the
    flash kernels exist to avoid, and the bf16 win was measured in the
    short-sequence XLA regime (392 tokens).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl.startswith("ring:"):
        # sequence-parallel attention: q/k/v are this shard's block of a
        # sequence sharded over the named mesh axis (call sites live
        # inside shard_map — bvc_tpu/parallel/seqpar.py)
        from bvc_tpu.ops.ring_attention import ring_attention

        return ring_attention(
            q, k, v, impl.split(":", 1)[1], scale=scale, key_mask=key_mask
        )
    n = q.shape[1]
    if impl == "xla_bf16":
        on_tpu = jax.default_backend() == "tpu"
        if n >= 512 and on_tpu:
            # long sequences: defer to flash whether masked or not —
            # even bf16 [B,h,N,N] logits are the HBM temp flash avoids
            # (masked calls take the key-bias kernels)
            impl = "flash"
        elif key_mask is not None and masked_auto_impl(
                q.shape[0], q.shape[2], n, k.shape[1], on_tpu,
                bytes_per_elem=2) == "flash":
            # memory routing applies to bf16-stored scores too (at half
            # the bytes): without this, autocast_scores would bypass the
            # big-batch escape hatch entirely
            impl = "flash"
        else:
            return _xla_attention(q, k, v, scale, key_mask, jnp.bfloat16)
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        if key_mask is None:
            # flash wins once the N^2 score matrix stops fitting the
            # cache hierarchy; measured crossover on v5e is below 512
            impl = "flash" if (on_tpu and n >= 512) else "xla"
        else:
            # masked: XLA measured FASTER in the real JEPA step (212 vs
            # 164 clips/s at bs 64 — the bias kernels' fwd matches XLA
            # but their backward loses, tools/probe_attn.py + A/B in
            # PERFORMANCE.md) — UNLESS the f32 score tensor is big
            # enough that its HBM residency becomes the binding
            # constraint, where the key-bias flash kernels (which never
            # materialise it) trade ~20% step time for not OOMing.
            impl = masked_auto_impl(q.shape[0], q.shape[2], n, k.shape[1],
                                    on_tpu)
    if impl == "flash":
        from bvc_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, key_mask=key_mask)
    return _xla_attention(q, k, v, scale, key_mask)
