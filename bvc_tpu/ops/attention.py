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


def _xla_attention(q, k, v, scale, key_mask=None):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
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

    ``impl``: 'auto' | 'xla' | 'flash'.  'auto' picks flash on TPU for
    long unmasked sequences and XLA otherwise.  ``key_mask`` (``[B, N]``
    bool, True = valid) makes padded tokens invisible to every query —
    the static-shape JEPA mask padding; masked 'auto' stays on XLA
    (measured faster end-to-end), while ``impl='flash'`` opts into the
    key-bias flash kernels (no f32 [B,h,N,N] HBM temps — the
    memory-bound escape hatch, see PERFORMANCE.md).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = q.shape[1]
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
            # PERFORMANCE.md).  The key-bias flash kernels remain opt-in
            # (impl='flash') for memory-bound cases: they never
            # materialise the f32 [B,h,N,N] scores that OOM JEPA at
            # 128 clips/chip.
            impl = "xla"
    if impl == "flash":
        from bvc_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, key_mask=key_mask)
    return _xla_attention(q, k, v, scale, key_mask)
