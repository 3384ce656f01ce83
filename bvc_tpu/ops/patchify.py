"""Tubelet patch embedding as one MXU-shaped matmul.

The reference embeds video with ``nn.Conv3d(kernel=stride=(ts,p,p))``
(``pretraining/predictive/vision_transformer.py:250-255``); a
stride-equals-kernel conv is exactly a blocked reshape followed by a dense
projection, so on TPU we express it that way: one ``[B*N, ts*p*p*C] @
[ts*p*p*C, D]`` matmul that XLA tiles straight onto the 128x128 systolic
array, with no conv window machinery.

Canonical video layout throughout the framework is ``[B, T, H, W, C]``
(channels-last — the TPU-friendly layout; the reference uses torch's
``[B, T, C, H, W]``).

Patch flattening order matches torch ``Conv3d`` weight layout
``[D, C, ts, p, p]`` transposed to ``[C, ts, p, p] → flat``, i.e. the flat
axis iterates (c, dt, dh, dw) slowest→fastest.  Keeping this fixed makes
torch-checkpoint import a pure transpose.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify_pixels(video: jnp.ndarray, tubelet_size: int, patch_size: int) -> jnp.ndarray:
    """``[B,T,H,W,C] → [B, N, ts*p*p*C]`` tubelet pixel blocks.

    N = (T/ts)·(H/p)·(W/p), ordered time-major then row-major over the
    spatial grid (the ordering both VideoMAE's loss targets and the mask
    generators assume).  Flat feature axis iterates (c, dt, dh, dw).
    """
    B, T, H, W, C = video.shape
    ts, p = tubelet_size, patch_size
    x = video.reshape(B, T // ts, ts, H // p, p, W // p, p, C)
    # → [B, T/ts, H/p, W/p, C, ts, p, p]
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(B, (T // ts) * (H // p) * (W // p), C * ts * p * p)


def tubelet_patchify(
    video: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    tubelet_size: int,
    patch_size: int,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Patch embedding: ``patchify_pixels`` then a single dense projection.

    kernel: ``[C*ts*p*p, D]``, bias: ``[D]``.
    Returns ``[B, N, D]`` in ``dtype``.
    """
    patches = patchify_pixels(video, tubelet_size, patch_size).astype(dtype)
    out = jnp.dot(patches, kernel.astype(dtype), preferred_element_type=dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out
