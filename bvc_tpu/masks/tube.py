"""Tube / random masking for VideoMAE pretraining — sampled in-step.

The reference builds masks on the host, one numpy shuffle per sample per
iteration inside the hot loop (``generative/pretrain_videomae.py:292-298``
calling ``mask.py:17-24``), then ships a ``[B, 1568]`` bool tensor to the
device.  TPU-first redesign: masks are drawn inside the jitted step with
``jax.random`` — vmapped permutations, zero host work, zero H2D traffic,
and reproducible from the step's PRNG key.

Semantics match the reference generators exactly:

- tube: ONE random spatial mask of ``int(mask_ratio * H*W)`` patches per
  sample, tiled across all T temporal sheets ("tubes") —
  ``TubeMaskingGenerator`` (``generative/mask.py:3-24``).
- random: ``int(mask_ratio * T*H*W)`` masked patches drawn uniformly over
  the whole token grid — ``RandomMaskingGenerator`` (``:26-46``).

Both yield a fixed masked-token count, which is what makes the encoder's
visible-token shape static under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("batch_size", "grid", "mask_ratio"))
def tube_mask(key, batch_size: int, grid: tuple[int, int, int], mask_ratio: float):
    """``[B, T*H*W]`` bool mask (True = masked), identical spatial pattern
    across the T sheets of each sample."""
    t, h, w = grid
    n_space = h * w
    n_masked = int(mask_ratio * n_space)

    def one(k):
        perm = jax.random.permutation(k, n_space)
        frame = jnp.zeros((n_space,), jnp.bool_).at[perm[:n_masked]].set(True)
        return jnp.tile(frame, t)

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)


@functools.partial(jax.jit, static_argnames=("batch_size", "grid", "mask_ratio"))
def random_mask(key, batch_size: int, grid: tuple[int, int, int], mask_ratio: float):
    """``[B, T*H*W]`` bool mask with uniformly random masked positions."""
    t, h, w = grid
    n_total = t * h * w
    n_masked = int(mask_ratio * n_total)

    def one(k):
        perm = jax.random.permutation(k, n_total)
        return jnp.zeros((n_total,), jnp.bool_).at[perm[:n_masked]].set(True)

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)


def mask_partition(mask: jnp.ndarray, num_visible: int):
    """Split a ``[B, N]`` bool mask into (visible_idx ``[B, V]``,
    masked_idx ``[B, N-V]``), each in ascending position order.

    Stable argsort of the 0/1 mask puts visible indices first in order,
    masked after — the ordering HF VideoMAE's decoder assumes when it
    concatenates [visible tokens ‖ mask tokens].
    """
    order = jnp.argsort(mask.astype(jnp.int32), axis=1, stable=True)
    return order[:, :num_visible], order[:, num_visible:]
