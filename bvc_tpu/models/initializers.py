"""Weight initialisation.

Mirrors the reference's init semantics (``pretraining/predictive/tensors.py:17-50``
``trunc_normal_``; ``vision_transformer.py:357-376`` ``fix_init_weight`` /
``_init_weights``) in distribution: linear kernels ~ truncated normal
(std 0.02 by default), biases zero, LayerNorm scale 1 / bias 0.

Note on truncation bounds: the reference's timm-style ``trunc_normal_``
truncates at *absolute* [-2, 2], which at std 0.02 is ±100σ — i.e. in
practice an untruncated normal.  We truncate at ±2σ (the conventional
reading); at these widths the distributions are indistinguishable for
training purposes and no bit-compat target exists for random init.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, std: float = 0.02, dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std


def linear_params(key, d_in: int, d_out: int, std: float = 0.02, bias: bool = True):
    p = {"kernel": trunc_normal(key, (d_in, d_out), std)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def layernorm_params(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def depth_rescale_factor(layer_id: int) -> float:
    """1/sqrt(2·layer_id) applied to attn-proj and mlp-fc2 kernels
    (``fix_init_weight``, layer_id is 1-based)."""
    return 1.0 / math.sqrt(2.0 * layer_id)
