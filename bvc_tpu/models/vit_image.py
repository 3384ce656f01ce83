"""Image (2-D) ViT variant.

Counterpart of the reference's ``pretraining/predictive/vision_transformer_image.py``
(present in the repo but not imported by its trainers — SURVEY.md §2.4):
a standard image ViT with Conv2d-equivalent patch embedding and fixed 2-D
sin-cos position table (``sincos_2d``), reusing the shared transformer
core.  Useful for single-frame conditions (num_frames=1 controls) and as
the natural extension point for image-level probes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bvc_tpu.models.initializers import layernorm_params, trunc_normal
from bvc_tpu.models.posenc import interpolate_pos_table, sincos_2d
from bvc_tpu.models.vit import init_blocks, layer_norm, run_blocks
from bvc_tpu.utils.config import ModelConfig


def init_params(key, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 2)
    p, c = cfg.patch_size, cfg.in_channels
    return {
        "patch_embed": {
            "kernel": trunc_normal(ks[0], (c * p * p, cfg.hidden_size), cfg.init_std),
            "bias": jnp.zeros((cfg.hidden_size,), jnp.float32),
        },
        "blocks": init_blocks(
            ks[1], cfg.depth, cfg.hidden_size, cfg.mlp_ratio, cfg.qkv_bias, cfg.init_std
        ),
        "norm": layernorm_params(cfg.hidden_size),
    }


def patchify_image(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """``[B, H, W, C] → [B, N, p*p*C]`` row-major patches, feature order
    (c, dh, dw) matching the video patchify convention."""
    B, H, W, C = images.shape
    p = patch_size
    x = images.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, (H // p) * (W // p), C * p * p)


def forward(params: dict, images: jnp.ndarray, cfg: ModelConfig,
            keep_idx: jnp.ndarray | None = None) -> jnp.ndarray:
    """``[B, H, W, C] → [B, N|K, D]`` (final-normed)."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    grid = cfg.image_size // cfg.patch_size
    tokens = patchify_image(images, cfg.patch_size).astype(dtype)
    tokens = jnp.dot(tokens, params["patch_embed"]["kernel"].astype(dtype),
                     preferred_element_type=dtype)
    tokens = tokens + params["patch_embed"]["bias"].astype(dtype)
    # Table baked at the configured (checkpoint) grid; inputs at another
    # resolution get the reference's bicubic table resize
    # (``vision_transformer_image.py:410,426-440``).  Shapes are static at
    # trace time so this is a build-time numpy constant either way.
    table = sincos_2d(cfg.hidden_size, grid)
    npatch = tokens.shape[1]
    if npatch != grid * grid:
        table = interpolate_pos_table(table, npatch)
    tokens = tokens + jnp.asarray(table, dtype)[None]
    key_mask = None
    if keep_idx is not None:
        key_mask = keep_idx >= 0
        tokens = jnp.take_along_axis(
            tokens, jnp.maximum(keep_idx, 0)[..., None], axis=1
        )
    x = run_blocks(params["blocks"], tokens, cfg.num_heads, cfg.layer_norm_eps,
                   cfg.remat, key_mask=key_mask, unroll=cfg.depth <= 12)
    return layer_norm(x, params["norm"], cfg.layer_norm_eps)


def embed(params: dict, images: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    return jnp.mean(forward(params, images, cfg).astype(jnp.float32), axis=1)
