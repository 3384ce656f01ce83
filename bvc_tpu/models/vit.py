"""Functional transformer core shared by all three model families.

Redesign of the reference's ``VisionTransformer`` /
``VisionTransformerPredictor`` (``pretraining/predictive/vision_transformer.py``)
and of HF's VideoMAE encoder/decoder stacks, as pure functions over explicit
parameter pytrees:

- **Stacked layers + ``lax.scan``**: the D transformer blocks are stored as
  one pytree whose leaves carry a leading ``[depth, ...]`` axis and executed
  with ``lax.scan``.  XLA compiles ONE block and iterates it — compile time
  stays flat in depth and the step is trivially shardable (the TP partition
  specs in :mod:`bvc_tpu.parallel.sharding` shard the stacked leaves).
- **bf16 compute, f32 state**: parameters live in f32; activations run in
  the configured compute dtype; LayerNorm statistics and softmax in f32.
  This subsumes the reference's ``torch.cuda.amp.autocast(bfloat16)`` +
  GradScaler (the scaler is a no-op for bf16 and is dropped).
- **Dropout paths**: every reference config runs drop_rate = attn_drop =
  0.0 (SURVEY.md §2.4) so plain dropout is omitted, but DropPath /
  stochastic depth (reference ``vision_transformer.py:145-164``, per-layer
  rates ``linspace(0, rate, depth)`` at ``:345``) IS implemented — pass
  ``drop_path_rates`` + ``rng`` to :func:`run_blocks`.  With the default
  ``None`` the hot path is untouched.

Block math matches ``Block.forward`` (``vision_transformer.py:225-231``):
pre-LN, fused-qkv attention, exact-erf GELU MLP, residual adds.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from bvc_tpu.models.initializers import (
    depth_rescale_factor,
    layernorm_params,
    linear_params,
    trunc_normal,
)
from bvc_tpu.ops.attention import multi_head_attention
from bvc_tpu.ops.gelu import gelu
from bvc_tpu.ops.quant import qdense


def layer_norm(x: jnp.ndarray, params: dict, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm with f32 statistics regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype)


def init_block(key, dim: int, mlp_ratio: float = 4.0, qkv_bias: bool = True,
               init_std: float = 0.02) -> dict:
    k_qkv, k_proj, k_fc1, k_fc2 = jax.random.split(key, 4)
    hidden = int(dim * mlp_ratio)
    return {
        "ln1": layernorm_params(dim),
        "attn": {
            "qkv": linear_params(k_qkv, dim, 3 * dim, init_std, bias=qkv_bias),
            "proj": linear_params(k_proj, dim, dim, init_std),
        },
        "ln2": layernorm_params(dim),
        "mlp": {
            "fc1": linear_params(k_fc1, dim, hidden, init_std),
            "fc2": linear_params(k_fc2, hidden, dim, init_std, bias=True),
        },
    }


def init_blocks(
    key,
    depth: int,
    dim: int,
    mlp_ratio: float = 4.0,
    qkv_bias: bool = True,
    init_std: float = 0.02,
    depth_rescale: bool = False,
) -> dict:
    """Stacked block params with leading ``[depth]`` axis on every leaf.

    ``depth_rescale=True`` divides attn-proj / mlp-fc2 kernels of layer i
    by sqrt(2i) (reference ``fix_init_weight``).  Note the reference's JEPA
    trainer immediately re-initialises every Linear afterwards
    (``pretrain_jepa.py:107-121``), wiping the rescale — so parity configs
    default to False.
    """
    keys = jax.random.split(key, depth)
    blocks = [init_block(k, dim, mlp_ratio, qkv_bias, init_std) for k in keys]
    if depth_rescale:
        for i, b in enumerate(blocks):
            f = depth_rescale_factor(i + 1)
            b["attn"]["proj"]["kernel"] = b["attn"]["proj"]["kernel"] * f
            b["mlp"]["fc2"]["kernel"] = b["mlp"]["fc2"]["kernel"] * f
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def _dense(x, p, dtype):
    if "kernel_q" in p:  # W8A8 inference path (ops/quant.py, opt-in)
        return qdense(x, p, dtype)
    out = jnp.dot(x, p["kernel"].astype(dtype), preferred_element_type=dtype)
    if "bias" in p:
        out = out + p["bias"].astype(dtype)
    return out


def drop_path(x: jnp.ndarray, rate: jnp.ndarray, rng: jnp.ndarray) -> jnp.ndarray:
    """Per-sample stochastic depth on a residual branch — reference
    ``drop_path`` (``vision_transformer.py:145-155``): Bernoulli(1−rate)
    over the batch axis, surviving branches scaled by 1/(1−rate).
    ``rate`` may be a traced scalar (scanned per-layer schedule)."""
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return x * (mask.astype(x.dtype) / keep.astype(x.dtype))


def block_apply(params: dict, x: jnp.ndarray, num_heads: int,
                ln_eps: float = 1e-6, attn_impl: str = "auto",
                key_mask: jnp.ndarray | None = None,
                drop_path_rate: jnp.ndarray | None = None,
                rng: jnp.ndarray | None = None) -> jnp.ndarray:
    """One pre-LN transformer block on ``[B, N, D]``.

    ``drop_path_rate`` + ``rng``: stochastic depth on both residual
    branches with independent draws (reference ``Block.forward``,
    ``vision_transformer.py:229-230`` — ``self.drop_path`` samples fresh
    per call)."""
    B, N, D = x.shape
    dtype = x.dtype
    h = layer_norm(x, params["ln1"], ln_eps)
    qkv = _dense(h, params["attn"]["qkv"], dtype)
    qkv = qkv.reshape(B, N, 3, num_heads, D // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn_out = multi_head_attention(q, k, v, impl=attn_impl, key_mask=key_mask)
    attn_out = _dense(attn_out.reshape(B, N, D), params["attn"]["proj"], dtype)
    if drop_path_rate is not None:
        attn_out = drop_path(attn_out, drop_path_rate, jax.random.fold_in(rng, 0))
    x = x + attn_out

    h = layer_norm(x, params["ln2"], ln_eps)
    h = _dense(h, params["mlp"]["fc1"], dtype)
    h = gelu(h)  # erf form; below-resolution poly fast path for bf16
    h = _dense(h, params["mlp"]["fc2"], dtype)
    if drop_path_rate is not None:
        h = drop_path(h, drop_path_rate, jax.random.fold_in(rng, 1))
    return x + h


def run_blocks(
    stacked: dict,
    x: jnp.ndarray,
    num_heads: int,
    ln_eps: float = 1e-6,
    remat: bool = False,
    attn_impl: str = "auto",
    key_mask: jnp.ndarray | None = None,
    drop_path_rates: jnp.ndarray | None = None,
    rng: jnp.ndarray | None = None,
    unroll: bool = False,
) -> jnp.ndarray:
    """Scan the stacked blocks over ``x``.

    ``drop_path_rates``: optional ``[depth]`` per-layer stochastic-depth
    schedule (the reference's ``linspace(0, rate, depth)`` decay rule,
    ``vision_transformer.py:345``), scanned alongside the params with a
    per-layer rng; requires ``rng``.

    ``unroll``: emit the layers as straight-line code instead of a
    ``lax.scan``.  Measured on v5e (PERFORMANCE.md): XLA schedules the
    unrolled decoder ~10% faster (per-layer fusion/layout freedom);
    compile time grows with depth, so it only pays for shallow stacks —
    callers enable it for depth ≤ 4.
    """
    if unroll and not remat:
        depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        if drop_path_rates is not None:
            assert rng is not None, "drop_path_rates requires an rng"
        rates = None if drop_path_rates is None else jnp.asarray(
            drop_path_rates, jnp.float32)
        keys = None if rng is None else jax.random.split(rng, depth)
        for i in range(depth):
            layer = jax.tree_util.tree_map(lambda l: l[i], stacked)
            x = block_apply(
                layer, x, num_heads, ln_eps, attn_impl, key_mask,
                None if rates is None else rates[i],
                None if keys is None else keys[i],
            )
        return x
    if drop_path_rates is not None:
        assert rng is not None, "drop_path_rates requires an rng"
        depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        xs = (stacked, jnp.asarray(drop_path_rates, jnp.float32),
              jax.random.split(rng, depth))

        def body(carry, layer):
            layer_params, rate, key = layer
            out = block_apply(layer_params, carry, num_heads, ln_eps,
                              attn_impl, key_mask, rate, key)
            return out, None
    else:
        xs = stacked

        def body(carry, layer_params):
            out = block_apply(layer_params, carry, num_heads, ln_eps,
                              attn_impl, key_mask)
            return out, None

    if remat:
        body = jax.checkpoint(body)
    out, _ = jax.lax.scan(body, x, xs)
    return out


# --------------------------------------------------------------------------
# Video/image ViT encoder (JEPA family)
# --------------------------------------------------------------------------

VIT_DIMS: dict[str, tuple[int, int, int]] = {
    # name: (embed_dim, depth, num_heads) — reference factories
    # vision_transformer.py:551-600
    "vit_tiny": (192, 12, 3),
    "vit_small": (384, 12, 6),
    "vit_base": (768, 12, 12),
    "vit_large": (1024, 24, 16),
    "vit_huge": (1280, 32, 16),
    "vit_giant": (1408, 40, 16),
}

VIT_EMBED_DIMS = {k: v[0] for k, v in VIT_DIMS.items()}


def block_attention_probs(params: dict, x: jnp.ndarray, num_heads: int,
                          ln_eps: float = 1e-6) -> jnp.ndarray:
    """Attention probabilities ``[B, h, N, N]`` of one block — the
    reference's ``Block.forward(return_attention=True)`` introspection
    path (``vision_transformer.py:225-228``), used for attention-map
    visualisation.  Not on the training hot path (materialises N^2)."""
    B, N, D = x.shape
    h = layer_norm(x, params["ln1"], ln_eps)
    qkv = _dense(h, params["attn"]["qkv"], x.dtype)
    qkv = qkv.reshape(B, N, 3, num_heads, D // num_heads)
    q, k = qkv[:, :, 0], qkv[:, :, 1]
    scale = (D // num_heads) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    return jax.nn.softmax(logits, axis=-1)


def mask_gather(x: jnp.ndarray, keep_indices: jnp.ndarray) -> jnp.ndarray:
    """Gather kept patch rows: ``[B, N, D] x [B, K] → [B, K, D]``.

    Functional analogue of the reference's ``apply_masks``
    (``predictive/mask.py:58-67``) for a single mask; multi-mask callers
    vmap/concat at the call site.
    """
    return jnp.take_along_axis(x, keep_indices[..., None], axis=1)
