"""(V-)JEPA: video ViT encoder + narrow predictor, pure-functional.

Re-implements the reference's from-scratch ViT
(``pretraining/predictive/vision_transformer.py:293-418``) and
``VisionTransformerPredictor`` (``:421-535``) on the shared transformer
core, with two structural changes for TPU:

- masked token selection is index-gather with static caps + attention
  key-masks instead of per-batch ragged tensors (see
  :mod:`bvc_tpu.masks.multiblock`),
- both stacks are scanned stacked blocks.

Faithfulness:

- encoder positional table is the channel-split ``PositionalEncoding3D``
  baked at build time (``:333-343``), predictor has its own table at
  predictor width (``:446-453``),
- the encoder applies a final LayerNorm (``:399-401``); the predictor
  embeds to ``pred_emb_dim``, appends mask tokens with target-position
  embeddings, runs its blocks, norms, and projects back to encoder width,
  returning only the mask-token outputs (``:494-535``),
- multi-mask handling is m-major: outputs/targets are stacked as
  ``[M, B, K, D]`` in mask order, matching the reference's
  ``apply_masks`` concat + ``x.repeat(len(masks),1,1)`` ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bvc_tpu.models.initializers import layernorm_params, linear_params, trunc_normal
from bvc_tpu.models.posenc import interpolate_pos_table_3d, positional_encoding_3d
from bvc_tpu.models.vit import init_blocks, layer_norm, run_blocks
from bvc_tpu.ops.patchify import tubelet_patchify
from bvc_tpu.utils.config import ModelConfig


def _grid(cfg: ModelConfig) -> tuple[int, int, int]:
    g = cfg.image_size // cfg.patch_size
    return (cfg.num_frames // cfg.tubelet_size, g, g)


def init_encoder_params(key, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 2)
    p, ts, c = cfg.patch_size, cfg.tubelet_size, cfg.in_channels
    return {
        "patch_embed": {
            "kernel": trunc_normal(ks[0], (c * ts * p * p, cfg.hidden_size), cfg.init_std),
            "bias": jnp.zeros((cfg.hidden_size,), jnp.float32),
        },
        "blocks": init_blocks(
            ks[1], cfg.depth, cfg.hidden_size, cfg.mlp_ratio, cfg.qkv_bias, cfg.init_std
        ),
        "norm": layernorm_params(cfg.hidden_size),
    }


def init_predictor_params(key, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 3)
    d_enc, d_pred = cfg.hidden_size, cfg.pred_emb_dim
    return {
        "embed": linear_params(ks[0], d_enc, d_pred, cfg.init_std),
        "mask_token": trunc_normal(ks[1], (1, 1, d_pred), cfg.init_std),
        "blocks": init_blocks(
            ks[2], cfg.pred_depth, d_pred, cfg.mlp_ratio, cfg.qkv_bias, cfg.init_std
        ),
        "norm": layernorm_params(d_pred),
        "proj": linear_params(jax.random.fold_in(ks[2], 7), d_pred, d_enc, cfg.init_std),
    }


def init_params(key, cfg: ModelConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_encoder_params(k1, cfg),
        "predictor": init_predictor_params(k2, cfg),
    }


def encoder_pos_table(cfg: ModelConfig) -> np.ndarray:
    t, h, w = _grid(cfg)
    return positional_encoding_3d(t, h, w, cfg.hidden_size)


def predictor_pos_table(cfg: ModelConfig) -> np.ndarray:
    t, h, w = _grid(cfg)
    return positional_encoding_3d(t, h, w, cfg.pred_emb_dim)


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _dpr(cfg: ModelConfig, rng, depth: int | None = None):
    """Per-layer stochastic-depth schedule when training with
    ``drop_path_rate > 0`` (reference decay rule ``linspace(0, rate, d)``,
    ``vision_transformer.py:345,444``); None otherwise."""
    if rng is None or cfg.drop_path_rate <= 0.0:
        return None
    return np.linspace(0.0, cfg.drop_path_rate, depth or cfg.depth)


def _safe_gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis treating -1 padding as index 0 (rows are later
    neutralised by the validity mask)."""
    return jnp.take_along_axis(x, jnp.maximum(idx, 0)[..., None], axis=1)


def encoder_forward(
    enc_params: dict,
    video: jnp.ndarray,
    cfg: ModelConfig,
    keep_idx: jnp.ndarray | None = None,
    rng: jnp.ndarray | None = None,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Encode ``[B, T, H, W, C]`` video.

    ``keep_idx``: optional ``[B, K]`` int32 token indices (−1 = padding)
    — the reference's ``forward(x, masks)`` path.  Returns ``[B, K, D]``
    (or ``[B, N, D]`` unmasked), final-normed.

    ``rng``: training-mode rng enabling stochastic depth when
    ``cfg.drop_path_rate > 0`` (reference ``:345-349``; every shipped
    config runs 0.0).

    Inputs at a different spatial resolution than ``cfg.image_size`` get
    the baked position table bicubically resized per time slice — the
    reference's ``interpolate_pos_encoding`` intent (``:388,404-418``; see
    :func:`bvc_tpu.models.posenc.interpolate_pos_table_3d` for why the
    reference's own video path is latently broken).  The time grid must
    match: the reference has no resize semantics for it either.
    """
    dtype = _dtype(cfg)
    from bvc_tpu.models.videomae import normalize_on_device

    video = normalize_on_device(video)
    tokens = tubelet_patchify(
        video, enc_params["patch_embed"]["kernel"], enc_params["patch_embed"]["bias"],
        cfg.tubelet_size, cfg.patch_size, dtype,
    )
    t, h, w = _grid(cfg)
    t_in = video.shape[1] // cfg.tubelet_size
    h_in, w_in = video.shape[2] // cfg.patch_size, video.shape[3] // cfg.patch_size
    table = encoder_pos_table(cfg)
    if (t_in, h_in, w_in) != (t, h, w):
        if t_in != t:
            raise ValueError(
                f"time grid {t_in} != configured {t}: positional tables "
                "only interpolate spatially"
            )
        table = interpolate_pos_table_3d(table, t, h, w, h_in, w_in)
    tokens = tokens + jnp.asarray(table, dtype)[None]
    key_mask = None
    if keep_idx is not None:
        key_mask = keep_idx >= 0
        tokens = _safe_gather(tokens, keep_idx)
    x = run_blocks(
        enc_params["blocks"], tokens, cfg.num_heads, cfg.layer_norm_eps,
        cfg.remat, attn_impl=attn_impl, key_mask=key_mask,
        drop_path_rates=_dpr(cfg, rng), rng=rng,
        unroll=cfg.depth <= 12,  # straight-line layers schedule faster (v5e)
    )
    return layer_norm(x, enc_params["norm"], cfg.layer_norm_eps)


def predictor_forward(
    pred_params: dict,
    z: jnp.ndarray,
    enc_idx: jnp.ndarray,
    pred_idx: jnp.ndarray,
    cfg: ModelConfig,
    rng: jnp.ndarray | None = None,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Predict target-position features from context features.

    z: ``[B, Ke, D_enc]`` encoder output at context positions
    enc_idx: ``[B, Ke]`` (−1 padded), pred_idx: ``[M, B, Kp]`` (−1 padded)
    Returns ``[M, B, Kp, D_enc]``.  ``rng`` enables stochastic depth as in
    :func:`encoder_forward` (reference predictor decay rule ``:444``).
    """
    dtype = z.dtype
    M, B, Kp = pred_idx.shape
    Ke = enc_idx.shape[1]
    pos = jnp.asarray(predictor_pos_table(cfg), dtype)[None]
    pos_b = jnp.broadcast_to(pos, (B, pos.shape[1], pos.shape[2]))

    x = jnp.dot(z, pred_params["embed"]["kernel"].astype(dtype),
                preferred_element_type=dtype) + pred_params["embed"]["bias"].astype(dtype)
    x = x + _safe_gather(pos_b, enc_idx)

    # m-major tiling of context, matching x.repeat(len(masks), 1, 1)
    x = jnp.broadcast_to(x[None], (M, B, Ke, x.shape[-1])).reshape(M * B, Ke, -1)
    enc_valid = jnp.broadcast_to((enc_idx >= 0)[None], (M, B, Ke)).reshape(M * B, Ke)

    pos_mask = jax.vmap(lambda idx: _safe_gather(pos_b, idx))(pred_idx)  # [M,B,Kp,Dp]
    pred_tokens = pred_params["mask_token"].astype(dtype) + pos_mask.reshape(M * B, Kp, -1)
    pred_valid = (pred_idx >= 0).reshape(M * B, Kp)

    full = jnp.concatenate([x, pred_tokens], axis=1)
    key_mask = jnp.concatenate([enc_valid, pred_valid], axis=1)
    full = run_blocks(
        pred_params["blocks"], full, cfg.num_heads, cfg.layer_norm_eps,
        cfg.remat, attn_impl=attn_impl, key_mask=key_mask,
        drop_path_rates=_dpr(cfg, rng, cfg.pred_depth), rng=rng,
        unroll=cfg.pred_depth <= 12,
    )
    out = full[:, Ke:]
    out = layer_norm(out, pred_params["norm"], cfg.layer_norm_eps)
    out = jnp.dot(out, pred_params["proj"]["kernel"].astype(dtype),
                  preferred_element_type=dtype) + pred_params["proj"]["bias"].astype(dtype)
    return out.reshape(M, B, Kp, -1)


def target_features(
    target_enc_params: dict,
    video: jnp.ndarray,
    pred_idx: jnp.ndarray,
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Frozen-target features at prediction positions, ``[M, B, Kp, D]``:
    full encode → feature-dim LayerNorm (parameterless, reference
    ``F.layer_norm(h, (h.size(-1),))`` at ``pretrain_jepa.py:387``) →
    gather.

    The no-grad encode defaults to bf16-stored attention logits
    (``cfg.target_score_bf16``) — the reference computes this pass under
    torch autocast-bf16 (``pretrain_jepa.py:405-409``), which quantizes
    its qk logits at the same point; measured 12.4 → 9.3 ms per
    attention layer at [64, 392, 12, 64] on v5e
    (tools/probe_softmax_dtype.py)."""
    impl = "xla_bf16" if cfg.target_score_bf16 else "auto"
    h = encoder_forward(target_enc_params, video, cfg, attn_impl=impl)
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.var(hf, axis=-1, keepdims=True)
    h = ((hf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(h.dtype)
    return jax.vmap(lambda idx: _safe_gather(h, idx))(pred_idx)


def embed(enc_params: dict, video: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Mean over patch tokens of the (normed) encoder output — the JEPA
    embedding extractor's pooling (``compute_embeddings_jepa.py:242``)."""
    h = encoder_forward(enc_params, video, cfg)
    return jnp.mean(h.astype(jnp.float32), axis=1)
