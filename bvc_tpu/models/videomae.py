"""VideoMAE for pretraining and embedding extraction, pure-functional.

Re-implements the semantics of HF ``VideoMAEForPreTraining`` /
``VideoMAEForVideoClassification`` as configured by the reference
(``pretraining/generative/pretrain_videomae.py:43-64``: base = 768/12L/12H
encoder, 384/4L/6H decoder, patch 16, tubelet 2, ``norm_pix_loss=True``,
``use_mean_pooling=True``), designed TPU-first:

- patch embedding is one dense matmul (:mod:`bvc_tpu.ops.patchify`),
- encoder/decoder stacks are scanned stacked blocks
  (:mod:`bvc_tpu.models.vit`),
- masking is static-shape: visible/masked token counts are compile-time
  constants; gathers use ``take_along_axis`` from a stable argsort of the
  bool mask,
- fixed 1-D sinusoid position tables are baked constants
  (:func:`bvc_tpu.models.posenc.sinusoid_table_1d`), not parameters.

Faithfulness notes (checked against HF modeling_videomae.py behavior):

- with ``use_mean_pooling=True`` the encoder output is NOT layer-normed
  before the decoder projection (HF sets ``layernorm=None``),
- the decoder consumes [visible+pos ‖ mask_token+pos] and only the last
  ``num_masked`` positions go through decoder-norm + head,
- norm-pix targets normalise each tubelet patch per-channel over its
  ts*p*p pixels with *unbiased* variance and eps added to the std,
- the classification-mode embedding (``num_labels=0``) is
  ``LayerNorm(mean(tokens))`` with a fresh (unit-affine) fc_norm — i.e. a
  parameterless standard layer norm.

Target/prediction feature ordering is (pixel-position, channel) —
``(p0 p1 p2) c`` — matching HF's rearrange, so a torch-checkpoint
converter only permutes the patch-embed kernel.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bvc_tpu.masks.tube import mask_partition
from bvc_tpu.models.initializers import layernorm_params, linear_params, trunc_normal
from bvc_tpu.models.posenc import sinusoid_table_1d
from bvc_tpu.models.vit import init_blocks, layer_norm, run_blocks
from bvc_tpu.ops.patchify import tubelet_patchify
from bvc_tpu.utils.config import ModelConfig


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------


def init_params(key, cfg: ModelConfig) -> dict:
    """Parameter pytree for the full pretraining model."""
    if cfg.architecture not in ("base",):
        # the reference defines only 'base' (get_config,
        # pretrain_videomae.py:43-64 — any other name dies on an
        # undefined config there); custom sizes here are expressed via
        # the explicit dim fields, so a stray size KEY would otherwise
        # silently build ViT-B
        raise ValueError(
            f"videomae architecture {cfg.architecture!r} is not defined; "
            "only 'base' exists (set explicit hidden_size/depth/... for "
            "custom sizes)"
        )
    ks = jax.random.split(key, 6)
    p, ts, c = cfg.patch_size, cfg.tubelet_size, cfg.in_channels
    patch_dim = ts * p * p * c
    enc_d, dec_d = cfg.hidden_size, cfg.decoder_hidden_size
    return {
        "patch_embed": {
            "kernel": trunc_normal(ks[0], (c * ts * p * p, enc_d), cfg.init_std),
            "bias": jnp.zeros((enc_d,), jnp.float32),
        },
        "encoder": init_blocks(
            ks[1], cfg.depth, enc_d, cfg.mlp_ratio, cfg.qkv_bias, cfg.init_std
        ),
        "enc_to_dec": {  # Linear(enc→dec, bias=False) as in HF
            "kernel": trunc_normal(ks[2], (enc_d, dec_d), cfg.init_std),
        },
        "mask_token": trunc_normal(ks[3], (1, 1, dec_d), cfg.init_std),
        "decoder": init_blocks(
            ks[4],
            cfg.decoder_depth,
            dec_d,
            cfg.mlp_ratio,
            cfg.qkv_bias,
            cfg.init_std,
        ),
        "decoder_norm": layernorm_params(dec_d),
        "decoder_head": linear_params(ks[5], dec_d, patch_dim, cfg.init_std),
    }


def pos_tables(cfg: ModelConfig) -> tuple[np.ndarray, np.ndarray]:
    """(encoder, decoder) fixed sinusoid tables, ``[N, D]``."""
    n = cfg.seq_len
    return (
        sinusoid_table_1d(n, cfg.hidden_size),
        sinusoid_table_1d(n, cfg.decoder_hidden_size),
    )


# --------------------------------------------------------------------------
# Forward passes
# --------------------------------------------------------------------------


def _compute_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def encode_visible(
    params: dict, video: jnp.ndarray, visible_idx: jnp.ndarray, cfg: ModelConfig
) -> jnp.ndarray:
    """Gather visible pixel blocks, embed, add pos, run encoder. ``[B, V, D]``.

    Gathering PIXELS before the projection (instead of projecting all N
    tokens and discarding the masked 90%) cuts the patch-embed matmul and
    its backward by N/V (~10x at mask ratio 0.9).
    """
    from bvc_tpu.ops.patchify import patchify_pixels

    dtype = _compute_dtype(cfg)
    enc_pos, _ = pos_tables(cfg)
    patches = patchify_pixels(video, cfg.tubelet_size, cfg.patch_size)
    vis_px = jnp.take_along_axis(
        patches, visible_idx[..., None], axis=1
    ).astype(dtype)
    pe = params["patch_embed"]
    vis = jnp.dot(vis_px, pe["kernel"].astype(dtype), preferred_element_type=dtype)
    vis = vis + pe["bias"].astype(dtype)
    pos = jnp.take_along_axis(
        jnp.broadcast_to(jnp.asarray(enc_pos, dtype)[None],
                         (video.shape[0],) + enc_pos.shape),
        visible_idx[..., None], axis=1,
    )
    vis = vis + pos
    return run_blocks(
        params["encoder"], vis, cfg.num_heads, cfg.layer_norm_eps, cfg.remat,
        # NOT routed through autocast_scores: at 160 visible tokens the
        # score tensor is small and the bf16 round-trip measured a ~1%
        # LOSS (280.8 → 277.9 clips/s, tools/probe_r3.py vmae_ac) — the
        # bandwidth saved is under the conversion cost.  The decoder's
        # flash kernels keep scores in VMEM and are precision-unaffected.
        # measured on v5e: unrolled 12-layer encoder fwd+bwd 44.8 → 36.5 ms
        # at [32, 160, 768] (PERFORMANCE.md)
        unroll=cfg.depth <= 12,
    )


def decode_masked(
    params: dict,
    encoded: jnp.ndarray,
    visible_idx: jnp.ndarray,
    masked_idx: jnp.ndarray,
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Decoder pass returning per-masked-token pixel predictions
    ``[B, M, patch_dim]``."""
    dtype = encoded.dtype
    _, dec_pos = pos_tables(cfg)
    dec_pos = jnp.asarray(dec_pos, dtype)[None]
    z = jnp.dot(
        encoded, params["enc_to_dec"]["kernel"].astype(dtype),
        preferred_element_type=dtype,
    )
    B = z.shape[0]
    pos_vis = jnp.take_along_axis(
        jnp.broadcast_to(dec_pos, (B, dec_pos.shape[1], dec_pos.shape[2])),
        visible_idx[..., None], axis=1,
    )
    pos_mask = jnp.take_along_axis(
        jnp.broadcast_to(dec_pos, (B, dec_pos.shape[1], dec_pos.shape[2])),
        masked_idx[..., None], axis=1,
    )
    mask_tok = params["mask_token"].astype(dtype)
    x = jnp.concatenate([z + pos_vis, mask_tok + pos_mask], axis=1)
    x = run_blocks(
        params["decoder"], x, cfg.decoder_num_heads, cfg.layer_norm_eps, cfg.remat,
        # shallow stack: straight-line layers schedule ~10% faster than
        # the scan on v5e (PERFORMANCE.md); compile-time cost is tiny at
        # depth ≤ 4
        unroll=cfg.decoder_depth <= 4,
    )
    x = x[:, -masked_idx.shape[1]:]
    x = layer_norm(x, params["decoder_norm"], cfg.layer_norm_eps)
    head = params["decoder_head"]
    return jnp.dot(x, head["kernel"].astype(dtype), preferred_element_type=dtype) + head[
        "bias"
    ].astype(dtype)


def patch_targets(
    video: jnp.ndarray, cfg: ModelConfig, idx: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Norm-pix regression targets ``[B, N|K, ts*p*p*C]``.

    Per-patch, per-channel normalisation over the ts*p*p pixels with
    unbiased variance; feature order (pixel, channel) — HF semantics.
    ``idx`` (``[B, K]``) selects patches BEFORE normalising (the
    normalisation is per-patch, so gathering first is exact and skips the
    ~90% of patches the loss never reads).
    """
    from bvc_tpu.ops.patchify import patchify_pixels

    B, T, H, W, C = video.shape
    ts, p = cfg.tubelet_size, cfg.patch_size
    q = ts * p * p
    # Route through the SAME channel-major patchify as the encoder path so
    # XLA CSEs the full-video relayout between the two (a second, HF-order
    # 8-D transpose of the whole video measured ~13 ms/step at bs 48 —
    # tools/profile_videomae.py); the HF (pixel, channel) feature order is
    # restored at the end on the gathered (masked-only) patches.
    x = patchify_pixels(video, ts, p).astype(jnp.float32)  # [B, N, C*q]
    if idx is not None:
        x = jnp.take_along_axis(x, idx[..., None], axis=1)
    n = x.shape[1]
    x = x.reshape(B, n, C, q)
    if cfg.norm_pix_loss:
        mean = jnp.mean(x, axis=3, keepdims=True)
        var = jnp.var(x, axis=3, ddof=1, keepdims=True)
        x = (x - mean) / (jnp.sqrt(var) + 1e-6)
    x = x.transpose(0, 1, 3, 2)  # → [B, n, q, C]: HF (pixel, channel)
    return x.reshape(B, n, q * C)


def normalize_on_device(video: jnp.ndarray) -> jnp.ndarray:
    """uint8 frames → normalized f32 on device.

    Lets the input pipeline ship uint8 (4x less H2D traffic than f32 —
    154 MB/batch → 38 MB at the reference batch) and fuses the
    (x/255 - 0.5)/0.25 normalization into the jitted step.
    """
    if video.dtype == jnp.uint8:
        return (video.astype(jnp.float32) * (1.0 / 255.0) - 0.5) * 4.0
    return video


def pretrain_loss(
    params: dict,
    video: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: ModelConfig,
    num_visible: int,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Masked reconstruction loss for one (possibly device-local) batch.

    ``mask``: ``[B, N]`` bool, True = masked.  ``num_visible`` must be the
    static visible-token count implied by the mask sampler.  ``video``
    may be normalized f32 or raw uint8 (normalized in-step).
    """
    video = normalize_on_device(video)
    visible_idx, masked_idx = mask_partition(mask, num_visible)
    encoded = encode_visible(params, video, visible_idx, cfg)
    preds = decode_masked(params, encoded, visible_idx, masked_idx, cfg)
    targets = patch_targets(video, cfg, masked_idx)
    loss = jnp.mean(
        jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    )
    return loss, {"loss": loss}


def forward_features(params: dict, video: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Unmasked encoder pass over all tokens, ``[B, N, D]`` (used by the
    embedding extractor)."""
    video = normalize_on_device(video)
    B, N = video.shape[0], cfg.seq_len
    all_idx = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
    return encode_visible(params, video, all_idx, cfg)


def embed(params: dict, video: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Pooled 768-d embedding: ``LayerNorm(mean(tokens))`` with unit
    affine — what ``VideoMAEForVideoClassification(num_labels=0).logits``
    yields (``benchmarks/compute_embeddings_videomae.py:78-96``)."""
    h = forward_features(params, video, cfg).astype(jnp.float32)
    pooled = jnp.mean(h, axis=1)
    mean = jnp.mean(pooled, axis=-1, keepdims=True)
    var = jnp.var(pooled, axis=-1, keepdims=True)
    return (pooled - mean) * jax.lax.rsqrt(var + 1e-6)
