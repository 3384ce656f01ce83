"""Decompose the JEPA train-step time on the local chip.

Times each stage (target encode, context encoder fwd+bwd, predictor
fwd+bwd) with in-jit repetition (dispatch-free — naive per-call timing
over the tunnel reads 3-10x worse, PERFORMANCE.md).  Each repetition is
chained through a negligible scalar perturbation of the input so XLA
cannot CSE the repeated pure calls into one.

Usage: python tools/profile_jepa.py [batch_per_chip]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchlib import timed  # noqa: E402


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
    from bvc_tpu.models import jepa
    from bvc_tpu.training.steps import smooth_l1
    from bvc_tpu.utils.config import ModelConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1)
    collator = MultiBlockMaskCollator(
        input_size=cfg.image_size, patch_size=cfg.patch_size,
        enc_mask_scale=(0.85, 1.0), pred_mask_scale=(0.1, 0.2),
        nenc=1, npred=4, seed=0,
    )
    params = jepa.init_params(jax.random.PRNGKey(0), cfg)
    raw = np.random.default_rng(0).integers(
        0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3), np.uint8)
    # pre-normalized f32 video (normalize_on_device passes f32 through),
    # so the CSE-defeating additive chain is valid
    video = jnp.asarray((raw.astype(np.float32) / 255.0 - 0.5) * 4.0)
    enc_idx, pred_idx = collator(B, step=0)
    enc_idx = jnp.asarray(update_mask_indices(
        enc_idx, cfg.image_size, cfg.patch_size, cfg.num_frames,
        cfg.tubelet_size, isencoder=True)[0])
    pred_idx = jnp.asarray(update_mask_indices(
        pred_idx, cfg.image_size, cfg.patch_size, cfg.num_frames,
        cfg.tubelet_size, isencoder=False))
    print(f"B={B} Ke={enc_idx.shape[1]} M,Kp={pred_idx.shape[0]},{pred_idx.shape[2]}")

    t_tgt = timed(lambda p, v: jepa.target_features(p, v, pred_idx, cfg),
                  params["encoder"], video)
    print(f"target encode fwd (392 tok):      {t_tgt:7.2f} ms")

    t_encf = timed(lambda p, v: jepa.encoder_forward(p, v, cfg, enc_idx),
                   params["encoder"], video)
    print(f"context encoder fwd ({enc_idx.shape[1]} tok):  {t_encf:7.2f} ms")

    def enc_loss(p, v):
        return jepa.encoder_forward(p, v, cfg, enc_idx).astype(jnp.float32).sum()

    enc_vg = jax.value_and_grad(enc_loss)  # w.r.t. params — real training bwd
    t_encb = timed(lambda p, v: enc_vg(p, v), params["encoder"], video)
    print(f"context encoder fwd+bwd:          {t_encb:7.2f} ms")

    z = jepa.encoder_forward(params["encoder"], video, cfg, enc_idx)
    targets = jepa.target_features(params["encoder"], video, pred_idx, cfg)
    valid = jnp.asarray((np.asarray(pred_idx) >= 0).astype(np.float32))[..., None]

    t_predf = timed(
        lambda p, zz: jepa.predictor_forward(p, zz.astype(z.dtype), enc_idx,
                                             pred_idx, cfg),
        params["predictor"], z.astype(jnp.float32))
    print(f"predictor fwd (M*B={4*B}, 209 tok): {t_predf:7.2f} ms")

    def pred_loss(p, zz):
        preds = jepa.predictor_forward(p, zz.astype(z.dtype), enc_idx, pred_idx, cfg)
        per = smooth_l1(preds, targets) * valid
        return per.sum() / (valid.sum() * preds.shape[-1])

    pred_vg = jax.value_and_grad(pred_loss)  # w.r.t. params
    t_predb = timed(lambda p, zz: pred_vg(p, zz),
                    params["predictor"], z.astype(jnp.float32))
    print(f"predictor fwd+bwd:                {t_predb:7.2f} ms")

    full = t_tgt + t_encb + t_predb
    print(f"sum of pieces (ex EMA/opt/joint): {full:7.2f} ms "
          f"→ {B / full * 1e3:.1f} clips/s bound")


if __name__ == "__main__":
    main()
