"""A/B: JEPA effective bs 128 via grad accumulation on the real chip.

The single-shot bs-128 JEPA step cannot be compiled on this dev box (the
remote compile helper rejects it — PERFORMANCE.md round-3, an infra
ceiling, not device HBM).  ``grad_accum=2`` holds one 64-clip
microbatch's activations at a time, so the program is bs-64-sized while
the optimizer consumes a 128-clip batch.  Also A/Bs bs-48 VideoMAE
accum=1 vs 2 to size the accumulation overhead at a shape where the
single shot fits.

Usage: python tools/probe_accum.py [jepa128|vmae48|all]
"""

from __future__ import annotations

import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_jepa(per_device_batch=128, accum=2, iters=20):
    import jax

    from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
    from bvc_tpu.models import jepa
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_jepa_train_step, place_state
    from bvc_tpu.utils.config import ModelConfig, OptimConfig
    from bvc_tpu.utils.profiling import sync

    cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1)
    collator = MultiBlockMaskCollator(
        input_size=cfg.image_size, patch_size=cfg.patch_size,
        enc_mask_scale=(0.85, 1.0), pred_mask_scale=(0.1, 0.2),
        nenc=1, npred=4, seed=0,
    )
    n_dev = len(jax.devices())
    mesh = make_mesh()
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.03, momentum=0.9))
    params = jepa.init_params(jax.random.PRNGKey(0), cfg)
    B = per_device_batch * n_dev
    state = place_state(
        TrainState.create(params, tx, jax.random.PRNGKey(1),
                          target_params=copy.deepcopy(params["encoder"])),
        mesh,
    )
    step = make_jepa_train_step(mesh, cfg, tx, total_steps=10000,
                                grad_accum=accum)
    video = np.random.default_rng(0).integers(
        0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
        dtype=np.uint8,
    )
    enc_idx, pred_idx = collator(B, step=0)
    enc_idx = update_mask_indices(enc_idx, cfg.image_size, cfg.patch_size,
                                  cfg.num_frames, cfg.tubelet_size, True)
    pred_idx = update_mask_indices(pred_idx, cfg.image_size, cfg.patch_size,
                                   cfg.num_frames, cfg.tubelet_size, False)
    batch = {
        "video": shard_batch(video, mesh),
        "enc_idx": shard_batch(enc_idx[0], mesh),
        "pred_idx": shard_batch(pred_idx.transpose(1, 0, 2), mesh),
    }
    for _ in range(3):
        state, metrics = step(state, batch)
    sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    sync(metrics["loss"])
    dt = time.perf_counter() - t0
    per_chip = B * iters / dt / n_dev
    print(json.dumps({
        "probe": "jepa_accum", "batch_per_chip": per_device_batch,
        "grad_accum": accum, "clips_per_sec_per_chip": round(per_chip, 2),
        "loss": float(metrics["loss"]),
    }), flush=True)


def probe_vmae(per_device_batch=48, iters=20, accums=(1, 2)):
    import jax

    from bvc_tpu.models import videomae
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_videomae_train_step, place_state
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig
    from bvc_tpu.utils.profiling import sync

    cfg = ModelConfig()
    mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.9)
    n_dev = len(jax.devices())
    mesh = make_mesh()
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)
    B = per_device_batch * n_dev
    video = np.random.default_rng(0).integers(
        0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
        dtype=np.uint8,
    )
    vid = shard_batch(video, mesh)
    for accum in accums:
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh
        )
        step = make_videomae_train_step(mesh, cfg, mask_cfg, tx,
                                        grad_accum=accum)
        for _ in range(3):
            state, metrics = step(state, vid)
        sync(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, vid)
        sync(metrics["loss"])
        dt = time.perf_counter() - t0
        per_chip = B * iters / dt / n_dev
        print(json.dumps({
            "probe": "vmae_accum", "batch_per_chip": per_device_batch,
            "grad_accum": accum,
            "clips_per_sec_per_chip": round(per_chip, 2),
            "loss": float(metrics["loss"]),
        }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("jepa128", "all"):
        accum = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        bs = int(sys.argv[3]) if len(sys.argv) > 3 else 128
        probe_jepa(per_device_batch=bs, accum=accum)
    if which in ("vmae48", "all"):
        accum = int(sys.argv[2]) if len(sys.argv) > 2 else None
        bs = int(sys.argv[3]) if len(sys.argv) > 3 else 48
        probe_vmae(per_device_batch=bs,
                   accums=(accum,) if accum else (1, 2))
