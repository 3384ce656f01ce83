"""Measure JEPA and SimCLR pretraining step throughput on the local chip.

Complements ``bench.py`` (the driver-facing VideoMAE headline) with the
other two reference families at their preset shapes
(``curriculum/presets.py``: predictive = ViT-B 224px 2 frames tubelet 1,
contrastive = resnet18 pair batches), so PERFORMANCE.md carries measured
numbers for every workload the reference runs.

Usage: ``python tools/bench_families.py [jepa|simclr|all]``
Prints one JSON line per family.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchlib import BASELINE_CLIPS_PER_SEC_PER_ACCEL, ladder  # noqa: E402


def bench_jepa(configs=((64, 4), (64, 1), (32, 1))):
    # (per_device_batch, grad_accum) rungs.  (64, 4) — the reference's
    # effective batch with microbatch-16 scan accumulation — measures
    # 292 clips/s vs 247 single-shot (tools/probe_accum.py,
    # PERFORMANCE.md "Gradient accumulation"): at small microbatches the
    # 392/209-token f32 score tensors stop streaming HBM and the
    # optimizer+EMA run once per batch.  Single-shot rungs remain as
    # fallbacks.  The single-shot 128/chip case cannot compile on this
    # dev box (remote compile-helper ceiling, PERFORMANCE.md round-3);
    # accumulated 128/chip runs (306 clips/s at accum 16) but changes
    # the effective batch, so it stays out of the headline rungs.
    import copy

    import jax

    from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
    from bvc_tpu.models import jepa
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_jepa_train_step, place_state
    from bvc_tpu.utils.config import ModelConfig, OptimConfig
    from bvc_tpu.utils.profiling import sync

    # predictive preset: ViT-B, 224 px, 2 frames, tubelet 1 (392 tokens)
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

    def build(config):
        per_device_batch, accum = config
        B = per_device_batch * n_dev
        state = place_state(
            TrainState.create(
                params, tx, jax.random.PRNGKey(1),
                target_params=copy.deepcopy(params["encoder"]),
            ),
            mesh,
        )
        step = make_jepa_train_step(mesh, cfg, tx, total_steps=10000,
                                    grad_accum=accum)
        video = np.random.default_rng(0).integers(
            0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
            dtype=np.uint8,
        )
        enc_idx, pred_idx = collator(B, step=0)
        enc_idx = update_mask_indices(
            enc_idx, cfg.image_size, cfg.patch_size, cfg.num_frames,
            cfg.tubelet_size, isencoder=True,
        )
        pred_idx = update_mask_indices(
            pred_idx, cfg.image_size, cfg.patch_size, cfg.num_frames,
            cfg.tubelet_size, isencoder=False,
        )
        batch = {
            "video": shard_batch(video, mesh),
            "enc_idx": shard_batch(enc_idx[0], mesh),
            "pred_idx": shard_batch(pred_idx.transpose(1, 0, 2), mesh),
        }
        for _ in range(3):
            state, metrics = step(state, batch)
        sync(metrics["loss"])
        return state, step, batch, B

    (per_device_batch, accum), (state, step, batch, B) = ladder(configs, build)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    sync(metrics["loss"])
    dt = time.perf_counter() - t0
    per_chip = B * iters / dt / n_dev
    print(json.dumps({
        "metric": "jepa_vitb_pretrain_throughput",
        "value": round(per_chip, 2),
        "unit": "clips/sec/chip",
        "batch_per_chip": per_device_batch,
        "grad_accum": accum,
        "vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC_PER_ACCEL, 2),
    }), flush=True)
    return per_chip


def bench_simclr(per_device_batches=(256, 128, 64)):
    import jax
    import jax.numpy as jnp

    from bvc_tpu.models import resnet
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_simclr_train_step, place_state
    from bvc_tpu.utils.config import OptimConfig
    from bvc_tpu.utils.profiling import sync

    n_dev = len(jax.devices())
    mesh = make_mesh()
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.01, momentum=0.9))
    params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", head_dim=512)

    def build(per_device_batch):
        B = per_device_batch * n_dev
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1), extra=stats),
            mesh,
        )
        step = make_simclr_train_step(
            mesh, "resnet18", tx, temperature=0.1, dtype=jnp.bfloat16
        )
        pairs = np.random.default_rng(0).integers(
            0, 255, (B, 2, 224, 224, 3), dtype=np.uint8
        )
        batch = shard_batch(pairs, mesh)
        for _ in range(3):
            state, metrics = step(state, batch)
        sync(metrics["loss"])
        return state, step, batch, B

    per_device_batch, (state, step, batch, B) = ladder(per_device_batches, build)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    sync(metrics["loss"])
    dt = time.perf_counter() - t0
    per_chip = B * iters / dt / n_dev  # pairs/sec/chip
    print(json.dumps({
        "metric": "simclr_resnet18_pretrain_throughput",
        "value": round(per_chip, 2),
        "unit": "pairs/sec/chip",
        "batch_per_chip": per_device_batch,
        "vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC_PER_ACCEL, 2),
    }), flush=True)
    return per_chip


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("jepa", "all"):
        bench_jepa()
    if which in ("simclr", "all"):
        bench_simclr()


if __name__ == "__main__":
    main()
