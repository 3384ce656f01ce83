"""Benchmark: VideoMAE-B pretraining step throughput on the local chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}``.

Baseline derivation (the reference publishes no numbers — BASELINE.md):
the generative curriculum job must fit 3 stages x 5 epochs x 2000 iters x
64 global-batch clips inside its 29 h SBATCH limit on 4 A100-class GPUs
(slurmscripts/generative/slurm_dev_def.bash:8,43-59) → an implied
minimum of 1.92M clips / 104400 s / 4 GPUs ≈ 4.6 clips/sec/GPU.
``vs_baseline`` is measured clips/sec/chip over that per-accelerator
floor.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC_PER_ACCEL = 4.6


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    from bvc_tpu.masks.tube import tube_mask
    from bvc_tpu.models import videomae
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.steps import make_videomae_train_step, place_state
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig

    cfg = ModelConfig()  # VideoMAE-B, 224px, 16f, tubelet 2, bf16 compute
    mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.9)
    n_dev = len(jax.devices())
    mesh = make_mesh()
    # 48/chip measures fastest (240.8 clips/s vs 225.6 at 32, see
    # PERFORMANCE.md); fall back down the ladder if the remote compile
    # helper rejects the larger program
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)

    from bvc_tpu.utils.profiling import sync

    step = None
    for per_device_batch in (48, 32, 16):
        batch = per_device_batch * n_dev
        try:
            state = place_state(
                TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh
            )
            step = make_videomae_train_step(mesh, cfg, mask_cfg, tx)
            video = np.random.default_rng(0).integers(
                0, 255,
                (batch, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
                dtype=np.uint8,
            )
            gbatch = shard_batch(video, mesh)
            # warmup (compile) + 2 steps; scalar readback is the only
            # reliable barrier on the tunneled TPU backend
            for _ in range(3):
                state, metrics = step(state, gbatch)
            sync(metrics["loss"])
            break
        except Exception as e:  # remote-compile flake at large batches
            print(f"# batch {per_device_batch}/chip failed to compile: {e}",
                  flush=True)
            step = None
            continue
    if step is None:
        raise RuntimeError("every batch size in (48, 32, 16) failed to compile")

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, gbatch)
    sync(metrics["loss"])
    assert int(jax.device_get(state.step)) == 3 + iters
    dt = time.perf_counter() - t0

    clips_per_sec = batch * iters / dt
    per_chip = clips_per_sec / n_dev
    # MFU: analytic model FLOPs (enc 28.3 + dec 37.3 + bridge/head 3.0
    # GFLOP/clip fwd; fwd+bwd ≈ 3x ≈ 205 GFLOP/clip — PERFORMANCE.md
    # "MFU") over the v5e bf16 peak (197 TFLOP/s)
    flop_per_clip = 205e9
    peak = 197e12
    mfu_pct = per_chip * flop_per_clip / peak * 100.0
    print(json.dumps({
        "metric": "videomae_b_pretrain_throughput",
        "value": round(per_chip, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC_PER_ACCEL, 2),
        "mfu_pct": round(mfu_pct, 1),
    }))


if __name__ == "__main__":
    main()
