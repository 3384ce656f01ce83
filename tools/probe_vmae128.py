"""One-off: VideoMAE-B single-shot bs-128 retry + HEAD bs-48 check.

PERFORMANCE.md round-3 notes the remote compile helper rejected bs-128
scale programs (HTTP 500, 4/4) — an infra ceiling, not a device limit.
This probe retries the ladder top-down in one process (128, 96, 64, 48)
so the same session gives an apples-to-apples throughput ladder at HEAD
and records whether the helper still rejects the large programs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
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

    for per_device_batch in (128, 96, 64, 48):
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
            for _ in range(3):
                state, metrics = step(state, gbatch)
            sync(metrics["loss"])
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, gbatch)
            sync(metrics["loss"])
            dt = time.perf_counter() - t0
            print(json.dumps({
                "probe": "vmae_ladder", "batch_per_chip": per_device_batch,
                "clips_per_sec_chip": round(batch * iters / dt / n_dev, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "probe": "vmae_ladder", "batch_per_chip": per_device_batch,
                "error": str(e)[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
