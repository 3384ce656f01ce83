"""Retry the full-KV backward flash block on the UNMASKED flagship step.

Round 4 measured bwd_bk=1568 beating 784 by ~18% standalone at the
decoder shape, but the FULL flagship train-step program with it
reproducibly 500'd the environment's remote compile helper (6/6
attempts — PERFORMANCE.md round-4 addendum), so the unmasked path kept
784.  VERDICT r4 weak #6 asks for a retry / fallback strategy.  This
probe jits the EXACT flagship train step twice — default blocks vs
``BVC_FLASH_BWD_BK=1568`` (the new env override in
``ops/flash_attention.py``) — reporting compile success and timed
throughput for each.

Usage: BVC_FLASH_BWD_BK unset!  python tools/probe_fullkv_bwd.py [bs]
(the probe sets/clears the env var itself between the two arms)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax

    from bvc_tpu.models import videomae
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_videomae_train_step, place_state
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig
    from bvc_tpu.utils.profiling import sync

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    cfg = ModelConfig()
    mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.9)
    mesh = make_mesh()
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)
    video = np.random.default_rng(0).integers(
        0, 255, (bs, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
        dtype=np.uint8)

    for arm, bk in (("default(784)", None), ("fullkv(1568)", "1568")):
        if bk is None:
            os.environ.pop("BVC_FLASH_BWD_BK", None)
        else:
            os.environ["BVC_FLASH_BWD_BK"] = bk
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh)
        step = make_videomae_train_step(mesh, cfg, mask_cfg, tx)
        gbatch = shard_batch(video, mesh)
        try:
            t0 = time.perf_counter()
            for _ in range(3):
                state, metrics = step(state, gbatch)
            sync(metrics["loss"])
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"[{arm}] COMPILE/RUN FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, gbatch)
        sync(metrics["loss"])
        dt = time.perf_counter() - t0
        print(f"[{arm}] ok: {bs * iters / dt:.1f} clips/s "
              f"(compile+3 steps {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
