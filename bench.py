"""Benchmark: the framework's north-star metrics on the local chip.

Prints one JSON line per metric, with the flagship LAST (the driver
tail-parses the final line):

1. ``videomae_embed_extraction_throughput`` (frames/sec/chip) — the
   second north-star in BASELINE.json (reference hot loop:
   ``benchmarks/compute_embeddings_videomae.py:253-264``).
2. ``jepa_vitb_pretrain_throughput`` (clips/sec/chip).
3. ``simclr_resnet18_pretrain_throughput`` (pairs/sec/chip).
4. ``videomae_b_pretrain_throughput`` (clips/sec/chip) — the flagship:
   ``{"metric": ..., "value": N, "unit": "clips/sec/chip",
   "vs_baseline": N}``.

Secondary benches are individually guarded: a failure prints a ``#``
comment line and the flagship still runs (and stays the tail line).

Baseline derivation (the reference publishes no numbers — BASELINE.md):
the generative curriculum job must fit 3 stages x 5 epochs x 2000 iters x
64 global-batch clips inside its 29 h SBATCH limit on 4 A100-class GPUs
(slurmscripts/generative/slurm_dev_def.bash:8,43-59) → an implied
minimum of 1.92M clips / 104400 s / 4 GPUs ≈ 4.6 clips/sec/GPU.
``vs_baseline`` is measured clips/sec/chip over that per-accelerator
floor.

Usage: ``python bench.py [all|flagship|extract|families]`` (default all).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_CLIPS_PER_SEC_PER_ACCEL = 4.6

_TOOLS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")


def flagship():
    import jax

    from bvc_tpu.models import videomae
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.steps import make_videomae_train_step, place_state
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig
    from bvc_tpu.utils.profiling import sync

    cfg = ModelConfig()  # VideoMAE-B, 224px, 16f, tubelet 2, bf16 compute
    mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.9)
    n_dev = len(jax.devices())
    mesh = make_mesh()
    # 48/chip measures fastest (240.8 clips/s vs 225.6 at 32, see
    # PERFORMANCE.md); fall back down the ladder if the remote compile
    # helper rejects the larger program
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)

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
    }), flush=True)


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sys.path.insert(0, _TOOLS)

    # Secondary metrics FIRST: the driver parses the LAST stdout line as
    # the flagship, so these must never print after it.  Each is guarded
    # — a secondary failure must not cost the flagship number.
    if which in ("extract", "all"):
        try:
            import bench_extract

            bench_extract.bench("videomae")
        except Exception as e:
            print(f"# extraction bench failed: {e}", flush=True)
        try:
            import bench_extract

            # the opt-in W8A8 path (--quantize int8, ops/quant.py)
            bench_extract.bench("videomae", quantize="int8")
        except Exception as e:
            print(f"# int8 extraction bench failed: {e}", flush=True)
    if which in ("families", "all"):
        try:
            import bench_families

            bench_families.bench_jepa()
        except Exception as e:
            print(f"# jepa bench failed: {e}", flush=True)
        try:
            import bench_families

            bench_families.bench_simclr()
        except Exception as e:
            print(f"# simclr bench failed: {e}", flush=True)
    if which in ("flagship", "all"):
        flagship()


if __name__ == "__main__":
    main()
