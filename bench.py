"""Benchmark: the framework's north-star metrics on the local chip.

Prints one JSON line per metric, with the flagship LAST (the driver
tail-parses the final line):

- ``videomae_embed_extraction_throughput`` (frames/sec/chip) — the
  second north-star in BASELINE.json (reference hot loop:
  ``benchmarks/compute_embeddings_videomae.py:253-264``).
- ``jepa_vitb_pretrain_throughput`` (clips/sec/chip).
- ``simclr_resnet18_pretrain_throughput`` (pairs/sec/chip).
- ``videomae_b_pretrain_throughput`` (clips/sec/chip) — the flagship:
  ``{"metric": ..., "value": N, "unit": "clips/sec/chip",
  "vs_baseline": N}``.

Deadline-aware (round-5 fix for the BENCH_r04 rc=124 timeout, where
five compile-heavy secondaries starved the flagship out of the driver's
wall-clock budget):

1. The FLAGSHIP is computed FIRST — its number exists before any
   secondary spends a second — but printed LAST, preserving the
   driver's tail-line contract.
2. SIGTERM/SIGINT handlers flush the held flagship line before dying,
   so even a driver timeout mid-secondary still tail-carries the
   flagship.
3. Secondaries run inside a soft deadline (``BVC_BENCH_DEADLINE_S``
   from process start, default 1080 s — the flagship alone measures
   ~957 s of that, dominated by the ~7 min tunnel warmup): each is
   skipped with a ``#`` note unless the remaining budget clears the
   measured cost of the priciest secondary so far (floor 120 s) plus a
   60 s tail margin.  The driver's wall-clock budget is NOT observable
   from here; the only calibration points are round records (r3:
   flagship-only ~957 s → rc 0; r4: secondaries-first → rc 124), so
   the default deadline hugs the proven-safe envelope — a driver run
   typically records the flagship plus whatever warmup variance leaves
   room for, and a manual run can raise the env var to capture
   everything (``BVC_BENCH_DEADLINE_S=2400 python bench.py``).
   Priority order: bf16 extraction, JEPA, SimCLR; the int8 extraction
   arm is manual-only (``python bench.py int8``) — it duplicates the
   bf16 compile cost for an opt-in path.

Baseline derivation (the reference publishes no numbers — BASELINE.md):
the generative curriculum job must fit 3 stages x 5 epochs x 2000 iters x
64 global-batch clips inside its 29 h SBATCH limit on 4 A100-class GPUs
(slurmscripts/generative/slurm_dev_def.bash:8,43-59) → an implied
minimum of 1.92M clips / 104400 s / 4 GPUs ≈ 4.6 clips/sec/GPU.
``vs_baseline`` is measured clips/sec/chip over that per-accelerator
floor.

Usage: ``python bench.py [all|flagship|extract|int8|families]``
(default all).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_CLIPS_PER_SEC_PER_ACCEL = 4.6

_TOOLS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")

_T_START = time.perf_counter()


def flagship() -> dict:
    """Measure the VideoMAE-B pretraining step; return the JSON record."""
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
    return {
        "metric": "videomae_b_pretrain_throughput",
        "value": round(per_chip, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_CLIPS_PER_SEC_PER_ACCEL, 2),
        "mfu_pct": round(mfu_pct, 1),
    }


_flagship_line: str | None = None
_flagship_emitted = False


def _emit_flagship() -> None:
    global _flagship_emitted
    if _flagship_line is not None and not _flagship_emitted:
        _flagship_emitted = True
        print(_flagship_line, flush=True)


def _guard_flagship(line: str) -> None:
    """Hold the flagship line; flush it as the LAST line even on a kill.

    ``timeout(1)`` sends SIGTERM — flush the held line and die
    immediately (``os._exit`` skips XLA teardown, which can hang on the
    tunneled backend past the kill grace period).
    """
    global _flagship_line
    _flagship_line = line

    def handler(signum, frame):
        _emit_flagship()
        os._exit(0)

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)


def _run_secondaries(deadline_s: float) -> None:
    """Run secondary benches, skipping any that can't fit the budget."""
    import bench_extract
    import bench_families

    jobs = (
        ("extract", lambda: bench_extract.bench("videomae")),
        ("jepa", bench_families.bench_jepa),
        ("simclr", bench_families.bench_simclr),
    )
    est = 120.0  # initial per-secondary estimate; updated from measurement
    margin = 60.0  # tail room so the flagship line lands before any kill
    for name, fn in jobs:
        remaining = deadline_s - (time.perf_counter() - _T_START)
        if remaining < est + margin:
            print(f"# skipping {name} bench: {remaining:.0f}s of budget "
                  f"left < {est:.0f}s estimated cost + {margin:.0f}s margin",
                  flush=True)
            continue
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:
            print(f"# {name} bench failed: {e}", flush=True)
        est = max(est, time.perf_counter() - t0)


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sys.path.insert(0, _TOOLS)

    if which == "all":
        # Driver mode: flagship FIRST (so its number exists whatever
        # happens next), printed LAST (driver tail-parses final line).
        record = flagship()
        _guard_flagship(json.dumps(record))
        try:
            deadline_s = float(os.environ.get("BVC_BENCH_DEADLINE_S", "1080"))
            _run_secondaries(deadline_s)
        finally:
            _emit_flagship()
        return

    # Manual modes: run exactly what was asked, no deadline.
    if which == "extract":
        import bench_extract

        bench_extract.bench("videomae")
    elif which == "int8":
        import bench_extract

        bench_extract.bench("videomae", quantize="int8")
    elif which == "families":
        import bench_families

        bench_families.bench_jepa()
        bench_families.bench_simclr()
    elif which == "flagship":
        print(json.dumps(flagship()), flush=True)
    else:
        raise SystemExit(f"unknown mode {which!r} (all|flagship|extract|"
                         "int8|families)")


if __name__ == "__main__":
    main()
