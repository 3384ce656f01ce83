"""Per-computation XLA compiler-option sweep on the flagship train step.

XLA_FLAGS is fixed per process, but ``lowered.compile(compiler_options=...)``
ships options inside each compile request — so one process (one tunnel
warmup) can A/B backend tunables on the exact flagship program.  The
remote compile helper validates names server-side (unknown flags HTTP
500), so speculative arms are caught per-arm and reported as rejected.

Arms: scoped-VMEM ceiling (bigger fusions may buffer more in VMEM),
latency-hiding scheduler off (isolates its contribution), and a couple
of fusion toggles.  Usage: python tools/probe_xla_options.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = [
    ("default", None),
    ("scoped_vmem=32768", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem=65536", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem=98304", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("latency_hiding_sched=off",
     {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("async_all_gather=off", {"xla_tpu_enable_async_all_gather": "false"}),
    ("flm_cost_model=on",
     {"xla_tpu_use_flm_cost_model": "true"}),
    ("dot_merger=off", {"xla_tpu_enable_dot_strength_reduction": "false"}),
]


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bvc_tpu.models import videomae
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.parallel.sharding import batch_sharding
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.steps import make_videomae_train_step, place_state
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig
    from bvc_tpu.utils.profiling import sync

    per_chip = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    cfg = ModelConfig()
    mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.9)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)
    host_state = TrainState.create(params, tx, jax.random.PRNGKey(1))

    B = per_chip * n_dev
    video = np.random.default_rng(0).integers(
        0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
        dtype=np.uint8)
    gbatch = shard_batch(video, mesh)

    # one regular call resolves the state shardings (and warms the tunnel)
    step = make_videomae_train_step(mesh, cfg, mask_cfg, tx)
    st = place_state(host_state, mesh)
    st, metrics = step(st, gbatch)
    sync(metrics["loss"])
    st_sh = step.shardings()
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(step.raw_step, in_shardings=(st_sh, batch_sharding(mesh)),
                     out_shardings=(st_sh, rep), donate_argnums=(0,))
    lowered = jitted.lower(place_state(host_state, mesh), gbatch)

    results = []
    for name, opts in ARMS:
        try:
            t_c = time.perf_counter()
            ex = (lowered.compile() if opts is None
                  else lowered.compile(compiler_options=opts))
            compile_s = time.perf_counter() - t_c
        except Exception as e:
            print(f"{name:28s} REJECTED: {str(e)[:100]}", flush=True)
            continue
        s = place_state(host_state, mesh)
        for _ in range(3):  # warm this executable
            s, m = ex(s, gbatch)
        sync(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            s, m = ex(s, gbatch)
        sync(m["loss"])
        dt = time.perf_counter() - t0
        rate = B * iters / dt / n_dev
        results.append((rate, name))
        print(f"{name:28s} {rate:7.1f} clips/s/chip  "
              f"(loss {float(jax.device_get(m['loss'])):.4f}, "
              f"compile {compile_s:.0f}s)", flush=True)
    results.sort(reverse=True)
    if results:
        print(f"\nbest: {results[0][1]} at {results[0][0]:.1f} clips/s/chip")


if __name__ == "__main__":
    main()
