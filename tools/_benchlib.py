"""Shared helpers for the benchmark/profiling tools in this directory.

- ``BASELINE_CLIPS_PER_SEC_PER_ACCEL``: the derived per-accelerator floor
  (the reference publishes no throughput; see bench.py for the full
  derivation from the SLURM envelope).
- ``timed``: dispatch-free timing via in-jit repetition with a
  data-dependent input perturbation between reps so XLA cannot CSE the
  repeated pure calls (naive per-call timing over the dev box's TPU
  tunnel reads 3-10x worse — PERFORMANCE.md).
- ``ladder``: try batch sizes in order, raising a clear error when every
  size fails to compile/fit.
"""

from __future__ import annotations

import time

BASELINE_CLIPS_PER_SEC_PER_ACCEL = 4.6

REPS = 8


def timed(fn, params, x, reps: int = REPS):
    """Median ms per call of ``fn(params, x)``; ``x`` is a float array
    that gets a ~1e-20 data-dependent perturbation between reps."""
    import jax
    import jax.numpy as jnp

    from bvc_tpu.utils.profiling import sync

    @jax.jit
    def rep(p, xx):
        s = jnp.float32(0.0)
        for _ in range(reps):
            out = fn(p, xx + s.astype(xx.dtype))
            # consume EVERY output leaf: chaining only the first leaf lets
            # XLA dead-code-eliminate the rest — with value_and_grad that
            # silently drops the whole backward pass (a "fwd+bwd" timing
            # that reads ≤ fwd is this bug)
            s = sum(
                l.ravel()[0].astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(out)
            ) * 1e-20

    r = rep(params, x)
    sync(r)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = rep(params, x)
        sync(r)
        times.append((time.perf_counter() - t0) / reps)
    return sorted(times)[1] * 1e3


def ladder(batch_sizes, build):
    """Call ``build(per_device_batch)`` down the ladder; return the first
    success as ``(per_device_batch, result)`` or raise with every error."""
    errors = []
    for b in batch_sizes:
        try:
            return b, build(b)
        except Exception as e:  # remote-compile flake / OOM at this size
            print(f"# batch {b}/chip failed: {e}", flush=True)
            errors.append((b, e))
    raise RuntimeError(
        f"every batch size in {tuple(batch_sizes)} failed; last error: "
        f"{errors[-1][1]}"
    )
