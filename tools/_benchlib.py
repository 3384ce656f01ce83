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
            # consume EVERY ELEMENT of EVERY output leaf via a full
            # reduction.  Anything less lets XLA shrink the work: an
            # unconsumed leaf is dead-code-eliminated (value_and_grad
            # loses its whole backward — symptom: fwd+bwd ≤ fwd), and a
            # single-element chain invites the slice-of-dot pushdown
            # (out[0,0] needs only row 0 of the matmul — measured
            # collapsing an 8x matmul chain to ~0 ms).  The reduction
            # adds one elementwise pass per leaf per rep: ~5% at the
            # attention shapes, fair across compared impls.
            s = sum(
                jnp.sum(l, dtype=jnp.float32)
                for l in jax.tree_util.tree_leaves(out)
            ) * 1e-20
        return s

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
