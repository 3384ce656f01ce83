"""Regression tests for the profiling harness (tools/_benchlib.py).

``timed`` is the measurement foundation of PERFORMANCE.md — two real
bugs motivated these tests:

- consuming only the first output leaf let XLA dead-code-eliminate the
  gradients of a ``value_and_grad`` target, so every "fwd+bwd" number
  silently measured forward only (symptom: fwd+bwd ≤ fwd);
- a dropped ``return`` made the repetition body entirely dead and all
  timings read ~0 ms.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


class TestTimed:
    def _setup(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((384, 384)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((384, 384)), jnp.float32)
        return w, x

    def test_matches_ground_truth_on_nonlinear_fn(self):
        import jax
        import jax.numpy as jnp

        from _benchlib import timed

        w, x = self._setup()
        fn = lambda p, xx: jnp.tanh(xx @ p)  # noqa: E731
        g = jax.jit(fn)
        g(w, x).block_until_ready()
        # min over repeats: the box is 1-core and the full suite loads it,
        # so any single wall-clock sample can be several x off
        gt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                r = g(w, x)
            r.block_until_ready()
            gt = min(gt, (time.perf_counter() - t0) / 8 * 1e3)

        t = min(timed(fn, w, x) for _ in range(2))
        # generous bounds: the failure modes this guards against read
        # ~0.01 ms (1000x off), not 10x
        assert 0.05 * gt < t < 10.0 * gt + 2.0, (t, gt)

    def test_backward_pass_is_not_dce_eliminated(self):
        import jax
        import jax.numpy as jnp

        from _benchlib import timed

        w, x = self._setup()
        fwd = timed(lambda p, xx: jnp.tanh(xx @ p), w, x)
        vg = jax.value_and_grad(lambda p, xx: jnp.tanh(xx @ p).sum())
        both = timed(vg, w, x)
        assert both > 1.3 * fwd, (fwd, both)
