"""Tracing / profiling utilities.

TPU-native replacements for the reference's CUDA-event ``gpu_timer``
(``predictive/loggingtools.py:11-28``) and
``torch.cuda.max_memory_allocated`` telemetry
(``generative/pretrain_videomae.py:344``):

- ``StepTimer``: wall-clock timing of a closure with
  ``jax.block_until_ready`` on its outputs, so async dispatch doesn't hide
  device time (the analogue of ``cuda.synchronize``).
- ``device_memory_stats``: per-device HBM usage via
  ``jax.Device.memory_stats``.
- ``trace``: context manager around ``jax.profiler`` for capturing full
  XLA traces viewable in TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


class StepTimer:
    """Times closures in milliseconds, device-synchronized."""

    def __call__(self, closure: Callable[[], Any]) -> tuple[Any, float]:
        t0 = time.perf_counter()
        result = closure()
        jax.block_until_ready(result)
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        return result, elapsed_ms


def device_memory_stats(device: jax.Device | None = None) -> dict[str, float]:
    """Bytes-in-use / peak / limit for a device; zeros where unsupported
    (CPU test meshes report nothing)."""
    if device is None:
        device = jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "bytes_in_use": float(stats.get("bytes_in_use", 0)),
        "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
        "bytes_limit": float(stats.get("bytes_limit", 0)),
    }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profile trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
