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
    """Times closures in milliseconds, device-synchronized.

    Synchronization note: on some remote-attached TPU backends (the axon
    tunnel in this environment) ``jax.block_until_ready`` returns before
    execution finishes; fetching a scalar leaf to the host is the reliable
    barrier, so we do both.
    """

    def __call__(self, closure: Callable[[], Any]) -> tuple[Any, float]:
        t0 = time.perf_counter()
        result = closure()
        sync(result)
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        return result, elapsed_ms


def sync(tree: Any) -> None:
    """Barrier on a pytree: block + force a scalar readback."""
    jax.block_until_ready(tree)
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim") and leaf.ndim == 0:
            jax.device_get(leaf)
            return
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves and hasattr(leaves[0], "addressable_shards"):
        # fetch one element of the first leaf
        jax.device_get(leaves[0].addressable_shards[0].data.ravel()[:1])


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


class StepTraceWindow:
    """Capture ONE ``jax.profiler`` trace of train steps
    ``[start, start + n)`` — the CLI's ``--profile_dir`` implementation.

    The reference's only tracing is the cuda-event ``gpu_timer``
    (``predictive/loggingtools.py:11-28``, ms per step); this captures
    the full XLA op-level timeline instead, viewable in
    TensorBoard/Perfetto.  ``start`` defaults past step 0 so the
    compile isn't what gets traced.  No-op when ``logdir`` is empty;
    multi-process runs trace only process 0 (one timeline is wanted,
    not N identical ones).
    """

    def __init__(self, logdir: str, start: int = 1, n: int = 3):
        if jax.process_count() > 1 and jax.process_index() != 0:
            logdir = ""
        self.logdir = logdir
        self.start, self.stop_at = start, start + n
        self._seen = 0
        self._open = False

    def step(self, _itr: int | None = None) -> None:
        """Call once per train step (before dispatching it)."""
        if not self.logdir:
            return
        if self._seen == self.start and not self._open:
            jax.profiler.start_trace(self.logdir)
            self._open = True
        elif self._seen == self.stop_at and self._open:
            jax.profiler.stop_trace()
            self._open = False
        self._seen += 1

    def close(self) -> None:
        if self._open:
            jax.profiler.stop_trace()
            self._open = False
