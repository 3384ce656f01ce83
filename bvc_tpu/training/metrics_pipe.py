"""Lag-1 metrics pipeline: log step i-1 while step i runs.

The reference synchronizes the accelerator every iteration to log the
loss (``gpu_timer`` + CSV write per step).  Fetching a freshly-dispatched
step's metrics stalls the pipeline for the device round-trip (~1-3 ms on
remote-attached TPUs, plus losing dispatch overlap).  Deferring the fetch
by one step means the values are already materialised when read — the
async dispatch queue never drains.

Wall-clock per-step timing needs a hard sync, so it is only taken every
``time_every`` steps; other steps report the last measured value.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax

from bvc_tpu.utils.profiling import sync


class MetricsPipe:
    """Wraps the per-iteration ``(state, metrics) = step(...)`` loop.

    Usage::

        pipe = MetricsPipe(log_fn, time_every=10)
        for itr, batch in enumerate(loader):
            state, metrics = step(state, batch)
            pipe.push(itr, metrics)   # logs itr-1's metrics, unstalled
        pipe.flush()                  # logs the final step
    """

    def __init__(self, log_fn: Callable[[int, dict], None], time_every: int = 10):
        self.log_fn = log_fn
        self.time_every = max(1, time_every)
        self._pending: tuple[int, dict] | None = None
        self._t_last = time.perf_counter()
        self._last_ms = 0.0
        self._count_since_time = 0

    def push(self, itr: int, metrics: dict) -> float:
        """Queue this step's metrics; emit the previous step's.  Returns
        the most recent per-step ms estimate."""
        if self._pending is not None:
            p_itr, p_metrics = self._pending
            self.log_fn(p_itr, {k: v for k, v in p_metrics.items()})
        self._pending = (itr, metrics)
        self._count_since_time += 1
        if self._count_since_time >= self.time_every:
            sync(metrics.get("loss", metrics))
            now = time.perf_counter()
            self._last_ms = (now - self._t_last) * 1e3 / self._count_since_time
            self._t_last = now
            self._count_since_time = 0
        return self._last_ms

    def flush(self) -> None:
        if self._pending is not None:
            itr, metrics = self._pending
            sync(metrics.get("loss", metrics))
            self.log_fn(itr, metrics)
            self._pending = None
        self._t_last = time.perf_counter()
        self._count_since_time = 0
