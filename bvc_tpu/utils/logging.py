"""Metrics / logging / observability.

Unifies the three near-identical copies of ``loggingtools.py`` in the
reference (``pretraining/{generative,predictive,contrastive}/loggingtools.py``,
see SURVEY.md §2.10): CSVLogger with printf-style column formats, the
AverageMeter, per-layer gradient-norm probes (generalised over model family
instead of hard-coding per-family parameter names), and process-0-only
printing (reference monkey-patches ``builtins.print`` in
``ddputils.py:9-22``; we provide an explicit helper instead).
"""

from __future__ import annotations

import builtins
import logging
from typing import Any, Callable, Iterable

import jax
import numpy as np


class CSVLogger:
    """Append-per-iteration CSV logger.

    Column schema is declared as ``(fmt, name)`` pairs exactly like the
    reference (``predictive/loggingtools.py:31-49``), e.g.::

        CSVLogger(path, ('%d', 'epoch'), ('%d', 'itr'), ('%.5f', 'loss'))
    """

    def __init__(self, fname: str, *columns: tuple[str, str], append: bool = False):
        """``append=True`` preserves existing rows (mid-stage resume) and
        only writes the header when the file doesn't exist yet."""
        import os

        self.fname = fname
        self.types = [c[0] for c in columns]
        if append and os.path.exists(fname):
            return
        with open(self.fname, "w") as f:
            f.write(",".join(c[1] for c in columns) + "\n")

    def log(self, *values: Any) -> None:
        row = ",".join(
            fmt % _to_py(v) for fmt, v in zip(self.types, values)
        )
        with open(self.fname, "a") as f:
            f.write(row + "\n")


def _to_py(v: Any):
    """Device arrays → python scalars so '%'-formatting works."""
    if isinstance(v, (jax.Array, np.ndarray)) and np.ndim(v) == 0:
        return v.item()
    return v


class AverageMeter:
    """Running mean/min/max tracker (``predictive/loggingtools.py:52-75``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.max = float("-inf")
        self.min = float("inf")
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = _to_py(val)
        self.val = val
        try:
            self.max = max(val, self.max)
            self.min = min(val, self.min)
        except Exception:
            pass
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class GradStats:
    """Container for the per-family gradient probes logged to CSV."""

    def __init__(self):
        self.first_layer = 0.0
        self.last_layer = 0.0
        # generative schema names (pretrain_videomae.py:148-150)
        self.enc_first_layer = 0.0
        self.enc_last_layer = 0.0
        self.dec_last_layer = 0.0
        self.mean = 0.0


def grad_logger(grads: Any, probes: dict[str, Callable[[Any], Any]] | None = None) -> GradStats:
    """Compute gradient-norm probes from a grads pytree.

    The reference re-implements ``grad_logger`` per model family with
    hard-coded parameter names (generative tracks VideoMAE embed/enc/dec
    layers, predictive tracks 'qkv' weights, contrastive tracks
    conv1/fc.0 — SURVEY.md §1).  Here the trainer passes ``probes``: a dict
    of attribute-name → function(grads pytree) → array, and we also compute
    the mean L2 norm over all non-1D leaves as a health signal.
    """
    stats = GradStats()
    leaves = [g for g in jax.tree_util.tree_leaves(grads) if np.ndim(g) > 1]
    if leaves:
        norms = [float(np.linalg.norm(np.asarray(g, dtype=np.float32))) for g in leaves]
        stats.mean = float(np.mean(norms))
        stats.first_layer = norms[0]
        stats.last_layer = norms[-1]
    if probes:
        for name, fn in probes.items():
            try:
                setattr(stats, name, float(np.asarray(fn(grads))))
            except Exception:
                setattr(stats, name, 0.0)
    return stats


def is_main_process() -> bool:
    """True on the process that should write checkpoints/logs.

    SPMD analogue of ``ddputils.is_main_process`` — in JAX's
    single-controller-per-host model this is host 0.
    """
    return jax.process_index() == 0


def main_process_only_print(enabled: bool | None = None) -> None:
    """Silence ``print`` on non-main hosts.

    Explicit, reversible analogue of the reference's
    ``setup_for_distributed`` monkey-patch (``generative/ddputils.py:9-22``):
    prints on non-zero hosts become no-ops unless called with
    ``force=True``.
    """
    if enabled is None:
        enabled = is_main_process()
    builtin_print = getattr(builtins, "_bvc_builtin_print", builtins.print)
    builtins._bvc_builtin_print = builtin_print

    def _print(*args, **kwargs):
        force = kwargs.pop("force", False)
        if enabled or force:
            builtin_print(*args, **kwargs)

    builtins.print = _print


def get_logger(name: str = "bvc_tpu", level: int | None = None) -> logging.Logger:
    """Stdlib logger: INFO on host 0, ERROR elsewhere
    (reference ``pretrain_jepa.py:160-165``)."""
    logging.basicConfig()
    logger = logging.getLogger(name)
    if level is None:
        level = logging.INFO if is_main_process() else logging.ERROR
    logger.setLevel(level)
    return logger


def nan_guard(loss, context: str = "") -> None:
    """Fail fast on NaN loss (reference ``pretrain_jepa.py:469``)."""
    val = float(loss)
    if np.isnan(val) or np.isinf(val):
        raise FloatingPointError(f"loss is {val} {context}")
