"""Asynchronous checkpoint writes: overlap serialization with training.

The reference blocks the whole job on every ``torch.save``
(``pretraining/generative/pretrain_videomae.py:367-372`` runs on rank 0
while every other rank waits at the next barrier).  Orbax serialization
of a ~94M-param VideoMAE state costs hundreds of ms to seconds of wall
clock per epoch under ``save_every_epoch`` — pure dead time for the chip.

:class:`AsyncCheckpointWriter` splits a save into

1. a synchronous **snapshot**: one bulk device→host transfer
   (``jax.device_get`` over the whole tree) giving copy-on-save isolation
   — the training loop may immediately donate/overwrite the live state;
2. a background **write**: the Orbax serialize + crash-safe atomic swap
   (:func:`bvc_tpu.training.checkpoint.save_checkpoint` semantics,
   including ``.new``/``.old`` recovery) on a daemon thread.

Overlapping saves serialize: a new :meth:`save` first waits for the
previous write.  Exceptions raised in the background propagate at the
next :meth:`save`/:meth:`wait` — a failed checkpoint is never silent.

Multi-host: falls back to the synchronous path.  Backgrounding is only
safe single-controller — ``save_checkpoint``'s cross-host barriers and
distributed Orbax saves issue device collectives, and interleaving those
with foreground train steps from another thread gives nondeterministic
collective order across hosts (deadlock risk).  Single-host covers the
bench/curriculum wall-clock case this feature targets.
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Any

import jax

from bvc_tpu.training.checkpoint import save_checkpoint
from bvc_tpu.utils.logging import get_logger

logger = get_logger("bvc_tpu.async_checkpoint")


class AsyncCheckpointWriter:
    """Background checkpoint writer with snapshot isolation.

    Usage::

        writer = AsyncCheckpointWriter()
        writer.save(path, state_tree, meta)   # returns once snapshotted
        ...                                    # training continues
        writer.wait()                          # before reading the file
    """

    def __init__(self) -> None:
        self._thread: threading.Thread | None = None
        self._exc: BaseException | None = None

    def save(
        self,
        path: str | Path,
        state_tree: dict[str, Any],
        meta: dict[str, Any] | None = None,
    ) -> None:
        """Snapshot ``state_tree`` to host and schedule the write.

        Returns as soon as the snapshot is taken; the caller may mutate
        or donate the live state immediately afterwards.
        """
        self.wait()  # serialize with (and surface errors from) the previous write
        if jax.process_count() > 1:
            # multi-host: synchronous save (see module docstring)
            save_checkpoint(path, state_tree, meta)
            return
        host_tree = jax.device_get(state_tree)
        self._thread = threading.Thread(
            target=self._write,
            args=(Path(path), host_tree, meta),
            name="bvc-ckpt-writer",
            daemon=True,
        )
        self._thread.start()

    def _write(self, path: Path, host_tree: Any, meta: dict | None) -> None:
        try:
            save_checkpoint(path, host_tree, meta)
        except BaseException as e:  # surfaced at the next save()/wait()
            logger.error("async checkpoint write to %s failed: %s", path, e)
            self._exc = e

    def wait(self) -> None:
        """Block until the pending write (if any) completes; re-raise its
        error if it failed."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        exc, self._exc = self._exc, None
        if exc is not None:
            raise exc

    @property
    def in_flight(self) -> bool:
        return self._thread is not None and self._thread.is_alive()
