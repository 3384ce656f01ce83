"""Checkpoint save/load with the reference's artifact contract.

The reference saves ``model_{run_id}.pth.tar`` torch dicts
(``generative/pretrain_videomae.py:72-85``; JEPA three-model variant at
``pretrain_jepa.py:126-142``) and threads them between curriculum stages
via the filename (``slurmscripts/generative/slurm_dev_def.bash:102-103``).

Here: Orbax (OCDBT) checkpoints in a ``model_{run_id}.ckpt`` directory,
same naming contract, same metadata keys, saved by host 0 only with a
cross-host sync (replacing the pre-save ``dist.barrier()``).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from bvc_tpu.parallel.collectives import sync_hosts
from bvc_tpu.utils.logging import is_main_process


def checkpoint_path(savedir: str | Path, run_id: str) -> Path:
    return Path(savedir) / f"model_{run_id}.ckpt"


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _has_nonaddressable(tree: Any) -> bool:
    return any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        for x in jax.tree_util.tree_leaves(tree)
    )


def save_checkpoint(
    path: str | Path,
    state_tree: dict[str, Any],
    meta: dict[str, Any] | None = None,
) -> None:
    """Save a pytree dict + JSON-able metadata at ``path``.

    ``state_tree`` keys mirror the reference dicts, e.g.
    ``{'model_state_dict': params, 'opt': opt_state, ...}`` or the JEPA
    ``{'encoder': ..., 'predictor': ..., 'target_encoder': ...}``.

    Multi-host correctness: when the tree contains jax Arrays with
    non-addressable shards (FSDP/TP state on a multi-host mesh), EVERY
    process participates in the Orbax save — host 0 alone cannot
    materialise remote shards (the reference's rank-0-only
    ``save_on_master``, ``generative/ddputils.py:49-51``, is only correct
    for replicated state).  Host-local trees (numpy, or fully-addressable
    arrays) keep the host-0-only write.

    Crash safety: the new checkpoint is written to a sibling ``.new``
    directory; the swap parks the previous checkpoint at ``.old`` before
    renaming ``.new`` in, so at EVERY instant at least one complete
    checkpoint exists on disk (a death inside the swap leaves ``.new``
    and/or ``.old`` complete — the next save finishes the swap via
    :func:`_recover_interrupted_swap`, and :func:`load_checkpoint` reads
    the survivors directly).
    """
    path = Path(path)
    tmp = path.with_name(path.name + ".new")
    old = path.with_name(path.name + ".old")
    sync_hosts("pre-save")
    distributed = _has_nonaddressable(state_tree)
    if is_main_process():
        _recover_interrupted_swap(path)
        if tmp.exists():
            shutil.rmtree(tmp)  # stale partial leftovers from a killed save
        if old.exists():
            shutil.rmtree(old)
    if distributed:
        sync_hosts("pre-save-clean")
        # all hosts contribute their shards; Orbax writes one global
        # array per leaf and finalises atomically
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp.resolve() / "state", state_tree)
    elif is_main_process():
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp.resolve() / "state", _to_host(state_tree))
    if is_main_process():
        if meta is not None:
            import json

            (tmp / "meta.json").write_text(json.dumps(meta, default=str))
        # swap: park the previous checkpoint aside, rename the completed
        # .new in, then drop the parked copy — a crash at any point
        # leaves a complete checkpoint recoverable
        if path.exists():
            path.rename(old)
        tmp.rename(path)
        if old.exists():
            shutil.rmtree(old)
    sync_hosts("post-save")


def _recover_interrupted_swap(path: Path) -> None:
    """Finish a swap a previous process died inside: if ``path`` has no
    complete state but a sibling ``.new`` (preferred — the newer save) or
    ``.old`` does, move the survivor in."""
    tmp = path.with_name(path.name + ".new")
    old = path.with_name(path.name + ".old")
    if (path / "state").exists():
        return
    for alt in (tmp, old):
        if (alt / "state").exists():
            if path.exists():
                shutil.rmtree(path)
            alt.rename(path)
            return


def checkpoint_exists(path: str | Path) -> bool:
    """True when a loadable checkpoint exists at ``path`` — including the
    ``.new``/``.old`` survivors of an interrupted swap (which
    :func:`load_checkpoint` reads transparently)."""
    path = Path(path)
    return any(
        (p / "state").exists()
        for p in (path, path.with_name(path.name + ".new"),
                  path.with_name(path.name + ".old"))
    )


def _resolve_ckpt_dir(path: Path) -> Path:
    """The directory actually holding ``state``: ``path`` itself, or a
    ``.new``/``.old`` survivor of an interrupted swap (read-only — no
    renames here, so concurrent readers on shared filesystems are safe)."""
    if (path / "state").exists():
        return path
    for alt in (path.with_name(path.name + ".new"),
                path.with_name(path.name + ".old")):
        if (alt / "state").exists():
            return alt
    return path


def load_checkpoint(path: str | Path, like: dict[str, Any] | None = None) -> dict[str, Any]:
    """Restore the pytree saved at ``path``.

    ``like``: an abstract/concrete pytree to restore into (gives dtypes &
    shardings).  Without it, raw numpy arrays are returned.
    """
    path = _resolve_ckpt_dir(Path(path).resolve())
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path / "state", like)
        return ckptr.restore(path / "state")


def load_meta(path: str | Path) -> dict[str, Any]:
    import json

    p = _resolve_ckpt_dir(Path(path)) / "meta.json"
    return json.loads(p.read_text()) if p.exists() else {}


def checkpoint_saver(cfg) -> tuple[Any, Any]:
    """(save_fn, wait_fn) for a trainer: plain :func:`save_checkpoint`,
    or the background :class:`AsyncCheckpointWriter`'s save when
    ``cfg.async_save`` (training overlaps serialization; ``wait_fn`` must
    run before returning the checkpoint path so it is complete on disk).
    Shared by all three trainers so the fallback policy cannot drift.
    """
    if getattr(cfg, "async_save", False):
        from bvc_tpu.training.async_checkpoint import AsyncCheckpointWriter

        writer = AsyncCheckpointWriter()
        return writer.save, writer.wait
    return save_checkpoint, lambda: None
