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
    directory and swapped in only once complete, so a host dying mid-save
    leaves the PREVIOUS checkpoint intact (never a half-written one).
    """
    path = Path(path)
    tmp = path.with_name(path.name + ".new")
    sync_hosts("pre-save")
    distributed = _has_nonaddressable(state_tree)
    if is_main_process() and tmp.exists():
        shutil.rmtree(tmp)  # stale leftovers from a killed save
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
        # atomic swap: the completed .new replaces the old checkpoint
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
    sync_hosts("post-save")


def load_checkpoint(path: str | Path, like: dict[str, Any] | None = None) -> dict[str, Any]:
    """Restore the pytree saved at ``path``.

    ``like``: an abstract/concrete pytree to restore into (gives dtypes &
    shardings).  Without it, raw numpy arrays are returned.
    """
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path / "state", like)
        return ckptr.restore(path / "state")


def load_meta(path: str | Path) -> dict[str, Any]:
    import json

    p = Path(path) / "meta.json"
    return json.loads(p.read_text()) if p.exists() else {}
