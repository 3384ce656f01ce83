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


def save_checkpoint(
    path: str | Path,
    state_tree: dict[str, Any],
    meta: dict[str, Any] | None = None,
) -> None:
    """Save a pytree dict + JSON-able metadata at ``path``.

    ``state_tree`` keys mirror the reference dicts, e.g.
    ``{'model_state_dict': params, 'opt': opt_state, ...}`` or the JEPA
    ``{'encoder': ..., 'predictor': ..., 'target_encoder': ...}``.
    """
    path = Path(path)
    sync_hosts("pre-save")
    if is_main_process():
        if path.exists():
            shutil.rmtree(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path.resolve() / "state", _to_host(state_tree))
        if meta is not None:
            import json

            (path / "meta.json").write_text(json.dumps(meta, default=str))
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
