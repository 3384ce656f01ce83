"""Distributed runtime bootstrap: device mesh construction.

TPU-native replacement for the reference's L0 layer (SURVEY.md §2.1): where
the reference spawns one process per GPU and rendezvous over NCCL on
localhost:12355 (``pretraining/generative/pretrain_videomae.py:87-94,505-515``),
we run single-controller SPMD: one process per host, a
``jax.sharding.Mesh`` over all addressable devices, and XLA inserts the
collectives over ICI/DCN.

The reference's only parallelism is data parallelism (DDP).  Here the mesh
carries up to two axes:

- ``data``  — batch sharding (DP) and, under FSDP, parameter sharding,
- ``model`` — tensor parallelism over attention heads / MLP hidden dim
  (optional; the reference has nothing comparable, models are ViT-B scale).

No barrier / port-staggering machinery is needed (reference
``dist.barrier()`` at ``pretrain_videomae.py:362`` and the bash ``sleep``
staggering): SPMD program order plus ``sync_hosts`` around checkpoint IO
covers it.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"

_DIST_INITIALIZED = False


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bootstrap.

    The SPMD analogue of the reference's SLURM-aware ``init_distributed``
    (``pretraining/predictive/distributed.py:18-46``): reads launcher env
    vars when args are not given, and degrades gracefully to single-process
    (the common case on one host, where calling ``jax.distributed`` is
    unnecessary).
    """
    # NOTE: must not touch jax.devices()/process_count() here — any backend
    # query initialises XLA and jax.distributed.initialize would then fail.
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "BVC_COORDINATOR", None
    )
    if coordinator_address is None:
        return  # single-host: nothing to do
    try:
        # `or` would treat an explicit process_id=0 as unset and fall back
        # to the env var — rank 0 must be expressible explicitly
        if num_processes is None:
            num_processes = int(os.environ.get("SLURM_NTASKS", 1))
        if process_id is None:
            process_id = int(os.environ.get("SLURM_PROCID", 0))
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # already initialised by a launcher/wrapper — graceful no-op
        if "already" not in str(e):
            raise
    _DIST_INITIALIZED = True


def make_mesh(shape: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build the device mesh.

    ``shape`` maps axis name → size, e.g. ``{'data': 4, 'model': 2}``.
    Empty/None puts every device on the ``data`` axis (pure DP — the
    reference's parity configuration).  Axis sizes must multiply to the
    device count; a single trailing ``-1`` is inferred.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not shape:
        shape = {DATA_AXIS: n}
    names = list(shape.keys())
    sizes = list(shape.values())
    if -1 in sizes:
        idx = sizes.index(-1)
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[idx] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh shape {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))
