"""Sharding layout: how batches and parameter pytrees map onto the mesh.

Replaces the reference's DDP wrap + ``DistributedSampler``
(``generative/pretrain_videomae.py:180-181,225-235``): instead of N model
replicas with NCCL grad buckets, params carry a ``NamedSharding`` and the
batch is sharded over the ``data`` axis; XLA emits the grad all-reduce (or
reduce-scatter under FSDP) automatically from the jitted train step.

Three parameter layouts:

- ``replicated``: DP parity with the reference (ViT-B fits on any chip).
- ``fsdp``: every >=2-D param sharded over ``data`` on its largest
  divisible dim; XLA turns grads into reduce-scatter + all-gather on use.
- ``tp``: tensor parallelism over ``model`` using structural rules for the
  transformer blocks (qkv/MLP-in column-parallel, proj/MLP-out
  row-parallel).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bvc_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over ``data``; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_on_dim(ndim: int, dim: int, axis: str = DATA_AXIS) -> P:
    entries: list[Any] = [None] * ndim
    entries[dim] = axis
    return P(*entries)


# Substrings of flattened param paths → partition axis counted FROM THE
# END (stacked-layer params carry a leading depth axis, so from-the-end
# indexing is layout-invariant).  Matches bvc_tpu.models.vit.
_TP_RULES: tuple[tuple[str, int], ...] = (
    ("attn/qkv/kernel", -1),   # [.., D, 3D'] → column parallel (heads)
    ("attn/qkv/bias", -1),     # [.., 3D']
    ("attn/proj/kernel", -2),  # [.., D', D]  → row parallel
    ("mlp/fc1/kernel", -1),    # [.., D, 4D]  → column parallel
    ("mlp/fc1/bias", -1),      # [.., 4D]
    ("mlp/fc2/kernel", -2),    # [.., 4D, D]  → row parallel
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params: Any, mesh: Mesh, mode: str = "replicated") -> Any:
    """Pytree of ``NamedSharding`` matching ``params``.

    ``mode``: 'replicated' | 'fsdp' | 'tp' (tp composes with DP on the
    batch; requires a ``model`` axis in the mesh).
    """
    has_model_axis = MODEL_AXIS in mesh.axis_names
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    data_size = mesh.shape.get(DATA_AXIS, 1)

    def spec_for(path, leaf) -> NamedSharding:
        pstr = _path_str(path)
        shape = np.shape(leaf)
        if mode == "tp" and has_model_axis:
            for pat, dim_from_end in _TP_RULES:
                if pstr.endswith(pat) or (pat in pstr):
                    d = len(shape) + dim_from_end
                    if 0 <= d < len(shape) and shape[d] % model_size == 0:
                        return NamedSharding(mesh, _spec_on_dim(len(shape), d, MODEL_AXIS))
            return NamedSharding(mesh, P())
        if mode == "fsdp":
            if len(shape) >= 2:
                order = sorted(range(len(shape)), key=lambda i: -shape[i])
                for d in order:
                    if shape[d] % data_size == 0 and shape[d] >= data_size:
                        return NamedSharding(mesh, _spec_on_dim(len(shape), d, DATA_AXIS))
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_batch(batch: Any, mesh: Mesh, spec: P | None = None) -> Any:
    """Device-put host-local numpy batches as a global batch sharded on
    ``data`` (or an explicit ``spec`` — e.g. ``P('data', 'seq')`` for the
    sequence-parallel step's time-sharded videos).

    Single-host: a plain sharded ``device_put``.  Multi-host: each process
    contributes its local slice via
    ``jax.make_array_from_process_local_data`` (the SPMD replacement for
    ``DistributedSampler``'s rank slicing).
    """
    sharding = batch_sharding(mesh) if spec is None else NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def host_local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(start, size) of this host's slice of the global batch — the index
    striding the reference delegates to ``DistributedSampler``."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch_size // n
    return i * per, per
