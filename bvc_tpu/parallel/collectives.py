"""Cross-host collectives used outside the jitted step.

Inside the jitted train step no explicit collectives are needed — the loss
is a global mean over the sharded batch, so XLA inserts the reductions the
reference expressed manually (custom autograd ``AllReduce`` at
``generative/ddputils.py:53-68`` and DDP grad buckets).

These helpers cover the host-side cases:

- ``all_gather_objects``: eval-result aggregation, replacing
  ``dist.all_gather_object`` (``benchmarks/compute_embeddings_jepa.py:230,253``).
- ``sync_hosts``: a named barrier around checkpoint IO, replacing the
  per-epoch ``dist.barrier()``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def all_gather_objects(data: dict[str, Any]) -> list[dict[str, Any]]:
    """Gather per-host result dicts onto every host.

    For single-process runs returns ``[data]``.  Multi-host uses
    ``multihost_utils.process_allgather`` on the array leaves and plain
    broadcast agreement on list-of-strings (fnames) via size-prefixed
    uint8 arrays.
    """
    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    out: list[dict[str, Any]] = [dict() for _ in range(jax.process_count())]
    for key, val in data.items():
        # The branch decides the SEQUENCE of collectives, so it must be
        # identical on every host: an empty fnames list on one host must
        # still take the string branch its peers take (checking val[0]
        # desynchronized the schedule → gloo preamble-mismatch abort;
        # caught by tests/test_multihost.py).  Decide by CONTAINER type
        # alone — list/tuple ⇒ string blob; non-str contents raise
        # loudly instead of silently choosing a host-dependent branch.
        if isinstance(val, (list, tuple)):
            if not all(isinstance(x, str) for x in val):
                raise TypeError(
                    f"all_gather_objects[{key!r}]: list values must be "
                    "strings (pass numeric data as an ndarray)"
                )
            blob = "\x00".join(val).encode("utf-8")
            arr = np.frombuffer(blob, dtype=np.uint8)
            # pad to a common length across hosts
            n = int(
                multihost_utils.process_allgather(np.asarray([arr.size])).max()
            )
            padded = np.zeros(n + 1, np.uint8)
            padded[: arr.size] = arr
            gathered = multihost_utils.process_allgather(padded)
            for i in range(jax.process_count()):
                raw = bytes(gathered[i]).rstrip(b"\x00")
                out[i][key] = raw.decode("utf-8").split("\x00") if raw else []
        else:
            arr = np.asarray(val)
            # hosts may hold different row counts (uneven slices, dropped
            # undecodable samples) and a zero-row host may not even know
            # the trailing dims — agree on the full padded shape first
            shape_vec = np.zeros(8, np.int64)
            shape_vec[0] = arr.shape[0]
            for d, sz in enumerate(arr.shape[1:], start=1):
                shape_vec[d] = sz
            shapes = multihost_utils.process_allgather(shape_vec)
            counts = shapes[:, 0]
            trailing = tuple(int(x) for x in shapes.max(axis=0)[1:] if x > 0)
            max_rows = int(counts.max())
            padded = np.zeros((max_rows,) + trailing, arr.dtype)
            if arr.shape[0]:
                padded[: arr.shape[0]] = arr.reshape((arr.shape[0],) + trailing)
            gathered = multihost_utils.process_allgather(padded)
            for i in range(jax.process_count()):
                out[i][key] = gathered[i][: int(counts[i])]
    return out


def all_gather_grad(x, axis_name: str):
    """Gradient-preserving all-gather inside ``shard_map``/``pmap`` code.

    The analogue of the reference's custom autograd ``AllGather``
    (``pretraining/predictive/distributed.py:49-77``: forward gather +
    concat, backward reduce-scatter back to the local slice).  In JAX,
    ``lax.all_gather`` is already differentiable with exactly these
    semantics, so this is a thin named wrapper kept for parity and for
    cross-chip-negative contrastive scaling (SURVEY.md §2.1).
    """
    import jax

    return jax.lax.all_gather(x, axis_name, tiled=True)


def psum_scalar(x, axis_name: str):
    """Mean-reduce a scalar across the axis — the reference's ``AllReduce``
    loss averaging (``generative/ddputils.py:53-68``).  Only needed inside
    explicit shard_map regions; the jitted global-mean loss path gets this
    reduction from XLA automatically."""
    import jax

    return jax.lax.pmean(x, axis_name)


def sync_hosts(name: str = "barrier") -> None:
    """Barrier across hosts (no-op single-host)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
