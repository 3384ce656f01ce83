"""Sharded, prefetching input pipeline feeding the device mesh.

Replaces ``DistributedSampler`` + torch ``DataLoader(num_workers=6)``
(``generative/pretrain_videomae.py:225-235``) with:

- :class:`EpochSampler` — deterministic global shuffle per epoch
  (seed+epoch, matching ``set_epoch`` semantics), sliced per host, batches
  dropped to a multiple of the global batch (``drop_last=True``);
- :class:`DataLoader` — a thread pool decoding samples (JPEG decode
  releases the GIL in cv2/PIL, so threads scale on the host cores, with
  an optional C++ decode core in :mod:`bvc_tpu.native`), assembling
  pinned numpy batches and device-putting them with the ``data``-axis
  sharding while the previous step computes (double-buffered prefetch —
  the H2D copy of batch k+1 overlaps step k).

Per-sample RNG: each (epoch, index) pair gets its own ``Generator`` seeded
from (seed, epoch, global index), so augmentations are reproducible and
independent of worker scheduling — stronger than the reference's
worker-process-dependent torch RNG streams.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Any, Iterator, Sequence

import jax
import numpy as np

from bvc_tpu.parallel.sharding import shard_batch


class EpochSampler:
    """Deterministic per-epoch index order, host-sliced, batch-aligned."""

    def __init__(
        self,
        dataset_len: int,
        global_batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.n = dataset_len
        self.global_batch = global_batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last

    def batches(self, epoch: int) -> list[np.ndarray]:
        """List of global-batch index arrays for this host's slice."""
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch)).permutation(self.n)
        else:
            order = np.arange(self.n)
        n_batches = self.n // self.global_batch
        if not self.drop_last and self.n % self.global_batch:
            n_batches += 1
            # wrap-around padding (repeats indices when n < batch)
            order = np.resize(order, n_batches * self.global_batch)
        order = order[: n_batches * self.global_batch]
        batches = order.reshape(n_batches, self.global_batch)
        # host slice: contiguous block of each global batch
        n_proc, i_proc = jax.process_count(), jax.process_index()
        if self.global_batch % n_proc != 0:
            # truncating would silently drop samples from every batch
            raise ValueError(
                f"global_batch_size ({self.global_batch}) must divide "
                f"evenly across {n_proc} processes"
            )
        per = self.global_batch // n_proc
        return list(batches[:, i_proc * per : (i_proc + 1) * per])


class DataLoader:
    """Iterate device-sharded batches for one epoch at a time."""

    def __init__(
        self,
        dataset,
        mesh,
        global_batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 6,
        prefetch: int = 2,
        drop_last: bool = True,
        max_batches: int = 0,
        to_device: bool = True,
        collate_fn=None,
        batch_spec=None,
    ):
        # collate_fn(stacked_batch, epoch, batch_idx) -> pytree; used by the
        # JEPA path to attach multi-block masks per batch.  Seeding from
        # (epoch, batch_idx) keeps masks deterministic under concurrent
        # prefetch — the property the reference gets from a locked shared
        # counter (predictive/mask.py:95-102).
        self.dataset = dataset
        self.mesh = mesh
        self.sampler = EpochSampler(
            len(dataset), global_batch_size, shuffle, seed, drop_last
        )
        # cap at the cores this process may actually use: decode threads
        # beyond that THRASH (measured on a 1-core host: 8 workers run
        # 2.8x slower than 1 — GIL handoffs + cache churn, PERFORMANCE.md)
        try:
            import os

            cores = len(os.sched_getaffinity(0))
        except (AttributeError, OSError):  # non-Linux
            import os

            cores = os.cpu_count() or 1
        self.num_workers = max(1, min(num_workers, cores))
        self.prefetch = max(1, prefetch)
        self.max_batches = max_batches
        self.seed = seed
        self.to_device = to_device
        self.collate_fn = collate_fn
        # optional PartitionSpec for device placement (e.g. P('data','seq')
        # for the sequence-parallel step's time-sharded videos)
        self.batch_spec = batch_spec

    def __len__(self) -> int:
        n = self.sampler.n // self.sampler.global_batch
        if not self.sampler.drop_last and self.sampler.n % self.sampler.global_batch:
            n += 1
        return min(n, self.max_batches) if self.max_batches else n

    def epoch(self, epoch: int) -> Iterator[Any]:
        batches = self.sampler.batches(epoch)
        if self.max_batches:
            batches = batches[: self.max_batches]

        def load_sample(idx: int) -> np.ndarray:
            rng = np.random.default_rng((self.seed, epoch, int(idx)))
            return self.dataset[(int(idx), rng)]

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:

            def assemble(batch_idx: int, idxs: np.ndarray):
                parts = list(pool.map(load_sample, idxs))
                batch = np.stack(parts)
                if self.collate_fn is not None:
                    batch = self.collate_fn(batch, epoch, batch_idx)
                return (shard_batch(batch, self.mesh, self.batch_spec)
                        if self.to_device else batch)

            pending: collections.deque = collections.deque()
            it = iter(enumerate(batches))
            # keep `prefetch` batch-futures in flight; samples within a
            # batch already fan out over the pool.
            outer = cf.ThreadPoolExecutor(max_workers=self.prefetch)
            try:
                for _ in range(self.prefetch):
                    try:
                        i, idxs = next(it)
                        pending.append(outer.submit(assemble, i, idxs))
                    except StopIteration:
                        break
                while pending:
                    fut = pending.popleft()
                    try:
                        i, idxs = next(it)
                        pending.append(outer.submit(assemble, i, idxs))
                    except StopIteration:
                        pass
                    yield fut.result()
            finally:
                outer.shutdown(wait=False, cancel_futures=True)
