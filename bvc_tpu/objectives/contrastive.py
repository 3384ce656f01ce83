"""NT-Xent / InfoNCE for the SimCLR family.

Faithful re-expression of ``info_nce_loss`` + ``get_special_matrix``
(``contrastive/pretrain_simclr.py:86-91,114-128,283-292``), which has two
quirks worth documenting because they change the numbers:

1. **Positive mask** is ``|i-j| == 1`` on the interleaved ``[2B]`` batch
   (anchor0, pos0, anchor1, pos1, ...).  That marks the true pairs
   (2k, 2k+1) in both directions *and* the spurious cross-sample pairs
   (2k+1, 2k+2).  We reproduce it in ``mode='parity'``.
2. **Global logsumexp**: ``cos_sim[neg_mask]`` boolean-flattens to 1-D,
   so the log-partition is over ALL negative pairs of the whole batch,
   not per-anchor.  The loss is
   ``mean_over_positives(logsumexp(all_negatives) - pos)``.

``mode='standard'`` provides the textbook SimCLR NT-Xent (per-anchor
logsumexp over that row's negatives, only true pairs positive) for users
who want the corrected objective; parity mode is the default so scores
line up with the reference.

Cross-replica negatives: the reference computes the loss per rank only
(SURVEY.md §2.5 "per-rank only").  Under SPMD jit the loss sees the
global batch, which *adds* cross-chip negatives.  ``per_replica_negatives``
restores reference semantics by blocking cross-shard pairs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interleaved_pair_masks(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(pos_mask, neg_mask) over the ``[n, n]`` similarity matrix,
    n = 2*batch.  pos = |i-j|==1; neg = everything except pos and self."""
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    pos = np.abs(i - j) == 1
    neg = ~(pos | (i == j))
    return pos, neg


def standard_pair_masks(n: int) -> tuple[np.ndarray, np.ndarray]:
    """True SimCLR pairing: positives only (2k, 2k+1)/(2k+1, 2k)."""
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    pos = (i // 2 == j // 2) & (i != j)
    neg = ~(pos | (i == j))
    return pos, neg


def _cosine_matrix(feats: jnp.ndarray) -> jnp.ndarray:
    f = feats.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
    return f @ f.T


def info_nce_loss(
    feats: jnp.ndarray,
    temperature: float = 0.1,
    mode: str = "parity",
    replica_ids: jnp.ndarray | None = None,
    n_replicas: int = 1,
) -> jnp.ndarray:
    """Loss over interleaved ``[2B, D]`` features.

    ``replica_ids``/``n_replicas``: when given, the loss is computed PER
    REPLICA (its own positives and its own log-partition over only its
    negatives) and averaged — exactly what the reference's per-rank loss
    + DDP gradient averaging produces (``pretrain_simclr.py`` runs the
    whole criterion per rank).  A pooled logsumexp over all replicas'
    negatives would weight negatives differently and is NOT equivalent.
    """
    n = feats.shape[0]
    sim = _cosine_matrix(feats) / temperature
    if mode == "parity":
        pos_np, neg_np = interleaved_pair_masks(n)
    else:
        pos_np, neg_np = standard_pair_masks(n)
    pos_mask = jnp.asarray(pos_np)
    neg_mask = jnp.asarray(neg_np)

    from jax.scipy.special import logsumexp

    if replica_ids is not None and n_replicas > 1:
        same = replica_ids[:, None] == replica_ids[None, :]
        neg_mask = neg_mask & same
        pos_mask = pos_mask & same
        if mode == "parity":
            # per-replica global logsumexp, vectorized as a segment
            # reduction over the row's replica id (within-replica entries
            # only, via `same` above) — one fused kernel instead of a
            # Python loop that would unroll n_replicas-fold at a pod's
            # mesh size
            import jax

            seg = jnp.broadcast_to(replica_ids[:, None], (n, n)).reshape(-1)
            flat_sim = sim.reshape(-1)
            flat_neg = neg_mask.reshape(-1)
            masked = jnp.where(flat_neg, flat_sim, -jnp.inf)
            seg_max = jax.ops.segment_max(masked, seg, num_segments=n_replicas)
            seg_max = jnp.maximum(seg_max, -1e30)  # empty segments
            exps = jnp.where(flat_neg, jnp.exp(masked - seg_max[seg]), 0.0)
            log_z = seg_max + jnp.log(
                jax.ops.segment_sum(exps, seg, num_segments=n_replicas)
            )
            flat_pos = pos_mask.reshape(-1)
            pos_sum = jax.ops.segment_sum(
                jnp.where(flat_pos, flat_sim, 0.0), seg, num_segments=n_replicas
            )
            pos_cnt = jax.ops.segment_sum(
                flat_pos.astype(jnp.float32), seg, num_segments=n_replicas
            )
            pos_mean = pos_sum / jnp.maximum(pos_cnt, 1.0)
            return jnp.mean(log_z - pos_mean)
        # standard mode is already per-anchor; scoped masks suffice

    if mode == "parity":
        # global log-partition over every negative pair (reference quirk 2)
        neg_logits = jnp.where(neg_mask, sim, -jnp.inf)
        log_z = logsumexp(neg_logits.reshape(-1))
        pos_terms = jnp.where(pos_mask, sim, 0.0)
        n_pos = jnp.sum(pos_mask)
        return log_z - jnp.sum(pos_terms) / n_pos
    # standard: per-anchor
    row_logits = jnp.where(neg_mask | pos_mask, sim, -jnp.inf)
    log_z_row = logsumexp(row_logits, axis=-1)
    pos_sim = jnp.sum(jnp.where(pos_mask, sim, 0.0), axis=-1)
    return jnp.mean(log_z_row - pos_sim)


def per_replica_info_nce_sharded(
    feats: jnp.ndarray,
    mesh,
    temperature: float = 0.1,
    mode: str = "parity",
    axis: str = "data",
) -> jnp.ndarray:
    """Per-replica InfoNCE as per-shard blocks under ``shard_map``.

    Numerically identical to ``info_nce_loss(feats, ..., replica_ids=...)``
    with shard-aligned replica ids (equivalence-tested), but each chip only
    ever materialises its own ``[2B/S, 2B/S]`` block instead of the full
    replicated ``[2B, 2B]`` cosine matrix — the scalable shape for pods:
    at v5e-256 with the reference's 32 pairs/chip, the replicated matrix
    is 16384^2 f32 (~1 GB/chip) while the block is 64^2.

    Reference semantics anchor: the per-rank criterion of
    ``contrastive/pretrain_simclr.py:284-292`` — each shard IS a rank, so
    the per-shard loss is exactly the reference's per-rank loss and the
    ``pmean`` reproduces the DDP loss average (the reference's custom
    ``AllReduce``).

    Alignment requirement: the interleaved ``[2B]`` rows are cut at
    shard boundaries, so each shard must hold WHOLE (anchor, positive)
    pairs — rows per shard must be even (equivalently B divides the
    shard count; the train step enforces this eagerly with a clear
    error before jit).
    """
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[axis]
    if feats.shape[0] % n_shards or (feats.shape[0] // n_shards) % 2:
        raise ValueError(
            f"per-replica blocks need whole pairs per shard: "
            f"{feats.shape[0]} rows over {n_shards} shards leaves "
            f"{feats.shape[0] / n_shards} rows/shard"
        )

    def local_loss(f):
        # f is this shard's [2b, D] block; a shard is a replica, so the
        # plain (non-replica-scoped) loss on the block is the per-replica
        # loss, and pmean averages over replicas.
        return jax.lax.pmean(info_nce_loss(f, temperature, mode), axis)

    return shard_map(
        local_loss, mesh=mesh, in_specs=P(axis), out_specs=P(),
        check_rep=False,
    )(feats.astype(jnp.float32))
