"""Jitted SPMD train/eval steps per objective family.

One function of ``(state, batch) → (state, metrics)`` per family, jitted
over the mesh with explicit shardings.  This single function subsumes what
the reference spreads over DDP grad hooks, the custom ``AllReduce`` loss
autograd, the GradScaler, host-side mask sampling, and the EMA loop:

- the loss is a mean over the *global* (data-sharded) batch, so XLA
  emits the cross-chip grad reduction itself — no explicit collectives;
- masks are sampled in-step from ``state.rng``;
- bf16 is the compute dtype inside the model; params/optimizer stay f32
  (GradScaler is meaningless for bf16 and is dropped — the reference
  carries one anyway, ``pretrain_videomae.py:197``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bvc_tpu.masks.tube import random_mask, tube_mask
from bvc_tpu.models import videomae
from bvc_tpu.parallel.sharding import batch_sharding, param_shardings
from bvc_tpu.training.optim import apply_gradients
from bvc_tpu.training.state import TrainState
from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig


def _microbatches(tree: Any, k: int) -> Any:
    """Split every batch-major leaf ``[B, ...]`` into ``[k, B//k, ...]``
    scan-ready microbatches.

    The grouping is STRIDED (microbatch j = rows ≡ j mod k): each data
    shard's contiguous block contributes ``B/(shards·k)`` rows to every
    microbatch, so the split never moves data across chips — a plain
    leading-axis reshape would regroup rows across shard boundaries."""

    def split(x):
        B = x.shape[0]
        if B % k:
            raise ValueError(
                f"grad_accum_steps ({k}) must divide the global batch ({B})"
            )
        return jnp.swapaxes(x.reshape(B // k, k, *x.shape[1:]), 0, 1)

    return jax.tree_util.tree_map(split, tree)


def _accumulated_grads(loss_fn_of, params, micro_xs, k: int,
                       mesh: Mesh | None = None, sharded: bool = False):
    """Mean loss and gradients over ``k`` sequential microbatches.

    ``loss_fn_of(xs)`` returns a scalar-loss function of ``params`` for
    one microbatch ``xs``.  ``lax.scan`` keeps one microbatch's
    activations live at a time — the point: peak activation memory drops
    ~k× for the same effective batch (the reference has no equivalent;
    its batch is bounded by per-GPU VRAM).

    ``sharded=True`` (replicated params only) runs the accumulation under
    ``shard_map`` over the ``data`` axis: each shard scans its LOCAL
    microbatch rows into a local gradient sum and the cross-chip
    reduction happens ONCE per optimizer step.  Without it the SPMD
    partitioner places the gradient all-reduce inside the scan body —
    once per microbatch, k× the ICI traffic (caught by
    ``tests/test_collectives_analysis.py``; invisible on one chip).
    Exact for the same reason microbatching itself is exact: equal
    per-sample loss weights make the global mean decompose into a mean
    of equal-size shard means.  (With stochastic depth enabled, each
    microbatch's drop-path draws are shared across data shards on this
    path — all reference configs run drop-path 0, SURVEY.md §2.4.)
    """
    if sharded:
        # shard_map needs the microbatch rows to split evenly over the
        # data axis; otherwise fall back to the partitioner-placed path
        # (correct, but all-reduces per microbatch)
        data_size = mesh.shape.get("data", 1) if mesh is not None else 1
        rows = jax.tree_util.tree_leaves(micro_xs)[0].shape[1]
        sharded = rows % data_size == 0

    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)

    def local_accum(p, xs_all):
        def micro(carry, xs):
            g_acc, loss_acc = carry
            loss, g = jax.value_and_grad(loss_fn_of(xs))(p)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            return (g_acc, loss_acc + loss), None

        return jax.lax.scan(micro, (zero_g, 0.0), xs_all)[0]

    if not sharded:
        g_sum, loss_sum = local_accum(params, micro_xs)
        grads = jax.tree_util.tree_map(lambda x: x / k, g_sum)
        return loss_sum / k, grads

    from jax.experimental.shard_map import shard_map

    from bvc_tpu.parallel.mesh import DATA_AXIS

    def body(p, xs_all):
        g_sum, loss_sum = local_accum(p, xs_all)
        # the step's ONE cross-chip gradient reduction
        grads = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, DATA_AXIS) / k, g_sum
        )
        return jax.lax.pmean(loss_sum, DATA_AXIS) / k, grads

    # microbatch leaves are [k, B, ...] with the batch dim sharded
    micro_specs = jax.tree_util.tree_map(lambda _: P(None, DATA_AXIS), micro_xs)
    rep_specs = jax.tree_util.tree_map(lambda _: P(), params)
    return shard_map(
        body, mesh=mesh,
        in_specs=(rep_specs, micro_specs),
        out_specs=(P(), rep_specs),
        check_rep=False,
    )(params, micro_xs)


def _tree_shardings(state: TrainState, mesh: Mesh, param_mode: str):
    """Shardings for the whole TrainState (params rule applied to params,
    opt state mirrors params where shapes match, scalars replicated).

    ``'zero1'``: params stay replicated (every forward is collective-free
    — unlike FSDP, which re-gathers per use and costs JEPA 2.4 GB of
    all-gathers/step, SCALING.md) while the OPTIMIZER state is sharded
    over ``data`` with the FSDP layout rule — the ZeRO-1 trade: momentum
    memory drops ~(1−1/S)×, the update math is sliced per shard by the
    partitioner, and the only added communication is the updated-params
    all-gather it can fuse with the gradient reduction."""
    opt_rule_mode = param_mode
    if param_mode == "zero1":
        param_mode, opt_rule_mode = "replicated", "fsdp"
    p_sh = param_shardings(state.params, mesh, param_mode)
    rep = NamedSharding(mesh, P())

    # opt_state contains pytrees shaped like params (momentum etc.) plus
    # scalars; map each params-shaped leaf to its param's sharding by TREE
    # PATH — optax embeds the params tree verbatim inside its states, so a
    # param's path is a suffix of its opt-state leaf's path (e.g.
    # (1, .trace, *param_path)).  Scalars (count etc.) match nothing and
    # stay replicated.  A (shape, dtype) map would silently share one
    # sharding between same-shape params under different partition rules
    # (e.g. qkv column-parallel vs proj row-parallel under 'tp').
    opt_rule_sh = (
        param_shardings(state.params, mesh, opt_rule_mode)
        if opt_rule_mode != param_mode else p_sh
    )
    t_sh = (
        param_shardings(state.target_params, mesh, param_mode)
        if state.target_params is not None
        else None
    )
    return tree_shardings_from_param_shardings(
        state, mesh, p_sh, opt_rule_sh=opt_rule_sh, target_sh=t_sh
    )


def tree_shardings_from_param_shardings(
    state: TrainState, mesh: Mesh, p_sh: Any,
    opt_rule_sh: Any = None, target_sh: Any = None,
) -> TrainState:
    """TrainState shardings from an explicit params-sharding pytree.

    Factored out of :func:`_tree_shardings` so custom layouts (e.g. the
    pipeline-parallel ``P('pipe')``-on-depth layout,
    :mod:`bvc_tpu.parallel.pipeline`) reuse the tree-path-suffix mapping
    of optimizer-state leaves onto their params' shardings.
    ``opt_rule_sh`` overrides the rule applied to optimizer state (the
    zero1 trick); default = follow ``p_sh``."""
    rep = NamedSharding(mesh, P())
    if state.target_params is not None and target_sh is None:
        raise ValueError(
            "state has target_params but target_sh was not given -- "
            "pass a sharding pytree for them (a None here surfaces "
            "later as a cryptic device_put tree-structure mismatch)"
        )
    if opt_rule_sh is None:
        opt_rule_sh = p_sh
    flat_p = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_sh = jax.tree_util.tree_flatten_with_path(opt_rule_sh)[0]
    by_path = {
        tuple(str(k) for k in path): (tuple(getattr(leaf, "shape", ())), sh)
        for (path, leaf), (_, sh) in zip(flat_p, flat_sh)
    }

    def opt_sh(path, leaf):
        keys = tuple(str(k) for k in path)
        shape = tuple(getattr(leaf, "shape", ()))
        for i in range(len(keys)):  # longest suffix first
            hit = by_path.get(keys[i:])
            if hit is not None and hit[0] == shape:
                return hit[1]
        return rep

    o_sh = jax.tree_util.tree_map_with_path(opt_sh, state.opt_state)
    t_sh = target_sh if state.target_params is not None else None
    e_sh = (
        jax.tree_util.tree_map(lambda _: rep, state.extra)
        if state.extra is not None
        else None
    )
    return TrainState(step=rep, params=p_sh, opt_state=o_sh, rng=rep,
                      target_params=t_sh, extra=e_sh)


def make_videomae_train_step(
    mesh: Mesh,
    model_cfg: ModelConfig,
    mask_cfg: MaskConfig,
    tx: optax.GradientTransformation,
    param_mode: str = "replicated",
    grad_probes: dict[str, Callable[[Any], jnp.ndarray]] | None = None,
    grad_accum: int = 1,
) -> Callable[[TrainState, jnp.ndarray], tuple[TrainState, dict]]:
    """Tube-masked reconstruction step over ``video [B,T,H,W,C]``.

    Replaces the hot loop of ``generative/pretrain_videomae.py:289-357``.
    ``grad_accum > 1`` splits the batch into that many sequential
    microbatches and averages their gradients before the single optimizer
    step — numerically the same batch-mean loss (tube masks give every
    sample an identical masked-patch count, so the mean of microbatch
    means is exact), at ~grad_accum× lower activation memory.
    """
    grid = (
        model_cfg.num_time_steps,
        model_cfg.image_size // model_cfg.patch_size,
        model_cfg.image_size // model_cfg.patch_size,
    )
    n_space = grid[1] * grid[2]
    if mask_cfg.sampler == "tube":
        n_masked = int(mask_cfg.mask_ratio * n_space) * grid[0]
        sampler = functools.partial(tube_mask, grid=grid, mask_ratio=mask_cfg.mask_ratio)
    else:
        n_masked = int(mask_cfg.mask_ratio * grid[0] * n_space)
        sampler = functools.partial(random_mask, grid=grid, mask_ratio=mask_cfg.mask_ratio)
    num_visible = model_cfg.seq_len - n_masked

    def step(state: TrainState, video: jnp.ndarray):
        rng, mask_rng = jax.random.split(state.rng)
        mask = sampler(mask_rng, video.shape[0])

        if grad_accum > 1:
            micro_xs = _microbatches({"video": video, "mask": mask}, grad_accum)

            def loss_fn_of(xs):
                def loss_fn(params):
                    loss, _ = videomae.pretrain_loss(
                        params, xs["video"], xs["mask"], model_cfg, num_visible
                    )
                    return loss

                return loss_fn

            loss, grads = _accumulated_grads(
                loss_fn_of, state.params, micro_xs, grad_accum,
                mesh=mesh, sharded=param_mode in ("replicated", "zero1"),
            )
            metrics = {"loss": loss}
        else:
            def loss_fn(params):
                loss, metrics = videomae.pretrain_loss(
                    params, video, mask, model_cfg, num_visible
                )
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            metrics = dict(metrics)
        params, opt_state = apply_gradients(tx, grads, state.opt_state, state.params)
        # grad_norm + EFL/ELL/DLL from one fused pass over the gradients
        # (reference grad_logger, generative/loggingtools.py:98-119)
        from bvc_tpu.training.probes import videomae_grad_metrics

        metrics.update(videomae_grad_metrics(grads))
        for name, fn in (grad_probes or {}).items():
            metrics[name] = fn(grads)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                rng=rng,
                target_params=state.target_params,
                extra=state.extra,
            ),
            metrics,
        )

    def eval_step(state: TrainState, video: jnp.ndarray, step_idx):
        # fresh mask realisation per val batch (the reference samples new
        # masks every iteration in both phases)
        mask = sampler(jax.random.fold_in(state.rng, step_idx), video.shape[0])
        loss, metrics = videomae.pretrain_loss(
            state.params, video, mask, model_cfg, num_visible
        )
        return metrics

    return _jit_over_mesh(step, eval_step, mesh, param_mode)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber/smooth-L1, torch ``F.smooth_l1_loss`` semantics
    (beta=1.0 default) — reference JEPA loss (``pretrain_jepa.py:399-402``)."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def make_jepa_train_step(
    mesh: Mesh,
    model_cfg: ModelConfig,
    tx: optax.GradientTransformation,
    total_steps: int,
    ema: tuple[float, float] = (0.996, 1.0),
    param_mode: str = "replicated",
    ema_fallback: float = 0.998,
    grad_probes: dict[str, Callable[[Any], jnp.ndarray]] | None = None,
    grad_accum: int = 1,
):
    """JEPA step: context-encode → predict → smooth-L1 vs frozen EMA
    targets → update online nets → EMA the target encoder.

    ``grad_accum > 1`` averages gradients over sequential microbatches
    before the one optimizer step and EMA update — exact (the collator's
    batch-min truncation gives every sample the same valid-mask count,
    so microbatch loss means compose to the batch mean), at ~grad_accum×
    lower activation memory; this is the supported route to effective
    batches past the single-shot memory ceiling (e.g. 128 clips/chip,
    PERFORMANCE.md "Masked flash attention").

    Batch dict (all batch-major for ``data``-axis sharding):
      ``video``    ``[B, T, H, W, C]``
      ``enc_idx``  ``[B, Ke]``      int32, −1 padded (nenc = 1)
      ``pred_idx`` ``[B, M, Kp]``   int32, −1 padded

    Subsumes ``pretrain_jepa.py:383-432`` (train_step incl. the momentum
    loop) in one jitted function; the EMA coefficient replicates the
    reference's generator exactly (``:309-311`` + the ``next(...)``
    ``except: m=0.998`` at ``:426-429``): linear 0.996 → 1.0 over
    ``total_steps``, UNCAPPED for the generator's 5 spare elements (steps
    ``total_steps..total_steps+4`` get m slightly above 1.0 — a real
    reference quirk), then ``ema_fallback`` once the generator is
    exhausted.
    """
    import dataclasses

    from bvc_tpu.models import jepa

    # f32 compute mode means "no autocast" anywhere: the target's bf16
    # logits are disabled along with the gradient-path ones (the model
    # function itself keeps honoring the explicit flag for tests/probes)
    if model_cfg.dtype != "bfloat16" and model_cfg.target_score_bf16:
        model_cfg = dataclasses.replace(model_cfg, target_score_bf16=False)

    def step(state: TrainState, batch):
        rng, _ = jax.random.split(state.rng)
        # Stochastic-depth rngs (only consumed when drop_path_rate > 0;
        # fold_in keeps the main rng stream identical either way).
        dpe = jax.random.fold_in(state.rng, 101) if model_cfg.drop_path_rate > 0 else None
        dpp = jax.random.fold_in(state.rng, 102) if model_cfg.drop_path_rate > 0 else None
        # autocast-parity bf16 logits on the gradient paths (the
        # reference's whole forward runs under autocast-bf16); only in
        # bf16 compute mode — f32 mode means "no autocast"
        grad_impl = (
            "xla_bf16"
            if model_cfg.autocast_scores and model_cfg.dtype == "bfloat16"
            else "auto"
        )

        def loss_fn_of(xs):
            video = xs["video"]
            enc_idx = xs["enc_idx"]
            pred_idx = jnp.transpose(xs["pred_idx"], (1, 0, 2))  # [M, mB, Kp]
            # target encode inside the microbatch: its activations are
            # the step's largest piece and must not all be live at once
            targets = jax.lax.stop_gradient(
                jepa.target_features(state.target_params, video, pred_idx, model_cfg)
            )
            valid = (pred_idx >= 0).astype(jnp.float32)[..., None]  # [M,mB,Kp,1]

            def loss_fn(params):
                z = jepa.encoder_forward(
                    params["encoder"], video, model_cfg, enc_idx, rng=dpe,
                    attn_impl=grad_impl,
                )
                preds = jepa.predictor_forward(
                    params["predictor"], z, enc_idx, pred_idx, model_cfg, rng=dpp,
                    attn_impl=grad_impl,
                )
                per = smooth_l1(preds, targets) * valid
                denom = jnp.maximum(jnp.sum(valid), 1.0) * preds.shape[-1]
                return jnp.sum(per) / denom

            return loss_fn

        enc_idx = batch["enc_idx"]
        pred_idx = jnp.transpose(batch["pred_idx"], (1, 0, 2))  # [M, B, Kp]
        if grad_accum > 1:
            micro_xs = _microbatches(
                {"video": batch["video"], "enc_idx": batch["enc_idx"],
                 "pred_idx": batch["pred_idx"]},
                grad_accum,
            )
            loss, grads = _accumulated_grads(
                loss_fn_of, state.params, micro_xs, grad_accum,
                mesh=mesh, sharded=param_mode in ("replicated", "zero1"),
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn_of(batch))(state.params)
        params, opt_state = apply_gradients(tx, grads, state.opt_state, state.params)

        # EMA coefficient: uncapped linear ramp while the reference's
        # generator still has elements (total_steps+5 of them), then the
        # exhaustion fallback.
        i = state.step.astype(jnp.float32)
        ramp = ema[0] + i * (ema[1] - ema[0]) / max(total_steps, 1)
        m = jnp.where(state.step < total_steps + 5, ramp, ema_fallback)
        target_params = jax.tree_util.tree_map(
            lambda t, p: t * m + p.astype(t.dtype) * (1.0 - m),
            state.target_params,
            params["encoder"],
        )
        from bvc_tpu.training.probes import jepa_grad_metrics

        metrics = {
            "loss": loss,
            # grad_norm + first/last-qkv norms, one fused pass
            # (predictive/loggingtools.py:98-112)
            **jepa_grad_metrics(grads),
            "mask_a": jnp.sum(enc_idx[0] >= 0),
            "mask_b": jnp.sum(pred_idx[0, 0] >= 0),
            "ema_m": m,
        }
        for name, fn in (grad_probes or {}).items():
            metrics[name] = fn(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state,
                       rng=rng, target_params=target_params, extra=state.extra),
            metrics,
        )

    def eval_step(state: TrainState, batch, step_idx):
        del step_idx  # masks come from the collator for JEPA
        video = batch["video"]
        enc_idx = batch["enc_idx"]
        pred_idx = jnp.transpose(batch["pred_idx"], (1, 0, 2))
        targets = jepa.target_features(state.target_params, video, pred_idx, model_cfg)
        z = jepa.encoder_forward(state.params["encoder"], video, model_cfg, enc_idx)
        preds = jepa.predictor_forward(
            state.params["predictor"], z, enc_idx, pred_idx, model_cfg
        )
        valid = (pred_idx >= 0).astype(jnp.float32)[..., None]
        per = smooth_l1(preds, targets) * valid
        denom = jnp.maximum(jnp.sum(valid), 1.0) * preds.shape[-1]
        return {"loss": jnp.sum(per) / denom}

    return _jit_over_mesh(step, eval_step, mesh, param_mode)


def make_simclr_train_step(
    mesh: Mesh,
    arch: str,
    tx: optax.GradientTransformation,
    temperature: float = 0.1,
    loss_mode: str = "parity",
    param_mode: str = "replicated",
    dtype=jnp.float32,
    negatives: str = "global",
    bn_stats: str = "global",
    grad_probes: dict[str, Callable[[Any], jnp.ndarray]] | None = None,
    grad_accum: int = 1,
):
    """SimCLR step over pair batches ``[B, 2, H, W, C]``.

    ``grad_accum`` must stay 1: InfoNCE couples every sample to the rest
    of the batch as negatives (and BatchNorm to its batch statistics), so
    microbatching would silently shrink the negative set — unlike the
    decomposable VideoMAE/JEPA losses.

    Replaces the hot loop of ``contrastive/pretrain_simclr.py:296-365``:
    the batch is flattened to the interleaved ``[2B, ...]`` layout
    (``:320-329``), pushed through ResNet+head, and scored with the
    reference's InfoNCE (see :mod:`bvc_tpu.objectives.contrastive` for the
    preserved quirks).  BatchNorm running stats live in ``state.extra``.

    ``negatives``: 'global' contrasts across the whole global batch (the
    natural SPMD semantics, MORE negatives than the reference at
    world_size>1); 'per_replica' restricts negative pairs to same-shard
    samples, reproducing the reference's per-rank loss exactly
    (SURVEY.md §2.5 "per-rank only").

    ``bn_stats``: 'global' computes BatchNorm batch statistics over the
    GLOBAL batch (SyncBN semantics — the lower-variance SPMD default,
    identical to the reference at world_size 1); 'per_replica'
    reproduces the reference's DDP BatchNorm exactly — per-rank batch
    stats with running buffers following rank 0 (torch DDP
    ``broadcast_buffers=True``), implemented as shard-aligned stat
    groups in :func:`bvc_tpu.models.resnet._bn`.
    """
    if grad_accum != 1:
        raise ValueError(
            "grad_accum_steps is not supported for SimCLR: InfoNCE "
            "negatives (and BatchNorm statistics) span the whole batch, "
            "so accumulation would change the loss semantics"
        )
    data_size = mesh.shape.get("data", 1)
    from bvc_tpu.models import resnet
    from bvc_tpu.objectives.contrastive import (
        info_nce_loss,
        per_replica_info_nce_sharded,
    )

    def step(state: TrainState, batch):
        from bvc_tpu.models.videomae import normalize_on_device

        batch = normalize_on_device(batch)
        B = batch.shape[0]
        x = batch.reshape(B * 2, *batch.shape[2:])
        rng, _ = jax.random.split(state.rng)

        # per-replica BN groups must align with the interleaved [2B] rows
        # of a shard: 2B rows / data shards (divisibility enforced by the
        # guarded wrapper below, before jit)
        bn_groups = data_size if bn_stats == "per_replica" and data_size > 1 else 1

        def loss_fn(params):
            feats, new_stats = resnet.apply(
                params, state.extra, x, arch, training=True, dtype=dtype,
                bn_groups=bn_groups,
            )
            if negatives == "per_replica" and data_size > 1:
                # per-shard blocks under shard_map: each chip scores only
                # its own [2B/S, 2B/S] block (never the replicated
                # [2B, 2B] matrix), numerically identical to the
                # replica_ids segment formulation — see
                # objectives/contrastive.py
                loss = per_replica_info_nce_sharded(
                    feats, mesh, temperature, loss_mode
                )
            else:
                loss = info_nce_loss(feats, temperature, loss_mode)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        params, opt_state = apply_gradients(tx, grads, state.opt_state, state.params)
        from bvc_tpu.training.probes import simclr_grad_metrics

        # grad_norm + conv1/fc.0 probes, one fused pass
        # (contrastive/loggingtools.py:103-110)
        metrics = {"loss": loss, **simclr_grad_metrics(grads)}
        for name, fn in (grad_probes or {}).items():
            metrics[name] = fn(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state,
                       rng=rng, target_params=state.target_params,
                       extra=new_stats),
            metrics,
        )

    def eval_step(state: TrainState, batch, step_idx):
        del step_idx
        from bvc_tpu.models.videomae import normalize_on_device

        batch = normalize_on_device(batch)
        B = batch.shape[0]
        x = batch.reshape(B * 2, *batch.shape[2:])
        feats, _ = resnet.apply(
            state.params, state.extra, x, arch, training=False, dtype=dtype
        )
        return {"loss": info_nce_loss(feats, temperature, loss_mode)}

    inner = _jit_over_mesh(step, eval_step, mesh, param_mode)
    needs_whole_pairs = data_size > 1 and (
        bn_stats == "per_replica" or negatives == "per_replica"
    )
    if needs_whole_pairs:
        # refuse (eagerly, before pjit's own divisibility error can blur
        # the message) batches whose augmentation pairs would not land
        # whole on a shard: per-replica BN stat groups AND the shard_map
        # per-replica InfoNCE blocks both slice the interleaved [2B]
        # rows at shard boundaries — B must divide the data axis so each
        # block holds complete (anchor, positive) pairs
        def guarded(state, batch):
            B = batch.shape[0]
            if B % data_size != 0:
                knobs = [k for k, v in (("bn_stats", bn_stats),
                                        ("negatives", negatives))
                         if v == "per_replica"]
                raise ValueError(
                    f"{'/'.join(knobs)}='per_replica' requires the data "
                    f"shard count ({data_size}) to divide the pair batch "
                    f"(B={B}) so every shard holds whole augmentation "
                    f"pairs — pick a batch size that is a multiple of "
                    f"the mesh or use the 'global' mode."
                )
            return inner(state, batch)

        guarded.eval_step = inner.eval_step  # type: ignore[attr-defined]
        guarded.shardings = inner.shardings  # type: ignore[attr-defined]
        return guarded
    return inner


def _jit_over_mesh(step, eval_step, mesh: Mesh, param_mode: str):
    """Wrap (train, eval) step fns with sharding-aware jit.

    Shardings are resolved lazily on first call from the concrete state.
    """
    b_sh = batch_sharding(mesh)
    cache: dict[str, Any] = {}

    rep = NamedSharding(mesh, P())

    def train(state: TrainState, batch):
        if "jit" not in cache:
            st_sh = _tree_shardings(state, mesh, param_mode)
            cache["st_sh"] = st_sh
            cache["jit"] = jax.jit(
                step,
                in_shardings=(st_sh, b_sh),
                out_shardings=(st_sh, rep),
                donate_argnums=(0,),
            )
            cache["ejit"] = jax.jit(
                eval_step, in_shardings=(st_sh, b_sh, rep),
                out_shardings=rep,
            )
        return cache["jit"](state, batch)

    def evaluate(state: TrainState, batch, step_idx=0):
        if "ejit" not in cache:
            st_sh = _tree_shardings(state, mesh, param_mode)
            cache["st_sh"] = st_sh
            cache["ejit"] = jax.jit(
                eval_step, in_shardings=(st_sh, b_sh, rep),
                out_shardings=rep,
            )
        return cache["ejit"](state, batch, jnp.asarray(step_idx, jnp.int32))

    def compiled_text(state: TrainState, batch) -> str:
        """Optimized HLO of the train step for these shapes — compiles but
        does NOT execute (feeds :mod:`bvc_tpu.parallel.analysis`)."""
        st_sh = cache.get("st_sh") or _tree_shardings(state, mesh, param_mode)
        jitted = jax.jit(
            step, in_shardings=(st_sh, b_sh), out_shardings=(st_sh, rep)
        )  # no donation: inspection must not invalidate the caller's state
        return jitted.lower(state, batch).compile().as_text()

    train.eval_step = evaluate  # type: ignore[attr-defined]
    train.shardings = lambda: cache.get("st_sh")  # type: ignore[attr-defined]
    train.compiled_text = compiled_text  # type: ignore[attr-defined]
    # the un-jitted step fn — lets tooling re-jit with explicit XLA
    # compiler_options (tools/probe_xla_options.py sweeps them per-arm
    # in ONE process; XLA_FLAGS can't vary within a process)
    train.raw_step = step  # type: ignore[attr-defined]
    return train


def place_state(state: TrainState, mesh: Mesh, param_mode: str = "replicated",
                shardings: TrainState | None = None) -> TrainState:
    """Device-put a host-built TrainState with the step's shardings.

    ``shardings`` overrides the ``param_mode`` rule with an explicit
    TrainState-of-shardings (e.g. the pipeline layout's
    :func:`bvc_tpu.parallel.pipeline.pipe_state_shardings`).

    Always materialises fresh buffers: the train step donates its input
    state, and ``device_put`` aliases arrays whose sharding already
    matches — without the copy, the caller's original arrays would be
    invalidated by the first step.

    Multi-process meshes: ``device_put`` refuses shardings with
    non-addressable devices (anything but fully-replicated), so each
    leaf is built from the host copy via ``make_array_from_callback`` —
    every process materialises only its addressable shards.
    """
    if shardings is None:
        shardings = _tree_shardings(state, mesh, param_mode)
    if jax.process_count() > 1:
        import numpy as _np

        def put(x, sh):
            arr = _np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sh, lambda idx, a=arr: a[idx]
            )

        return jax.tree_util.tree_map(put, state, shardings)
    placed = jax.device_put(state, shardings)
    return jax.tree_util.tree_map(jnp.copy, placed)
