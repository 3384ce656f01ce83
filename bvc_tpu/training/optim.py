"""Optimizers (optax), mirroring the reference's options.

- SGD with Nesterov momentum + (coupled) L2 weight decay — the default in
  every trainer (``generative/pretrain_videomae.py:187-189``,
  ``predictive/helper.py:144-147``, ``contrastive/pretrain_simclr.py:234``).
  torch couples weight decay into the gradient *before* the momentum
  buffer; ``optax.add_decayed_weights`` before the trace reproduces that.
- AdamW with betas (0.9, 0.95) (``generative/pretrain_videomae.py:190-191``).
- Adam (plain, wd coupled) (``:192-193``).

The JEPA param grouping — weight decay excluded for biases and 1-D params
(``predictive/helper.py:128-141``) — is expressed as an optax mask.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import optax

from bvc_tpu.utils.config import OptimConfig


class FusedTx(NamedTuple):
    """optax-compatible transformation carrying an extra single-pass
    ``fused_apply`` used by the train steps.

    ``init``/``update`` are the plain optax chain (same state pytree
    structure — checkpoints stay compatible and any caller using the
    standard protocol gets identical numerics).  ``fused_apply`` computes
    ``(new_params, new_state)`` in ONE tree_map, so XLA emits one fused
    read(g,t,p) → write(t,p) kernel per leaf instead of materialising the
    decayed-grad / trace / update intermediate trees (measured ~7.7 ms of
    per-leaf reduction chains at ViT-B scale, PERFORMANCE.md).
    """

    init: Callable
    update: Callable
    fused_apply: Callable


def wd_mask(params: Any) -> Any:
    """True for leaves that take weight decay: ndim >= 2.

    Matches the reference's ``('bias' not in n) and (len(p.shape) != 1)``
    — in our layout every 1-D leaf is a bias/scale and vice versa (the
    JEPA mask_token is 3-D but frozen-std init; torch applies WD to it via
    the predictor group — ndim>=2 keeps that behavior).
    """
    import jax

    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def _make_fused_sgd_apply(lr, momentum, nesterov, wd, mask, trace_idx):
    """Single-tree-map torch-SGD (coupled WD → nesterov trace → step),
    numerically identical to the optax chain (equivalence-tested)."""
    import jax

    def leaf(g, t, p, m):
        g = g + wd * p if (wd and m) else g
        if momentum:
            t_new = momentum * t + g
            upd = g + momentum * t_new if nesterov else t_new
        else:
            t_new = t
            upd = g
        return p - lr * upd, t_new

    def fused_apply(grads, opt_state, params):
        t = opt_state[trace_idx].trace if trace_idx is not None else grads
        m = mask if mask is not None else jax.tree_util.tree_map(
            lambda _: True, params
        )
        zipped = jax.tree_util.tree_map(leaf, grads, t, params, m)
        outer = jax.tree_util.tree_structure(params)
        inner = jax.tree_util.tree_structure((0, 0))
        new_params, new_trace = jax.tree_util.tree_transpose(
            outer, inner, zipped
        )
        if trace_idx is not None:
            new_state = (
                opt_state[:trace_idx]
                + (optax.TraceState(trace=new_trace),)
                + opt_state[trace_idx + 1:]
            )
        else:
            new_state = opt_state
        return new_params, new_state

    return fused_apply


def warmup_cosine_lr(start: float, peak: float, final: float,
                     warmup_steps: int, total_steps: int) -> Callable:
    """I-JEPA's ``WarmupCosineSchedule`` as a step→lr function: linear
    ``start→peak`` over ``warmup_steps``, then cosine ``peak→final`` over
    the remaining ``total_steps - warmup_steps``, floored at ``final``
    (the reference ships this disabled — ``predictive/helper.py:148-155``
    — so it is opt-in here via ``OptimConfig.schedule``)."""
    import jax.numpy as jnp

    def fn(count):
        t = jnp.asarray(count, jnp.float32)
        warm = start + (peak - start) * t / max(1, warmup_steps)
        prog = jnp.clip(
            (t - warmup_steps) / max(1, total_steps - warmup_steps), 0.0, 1.0
        )
        cos = final + (peak - final) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(t < warmup_steps, warm, jnp.maximum(cos, final))

    return fn


def cosine_wd(ref: float, final: float, total_steps: int) -> Callable:
    """``CosineWDSchedule`` (``predictive/helper.py:156-161``): cosine
    ``ref→final`` over ``total_steps``, clamped at ``final`` past the
    horizon (in whichever direction final lies)."""
    import jax.numpy as jnp

    def fn(count):
        prog = jnp.clip(
            jnp.asarray(count, jnp.float32) / max(1, total_steps), 0.0, 1.0
        )
        val = final + (ref - final) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.maximum(val, final) if final <= ref else jnp.minimum(val, final)

    return fn


def _scheduled_decayed_weights(wd_fn: Callable, mask: Any) -> optax.GradientTransformation:
    """``optax.add_decayed_weights`` with a per-step decay coefficient
    (coupled wd, applied before the momentum trace — torch semantics)."""
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scheduled weight decay requires params")
        w = wd_fn(state.count)
        if mask is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p, m: g + w * p if m else g, updates, params, mask
            )
        else:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + w * p, updates, params
            )
        return updates, optax.ScaleByScheduleState(
            count=optax.safe_int32_increment(state.count)
        )

    return optax.GradientTransformation(init_fn, update_fn)


def schedule_steps(cfg, mesh) -> tuple[int, int] | None:
    """(warmup_steps, total_steps) for ``TrainConfig`` ``cfg`` on ``mesh``,
    or None when no schedule is configured.

    Mirrors the reference's horizon math ``T_max = ipe_scale *
    num_epochs * iterations_per_epoch`` (``predictive/helper.py:148-161``)
    with iterations/epoch derived from the config the way the trainers'
    loaders will: ``n_trainsamples // global_batch`` capped by
    ``max_epoch_iters`` (ipe_scale's 25% padding absorbs any drop-last
    rounding)."""
    o = cfg.optim
    if o.schedule == "none" and o.final_wd is None:
        return None
    # mirror the trainers' loader sizing: under a ('data','seq') mesh a
    # whole seq group carries each batch row, so the global batch scales
    # with the data axis only (trainer_videomae.py seq branch)
    if "seq" in getattr(mesh, "axis_names", ()):
        # .get: a seq mesh without 'data' is invalid, but the trainer's
        # mesh validation owns that diagnostic — don't preempt it with a
        # bare KeyError here
        world = mesh.shape.get("data", mesh.devices.size)
    else:
        world = mesh.devices.size
    global_batch = cfg.data.batch_size * world
    ipe = max(1, cfg.data.n_trainsamples // max(1, global_batch))
    if cfg.max_epoch_iters:
        ipe = min(ipe, cfg.max_epoch_iters)
    total = max(1, int(o.ipe_scale * cfg.n_epoch * ipe))
    warmup = min(int(o.warmup_epochs * ipe), total)
    return warmup, total


def apply_gradients(tx, grads, opt_state, params):
    """(new_params, new_opt_state) — via ``fused_apply`` when the
    transformation provides one, else the standard optax protocol."""
    if hasattr(tx, "fused_apply"):
        return tx.fused_apply(grads, opt_state, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def make_optimizer(
    cfg: OptimConfig,
    params_example: Any | None = None,
    steps: tuple[int, int] | None = None,
) -> optax.GradientTransformation:
    """``steps=(warmup_steps, total_steps)`` (see :func:`schedule_steps`)
    is required when ``cfg.schedule``/``cfg.final_wd`` enable a schedule;
    without schedules the optimizer state layout is unchanged from
    previous releases (checkpoints stay compatible)."""
    wd = cfg.weight_decay
    mask = None
    if cfg.exclude_bias_and_norm_from_wd and params_example is not None:
        mask = wd_mask(params_example)

    lr_fn = None
    wd_fn = None
    if cfg.schedule == "warmup_cosine" or cfg.final_wd is not None:
        if steps is None:
            raise ValueError(
                "schedule/final_wd configured but no (warmup, total) steps "
                "given — pass steps=schedule_steps(cfg, mesh)"
            )
        warmup_steps, total_steps = steps
        if cfg.schedule == "warmup_cosine":
            lr_fn = warmup_cosine_lr(
                cfg.start_lr, cfg.lr, cfg.final_lr, warmup_steps, total_steps
            )
        elif cfg.schedule != "none":
            raise ValueError(f"invalid schedule {cfg.schedule!r}")
        if cfg.final_wd is not None:
            if not wd:
                raise ValueError("final_wd configured but weight_decay is 0")
            wd_fn = cosine_wd(wd, cfg.final_wd, total_steps)
    elif cfg.schedule != "none":
        raise ValueError(f"invalid schedule {cfg.schedule!r}")

    if cfg.name == "sgd":
        chain = []
        trace_idx = None
        if wd:
            chain.append(
                _scheduled_decayed_weights(wd_fn, mask) if wd_fn is not None
                else optax.add_decayed_weights(wd, mask=mask)
            )
        if cfg.momentum:
            trace_idx = len(chain)
            chain.append(
                optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov)
            )
        if lr_fn is not None:
            chain.append(optax.scale_by_schedule(lambda c: -lr_fn(c)))
        else:
            chain.append(optax.scale(-cfg.lr))
        tx = optax.chain(*chain)
        if lr_fn is not None or wd_fn is not None:
            # scheduled runs use the standard optax protocol — the fused
            # single-pass apply measured a wash anyway (PERFORMANCE.md
            # "Fused single-pass SGD")
            return tx
        fused = _make_fused_sgd_apply(
            cfg.lr, cfg.momentum, cfg.nesterov, wd, mask, trace_idx
        )
        return FusedTx(init=tx.init, update=tx.update, fused_apply=fused)
    if cfg.name == "adamw":
        if wd_fn is not None:
            raise NotImplementedError(
                "final_wd scheduling is coupled-wd (sgd/adam); adamw's "
                "decoupled decay is not scheduled"
            )
        return optax.adamw(
            lr_fn if lr_fn is not None else cfg.lr,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            weight_decay=wd,
            mask=mask,
        )
    if cfg.name == "adam":
        chain = []
        if wd:
            chain.append(
                _scheduled_decayed_weights(wd_fn, mask) if wd_fn is not None
                else optax.add_decayed_weights(wd, mask=mask)
            )
        chain.append(optax.adam(lr_fn if lr_fn is not None else cfg.lr))
        return chain[0] if len(chain) == 1 else optax.chain(*chain)
    raise ValueError(f"invalid optimizer {cfg.name!r}")
