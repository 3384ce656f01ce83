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


def apply_gradients(tx, grads, opt_state, params):
    """(new_params, new_opt_state) — via ``fused_apply`` when the
    transformation provides one, else the standard optax protocol."""
    if hasattr(tx, "fused_apply"):
        return tx.fused_apply(grads, opt_state, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def make_optimizer(cfg: OptimConfig, params_example: Any | None = None) -> optax.GradientTransformation:
    wd = cfg.weight_decay
    mask = None
    if cfg.exclude_bias_and_norm_from_wd and params_example is not None:
        mask = wd_mask(params_example)

    if cfg.name == "sgd":
        chain = []
        trace_idx = None
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=mask))
        if cfg.momentum:
            trace_idx = len(chain)
            chain.append(
                optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov)
            )
        chain.append(optax.scale(-cfg.lr))
        tx = optax.chain(*chain)
        fused = _make_fused_sgd_apply(
            cfg.lr, cfg.momentum, cfg.nesterov, wd, mask, trace_idx
        )
        return FusedTx(init=tx.init, update=tx.update, fused_apply=fused)
    if cfg.name == "adamw":
        return optax.adamw(
            cfg.lr,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            weight_decay=wd,
            mask=mask,
        )
    if cfg.name == "adam":
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=mask))
        chain.append(optax.adam(cfg.lr))
        return chain[0] if len(chain) == 1 else optax.chain(*chain)
    raise ValueError(f"invalid optimizer {cfg.name!r}")
