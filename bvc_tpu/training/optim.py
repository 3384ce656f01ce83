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

from typing import Any

import optax

from bvc_tpu.utils.config import OptimConfig


def wd_mask(params: Any) -> Any:
    """True for leaves that take weight decay: ndim >= 2.

    Matches the reference's ``('bias' not in n) and (len(p.shape) != 1)``
    — in our layout every 1-D leaf is a bias/scale and vice versa (the
    JEPA mask_token is 3-D but frozen-std init; torch applies WD to it via
    the predictor group — ndim>=2 keeps that behavior).
    """
    import jax

    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(cfg: OptimConfig, params_example: Any | None = None) -> optax.GradientTransformation:
    wd = cfg.weight_decay
    mask = None
    if cfg.exclude_bias_and_norm_from_wd and params_example is not None:
        mask = wd_mask(params_example)

    if cfg.name == "sgd":
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=mask))
        if cfg.momentum:
            chain.append(
                optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov)
            )
        chain.append(optax.scale(-cfg.lr))
        return optax.chain(*chain)
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
