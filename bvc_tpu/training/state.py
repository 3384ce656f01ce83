"""Train state pytree."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.struct import dataclass as pytree_dataclass, field


@pytree_dataclass
class TrainState:
    """Carried through the jitted step; all leaves live on device.

    Covers every piece of cross-stage state the reference threads through
    its checkpoints (SURVEY.md §5 checkpoint/resume): params, optimizer
    state, step counter, PRNG key, and (JEPA) target-encoder params.
    """

    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    target_params: Any = None  # JEPA EMA target encoder (else None)
    extra: Any = None  # family-specific (e.g. predictor params live in params)

    @staticmethod
    def create(params: Any, tx: optax.GradientTransformation, rng, target_params=None, extra=None):
        import jax.numpy as jnp

        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
            target_params=target_params,
            extra=extra,
        )
