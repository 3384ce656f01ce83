"""Opt-in device-side gradient-health probes (the reference's fuller
``grad_logger`` stats table).

The reference's ``grad_logger`` builds an ``AverageMeter`` over per-layer
gradient norms on the host every iteration — family-specific scope:

- generative: the three named VideoMAE layers (patch-embed projection,
  encoder→decoder bridge, decoder head)
  (``generative/loggingtools.py:98-119``);
- predictive: EVERY non-bias weight tensor of encoder+predictor, with the
  first/last ``qkv`` norms pinned (``predictive/loggingtools.py:98-112``);
- contrastive: ``conv1.weight`` / ``fc.0.weight``
  (``contrastive/loggingtools.py:98-114``).

Here the same statistics are computed ON DEVICE inside the jitted step
(as extra ``grad_probes``), so enabling them costs a handful of fused
reductions instead of a host transfer of every gradient.  They are
OPT-IN (``TrainConfig.log_grad_stats``) and surface in the INFO log line
— the CSV schemas are unchanged (the CSV contract is what downstream
consumes, VERDICT r2 #9).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


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


def per_layer_weight_norms(tree: Any) -> jnp.ndarray:
    """Concatenated per-layer gradient norms of every non-bias weight
    tensor (torch ``len(p.shape) > 1`` filter, reference
    ``predictive/loggingtools.py:103``).

    Stacked-block leaves (leading depth axis, path contains 'blocks')
    contribute one norm PER LAYER — matching the reference's per-module
    iteration granularity.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    norms = []
    for path, leaf in flat:
        p = _path_str(path)
        if "bias" in p:
            continue
        x = jnp.asarray(leaf).astype(jnp.float32)
        if "blocks" in p:
            if x.ndim >= 3:  # per-depth slices are the >=2-D weights
                norms.append(jnp.sqrt(jnp.sum(x * x, axis=tuple(range(1, x.ndim)))))
        elif x.ndim >= 2:
            norms.append(jnp.sqrt(jnp.sum(x * x))[None])
    if not norms:
        return jnp.zeros((1,), jnp.float32)
    return jnp.concatenate(norms)


def _meter(norms_fn: Callable[[Any], jnp.ndarray]) -> dict[str, Callable]:
    """avg/min/max over a set of per-layer norms — the reference
    ``AverageMeter`` fields its log lines read."""
    return {
        "gstat_avg": lambda g: jnp.mean(norms_fn(g)),
        "gstat_min": lambda g: jnp.min(norms_fn(g)),
        "gstat_max": lambda g: jnp.max(norms_fn(g)),
    }


def _leaf_sumsqs(grads: Any, stacked) -> list[tuple[str, jnp.ndarray]]:
    """(path, sumsq) per leaf — per-DEPTH vectors for stacked-block
    leaves (``stacked(path)`` True), scalars otherwise.  One read of the
    gradient tree; every norm metric below is a combination of these
    partial sums."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        p = _path_str(path)
        x = jnp.asarray(leaf).astype(jnp.float32)
        if stacked(p) and x.ndim >= 1:
            out.append((p, jnp.sum(x * x, axis=tuple(range(1, x.ndim)))))
        else:
            out.append((p, jnp.sum(x * x)))
    return out


def _sqrt_sum(parts: list[jnp.ndarray]) -> jnp.ndarray:
    if not parts:
        return jnp.zeros((), jnp.float32)
    return jnp.sqrt(sum(jnp.sum(x) for x in parts))


def videomae_grad_metrics(grads: Any) -> dict[str, jnp.ndarray]:
    """grad_norm + the generative CSV's EFL/ELL/DLL probes
    (``generative/loggingtools.py:98-119``) from ONE pass over the
    gradients — per-leaf sum-of-squares computed once and combined,
    instead of four independent reduction chains (VERDICT r2 #2: the
    probes were ~7.7 ms of the step residual as separate reductions).

    The videomae tree stacks its transformer layers directly under the
    ``encoder``/``decoder`` keys (no ``blocks`` level)."""
    ssqs = _leaf_sumsqs(
        grads, lambda p: p.split("/", 1)[0] in ("encoder", "decoder")
    )
    total, efl, ell, dll = [], [], [], []
    for p, v in ssqs:
        head = p.split("/", 1)[0]
        total.append(v)
        if head == "patch_embed":
            efl.append(v)
        elif head == "decoder_head":
            dll.append(v)
        elif head == "encoder":
            ell.append(v[-1])  # last layer's slice of the stacked leaf
    return {
        "grad_norm": _sqrt_sum(total),
        "grad_efl": _sqrt_sum(efl),
        "grad_ell": _sqrt_sum(ell),
        "grad_dll": _sqrt_sum(dll),
    }


def jepa_grad_metrics(grads: Any) -> dict[str, jnp.ndarray]:
    """grad_norm + first/last qkv-layer norms
    (``predictive/loggingtools.py:98-112``), one pass."""
    ssqs = _leaf_sumsqs(grads, lambda p: "blocks" in p)
    total = [v for _, v in ssqs]
    fl = ll = jnp.zeros((), jnp.float32)
    for p, v in ssqs:
        if p == "encoder/blocks/attn/qkv/kernel":
            fl, ll = jnp.sqrt(v[0]), jnp.sqrt(v[-1])
    return {"grad_norm": _sqrt_sum(total), "grad_fl": fl, "grad_ll": ll}


def simclr_grad_metrics(grads: Any) -> dict[str, jnp.ndarray]:
    """grad_norm + conv1/fc.0 norms
    (``contrastive/loggingtools.py:98-114``), one pass."""
    ssqs = _leaf_sumsqs(grads, lambda p: False)
    total = [v for _, v in ssqs]
    conv1 = [v for p, v in ssqs if p.startswith("stem/conv")]
    fc0 = [v for p, v in ssqs if p.startswith("head/fc1")]
    return {
        "grad_norm": _sqrt_sum(total),
        "grad_conv1": _sqrt_sum(conv1),
        "grad_fc0": _sqrt_sum(fc0),
    }


def full_grad_probes(family: str) -> dict[str, Callable[[Any], jnp.ndarray]]:
    """The opt-in fuller stats table for one model family.

    Returns extra ``grad_probes`` (name → fn(grads)); the named
    first/last-layer norms the CSVs already carry stay where they are.
    """
    import optax

    if family == "videomae":
        def norms(g):
            return jnp.stack([
                optax.global_norm(g["patch_embed"]),
                optax.global_norm(g["enc_to_dec"]),
                optax.global_norm(g["decoder_head"]),
            ])

        return _meter(norms)
    if family == "jepa":
        # all non-bias weights of encoder+predictor, like the reference's
        # full-iteration meter
        return _meter(per_layer_weight_norms)
    if family == "simclr":
        def norms(g):
            return jnp.stack([
                optax.global_norm(g["stem"]["conv"]),
                optax.global_norm(g["head"]["fc1"]),
            ])

        return _meter(norms)
    raise ValueError(f"unknown family {family!r}")


def format_gstats(metrics) -> str:
    """Log-line suffix for the opt-in fuller grad_logger stats (the
    reference meter's ``avg (min, max)`` — loggingtools.py:98-119), empty
    when the probe did not run this step.  Shared by all three trainers."""
    if "gstat_avg" not in metrics:
        return ""
    return " [grad: %.2e (%.2e, %.2e)]" % (
        float(metrics["gstat_avg"]),
        float(metrics["gstat_min"]),
        float(metrics["gstat_max"]),
    )
