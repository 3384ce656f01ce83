"""Pipeline-parallel VideoMAE — GPipe microbatching over a ``pipe`` mesh axis.

The reference needs no pipeline parallelism: its largest model is ViT-B
(~87M params) and fits any single accelerator (SURVEY.md §2.1 "No
TP/PP/..."), so — like :mod:`bvc_tpu.parallel.seqpar` — this module is a
beyond-parity extension point: train models whose LAYER STACK exceeds one
chip's HBM by placing contiguous layer chunks on successive chips and
streaming microbatches through them (GPipe schedule: all forward
microbatches flow stage 0 → P−1, autodiff reverses the flow for the
backward — the cotangents ride the transposed ``ppermute``s).

TPU-first design notes:

- **Stages are slices of the stacked-block pytree.** The models already
  store their D transformer blocks as one pytree with a leading
  ``[depth]`` axis (:func:`bvc_tpu.models.vit.init_blocks`), so "stage
  s holds layers [s·D/P, (s+1)·D/P)" is literally ``P('pipe')`` on that
  axis — no re-packing, and the optimizer update outside the
  ``shard_map`` is sliced per stage by GSPMD for free.
- **The schedule is a ``lax.scan`` over M+P−1 ticks** inside one
  ``shard_map``: every tick each stage applies its local layers once and
  ``ppermute``s the activation one hop along the ``pipe`` ring (nearest
  neighbors on ICI).  Static shapes throughout; the bubble is the usual
  GPipe (P−1)/(M+P−1) per pipelined stack.
- **Edge work is resident, not sharded.** Patchify/embed (3 of the 68.5
  GFLOP/clip, PERFORMANCE.md) runs on stage 0; the decoder bridge on
  stage 0; the loss head on stage P−1.  Every shard executes the same
  SPMD program, but non-resident shards' results are select()-ed away at
  the injection points, so their gradients are structurally zero and one
  ``psum`` over ``pipe`` recovers the true gradient for these replicated
  params (the resident shard holds the full-batch contribution).
- **Both stacks are pipelined.** Encoder (width 768) and decoder (width
  384) run as two back-to-back pipelines over the same ``pipe`` axis —
  one extra ring hop moves the collected encoder outputs from stage P−1
  back to stage 0 between them.  This keeps per-chip parameters at 1/P
  of BOTH stacks instead of replicating the decoder's 37 GFLOP/clip.

Exactness: the schedule reorders nothing — microbatch j's tokens meet
exactly the layers they would on one chip, the loss is the same mean over
the same masked patches (both the tube and random samplers fix the
per-sample masked count, so the microbatch mean composes to the batch
mean), and the
single ``pmean`` over ``data`` + ``psum`` over ``pipe`` reproduce the
GSPMD gradients.  Equivalence vs
:func:`bvc_tpu.training.steps.make_videomae_train_step` (loss, updated
params, multi-step trajectories) is tested on the 8-device CPU mesh
(tests/test_pipeline.py).

Communication per step (B local rows, V visible tokens, D widths):
``(M+P−1)`` activation hops of ``[mb, V, D]`` per stack per direction
(fwd + transposed bwd) riding nearest-neighbor ICI, plus the one
encoder→decoder relay hop, plus the step's gradient ``pmean`` over
``data`` — there is no all-gather of parameters anywhere (contrast FSDP,
SCALING.md).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bvc_tpu.parallel.mesh import DATA_AXIS
from bvc_tpu.utils.config import MaskConfig, ModelConfig

PIPE_AXIS = "pipe"


def make_pipe_mesh(data: int, pipe: int, devices=None) -> Mesh:
    """``(data, pipe)`` mesh; ``pipe`` innermost so stage hops ride
    nearest-neighbor ICI links."""
    from bvc_tpu.parallel.mesh import make_mesh

    if devices is None:
        devices = jax.devices()[: data * pipe]
    return make_mesh({DATA_AXIS: data, PIPE_AXIS: pipe}, devices=devices)


def _check_mesh(mesh: Mesh):
    if DATA_AXIS not in mesh.axis_names or PIPE_AXIS not in mesh.axis_names:
        raise ValueError(
            f"pipeline-parallel steps need a ('{DATA_AXIS}', '{PIPE_AXIS}') "
            f"mesh, got axes {mesh.axis_names}"
        )


def pipe_param_specs(params: Any) -> Any:
    """PartitionSpec pytree: stacked encoder/decoder block leaves get
    ``P('pipe')`` on their leading depth axis, everything else replicated."""

    def spec(path, leaf):
        top = path[0]
        key = getattr(top, "key", None)
        if key in ("encoder", "decoder") and np.ndim(leaf) >= 1:
            return P(PIPE_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _stage_depths(cfg: ModelConfig, n_stages: int) -> tuple[int, int]:
    if cfg.depth % n_stages or cfg.decoder_depth % n_stages:
        raise ValueError(
            f"encoder depth {cfg.depth} and decoder depth "
            f"{cfg.decoder_depth} must both divide over {n_stages} pipeline "
            "stages (each stage holds an equal contiguous layer chunk)"
        )
    return cfg.depth // n_stages, cfg.decoder_depth // n_stages


def _pipeline_stack(
    stage_blocks: dict,
    x_micro: jnp.ndarray,
    num_heads: int,
    ln_eps: float,
) -> jnp.ndarray:
    """GPipe schedule for one uniform stack: ``[M, mb, N, D] → [M, mb, N, D]``.

    ``stage_blocks``: this shard's ``[L/P, ...]`` slice of the stacked
    block params.  ``x_micro`` carries real data on stage 0 only (other
    stages' copies are select()-ed away at injection).  The returned
    buffer holds the stack outputs in microbatch order on stage P−1;
    other stages return junk that callers must mask.

    Tick t: stage 0 injects microbatch min(t, M−1) (re-injecting the last
    microbatch during drain ticks — its outputs never reach a collected
    slot, see below), every stage applies its layers to what it holds,
    stage P−1 records output slot t−(P−1), and the activation hops one
    ring position.  Slot writes use clipped indices so junk (warmup
    ticks) always lands BEFORE the real write to the same slot —
    last-write-wins makes an unconditional ``dynamic_update_slice``
    correct, and AD zeroes the overwritten writes' cotangents.
    """
    from bvc_tpu.models.vit import run_blocks

    n_stages = jax.lax.axis_size(PIPE_AXIS)
    s = jax.lax.axis_index(PIPE_AXIS)
    M = x_micro.shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        act, buf = carry
        inj = jax.lax.dynamic_index_in_dim(
            x_micro, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
        )
        inp = jnp.where(s == 0, inj, act)
        out = run_blocks(stage_blocks, inp, num_heads, ln_eps)
        slot = jnp.clip(t - (n_stages - 1), 0, M - 1)
        buf = jax.lax.dynamic_update_index_in_dim(buf, out, slot, axis=0)
        nxt = jax.lax.ppermute(out, PIPE_AXIS, perm)
        return (nxt, buf), None

    act0 = jnp.zeros_like(x_micro[0])
    buf0 = jnp.zeros_like(x_micro)
    (_, buf), _ = jax.lax.scan(
        tick, (act0, buf0), jnp.arange(M + n_stages - 1)
    )
    return buf


def _relay_last_to_first(x: jnp.ndarray) -> jnp.ndarray:
    """One ring hop moving stage P−1's buffer to stage 0 (zeros elsewhere)."""
    n_stages = jax.lax.axis_size(PIPE_AXIS)
    return jax.lax.ppermute(x, PIPE_AXIS, [(n_stages - 1, 0)])


def make_pipe_videomae_train_step(
    mesh: Mesh,
    model_cfg: ModelConfig,
    mask_cfg: MaskConfig,
    tx: optax.GradientTransformation,
    num_microbatches: int = 4,
    grad_probes: dict[str, Callable[[Any], jnp.ndarray]] | None = None,
    grad_accum: int = 1,
) -> Callable:
    """Pipeline-parallel twin of
    :func:`bvc_tpu.training.steps.make_videomae_train_step`: same
    ``step(state, video) -> (state, metrics)`` contract, same tube masks
    from ``state.rng`` (equivalence-tested), video sharded ``[B@data]``
    (replicated over ``pipe``), encoder/decoder block params sharded
    ``P('pipe')`` on their depth axis.

    Both mask samplers are supported: the sequence stays whole on every
    stage (only DEPTH is sharded), so any sampler with a fixed per-sample
    masked count keeps microbatch shapes static — tube AND random
    qualify.  (Contrast :mod:`bvc_tpu.parallel.seqpar`, which shards the
    TIME axis and genuinely needs tube masks' per-sheet count invariant.)

    ``grad_accum > 1`` composes gradient accumulation WITH the GPipe
    schedule: the per-data-shard batch splits into ``grad_accum``
    sequential chunks, each chunk runs its own full pipeline pass
    (``num_microbatches`` microbatches through all stages), and the one
    optimizer step applies the chunk-mean gradient.  The two knobs are
    orthogonal, as in any production pipeline system: microbatching
    bounds ACTIVATION memory inside one pipeline pass (and sets the
    bubble fraction (P−1)/(M+P−1)), accumulation bounds the
    OPTIMIZER-visible batch beyond what one pass can hold.  Exact for
    the usual reason — equal per-sample masked counts make the mean of
    chunk means the batch mean (equivalence-tested vs the GSPMD DP step
    in tests/test_pipeline.py).
    """
    _check_mesh(mesh)
    if mask_cfg.sampler not in ("tube", "random"):
        raise ValueError(
            "pipeline-parallel VideoMAE supports the 'tube' and 'random' "
            f"samplers (fixed per-sample visible count); got "
            f"{mask_cfg.sampler!r}"
        )
    from bvc_tpu.masks.tube import mask_partition
    from bvc_tpu.models.videomae import (
        _compute_dtype, normalize_on_device, patch_targets, pos_tables,
    )
    from bvc_tpu.models.vit import layer_norm
    from bvc_tpu.ops.patchify import patchify_pixels
    from bvc_tpu.parallel.seqpar import _local_tube_masks
    from bvc_tpu.training.optim import apply_gradients
    from bvc_tpu.training.probes import videomae_grad_metrics
    from bvc_tpu.training.state import TrainState

    n_stages = mesh.shape[PIPE_AXIS]
    _stage_depths(model_cfg, n_stages)
    t_sheets = model_cfg.num_time_steps
    hw = model_cfg.image_size // model_cfg.patch_size
    n_space = hw * hw
    if mask_cfg.sampler == "tube":
        n_masked_space = int(mask_cfg.mask_ratio * n_space)
        n_masked = n_masked_space * t_sheets
    else:  # random: counts over the whole token grid (masks/tube.py)
        n_masked = int(mask_cfg.mask_ratio * model_cfg.seq_len)
    num_visible = model_cfg.seq_len - n_masked

    def local_masks(mask_rng, b_local):
        """This data-shard's ``[b_local, seq_len]`` rows of the global
        mask — bitwise what the DP step's sampler draws for these rows
        (same key-split indexing as ``_local_tube_masks``)."""
        if mask_cfg.sampler == "tube":
            return _local_tube_masks(
                mask_rng, b_local, t_sheets, n_space, n_masked_space
            )
        d_idx = jax.lax.axis_index(DATA_AXIS)
        b_global = b_local * jax.lax.axis_size(DATA_AXIS)
        keys = jax.random.split(mask_rng, b_global)
        local_keys = jax.lax.dynamic_slice_in_dim(
            keys, d_idx * b_local, b_local
        )

        def one(k):
            perm = jax.random.permutation(k, model_cfg.seq_len)
            return (
                jnp.zeros((model_cfg.seq_len,), jnp.bool_)
                .at[perm[:n_masked]].set(True)
            )

        return jax.vmap(one)(local_keys)
    enc_table, dec_table = pos_tables(model_cfg)
    M = num_microbatches

    def local_loss(params, video, visible_idx, masked_idx, targets):
        """Per-shard loss: nonzero only on stage P−1 (see module doc)."""
        dtype = _compute_dtype(model_cfg)
        b_local = video.shape[0]
        if b_local % M:
            raise ValueError(
                f"num_microbatches ({M}) must divide the per-data-shard "
                f"batch ({b_local})"
            )
        mb = b_local // M

        # ---- stage-0 resident: patchify → gather visible → embed + pos
        patches = patchify_pixels(video, model_cfg.tubelet_size, model_cfg.patch_size)
        vis_px = jnp.take_along_axis(
            patches, visible_idx[..., None], axis=1
        ).astype(dtype)
        pe = params["patch_embed"]
        x = jnp.dot(vis_px, pe["kernel"].astype(dtype), preferred_element_type=dtype)
        x = x + pe["bias"].astype(dtype)
        enc_pos = jnp.broadcast_to(
            jnp.asarray(enc_table, dtype)[None], (b_local,) + enc_table.shape
        )
        x = x + jnp.take_along_axis(enc_pos, visible_idx[..., None], axis=1)

        # ---- encoder pipeline over ``pipe``
        x_micro = x.reshape(M, mb, num_visible, model_cfg.hidden_size)
        enc_out = _pipeline_stack(
            params["encoder"], x_micro, model_cfg.num_heads,
            model_cfg.layer_norm_eps,
        )
        enc_out = _relay_last_to_first(enc_out)  # → stage 0

        # ---- stage-0 resident: bridge to decoder width + mask tokens
        z = jnp.dot(
            enc_out.reshape(b_local, num_visible, model_cfg.hidden_size),
            params["enc_to_dec"]["kernel"].astype(dtype),
            preferred_element_type=dtype,
        )
        dec_pos = jnp.broadcast_to(
            jnp.asarray(dec_table, dtype)[None], (b_local,) + dec_table.shape
        )
        pos_vis = jnp.take_along_axis(dec_pos, visible_idx[..., None], axis=1)
        pos_mask = jnp.take_along_axis(dec_pos, masked_idx[..., None], axis=1)
        mask_tok = params["mask_token"].astype(dtype)
        y = jnp.concatenate([z + pos_vis, mask_tok + pos_mask], axis=1)

        # ---- decoder pipeline over ``pipe``
        y_micro = y.reshape(M, mb, model_cfg.seq_len, model_cfg.decoder_hidden_size)
        dec_out = _pipeline_stack(
            params["decoder"], y_micro, model_cfg.decoder_num_heads,
            model_cfg.layer_norm_eps,
        )

        # ---- stage-(P−1) resident: norm → head → masked-patch MSE
        d = dec_out.reshape(b_local, model_cfg.seq_len, model_cfg.decoder_hidden_size)
        d = d[:, -n_masked:]
        d = layer_norm(d, params["decoder_norm"], model_cfg.layer_norm_eps)
        head = params["decoder_head"]
        preds = jnp.dot(
            d, head["kernel"].astype(dtype), preferred_element_type=dtype
        ) + head["bias"].astype(dtype)
        loss = jnp.mean(
            jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32))
        )
        is_last = jax.lax.axis_index(PIPE_AXIS) == n_stages - 1
        return jnp.where(is_last, loss, 0.0)

    def _reduce_grads(grads):
        """pmean over ``data``; for pipe-replicated leaves, psum over
        ``pipe`` (exactly one stage holds the nonzero contribution —
        patchify/bridge on stage 0, norm/head on stage P−1); stage-sharded
        block leaves need no pipe reduction (each shard owns its layers).
        """

        def red(path, g):
            g = jax.lax.pmean(g, DATA_AXIS)
            top = getattr(path[0], "key", None)
            if top not in ("encoder", "decoder"):
                g = jax.lax.psum(g, PIPE_AXIS)
            return g

        return jax.tree_util.tree_map_with_path(red, grads)

    def local_loss_grads(params, mask_rng, video_local):
        video = normalize_on_device(video_local)
        b_local = video.shape[0]
        mask = local_masks(mask_rng, b_local)
        visible_idx, masked_idx = mask_partition(mask, num_visible)
        targets = patch_targets(video, model_cfg, masked_idx)

        if grad_accum > 1:
            # sequential accumulation OVER full pipeline passes: chunk c
            # = contiguous local rows [c*bc, (c+1)*bc) (chunking order is
            # irrelevant to the mean; masks/targets were sampled for the
            # full local batch above, so every row sees the same mask it
            # would without accumulation)
            if b_local % grad_accum:
                raise ValueError(
                    f"grad_accum_steps ({grad_accum}) must divide the "
                    f"per-data-shard batch ({b_local})"
                )
            bc = b_local // grad_accum

            def chunks(x):
                return x.reshape(grad_accum, bc, *x.shape[1:])

            xs_all = tuple(map(chunks, (video, visible_idx, masked_idx,
                                        targets)))
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)

            def chunk_pass(carry, xs):
                g_acc, l_acc = carry
                v, vi, mi, tg = xs
                loss, g = jax.value_and_grad(
                    lambda p: local_loss(p, v, vi, mi, tg)
                )(params)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + loss), None

            (g_sum, l_sum), _ = jax.lax.scan(
                chunk_pass, (zero_g, 0.0), xs_all
            )
            loss_local = l_sum / grad_accum
            grads_local = jax.tree_util.tree_map(
                lambda x: x / grad_accum, g_sum
            )
        else:
            loss_local, grads_local = jax.value_and_grad(
                lambda p: local_loss(p, video, visible_idx, masked_idx,
                                     targets)
            )(params)
        loss = jax.lax.pmean(jax.lax.psum(loss_local, PIPE_AXIS), DATA_AXIS)
        return loss, _reduce_grads(grads_local)

    def local_eval_loss(params, eval_rng, video_local):
        video = normalize_on_device(video_local)
        mask = local_masks(eval_rng, video.shape[0])
        visible_idx, masked_idx = mask_partition(mask, num_visible)
        targets = patch_targets(video, model_cfg, masked_idx)
        loss_local = local_loss(params, video, visible_idx, masked_idx, targets)
        return jax.lax.pmean(jax.lax.psum(loss_local, PIPE_AXIS), DATA_AXIS)

    p_specs_cache: dict[str, Any] = {}

    def _param_specs(params):
        if "p" not in p_specs_cache:
            p_specs_cache["p"] = pipe_param_specs(params)
        return p_specs_cache["p"]

    def _shard_maps(params):
        if "sm" not in p_specs_cache:
            p_specs = _param_specs(params)
            # explicit-reduction style (as seqpar): with vma checking on,
            # AD would ALSO auto-psum cotangents at replicated-operand
            # boundaries and double-count the explicit reductions above
            p_specs_cache["sm"] = jax.shard_map(
                local_loss_grads, mesh=mesh,
                in_specs=(p_specs, P(), P(DATA_AXIS)),
                out_specs=(P(), p_specs),
                check_vma=False,
            )
            p_specs_cache["esm"] = jax.shard_map(
                local_eval_loss, mesh=mesh,
                in_specs=(p_specs, P(), P(DATA_AXIS)),
                out_specs=P(),
                check_vma=False,
            )
        return p_specs_cache["sm"], p_specs_cache["esm"]

    def step(state: TrainState, video: jnp.ndarray):
        rng, mask_rng = jax.random.split(state.rng)
        grads_sm, _ = _shard_maps(state.params)
        loss, grads = grads_sm(state.params, mask_rng, video)
        params, opt_state = apply_gradients(tx, grads, state.opt_state, state.params)
        metrics = {"loss": loss}
        metrics.update(videomae_grad_metrics(grads))
        for name, fn in (grad_probes or {}).items():
            metrics[name] = fn(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state,
                       rng=rng, target_params=state.target_params,
                       extra=state.extra),
            metrics,
        )

    def eval_step(state: TrainState, video: jnp.ndarray, step_idx):
        _, eval_sm = _shard_maps(state.params)
        return {
            "loss": eval_sm(
                state.params, jax.random.fold_in(state.rng, step_idx), video
            )
        }

    video_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    cache: dict[str, Any] = {}

    def _shardings(state: TrainState):
        if "st_sh" not in cache:
            cache["st_sh"] = pipe_state_shardings(state, mesh)
        return cache["st_sh"]

    def train(state: TrainState, batch):
        if "jit" not in cache:
            st_sh = _shardings(state)
            cache["jit"] = jax.jit(
                step, in_shardings=(st_sh, video_sh),
                out_shardings=(st_sh, rep), donate_argnums=(0,),
            )
        return cache["jit"](state, batch)

    def evaluate(state: TrainState, batch, step_idx=0):
        if "ejit" not in cache:
            st_sh = _shardings(state)
            cache["ejit"] = jax.jit(
                eval_step, in_shardings=(st_sh, video_sh, rep),
                out_shardings=rep,
            )
        return cache["ejit"](state, batch, jnp.asarray(step_idx, jnp.int32))

    def compiled_text(state: TrainState, batch) -> str:
        """Optimized HLO for these shapes — compiles but does NOT execute
        (feeds :mod:`bvc_tpu.parallel.analysis`)."""
        st_sh = _shardings(state)
        jitted = jax.jit(
            step, in_shardings=(st_sh, video_sh), out_shardings=(st_sh, rep)
        )  # no donation: inspection must not invalidate the caller's state
        return jitted.lower(state, batch).compile().as_text()

    train.eval_step = evaluate  # type: ignore[attr-defined]
    train.shardings = lambda: cache.get("st_sh")  # type: ignore[attr-defined]
    train.compiled_text = compiled_text  # type: ignore[attr-defined]
    return train


def pipe_state_shardings(state, mesh: Mesh):
    """TrainState shardings for the pipeline layout: block stacks
    ``P('pipe')`` on depth, everything else (incl. matching optimizer
    momentum, by tree-path suffix) following its param."""
    from bvc_tpu.training.steps import tree_shardings_from_param_shardings

    p_sh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), pipe_param_specs(state.params),
        is_leaf=lambda x: isinstance(x, P),
    )
    return tree_shardings_from_param_shardings(state, mesh, p_sh)
