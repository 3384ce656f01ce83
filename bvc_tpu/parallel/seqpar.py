"""Sequence(time)-parallel VideoMAE — long-clip training and extraction.

The reference never needs sequence parallelism: its longest sequence is
the 1568-token VideoMAE grid (SURVEY.md §5 "Long-context: none").  This
module is the beyond-parity extension point that section names — train
and embed clips whose token count exceeds what one chip's attention can
hold, by sharding the TIME axis over a ``seq`` mesh axis.

Why exactness is structural here: tube masking draws ONE spatial mask
per sample and tiles it across every temporal sheet
(``generative/mask.py:3-24``; :func:`bvc_tpu.masks.tube.tube_mask`), so
every time shard keeps an identical, static count of visible tokens —
locality and static shapes survive the sharding.  Per shard the step
runs patchify → encoder → decoder → norm-pix loss on its own sheets;
the only cross-shard communication is

- ring attention over the ``seq`` axis (:mod:`bvc_tpu.ops.ring_attention`)
  inside the encoder (visible tokens) and decoder (full grid), and
- one ``pmean`` for the loss/gradients.

The result is mathematically the single-chip step: attention is over the
same global key set (softmax is permutation-invariant in its keys), the
norm-pix targets are per-patch local, and equal per-shard masked counts
make the mean-of-local-means exact.  Equivalence vs
:func:`bvc_tpu.models.videomae.pretrain_loss` and the GSPMD train step
is tested on the 8-device CPU mesh (tests/test_seqpar.py).

Sharding layout: ``video [B, T, H, W, C]`` with B over ``data`` and T
over ``seq``; params replicated, optimizer state replicated or — with
``param_mode='zero1'`` — sharded over ``data`` (the optimizer update
runs outside the shard_map under GSPMD, so the zero1 slicing composes
exactly as in the main step; FSDP stays rejected because it would
re-gather the whole stack per layer inside the ring, while tensor
parallelism composes via :func:`make_seq_tp_videomae_train_step` — the
heads-sharded Megatron step over a third ``model`` axis).  Gradient
accumulation (``grad_accum``) scans local microbatches inside the
shard_map with the cross-chip reduction still once per optimizer step.
Per-chip attention memory falls from O(N²) to O((N/S)²)
and activation memory by S×, which is what admits e.g. 64-frame 224px
clips (6272 tokens) that OOM the single-chip step.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from bvc_tpu.parallel.mesh import DATA_AXIS
from bvc_tpu.utils.config import MaskConfig, ModelConfig

SEQ_AXIS = "seq"


def make_seq_mesh(data: int, seq: int, devices=None) -> Mesh:
    """``(data, seq)`` mesh; ``seq`` innermost so KV ring hops ride
    nearest-neighbor ICI links.  Uses the first ``data*seq`` devices when
    ``devices`` is not given (the mesh may be smaller than the backend)."""
    from bvc_tpu.parallel.mesh import make_mesh

    if devices is None:
        devices = jax.devices()[: data * seq]
    return make_mesh({DATA_AXIS: data, SEQ_AXIS: seq}, devices=devices)


def shard_seq_batch(video: Any, mesh: Mesh) -> Any:
    """Place ``[B, T, ...]`` with B over ``data`` and T over ``seq``.

    Delegates to :func:`bvc_tpu.parallel.sharding.shard_batch`, which is
    multi-host aware: each process contributes its local batch rows (a
    plain ``device_put`` cannot address other hosts' devices)."""
    from bvc_tpu.parallel.sharding import shard_batch

    return shard_batch(video, mesh, P(DATA_AXIS, SEQ_AXIS))


def _check_mesh(mesh: Mesh):
    if DATA_AXIS not in mesh.axis_names or SEQ_AXIS not in mesh.axis_names:
        raise ValueError(
            f"sequence-parallel steps need a ('{DATA_AXIS}', '{SEQ_AXIS}') "
            f"mesh, got axes {mesh.axis_names}"
        )


def _seq_size(mesh: Mesh) -> int:
    return mesh.shape[SEQ_AXIS]


def _rings_process_local(proc_idx: np.ndarray, seq_ax: int) -> bool:
    """True iff every ring (a 1-D slice along ``seq_ax``) stays within
    one process.  ``proc_idx``: per-device process indices shaped like
    ``mesh.devices``."""
    moved = np.moveaxis(proc_idx, seq_ax, -1)
    rings = moved.reshape(-1, proc_idx.shape[seq_ax])
    return bool((rings == rings[:, :1]).all())


def require_process_local_seq(mesh: Mesh) -> None:
    """Host-feed paths (the trainer's loader, extraction's
    ``shard_seq_batch``) hand each process a FULL-time-axis batch slice;
    ``make_array_from_process_local_data``/``device_put`` can only place
    that when the ``seq`` axis is confined to one process per ring.
    Cross-process rings are valid SPMD (``ppermute`` would ride DCN) but
    would need a time-sliced host feed that does not exist — fail with
    the real reason instead of a JAX local-shape mismatch.
    """
    if jax.process_count() == 1:
        return
    seq_ax = list(mesh.axis_names).index(SEQ_AXIS)
    proc_idx = np.vectorize(lambda d: d.process_index)(mesh.devices)
    if not _rings_process_local(proc_idx, seq_ax):
        raise ValueError(
            "sequence-parallel host feeding requires each 'seq' ring to "
            "stay within one process (put 'data' on the outer/DCN axis "
            "and 'seq' within hosts); this mesh spreads a ring across "
            "processes"
        )


def _local_sheets(cfg: ModelConfig, n_shards: int) -> int:
    t = cfg.num_time_steps
    if t % n_shards:
        raise ValueError(
            f"{t} temporal sheets do not split over {n_shards} seq shards "
            "(num_frames/tubelet_size must be divisible by the seq axis)"
        )
    return t // n_shards


def _local_pos_rows(table: np.ndarray, n_shards: int) -> jnp.ndarray:
    """[N, D] global sinusoid table → this shard's [N/S, D] rows (token
    order is t-major, so a time shard's tokens are contiguous rows)."""
    n, d = table.shape
    table_r = jnp.asarray(table.reshape(n_shards, n // n_shards, d))
    return table_r[jax.lax.axis_index(SEQ_AXIS)]


def _local_tube_masks(mask_rng, b_local: int, t_local: int, n_space: int,
                      n_masked_space: int):
    """This data-shard's rows of the global tube mask, tiled over the
    LOCAL sheets — bitwise the (data, seq) block of what
    ``tube_mask(mask_rng, B_global, (T, h, w), ratio)`` samples, because
    the spatial frame never depends on T."""
    d_idx = jax.lax.axis_index(DATA_AXIS)
    b_global = b_local * jax.lax.axis_size(DATA_AXIS)
    keys = jax.random.split(mask_rng, b_global)
    local_keys = jax.lax.dynamic_slice_in_dim(keys, d_idx * b_local, b_local)

    def one_frame(k):
        perm = jax.random.permutation(k, n_space)
        return jnp.zeros((n_space,), jnp.bool_).at[perm[:n_masked_space]].set(True)

    frames = jax.vmap(one_frame)(local_keys)
    return jnp.tile(frames, (1, t_local))


def _local_pretrain_loss(
    params: dict,
    video_local: jnp.ndarray,
    mask_local: jnp.ndarray,
    cfg: ModelConfig,
    num_visible_local: int,
    enc_pos_local: jnp.ndarray,
    dec_pos_local: jnp.ndarray,
    tp: int = 1,
) -> jnp.ndarray:
    """This shard's mean masked-patch loss over its own sheets.

    Mirrors :func:`bvc_tpu.models.videomae.pretrain_loss` =
    ``encode_visible`` + ``decode_masked`` + ``patch_targets`` with two
    sequence-parallel substitutions: position tables are this shard's
    rows, and both stacks attend with ``ring:seq``.

    ``tp > 1``: block params arrive as this 'model' shard's head-major
    slices and the stacks run :func:`_run_blocks_seq_tp` (heads-sharded
    Megatron TP composed with the ring — see the module section below).
    """
    from bvc_tpu.masks.tube import mask_partition
    from bvc_tpu.models.videomae import (
        _compute_dtype, normalize_on_device, patch_targets,
    )
    from bvc_tpu.models.vit import layer_norm, run_blocks
    from bvc_tpu.ops.patchify import patchify_pixels

    dtype = _compute_dtype(cfg)
    video = normalize_on_device(video_local)
    visible_idx, masked_idx = mask_partition(mask_local, num_visible_local)

    # ---- encoder on this shard's visible tokens (ring attention) ----
    patches = patchify_pixels(video, cfg.tubelet_size, cfg.patch_size)
    vis_px = jnp.take_along_axis(patches, visible_idx[..., None], axis=1).astype(dtype)
    pe = params["patch_embed"]
    x = jnp.dot(vis_px, pe["kernel"].astype(dtype), preferred_element_type=dtype)
    x = x + pe["bias"].astype(dtype)
    b = video.shape[0]
    enc_pos = jnp.broadcast_to(
        enc_pos_local.astype(dtype)[None], (b,) + enc_pos_local.shape
    )
    x = x + jnp.take_along_axis(enc_pos, visible_idx[..., None], axis=1)
    if tp > 1:
        x = _run_blocks_seq_tp(params["encoder"], x, cfg.num_heads // tp,
                               cfg.layer_norm_eps, cfg.remat,
                               unroll=cfg.depth <= 12)
    else:
        x = run_blocks(
            params["encoder"], x, cfg.num_heads, cfg.layer_norm_eps, cfg.remat,
            attn_impl=f"ring:{SEQ_AXIS}", unroll=cfg.depth <= 12,
        )

    # ---- decoder over this shard's full grid (ring attention) ----
    z = jnp.dot(
        x, params["enc_to_dec"]["kernel"].astype(dtype), preferred_element_type=dtype
    )
    dec_pos = jnp.broadcast_to(
        dec_pos_local.astype(dtype)[None], (b,) + dec_pos_local.shape
    )
    pos_vis = jnp.take_along_axis(dec_pos, visible_idx[..., None], axis=1)
    pos_mask = jnp.take_along_axis(dec_pos, masked_idx[..., None], axis=1)
    mask_tok = params["mask_token"].astype(dtype)
    y = jnp.concatenate([z + pos_vis, mask_tok + pos_mask], axis=1)
    if tp > 1:
        y = _run_blocks_seq_tp(params["decoder"], y,
                               cfg.decoder_num_heads // tp,
                               cfg.layer_norm_eps, cfg.remat,
                               unroll=cfg.decoder_depth <= 4)
    else:
        y = run_blocks(
            params["decoder"], y, cfg.decoder_num_heads, cfg.layer_norm_eps,
            cfg.remat, attn_impl=f"ring:{SEQ_AXIS}",
            unroll=cfg.decoder_depth <= 4,
        )
    y = y[:, -masked_idx.shape[1]:]
    y = layer_norm(y, params["decoder_norm"], cfg.layer_norm_eps)
    head = params["decoder_head"]
    preds = jnp.dot(
        y, head["kernel"].astype(dtype), preferred_element_type=dtype
    ) + head["bias"].astype(dtype)

    # ---- per-patch-local norm-pix targets + local mean ----
    targets = patch_targets(video, cfg, masked_idx)
    return jnp.mean(
        jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32))
    )


def make_seq_videomae_train_step(
    mesh: Mesh,
    model_cfg: ModelConfig,
    mask_cfg: MaskConfig,
    tx: optax.GradientTransformation,
    param_mode: str = "replicated",
    grad_probes: dict[str, Callable[[Any], jnp.ndarray]] | None = None,
    grad_accum: int = 1,
) -> Callable:
    """Sequence-parallel twin of
    :func:`bvc_tpu.training.steps.make_videomae_train_step`: same
    ``step(state, video) -> (state, metrics)`` contract, same mask
    sampling from ``state.rng`` (equivalence-tested), video sharded
    ``[B@data, T@seq, H, W, C]`` (:func:`shard_seq_batch`).

    Tube masks only: the random sampler has no per-sheet count invariant,
    so its visible-token shapes are not static per shard.

    Structure: the ``shard_map`` computes only (loss, grads) — both
    replicated out via the step's ONE ``pmean`` — and the optimizer
    update runs OUTSIDE it under GSPMD.  That split is what admits the
    ``param_mode='zero1'`` composition (momentum sharded over ``data``
    while the ring step's params stay replicated: the partitioner slices
    the update math exactly as in the GSPMD zero1 step) and makes
    ``grad_probes`` free (grads are replicated arrays at that point).

    ``grad_accum > 1`` scans that many sequential microbatches of this
    shard's LOCAL rows into one gradient inside the shard_map — exact
    (tube masks give every sample the same masked count, so the mean of
    microbatch means is the batch mean) with the cross-chip reduction
    still happening once per optimizer step.
    """
    _check_mesh(mesh)
    if mask_cfg.sampler != "tube":
        raise ValueError(
            "sequence-parallel VideoMAE requires the tube sampler (its "
            "per-sheet visible count is what keeps shard shapes static); "
            f"got {mask_cfg.sampler!r}"
        )
    if param_mode not in ("replicated", "zero1"):
        raise ValueError(
            "this step composes with 'replicated' or 'zero1' param "
            f"sharding (got {param_mode!r}). FSDP stays rejected: it "
            "would re-gather the whole stack per layer inside the ring. "
            "Tensor parallelism IS available — add a 'model' mesh axis "
            "and use make_seq_tp_videomae_train_step (heads-sharded "
            "Megatron TP composed with the ring; --mesh "
            "data=..,seq=..,model=.. on the CLI)"
        )
    from jax.sharding import NamedSharding

    from bvc_tpu.models.videomae import pos_tables
    from bvc_tpu.training.optim import apply_gradients
    from bvc_tpu.training.probes import videomae_grad_metrics
    from bvc_tpu.training.state import TrainState

    n_shards = _seq_size(mesh)
    t_local = _local_sheets(model_cfg, n_shards)
    hw = model_cfg.image_size // model_cfg.patch_size
    n_space = hw * hw
    n_masked_space = int(mask_cfg.mask_ratio * n_space)
    num_visible_local = (n_space - n_masked_space) * t_local
    enc_table, dec_table = pos_tables(model_cfg)

    def local_loss_grads(params, mask_rng, video_local: jnp.ndarray):
        b_local = video_local.shape[0]
        mask_local = _local_tube_masks(
            mask_rng, b_local, t_local, n_space, n_masked_space
        )
        enc_pos = _local_pos_rows(enc_table, n_shards)
        dec_pos = _local_pos_rows(dec_table, n_shards)

        def loss_of(v, m):
            def loss_fn(p):
                return _local_pretrain_loss(
                    p, v, m, model_cfg, num_visible_local, enc_pos, dec_pos
                )

            return loss_fn

        if grad_accum > 1:
            if b_local % grad_accum:
                raise ValueError(
                    f"grad_accum_steps ({grad_accum}) must divide the "
                    f"per-data-shard batch ({b_local})"
                )
            vb = video_local.reshape(
                grad_accum, b_local // grad_accum, *video_local.shape[1:]
            )
            mb = mask_local.reshape(
                grad_accum, b_local // grad_accum, *mask_local.shape[1:]
            )
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)

            def micro(carry, xs):
                g_acc, l_acc = carry
                v, m = xs
                loss, g = jax.value_and_grad(loss_of(v, m))(params)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + loss), None

            (g_sum, l_sum), _ = jax.lax.scan(micro, (zero_g, 0.0), (vb, mb))
            loss_local = l_sum / grad_accum
            grads_local = jax.tree_util.tree_map(
                lambda x: x / grad_accum, g_sum
            )
        else:
            loss_local, grads_local = jax.value_and_grad(
                loss_of(video_local, mask_local)
            )(params)
        # equal per-shard masked counts → mean of local means is exact;
        # this pmean is the step's ONE cross-chip reduction
        loss = jax.lax.pmean(loss_local, (DATA_AXIS, SEQ_AXIS))
        grads = jax.lax.pmean(grads_local, (DATA_AXIS, SEQ_AXIS))
        return loss, grads

    def local_eval_loss(params, eval_rng, video_local: jnp.ndarray):
        mask_local = _local_tube_masks(
            eval_rng, video_local.shape[0], t_local, n_space, n_masked_space
        )
        loss_local = _local_pretrain_loss(
            params, video_local, mask_local, model_cfg,
            num_visible_local, _local_pos_rows(enc_table, n_shards),
            _local_pos_rows(dec_table, n_shards),
        )
        return jax.lax.pmean(loss_local, (DATA_AXIS, SEQ_AXIS))

    video_spec = P(DATA_AXIS, SEQ_AXIS)
    # explicit-reduction style (as training/steps.py _accumulated_grads):
    # with vma checking on, AD would ALSO auto-psum the cotangents at the
    # replicated-params boundary and the explicit pmean above would
    # double-count by the shard count (caught by tests/test_seqpar.py)
    grads_sm = jax.shard_map(
        local_loss_grads, mesh=mesh,
        in_specs=(P(), P(), video_spec), out_specs=(P(), P()),
        check_vma=False,
    )
    eval_sm = jax.shard_map(
        local_eval_loss, mesh=mesh,
        in_specs=(P(), P(), video_spec), out_specs=P(),
        check_vma=False,
    )

    def step(state: TrainState, video: jnp.ndarray):
        rng, mask_rng = jax.random.split(state.rng)
        loss, grads = grads_sm(state.params, mask_rng, video)
        params, opt_state = apply_gradients(
            tx, grads, state.opt_state, state.params
        )
        metrics = {"loss": loss}
        metrics.update(videomae_grad_metrics(grads))
        for name, fn in (grad_probes or {}).items():
            metrics[name] = fn(grads)
        return (
            TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                rng=rng, target_params=state.target_params, extra=state.extra,
            ),
            metrics,
        )

    def eval_step(state: TrainState, video: jnp.ndarray, step_idx):
        # fresh mask realisation per val batch, like the GSPMD eval step
        return {
            "loss": eval_sm(
                state.params, jax.random.fold_in(state.rng, step_idx), video
            )
        }

    video_sh = NamedSharding(mesh, video_spec)
    rep = NamedSharding(mesh, P())
    cache: dict[str, Any] = {}

    def _shardings(state: TrainState):
        if "st_sh" not in cache:
            from bvc_tpu.training.steps import _tree_shardings

            cache["st_sh"] = _tree_shardings(state, mesh, param_mode)
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
        (feeds :mod:`bvc_tpu.parallel.analysis`, same contract as the
        GSPMD steps' ``compiled_text``)."""
        st_sh = _shardings(state)
        jitted = jax.jit(
            step, in_shardings=(st_sh, video_sh), out_shardings=(st_sh, rep)
        )  # no donation: inspection must not invalidate the caller's state
        return jitted.lower(state, batch).compile().as_text()

    train.eval_step = evaluate  # type: ignore[attr-defined]
    train.shardings = lambda: cache.get("st_sh")  # type: ignore[attr-defined]
    train.compiled_text = compiled_text  # type: ignore[attr-defined]
    return train


def make_seq_embed_fn(mesh: Mesh, cfg: ModelConfig,
                      gather_output: bool = False) -> Callable:
    """Sequence-parallel twin of :func:`bvc_tpu.models.videomae.embed`
    (the classifier-head pooled embedding,
    ``benchmarks/compute_embeddings_videomae.py:78-96`` semantics) for
    clips too long for single-chip attention.  ``embed(params, video)``
    with video sharded by :func:`shard_seq_batch`; returns ``[B, D]``.

    ``gather_output=True`` all-gathers the rows over ``data`` so the
    result is fully replicated — required on multi-host meshes, where a
    ``P('data')``-sharded output is not host-materialisable
    (``np.asarray`` on non-addressable shards raises).  Values are
    identical either way (equivalence-tested).
    """
    _check_mesh(mesh)
    n_shards = _seq_size(mesh)
    _local_sheets(cfg, n_shards)  # divisibility check
    from bvc_tpu.models.videomae import _compute_dtype, normalize_on_device, pos_tables
    from bvc_tpu.models.vit import run_blocks
    from bvc_tpu.ops.patchify import patchify_pixels

    enc_table, _ = pos_tables(cfg)
    n_total = cfg.seq_len

    def local_embed(params: dict, video_local: jnp.ndarray) -> jnp.ndarray:
        dtype = _compute_dtype(cfg)
        video = normalize_on_device(video_local)
        patches = patchify_pixels(video, cfg.tubelet_size, cfg.patch_size).astype(dtype)
        pe = params["patch_embed"]
        x = jnp.dot(patches, pe["kernel"].astype(dtype), preferred_element_type=dtype)
        x = x + pe["bias"].astype(dtype)
        x = x + _local_pos_rows(enc_table, n_shards).astype(dtype)[None]
        x = run_blocks(
            params["encoder"], x, cfg.num_heads, cfg.layer_norm_eps, cfg.remat,
            attn_impl=f"ring:{SEQ_AXIS}", unroll=cfg.depth <= 12,
        )
        # global mean over tokens, then the parameterless fc_norm
        pooled = jax.lax.psum(
            jnp.sum(x.astype(jnp.float32), axis=1), SEQ_AXIS
        ) / n_total
        mean = jnp.mean(pooled, axis=-1, keepdims=True)
        var = jnp.var(pooled, axis=-1, keepdims=True)
        emb = (pooled - mean) * jax.lax.rsqrt(var + 1e-6)
        if gather_output:
            emb = jax.lax.all_gather(emb, DATA_AXIS, axis=0, tiled=True)
        return emb

    return jax.jit(
        jax.shard_map(
            local_embed, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, SEQ_AXIS)),
            out_specs=P() if gather_output else P(DATA_AXIS),
            # gather_output: the all_gather over 'data' + psum over 'seq'
            # make emb fully replicated, but vma inference cannot see the
            # composition — verified instead by the equivalence test and
            # the 2-process multihost extraction
            check_vma=not gather_output,
        )
    )


def make_seq_jepa_embed_fn(mesh: Mesh, cfg: ModelConfig,
                           gather_output: bool = False) -> Callable:
    """Sequence-parallel twin of :func:`bvc_tpu.models.jepa.embed` — the
    mean over patch tokens of the final-normed encoder output
    (``benchmarks/compute_embeddings_jepa.py:242`` pooling) with the TIME
    axis sharded over ``seq``.  ``embed(enc_params, video)`` with video
    placed by :func:`shard_seq_batch`; returns ``[B, D]``.

    Exactness mirrors the VideoMAE embed: ring attention sees the same
    global key set, the final LayerNorm is per-token (local), and the
    token mean is a ``psum`` of local sums over the global count.  The
    spatial-resolution interpolation path of ``encoder_forward`` is not
    supported here (inputs must match ``cfg.image_size``).
    """
    _check_mesh(mesh)
    n_shards = _seq_size(mesh)
    _local_sheets(cfg, n_shards)  # divisibility check
    from bvc_tpu.models import jepa as jepa_model
    from bvc_tpu.models.videomae import normalize_on_device
    from bvc_tpu.models.vit import layer_norm, run_blocks
    from bvc_tpu.ops.patchify import tubelet_patchify

    table = jepa_model.encoder_pos_table(cfg)  # [N, D] t-major
    n_total = table.shape[0]

    def local_embed(enc_params: dict, video_local: jnp.ndarray) -> jnp.ndarray:
        dtype = jepa_model._dtype(cfg)
        video = normalize_on_device(video_local)
        tokens = tubelet_patchify(
            video, enc_params["patch_embed"]["kernel"],
            enc_params["patch_embed"]["bias"],
            cfg.tubelet_size, cfg.patch_size, dtype,
        )
        tokens = tokens + _local_pos_rows(table, n_shards).astype(dtype)[None]
        x = run_blocks(
            enc_params["blocks"], tokens, cfg.num_heads, cfg.layer_norm_eps,
            cfg.remat, attn_impl=f"ring:{SEQ_AXIS}", unroll=cfg.depth <= 12,
        )
        x = layer_norm(x, enc_params["norm"], cfg.layer_norm_eps)
        emb = jax.lax.psum(
            jnp.sum(x.astype(jnp.float32), axis=1), SEQ_AXIS
        ) / n_total
        if gather_output:
            emb = jax.lax.all_gather(emb, DATA_AXIS, axis=0, tiled=True)
        return emb

    return jax.jit(
        jax.shard_map(
            local_embed, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, SEQ_AXIS)),
            out_specs=P() if gather_output else P(DATA_AXIS),
            check_vma=not gather_output,
        )
    )


# ---------------------------------------------------------------------------
# Sequence-parallel x tensor-parallel composition (VERDICT r4 task 6)
# ---------------------------------------------------------------------------
#
# Heads-sharded TP over a 'model' mesh axis composed WITH ring attention
# over 'seq': TP splits attention over HEADS and the MLP over its hidden
# width — both orthogonal to the ring's split over TIME, so each
# (data, seq, model) shard runs ring attention for its H/tp heads over
# its T/S sheets.  Standard Megatron-style manual collectives inside the
# shard_map:
#
# - column-parallel qkv/fc1 (activations replicated over 'model', each
#   shard computes its head/hidden slice), preceded by the "f" operator
#   (identity forward, psum-over-'model' backward — the cotangents of a
#   replicated activation are partial per shard);
# - row-parallel proj/fc2 followed by the "g" operator (psum forward,
#   identity backward); their biases are added AFTER the psum.
#
# Storage stays canonical and REPLICATED (an 87M-param ViT-B needs no
# param sharding; TP here buys attention/MLP compute + activation
# splitting for long-clip runs, not parameter memory): the step permutes
# the fused qkv leaves to head-major column order outside the shard_map
# (the stored (3, H, d) order would make contiguous column slices span
# q/k/v of DIFFERENT heads), lets the in_specs slice head-aligned
# columns, and permutes the qkv grads back.  The permute is an O(params)
# elementwise pass per step (~0.5 ms at ViT-B vs a >100 ms step).
#
# Communication per layer per direction: 2 psums over 'model' (g fwd /
# f bwd) of [b_local, n_local, D] activations — riding the innermost
# ICI axis — on top of the ring's S-1 ppermutes over 'seq'.  Counts
# verified against compiled HLO in tests/test_seqpar_tp.py.


def make_seq_tp_mesh(data: int, seq: int, model: int, devices=None) -> Mesh:
    """``(data, seq, model)`` mesh; ``model`` innermost (4 psums/layer
    ride the fastest links), ``seq`` next (ring hops), ``data`` outer."""
    from bvc_tpu.parallel.mesh import MODEL_AXIS, make_mesh

    if devices is None:
        devices = jax.devices()[: data * seq * model]
    return make_mesh(
        {DATA_AXIS: data, SEQ_AXIS: seq, MODEL_AXIS: model}, devices=devices
    )


def _ident_fwd_psum_bwd(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Megatron's "f": identity forward, psum backward over ``axis``."""

    @jax.custom_vjp
    def f(v):
        return v

    f.defvjp(lambda v: (v, None),
             lambda _, g: (jax.lax.psum(g, axis),))
    return f(x)


def _psum_fwd_ident_bwd(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Megatron's "g": psum forward, identity backward (the cotangent of
    a replicated downstream activation is already complete)."""

    @jax.custom_vjp
    def g_op(v):
        return jax.lax.psum(v, axis)

    g_op.defvjp(lambda v: (jax.lax.psum(v, axis), None),
                lambda _, g: (g,))
    return g_op(x)


def _headmajor_qkv(params: dict, cfg: ModelConfig, inverse: bool = False) -> dict:
    """Permute fused-qkv leaves between the canonical ``(3, H, d)`` column
    order and the head-major ``(H, 3, d)`` order whose contiguous column
    slices are whole heads (what the TP in_specs slice)."""
    out = dict(params)
    for stack, heads in (("encoder", cfg.num_heads),
                         ("decoder", cfg.decoder_num_heads)):
        blocks = dict(out[stack])
        attn = dict(blocks["attn"])
        qkv = dict(attn["qkv"])
        d = qkv["kernel"].shape[-1] // (3 * heads)

        def fix(leaf):
            lead = leaf.shape[:-1]
            if inverse:
                r = leaf.reshape(*lead, heads, 3, d)
                r = jnp.swapaxes(r, -3, -2)  # (H,3,d) -> (3,H,d)
            else:
                r = leaf.reshape(*lead, 3, heads, d)
                r = jnp.swapaxes(r, -3, -2)  # (3,H,d) -> (H,3,d)
            return r.reshape(*lead, 3 * heads * d)

        qkv["kernel"] = fix(qkv["kernel"])
        if "bias" in qkv:
            qkv["bias"] = fix(qkv["bias"])
        attn["qkv"] = qkv
        blocks["attn"] = attn
        out[stack] = blocks
    return out


def _tp_param_specs(params: dict) -> Any:
    """shard_map in/out specs: head-major qkv + fc1 column-sharded on
    their last dim, proj/fc2 row-sharded on the contraction dim,
    everything else replicated."""
    from bvc_tpu.parallel.mesh import MODEL_AXIS

    def spec(path, leaf):
        keys = [str(getattr(k, "key", k)) for k in path]
        if keys and keys[0] in ("encoder", "decoder"):
            if "qkv" in keys or "fc1" in keys:
                return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
            if ("proj" in keys or "fc2" in keys) and keys[-1] == "kernel":
                return P(None, MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _run_blocks_seq_tp(stacked: dict, x: jnp.ndarray, heads_local: int,
                       eps: float, remat: bool, unroll: bool) -> jnp.ndarray:
    """TP twin of :func:`bvc_tpu.models.vit.run_blocks` for use inside the
    (data, seq, model) shard_map: ring attention over 'seq' on this
    shard's local heads, manual Megatron collectives over 'model'."""
    from bvc_tpu.models.vit import layer_norm
    from bvc_tpu.ops.attention import multi_head_attention
    from bvc_tpu.ops.gelu import gelu
    from bvc_tpu.parallel.mesh import MODEL_AXIS

    dtype = x.dtype
    B, N, D = x.shape
    d = None  # resolved per layer from the local qkv width

    def dot(v, p, bias: bool):
        o = jnp.dot(v, p["kernel"].astype(dtype), preferred_element_type=dtype)
        if bias and "bias" in p:
            o = o + p["bias"].astype(dtype)
        return o

    def body(carry, layer):
        x = carry
        h = layer_norm(x, layer["ln1"], eps)
        h = _ident_fwd_psum_bwd(h, MODEL_AXIS)
        qkv = dot(h, layer["attn"]["qkv"], bias=True)  # local heads' slice
        dh = qkv.shape[-1] // (3 * heads_local)
        qkv = qkv.reshape(B, N, heads_local, 3, dh)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        o = multi_head_attention(q, k, v, impl=f"ring:{SEQ_AXIS}")
        o = dot(o.reshape(B, N, heads_local * dh), layer["attn"]["proj"],
                bias=False)
        o = _psum_fwd_ident_bwd(o, MODEL_AXIS)
        o = o + layer["attn"]["proj"]["bias"].astype(dtype)
        x = x + o
        h = layer_norm(x, layer["ln2"], eps)
        h = _ident_fwd_psum_bwd(h, MODEL_AXIS)
        h = gelu(dot(h, layer["mlp"]["fc1"], bias=True))
        h = dot(h, layer["mlp"]["fc2"], bias=False)
        h = _psum_fwd_ident_bwd(h, MODEL_AXIS)
        h = h + layer["mlp"]["fc2"]["bias"].astype(dtype)
        return x + h, None

    if unroll and not remat:
        depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        for i in range(depth):
            x, _ = body(x, jax.tree_util.tree_map(lambda l: l[i], stacked))
        return x
    fn = jax.checkpoint(body) if remat else body
    out, _ = jax.lax.scan(fn, x, stacked)
    return out


def make_seq_tp_videomae_train_step(
    mesh: Mesh,
    model_cfg: ModelConfig,
    mask_cfg: MaskConfig,
    tx,
    grad_probes=None,
    grad_accum: int = 1,
):
    """Sequence-parallel x tensor-parallel VideoMAE train step over a
    ``(data, seq, model)`` mesh (:func:`make_seq_tp_mesh`) — same
    ``step(state, video) -> (state, metrics)`` contract and mask
    sampling as :func:`make_seq_videomae_train_step`, equivalence-tested
    against it and the GSPMD DP step (tests/test_seqpar_tp.py).

    Params/optimizer state stay canonical and replicated (see the TP
    section comment above); the step permutes the fused qkv leaves to
    head-major column order around the shard_map so the 'model' slices
    are whole heads.
    """
    from bvc_tpu.parallel.mesh import MODEL_AXIS

    _check_mesh(mesh)
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(
            f"the seq x tp step needs a '{MODEL_AXIS}' mesh axis "
            f"(got {mesh.axis_names}); use make_seq_tp_mesh(data, seq, model)"
        )
    tp = mesh.shape[MODEL_AXIS]
    for what, heads in (("num_heads", model_cfg.num_heads),
                        ("decoder_num_heads", model_cfg.decoder_num_heads)):
        if heads % tp:
            raise ValueError(
                f"tensor parallelism shards whole heads: {what}={heads} "
                f"does not divide over model={tp}"
            )
    if mask_cfg.sampler != "tube":
        raise ValueError(
            "sequence-parallel VideoMAE requires the tube sampler (its "
            "per-sheet visible count is what keeps shard shapes static); "
            f"got {mask_cfg.sampler!r}"
        )
    from jax.sharding import NamedSharding

    from bvc_tpu.models.videomae import pos_tables
    from bvc_tpu.training.optim import apply_gradients
    from bvc_tpu.training.probes import videomae_grad_metrics
    from bvc_tpu.training.state import TrainState

    n_shards = _seq_size(mesh)
    t_local = _local_sheets(model_cfg, n_shards)
    hw = model_cfg.image_size // model_cfg.patch_size
    n_space = hw * hw
    n_masked_space = int(mask_cfg.mask_ratio * n_space)
    num_visible_local = (n_space - n_masked_space) * t_local
    enc_table, dec_table = pos_tables(model_cfg)

    def local_loss_grads(params, mask_rng, video_local):
        b_local = video_local.shape[0]
        mask_local = _local_tube_masks(
            mask_rng, b_local, t_local, n_space, n_masked_space
        )
        enc_pos = _local_pos_rows(enc_table, n_shards)
        dec_pos = _local_pos_rows(dec_table, n_shards)

        def loss_fn(p):
            return _local_pretrain_loss(
                p, video_local, mask_local, model_cfg, num_visible_local,
                enc_pos, dec_pos, tp=tp,
            )

        if grad_accum > 1:
            if b_local % grad_accum:
                raise ValueError(
                    f"grad_accum_steps ({grad_accum}) must divide the "
                    f"per-data-shard batch ({b_local})"
                )
            vb = video_local.reshape(
                grad_accum, b_local // grad_accum, *video_local.shape[1:]
            )
            mb = mask_local.reshape(
                grad_accum, b_local // grad_accum, *mask_local.shape[1:]
            )
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)

            def micro(carry, xs):
                g_acc, l_acc = carry
                v, m = xs

                def lf(p):
                    return _local_pretrain_loss(
                        p, v, m, model_cfg, num_visible_local,
                        enc_pos, dec_pos, tp=tp,
                    )

                loss, g = jax.value_and_grad(lf)(params)
                return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                        l_acc + loss), None

            (g_sum, l_sum), _ = jax.lax.scan(micro, (zero_g, 0.0), (vb, mb))
            loss_local = l_sum / grad_accum
            grads_local = jax.tree_util.tree_map(
                lambda x: x / grad_accum, g_sum
            )
        else:
            loss_local, grads_local = jax.value_and_grad(loss_fn)(params)
        # loss is identical across 'model' (activations replicated post-
        # psum); sharded-leaf grads are slice-complete per model shard and
        # replicated-leaf grads identical — so the reduction stays over
        # (data, seq) only, exactly as the pure-seq step
        loss = jax.lax.pmean(loss_local, (DATA_AXIS, SEQ_AXIS))
        grads = jax.lax.pmean(grads_local, (DATA_AXIS, SEQ_AXIS))
        return loss, grads

    def local_eval_loss(params, eval_rng, video_local):
        mask_local = _local_tube_masks(
            eval_rng, video_local.shape[0], t_local, n_space, n_masked_space
        )
        loss_local = _local_pretrain_loss(
            params, video_local, mask_local, model_cfg, num_visible_local,
            _local_pos_rows(enc_table, n_shards),
            _local_pos_rows(dec_table, n_shards), tp=tp,
        )
        return jax.lax.pmean(loss_local, (DATA_AXIS, SEQ_AXIS))

    video_spec = P(DATA_AXIS, SEQ_AXIS)

    def _sm(params_hm):
        specs = _tp_param_specs(params_hm)
        return jax.shard_map(
            local_loss_grads, mesh=mesh,
            in_specs=(specs, P(), video_spec), out_specs=(P(), specs),
            check_vma=False,
        )

    def step(state: TrainState, video: jnp.ndarray):
        rng, mask_rng = jax.random.split(state.rng)
        p_hm = _headmajor_qkv(state.params, model_cfg)
        loss, g_hm = _sm(p_hm)(p_hm, mask_rng, video)
        grads = _headmajor_qkv(g_hm, model_cfg, inverse=True)
        params, opt_state = apply_gradients(
            tx, grads, state.opt_state, state.params
        )
        metrics = {"loss": loss}
        metrics.update(videomae_grad_metrics(grads))
        for name, fn in (grad_probes or {}).items():
            metrics[name] = fn(grads)
        return (
            TrainState(
                step=state.step + 1, params=params, opt_state=opt_state,
                rng=rng, target_params=state.target_params, extra=state.extra,
            ),
            metrics,
        )

    video_sh = NamedSharding(mesh, video_spec)
    rep = NamedSharding(mesh, P())
    cache = {}

    def _shardings(state: TrainState):
        if "st_sh" not in cache:
            from bvc_tpu.training.steps import _tree_shardings

            cache["st_sh"] = _tree_shardings(state, mesh, "replicated")
        return cache["st_sh"]

    def train(state: TrainState, batch):
        if "jit" not in cache:
            st_sh = _shardings(state)
            cache["jit"] = jax.jit(
                step, in_shardings=(st_sh, video_sh),
                out_shardings=(st_sh, rep), donate_argnums=(0,),
            )
        return cache["jit"](state, batch)

    def compiled_text(state: TrainState, batch) -> str:
        st_sh = _shardings(state)
        jitted = jax.jit(
            step, in_shardings=(st_sh, video_sh), out_shardings=(st_sh, rep)
        )
        return jitted.lower(state, batch).compile().as_text()

    def eval_step(state: TrainState, video, step_idx):
        p_hm = _headmajor_qkv(state.params, model_cfg)
        specs = _tp_param_specs(p_hm)
        sm = jax.shard_map(
            local_eval_loss, mesh=mesh,
            in_specs=(specs, P(), video_spec), out_specs=P(),
            check_vma=False,
        )
        return {"loss": sm(p_hm, jax.random.fold_in(state.rng, step_idx),
                           video)}

    def evaluate(state: TrainState, batch, step_idx=0):
        if "ejit" not in cache:
            st_sh = _shardings(state)
            cache["ejit"] = jax.jit(
                eval_step, in_shardings=(st_sh, video_sh, rep),
                out_shardings=rep,
            )
        return cache["ejit"](state, batch, jnp.asarray(step_idx, jnp.int32))

    train.eval_step = evaluate
    train.shardings = lambda: cache.get("st_sh")
    train.compiled_text = compiled_text
    return train
