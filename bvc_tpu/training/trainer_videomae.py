"""VideoMAE pretraining driver — one curriculum stage.

End-to-end analogue of ``DDP_process`` in
``pretraining/generative/pretrain_videomae.py:97-377``, restructured for
SPMD: no process spawning, one mesh, one jitted step; preserves the
artifact contract (``csvlog_{run_id}.csv`` with the generative column
schema, ``params_{run_id}.yaml``, ``model_{run_id}.ckpt`` with the
reference's metadata keys).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bvc_tpu.data.factory import make_dataset
from bvc_tpu.data.loader import DataLoader
from bvc_tpu.models import videomae
from bvc_tpu.parallel import make_mesh
from bvc_tpu.training.checkpoint import (
    checkpoint_exists,
    checkpoint_path,
    checkpoint_saver,
    load_checkpoint,
)
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.probes import format_gstats
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import make_videomae_train_step, place_state
from bvc_tpu.utils import AverageMeter, CSVLogger, TrainConfig
from bvc_tpu.utils.logging import get_logger, is_main_process


# The grad-EFL/ELL/DLL columns (pretrain_videomae.py:148-150) are now
# computed inside the step via the fused one-pass metrics
# (bvc_tpu.training.probes.videomae_grad_metrics); extra probes passed
# here are for the opt-in stats table only.


def run_pretraining(cfg: TrainConfig, mesh=None) -> dict:
    """Train one stage; returns summary dict with final losses and the
    checkpoint path."""
    logger = get_logger("bvc_tpu.videomae")
    if not cfg.savedir:
        raise ValueError("savedir is required")
    folder = Path(cfg.savedir)
    folder.mkdir(parents=True, exist_ok=True)

    mesh = mesh or make_mesh(cfg.mesh_shape)
    cfg.dump_yaml(folder / f"params_{cfg.run_id}.yaml")
    csv_logger = None
    if is_main_process():
        csv_logger = CSVLogger(
            str(folder / f"csvlog_{cfg.run_id}.csv"),
            ("%d", "epoch"), ("%d", "itr"),
            ("%.5f", "train loss"), ("%.5f", "val loss"),
            ("%.4e", "grad-EFL"), ("%.4e", "grad-ELL"), ("%.4e", "grad-DLL"),
            append=cfg.resume,  # keep prior epochs' rows when resuming
        )

    # model / optimizer / state ------------------------------------------------
    params = videomae.init_params(jax.random.PRNGKey(cfg.seed), cfg.model)
    if cfg.init_checkpoint_path != "na":
        logger.info("init from checkpoint %s", cfg.init_checkpoint_path)
        restored = load_checkpoint(cfg.init_checkpoint_path)
        params = jax.tree_util.tree_map(
            lambda like, x: jnp.asarray(x, like.dtype), params,
            restored["model_state_dict"],
        )
    from bvc_tpu.training.optim import schedule_steps

    tx = make_optimizer(cfg.optim, steps=schedule_steps(cfg, mesh))
    state = TrainState.create(params, tx, jax.random.PRNGKey(cfg.seed + 1))
    start_epoch = 0
    own_ckpt = checkpoint_path(folder, cfg.run_id)
    if cfg.resume and checkpoint_exists(own_ckpt):
        from bvc_tpu.training.checkpoint import load_meta

        # completed-stage fast path: curriculum-level resume answers the
        # skip question from meta.json without restoring the full
        # model+optimizer tree
        meta = load_meta(own_ckpt)
        if int(meta.get("epoch", -1)) >= cfg.n_epoch:
            logger.info("run already complete (epoch %s/%d) — nothing to do",
                        meta.get("epoch"), cfg.n_epoch)
            return {
                "checkpoint": str(own_ckpt),
                "train_loss": meta.get("train_loss", 0.0),
                "val_loss": meta.get("val_loss", 0.0),
            }
        # mid-stage preemption recovery: restore weights + optimizer +
        # epoch + step/rng (so mask streams continue, not replay)
        logger.info("resuming from %s", own_ckpt)
        like = {
            "model_state_dict": state.params,
            "opt": state.opt_state,
            "epoch": np.zeros((), np.int32),
            "step": np.asarray(state.step),
            "rng": np.asarray(state.rng),
        }
        restored = load_checkpoint(own_ckpt, like=like)
        start_epoch = int(restored["epoch"])
        state = state.replace(params=restored["model_state_dict"],
                              opt_state=restored["opt"],
                              step=jnp.asarray(restored["step"]),
                              rng=jnp.asarray(restored["rng"]))
        if start_epoch >= cfg.n_epoch:
            logger.info("run already complete (epoch %d/%d) — nothing to do",
                        start_epoch, cfg.n_epoch)
            from bvc_tpu.training.checkpoint import load_meta

            meta = load_meta(own_ckpt)
            return {
                "checkpoint": str(own_ckpt),
                "train_loss": meta.get("train_loss", 0.0),
                "val_loss": meta.get("val_loss", 0.0),
            }
    seq_parallel = "seq" in mesh.axis_names
    pipe_parallel = "pipe" in mesh.axis_names
    probes = {}
    if cfg.log_grad_stats:
        from bvc_tpu.training.probes import full_grad_probes

        probes.update(full_grad_probes("videomae"))
    if seq_parallel and "model" in mesh.axis_names:
        # long-clip x tensor-parallel mode (--mesh data=..,seq=..,model=..):
        # heads-sharded Megatron TP composed with ring attention
        # (bvc_tpu/parallel/seqpar.py TP section; SCALING.md "Seq x TP")
        from bvc_tpu.parallel.seqpar import (
            make_seq_tp_videomae_train_step, require_process_local_seq,
        )

        if cfg.param_sharding != "replicated":
            raise ValueError(
                "the seq x tp step keeps params canonical and replicated "
                "(TP shards COMPUTE over heads, not storage) -- "
                f"--param_sharding must stay 'replicated' "
                f"(got {cfg.param_sharding!r})"
            )
        require_process_local_seq(mesh)
        step = make_seq_tp_videomae_train_step(
            mesh, cfg.model, cfg.mask, tx, probes,
            grad_accum=cfg.optim.grad_accum_steps,
        )
        state = place_state(state, mesh, "replicated")
    elif seq_parallel:
        # long-clip mode: time axis sharded over 'seq', ring attention
        # (bvc_tpu/parallel/seqpar.py; SCALING.md "Sequence parallelism").
        # Composes with 'replicated' or 'zero1' param sharding, grad
        # accumulation, and grad-stats probes; make_seq_videomae_train_step
        # rejects fsdp with the real reason (and points tp at the
        # 'model'-axis composition above).
        from bvc_tpu.parallel.seqpar import (
            make_seq_videomae_train_step, require_process_local_seq,
        )

        require_process_local_seq(mesh)
        # step construction validates param_sharding — before place_state
        # can trip on a mesh that lacks the axes fsdp/tp would need
        step = make_seq_videomae_train_step(
            mesh, cfg.model, cfg.mask, tx, cfg.param_sharding, probes,
            grad_accum=cfg.optim.grad_accum_steps,
        )
        state = place_state(state, mesh, cfg.param_sharding)
    elif pipe_parallel:
        # deep-stack mode: GPipe microbatching over 'pipe', block stacks
        # sharded on depth (bvc_tpu/parallel/pipeline.py; SCALING.md
        # "Pipeline parallelism").  The layout defines its own stage
        # sharding, so the param_sharding knob must stay at its default.
        from bvc_tpu.parallel.pipeline import (
            make_pipe_videomae_train_step, pipe_state_shardings,
        )

        if cfg.param_sharding != "replicated":
            raise ValueError(
                "a 'pipe' mesh defines its own stage sharding (block "
                "stacks P('pipe') on depth); --param_sharding must stay "
                f"'replicated' (got {cfg.param_sharding!r})"
            )
        # grad_accum composes WITH the GPipe schedule: microbatching
        # bounds activation memory inside one pipeline pass, accumulation
        # bounds the optimizer-visible batch beyond what one pass holds
        # (equivalence-tested in tests/test_pipeline.py)
        step = make_pipe_videomae_train_step(
            mesh, cfg.model, cfg.mask, tx,
            num_microbatches=cfg.pipe_microbatches, grad_probes=probes,
            grad_accum=cfg.optim.grad_accum_steps,
        )
        state = place_state(state, mesh,
                            shardings=pipe_state_shardings(state, mesh))
    else:
        state = place_state(state, mesh, cfg.param_sharding)
        step = make_videomae_train_step(
            mesh, cfg.model, cfg.mask, tx, cfg.param_sharding, probes,
            grad_accum=cfg.optim.grad_accum_steps,
        )

    # data ---------------------------------------------------------------------
    datasets = make_dataset("videomae", cfg.data)
    # under sequence parallelism a whole seq group carries each batch row,
    # so the batch scales with the data axis only (and videos are placed
    # time-sharded)
    batch_spec = None
    if seq_parallel:
        from jax.sharding import PartitionSpec

        global_batch = cfg.data.batch_size * mesh.shape["data"]
        batch_spec = PartitionSpec("data", "seq")
    elif pipe_parallel:
        # each pipe group carries whole batch rows (video replicated over
        # 'pipe'), so the batch scales with the data axis only
        global_batch = cfg.data.batch_size * mesh.shape["data"]
    else:
        global_batch = cfg.data.batch_size * mesh.devices.size
    loaders = {
        phase: DataLoader(
            ds, mesh, global_batch, shuffle=(phase == "train"), seed=cfg.seed,
            num_workers=cfg.data.num_workers, prefetch=cfg.data.prefetch,
            batch_spec=batch_spec,
            max_batches=cfg.max_epoch_iters,
            # val keeps every sample by padding the last global batch
            drop_last=(phase == "train"),
        )
        for phase, ds in datasets.items()
        if ds is not None
    }
    logger.info(
        "datasets: train=%d val=%s, global batch %d, %d iters/epoch",
        len(datasets["train"]),
        len(datasets["val"]) if datasets.get("val") else 0,
        global_batch, len(loaders["train"]),
    )
    if len(loaders["train"]) == 0:
        raise ValueError(
            f"dataset ({len(datasets['train'])} samples) is smaller than the "
            f"global batch ({global_batch}); no training would happen"
        )

    from bvc_tpu.training.metrics_pipe import MetricsPipe

    save_fn, save_wait = checkpoint_saver(cfg)

    def save(epoch_done: int):
        save_fn(
            checkpoint_path(folder, cfg.run_id),
            {
                # raw (possibly non-addressable) arrays: save_checkpoint gathers
                # or runs an all-host distributed save as needed
                "model_state_dict": state.params,
                "opt": state.opt_state,
                "epoch": np.int32(epoch_done),
                "step": np.asarray(jax.device_get(state.step)),
                "rng": np.asarray(jax.device_get(state.rng)),
            },
            meta={
                "run_id": cfg.run_id,
                "epoch": epoch_done,
                "train_loss": loss_meter.get("train", AverageMeter()).avg,
                "val_loss": loss_meter.get("val", AverageMeter()).avg,
                "batch_size": cfg.data.batch_size,
                "world_size": int(mesh.devices.size),
                "lr": cfg.optim.lr,
                "family": "videomae",
                "script": cfg.script,
            },
        )

    from bvc_tpu.utils.profiling import StepTraceWindow

    tracer = StepTraceWindow(cfg.profile_dir)  # no-op when unset
    loss_meter = {}
    for epoch in range(start_epoch, cfg.n_epoch):
        loss_meter = {p: AverageMeter() for p in ("train", "val")}
        for phase, loader in loaders.items():
            pipe_ms = [0.0]

            def log_fn(itr, metrics, phase=phase, epoch=epoch):
                loss = float(metrics["loss"])
                loss_meter[phase].update(loss)
                if csv_logger is not None:
                    csv_logger.log(
                        epoch + 1, itr,
                        loss if phase == "train" else 0.0,
                        loss if phase == "val" else 0.0,
                        float(metrics.get("grad_efl", 0.0)) if phase == "train" else 0.0,
                        float(metrics.get("grad_ell", 0.0)) if phase == "train" else 0.0,
                        float(metrics.get("grad_dll", 0.0)) if phase == "train" else 0.0,
                    )
                if itr % cfg.log_freq == 0:
                    from bvc_tpu.utils.profiling import device_memory_stats

                    mem = device_memory_stats()["peak_bytes_in_use"] / 1024**2
                    extra = format_gstats(metrics)
                    logger.info(
                        "[%d, %5d] %s loss: %.3f [mem: %.2e MB] (%.0f ms/it)%s",
                        epoch + 1, itr, phase, loss_meter[phase].avg, mem,
                        pipe_ms[0], extra,
                    )
                if np.isnan(loss) or np.isinf(loss):
                    raise FloatingPointError(
                        f"loss is {loss} at epoch {epoch} itr {itr}"
                    )

            # lag-1 logging: step i's CSV row is written while step i+1
            # runs, so the dispatch pipeline never drains on metric reads
            pipe = MetricsPipe(log_fn, time_every=cfg.log_freq)
            for itr, batch in enumerate(loader.epoch(epoch)):
                if phase == "train":
                    tracer.step()
                    state, metrics = step(state, batch)
                else:
                    metrics = step.eval_step(state, batch, itr)
                pipe_ms[0] = pipe.push(itr, metrics)
            pipe.flush()
            logger.info("epoch %d %s avg loss %.4f", epoch + 1, phase,
                        loss_meter[phase].avg)
        if cfg.save_every_epoch and epoch + 1 < cfg.n_epoch:
            save(epoch + 1)

    tracer.close()
    # checkpoint ---------------------------------------------------------------
    chpt = checkpoint_path(folder, cfg.run_id)
    save(cfg.n_epoch)
    save_wait()  # async: the returned path must be complete on disk
    logger.info("checkpoint saved at %s", chpt)
    return {
        "checkpoint": str(chpt),
        "train_loss": loss_meter.get("train", AverageMeter()).avg,
        "val_loss": loss_meter.get("val", AverageMeter()).avg,
    }
