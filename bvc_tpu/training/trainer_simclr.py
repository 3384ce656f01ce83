"""SimCLR pretraining driver — one curriculum stage.

End-to-end analogue of ``DDP_process`` in
``pretraining/contrastive/pretrain_simclr.py:140-383``: ResNet+MLP head,
interleaved-pair InfoNCE (tau = 0.1 hard-coded like ``:284``), the
contrastive CSV schema, params yaml, and a
``model_state_dict``-style checkpoint.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from bvc_tpu.data.factory import make_dataset
from bvc_tpu.data.loader import DataLoader
from bvc_tpu.models import resnet
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
from bvc_tpu.training.steps import make_simclr_train_step, place_state
from bvc_tpu.utils import AverageMeter, CSVLogger, TrainConfig
from bvc_tpu.utils.logging import get_logger, is_main_process

TEMPERATURE = 0.1  # hard-coded in the reference (pretrain_simclr.py:284)


def run_pretraining(cfg: TrainConfig, mesh=None) -> dict:
    logger = get_logger("bvc_tpu.simclr")
    if not cfg.savedir:
        raise ValueError("savedir is required")
    folder = Path(cfg.savedir)
    folder.mkdir(parents=True, exist_ok=True)
    mesh = mesh or make_mesh(cfg.mesh_shape)
    for axis in ("seq", "pipe"):
        if axis in mesh.axis_names:
            raise ValueError(
                f"'{axis}' parallelism is videomae-only (this family's "
                "clips fit one chip; the axis would replicate the whole "
                "step across it and inflate global_batch with no "
                "speedup) -- use a pure-data mesh"
            )
    cfg.dump_yaml(folder / f"params_{cfg.run_id}.yaml")

    csv_logger = None
    if is_main_process():
        csv_logger = CSVLogger(
            str(folder / f"csvlog_{cfg.run_id}.csv"),
            ("%d", "epoch"), ("%d", "itr"), ("%.5f", "train loss"),
            ("%.4e", "grad-conv1"), ("%.4e", "grad-fc0"), ("%d", "time (ms)"),
            append=cfg.resume,  # keep prior epochs' rows when resuming
        )

    arch = cfg.model.architecture or "resnet18"
    params, stats = resnet.init_params(
        jax.random.PRNGKey(cfg.seed), arch, head_dim=cfg.model.pred_emb_dim
    )
    if cfg.init_checkpoint_path != "na":
        logger.info("init from checkpoint %s", cfg.init_checkpoint_path)
        restored = load_checkpoint(cfg.init_checkpoint_path)
        cast = lambda like, x: jax.tree_util.tree_map(
            lambda l, v: jnp.asarray(v, l.dtype), like, x
        )
        params = cast(params, restored["model_state_dict"])
        if "batch_stats" in restored:
            stats = cast(stats, restored["batch_stats"])
    from bvc_tpu.training.optim import schedule_steps

    tx = make_optimizer(cfg.optim, steps=schedule_steps(cfg, mesh))
    state = TrainState.create(params, tx, jax.random.PRNGKey(cfg.seed + 1), extra=stats)
    start_epoch = 0
    own_ckpt = checkpoint_path(folder, cfg.run_id)
    if cfg.resume and checkpoint_exists(own_ckpt):
        from bvc_tpu.training.checkpoint import load_meta

        meta = load_meta(own_ckpt)
        if int(meta.get("epoch", -1)) >= cfg.n_epoch:
            logger.info("run already complete (epoch %s/%d) — nothing to do",
                        meta.get("epoch"), cfg.n_epoch)
            return {"checkpoint": str(own_ckpt),
                    "train_loss": meta.get("train_loss", 0.0)}
        # mid-stage preemption recovery: weights + BN running stats +
        # optimizer + epoch + step/rng (mirrors trainer_videomae.py)
        logger.info("resuming from %s", own_ckpt)
        like = {
            "model_state_dict": state.params,
            "batch_stats": state.extra,
            "opt": state.opt_state,
            "epoch": np.zeros((), np.int32),
            "step": np.asarray(state.step),
            "rng": np.asarray(state.rng),
        }
        restored = load_checkpoint(own_ckpt, like=like)
        start_epoch = int(restored["epoch"])
        state = state.replace(params=restored["model_state_dict"],
                              extra=restored["batch_stats"],
                              opt_state=restored["opt"],
                              step=jnp.asarray(restored["step"]),
                              rng=jnp.asarray(restored["rng"]))
        if start_epoch >= cfg.n_epoch:
            logger.info("run already complete (epoch %d/%d) — nothing to do",
                        start_epoch, cfg.n_epoch)
            from bvc_tpu.training.checkpoint import load_meta

            meta = load_meta(own_ckpt)
            return {"checkpoint": str(own_ckpt),
                    "train_loss": meta.get("train_loss", 0.0)}
    state = place_state(state, mesh, cfg.param_sharding)
    probes = None
    if cfg.log_grad_stats:
        from bvc_tpu.training.probes import full_grad_probes

        probes = full_grad_probes("simclr")
    step = make_simclr_train_step(
        mesh, arch, tx, TEMPERATURE, loss_mode="parity",
        param_mode=cfg.param_sharding,
        grad_accum=cfg.optim.grad_accum_steps,
        # bf16 compute like the reference's autocast forward
        # (pretrain_simclr.py:332-340); BN batch stats and the InfoNCE
        # cosine matrix stay f32 (torch autocast's own policy for them)
        dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32,
        negatives=getattr(cfg.optim, "contrastive_negatives", "global"),
        bn_stats=getattr(cfg.optim, "bn_stats", "global"),
        grad_probes=probes,
    )

    datasets = make_dataset("simclr", cfg.data)
    global_batch = cfg.data.batch_size * mesh.devices.size
    loader = DataLoader(
        datasets["train"], mesh, global_batch, shuffle=True, seed=cfg.seed,
        num_workers=cfg.data.num_workers, prefetch=cfg.data.prefetch,
        max_batches=cfg.max_epoch_iters,
    )
    logger.info("dataset: %d pairs, %d iters/epoch, global batch %d",
                len(datasets["train"]), len(loader), global_batch)
    if len(loader) == 0:
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
                # raw arrays: save_checkpoint handles sharded multi-host state
                "model_state_dict": state.params,
                "batch_stats": state.extra,
                "opt": state.opt_state,
                "epoch": np.int32(epoch_done),
                "step": np.asarray(jax.device_get(state.step)),
                "rng": np.asarray(jax.device_get(state.rng)),
            },
            meta={
                "run_id": cfg.run_id,
                "epoch": epoch_done,
                "train_loss": loss_meter.avg,
                "batch_size": cfg.data.batch_size,
                "world_size": int(mesh.devices.size),
                "lr": cfg.optim.lr,
                "family": "simclr",
                "architecture": arch,
                "script": cfg.script,
            },
        )

    loss_meter = AverageMeter()
    from bvc_tpu.utils.profiling import StepTraceWindow

    tracer = StepTraceWindow(cfg.profile_dir)  # no-op when unset
    for epoch in range(start_epoch, cfg.n_epoch):
        loss_meter = AverageMeter()
        pipe_ms = [0.0]

        def log_fn(itr, metrics, epoch=epoch):
            loss = float(metrics["loss"])
            loss_meter.update(loss)
            if csv_logger is not None:
                csv_logger.log(epoch + 1, itr, loss,
                               float(metrics["grad_conv1"]),
                               float(metrics["grad_fc0"]), int(pipe_ms[0]))
            if itr % cfg.log_freq == 0:
                extra = format_gstats(metrics)
                logger.info("[%d, %5d] loss: %.3f (%.0f ms)%s",
                            epoch + 1, itr, loss_meter.avg, pipe_ms[0], extra)
            if np.isnan(loss) or np.isinf(loss):
                raise FloatingPointError(f"loss is {loss}")

        pipe = MetricsPipe(log_fn, time_every=cfg.log_freq)
        for itr, batch in enumerate(loader.epoch(epoch)):
            tracer.step()
            state, metrics = step(state, batch)
            pipe_ms[0] = pipe.push(itr, metrics)
        pipe.flush()
        logger.info("epoch %d avg loss %.4f", epoch + 1, loss_meter.avg)
        if cfg.save_every_epoch and epoch + 1 < cfg.n_epoch:
            save(epoch + 1)

    tracer.close()
    chpt = checkpoint_path(folder, cfg.run_id)
    save(cfg.n_epoch)
    save_wait()  # async: the returned path must be complete on disk
    logger.info("checkpoint saved at %s", chpt)
    return {"checkpoint": str(chpt), "train_loss": loss_meter.avg}
