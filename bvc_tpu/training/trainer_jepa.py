"""(V-)JEPA pretraining driver — one curriculum stage.

End-to-end analogue of ``DDP_process`` in
``pretraining/predictive/pretrain_jepa.py:154-483``: multi-block mask
collation in the input pipeline, context/target encoders + predictor, EMA
target updates, the predictive CSV schema
(epoch, itr, loss, grad-FL, grad-LL, mask-A, mask-B, time (ms)), params
yaml, and a three-model checkpoint
(``encoder``/``predictor``/``target_encoder`` keys as at
``pretrain_jepa.py:126-142``).
"""

from __future__ import annotations

import copy
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from bvc_tpu.data.factory import make_dataset
from bvc_tpu.data.loader import DataLoader
from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
from bvc_tpu.models import jepa
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
from bvc_tpu.training.steps import make_jepa_train_step, place_state
from bvc_tpu.utils import AverageMeter, CSVLogger, TrainConfig
from bvc_tpu.utils.logging import get_logger, is_main_process


def make_mask_collate(cfg: TrainConfig, batches_per_epoch: int):
    """collate_fn attaching enc/pred mask indices to each batch."""
    m = cfg.model
    collator = MultiBlockMaskCollator(
        input_size=m.image_size,
        patch_size=m.patch_size,
        enc_mask_scale=cfg.mask.enc_mask_scale,
        pred_mask_scale=cfg.mask.pred_mask_scale,
        aspect_ratio=cfg.mask.aspect_ratio,
        nenc=cfg.mask.num_enc_masks,
        npred=cfg.mask.num_pred_masks,
        min_keep=cfg.mask.min_keep,
        allow_overlap=cfg.mask.allow_overlap,
        seed=cfg.seed,
    )
    if cfg.mask.num_enc_masks != 1:
        raise NotImplementedError("nenc != 1 not supported (reference always uses 1)")

    def collate(batch: np.ndarray, epoch: int, batch_idx: int):
        step = epoch * batches_per_epoch + batch_idx
        enc_idx, pred_idx = collator(batch.shape[0], step=step)
        enc_idx = update_mask_indices(
            enc_idx, m.image_size, m.patch_size, m.num_frames, m.tubelet_size,
            isencoder=True,
        )
        pred_idx = update_mask_indices(
            pred_idx, m.image_size, m.patch_size, m.num_frames, m.tubelet_size,
            isencoder=False,
        )
        return {
            "video": batch,
            "enc_idx": enc_idx[0],                       # nenc=1 → [B, Ke]
            "pred_idx": pred_idx.transpose(1, 0, 2),     # [B, M, Kp]
        }

    return collate, collator


def run_pretraining(cfg: TrainConfig, mesh=None) -> dict:
    logger = get_logger("bvc_tpu.jepa")
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
            ("%d", "epoch"), ("%d", "itr"), ("%.5f", "loss"),
            ("%.4e", "grad-FL"), ("%.4e", "grad-LL"),
            ("%d", "mask-A"), ("%d", "mask-B"), ("%d", "time (ms)"),
            append=cfg.resume,  # keep prior epochs' rows when resuming
        )

    # model/state --------------------------------------------------------------
    params = jepa.init_params(jax.random.PRNGKey(cfg.seed), cfg.model)
    target_params = copy.deepcopy(params["encoder"])
    from bvc_tpu.training.optim import schedule_steps

    tx = make_optimizer(cfg.optim, params, steps=schedule_steps(cfg, mesh))
    chain_start = 0
    state = TrainState.create(params, tx, jax.random.PRNGKey(cfg.seed + 1),
                              target_params=target_params)

    def _like(legacy: bool = False):
        like = {
            "encoder": state.params["encoder"],
            "predictor": state.params["predictor"],
            "target_encoder": state.target_params,
            "opt": state.opt_state,
            "epoch": np.zeros((), np.int32),
        }
        if not legacy:
            like["step"] = np.asarray(state.step)
            like["rng"] = np.asarray(state.rng)
        return like

    def _restore(path):
        # checkpoints written before step/rng were added lack those keys;
        # Orbax restore-into-template requires exact structure, so fall
        # back to the legacy layout (chaining never consumes step/rng)
        try:
            return load_checkpoint(path, like=_like())
        except (ValueError, KeyError):
            logger.info("checkpoint %s has the legacy (pre-resume) layout", path)
            restored = dict(load_checkpoint(path, like=_like(legacy=True)))
            restored.setdefault("step", np.asarray(state.step))
            restored.setdefault("rng", np.asarray(state.rng))
            return restored

    own_ckpt = checkpoint_path(folder, cfg.run_id)
    resuming = cfg.resume and checkpoint_exists(own_ckpt)
    if cfg.init_checkpoint_path != "na":
        from bvc_tpu.training.checkpoint import load_meta

        # chain_start only needs the previous stage's epoch COUNT; read
        # it from meta.json when available so the stage-skip /
        # mid-stage-resume paths (which overwrite all model state from
        # own_ckpt anyway) never pay a full Orbax restore of the
        # three-model + optimizer tree just to learn one integer
        init_meta = load_meta(cfg.init_checkpoint_path)
        init_epoch = int(init_meta["epoch"]) if "epoch" in init_meta else None
        if init_epoch is None or not resuming:
            # restore INTO a structural template so the optax pytree
            # shapes survive serialization (reference loads
            # enc/pred/target AND the optimizer when chaining stages,
            # pretrain_jepa.py:290-300).  step/rng are NOT adopted: each
            # stage restarts its EMA ramp like the reference's per-stage
            # momentum generator (:309-311).
            logger.info("init from checkpoint %s", cfg.init_checkpoint_path)
            restored = _restore(cfg.init_checkpoint_path)
            init_epoch = int(restored["epoch"])
            if not resuming:
                state = state.replace(
                    params={"encoder": restored["encoder"],
                            "predictor": restored["predictor"]},
                    target_params=restored["target_encoder"],
                    opt_state=restored["opt"],
                )
        chain_start = init_epoch
    start_epoch = chain_start
    if resuming:
        from bvc_tpu.training.checkpoint import load_meta

        meta = load_meta(own_ckpt)
        if int(meta.get("epoch", -1)) >= chain_start + cfg.n_epoch:
            logger.info("run already complete (epoch %s/%d) — nothing to do",
                        meta.get("epoch"), chain_start + cfg.n_epoch)
            return {"checkpoint": str(own_ckpt),
                    "train_loss": meta.get("loss", 0.0)}
        # mid-stage preemption recovery: restore all three models,
        # optimizer, epoch and step/rng (step drives the EMA ramp; the
        # mask stream is (seed, epoch, batch)-deterministic so it resumes
        # for free)
        logger.info("resuming from %s", own_ckpt)
        restored = _restore(own_ckpt)
        start_epoch = int(restored["epoch"])
        state = state.replace(
            params={"encoder": restored["encoder"], "predictor": restored["predictor"]},
            target_params=restored["target_encoder"],
            opt_state=restored["opt"],
            step=jnp.asarray(restored["step"]),
            rng=jnp.asarray(restored["rng"]),
        )
        if start_epoch >= chain_start + cfg.n_epoch:
            logger.info("run already complete (epoch %d/%d) — nothing to do",
                        start_epoch, chain_start + cfg.n_epoch)
            from bvc_tpu.training.checkpoint import load_meta

            meta = load_meta(own_ckpt)
            return {"checkpoint": str(own_ckpt),
                    "train_loss": meta.get("loss", 0.0)}
    state = place_state(state, mesh, cfg.param_sharding)

    # data ---------------------------------------------------------------------
    datasets = make_dataset("jepa", cfg.data)
    global_batch = cfg.data.batch_size * mesh.devices.size
    n_batches = len(datasets["train"]) // global_batch
    if cfg.max_epoch_iters:
        n_batches = min(n_batches, cfg.max_epoch_iters)
    collate, collator = make_mask_collate(cfg, n_batches)

    # EMA momentum ramps over the REAL iteration count (reference
    # pretrain_jepa.py:309-311 uses ipe*num_epochs; with the CLI default
    # max_epoch_iters=0 the per-epoch count comes from the data)
    total_steps = max(n_batches, 1) * cfg.n_epoch
    probes = None
    if cfg.log_grad_stats:
        from bvc_tpu.training.probes import full_grad_probes

        probes = full_grad_probes("jepa")
    step = make_jepa_train_step(
        mesh, cfg.model, tx, total_steps, cfg.optim.ema, cfg.param_sharding,
        ema_fallback=cfg.optim.ema_fallback, grad_probes=probes,
        grad_accum=cfg.optim.grad_accum_steps,
    )
    loader = DataLoader(
        datasets["train"], mesh, global_batch, shuffle=True, seed=cfg.seed,
        num_workers=cfg.data.num_workers, prefetch=cfg.data.prefetch,
        max_batches=cfg.max_epoch_iters, collate_fn=collate,
    )
    logger.info("dataset: %d samples, %d iters/epoch, global batch %d",
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
                "encoder": state.params["encoder"],
                "predictor": state.params["predictor"],
                "target_encoder": state.target_params,
                "opt": state.opt_state,
                "epoch": np.int32(epoch_done),
                "step": np.asarray(jax.device_get(state.step)),
                "rng": np.asarray(jax.device_get(state.rng)),
            },
            meta={
                "run_id": cfg.run_id,
                "epoch": epoch_done,
                "loss": loss_meter.avg,
                "batch_size": cfg.data.batch_size,
                "world_size": int(mesh.devices.size),
                "lr": cfg.optim.lr,
                "family": "jepa",
                "collator_step": collator.state_dict()["step"],
                "script": cfg.script,
            },
        )

    loss_meter = AverageMeter()
    from bvc_tpu.utils.profiling import StepTraceWindow

    tracer = StepTraceWindow(cfg.profile_dir)  # no-op when unset
    for epoch in range(start_epoch, chain_start + cfg.n_epoch):
        loss_meter = AverageMeter()
        maskA = AverageMeter()
        maskB = AverageMeter()
        pipe_ms = [0.0]

        def log_fn(itr, metrics, epoch=epoch):
            loss = float(metrics["loss"])
            loss_meter.update(loss)
            maskA.update(float(metrics["mask_a"]))
            maskB.update(float(metrics["mask_b"]))
            if csv_logger is not None:
                csv_logger.log(
                    epoch + 1, itr, loss,
                    float(metrics["grad_fl"]), float(metrics["grad_ll"]),
                    int(metrics["mask_a"]), int(metrics["mask_b"]),
                    int(pipe_ms[0]),
                )
            if itr % cfg.log_freq == 0:
                extra = format_gstats(metrics)
                logger.info(
                    "[%d, %5d] loss: %.3f masks: %.1f %.1f (%.0f ms) m=%.4f%s",
                    epoch + 1, itr, loss_meter.avg, maskA.avg, maskB.avg,
                    pipe_ms[0], float(metrics["ema_m"]), extra,
                )
            if np.isnan(loss):
                raise FloatingPointError(f"loss is nan at epoch {epoch} itr {itr}")

        pipe = MetricsPipe(log_fn, time_every=cfg.log_freq)
        for itr, batch in enumerate(loader.epoch(epoch)):
            tracer.step()
            state, metrics = step(state, batch)
            pipe_ms[0] = pipe.push(itr, metrics)
        pipe.flush()
        logger.info("epoch %d avg loss %.4f", epoch + 1, loss_meter.avg)
        if cfg.save_every_epoch and epoch + 1 < chain_start + cfg.n_epoch:
            save(epoch + 1)

    tracer.close()
    chpt = checkpoint_path(folder, cfg.run_id)
    save(chain_start + cfg.n_epoch)
    save_wait()  # async: the returned path must be complete on disk
    logger.info("checkpoint saved at %s", chpt)
    return {"checkpoint": str(chpt), "train_loss": loss_meter.avg}
