"""Gradient accumulation (``OptimConfig.grad_accum_steps``): k sequential
microbatches per optimizer step — same effective batch, ~k× lower
activation memory.  Beyond the reference (whose batch is VRAM-bounded);
the supported route to effective batches past the single-shot memory
ceiling (PERFORMANCE.md "Masked flash attention", the 128 clips/chip
case)."""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
from bvc_tpu.models import jepa, videomae
from bvc_tpu.parallel import make_mesh, shard_batch
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import (
    make_jepa_train_step,
    make_simclr_train_step,
    make_videomae_train_step,
    place_state,
)
from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig

from test_jepa import jepa_cfg
from test_videomae import tiny_cfg


def _videomae_state(cfg, tx, mesh):
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)
    return place_state(TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh)


class TestVideomaeAccum:
    def test_accum_matches_single_shot(self):
        # the microbatched step must produce the same loss and the same
        # updated params as one full-batch step (tube masks give equal
        # per-sample mask counts, so mean-of-means is exact)
        mesh = make_mesh()
        cfg = tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.75)
        video = np.random.default_rng(0).standard_normal(
            (16, 4, 32, 32, 3)
        ).astype(np.float32)

        results = {}
        for k in (1, 2, 4):
            tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
            state = _videomae_state(cfg, tx, mesh)
            step = make_videomae_train_step(
                mesh, cfg, mask_cfg, tx, grad_accum=k
            )
            state, metrics = step(state, shard_batch(video, mesh))
            results[k] = (
                float(metrics["loss"]),
                jax.device_get(state.params["patch_embed"]["kernel"]),
            )
        for k in (2, 4):
            assert results[k][0] == pytest.approx(results[1][0], rel=1e-5)
            np.testing.assert_allclose(
                results[k][1], results[1][1], rtol=2e-5, atol=1e-6
            )

    def test_indivisible_batch_raises(self):
        mesh = make_mesh()
        cfg = tiny_cfg()
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        state = _videomae_state(cfg, tx, mesh)
        step = make_videomae_train_step(
            mesh, cfg, MaskConfig(mask_ratio=0.75), tx, grad_accum=3
        )
        video = np.zeros((16, 4, 32, 32, 3), np.float32)
        with pytest.raises(ValueError, match="grad_accum_steps"):
            step(state, shard_batch(video, mesh))


class TestJepaAccum:
    def test_accum_matches_single_shot(self):
        mesh = make_mesh()
        cfg = jepa_cfg()
        rng = np.random.default_rng(0)
        collator = MultiBlockMaskCollator(
            input_size=32, patch_size=8, enc_mask_scale=(0.85, 1.0),
            pred_mask_scale=(0.2, 0.25), npred=2, min_keep=2, seed=0,
        )
        B = 16
        enc, pred = collator(B, step=0)
        enc = update_mask_indices(enc, 32, 8, 2, 1, True)
        pred = update_mask_indices(pred, 32, 8, 2, 1, False)
        batch = {
            "video": rng.standard_normal((B, 2, 32, 32, 3)).astype(np.float32),
            "enc_idx": enc[0],
            "pred_idx": pred.transpose(1, 0, 2),
        }

        results = {}
        for k in (1, 2):
            tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
            params = jepa.init_params(jax.random.PRNGKey(0), cfg)
            state = place_state(
                TrainState.create(params, tx, jax.random.PRNGKey(1),
                                  target_params=copy.deepcopy(params["encoder"])),
                mesh,
            )
            step = make_jepa_train_step(
                mesh, cfg, tx, total_steps=100, grad_accum=k
            )
            state, metrics = step(state, shard_batch(batch, mesh))
            results[k] = (
                float(metrics["loss"]),
                jax.device_get(state.params["encoder"]["patch_embed"]["kernel"]),
                jax.device_get(state.target_params["patch_embed"]["kernel"]),
            )
        assert results[2][0] == pytest.approx(results[1][0], rel=1e-5)
        np.testing.assert_allclose(results[2][1], results[1][1],
                                   rtol=2e-5, atol=1e-6)
        # EMA update identical too (one update from the averaged params)
        np.testing.assert_allclose(results[2][2], results[1][2],
                                   rtol=2e-5, atol=1e-6)


class TestSimclrRefuses:
    def test_builder_raises(self):
        mesh = make_mesh()
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        with pytest.raises(ValueError, match="InfoNCE"):
            make_simclr_train_step(mesh, "resnet18", tx, grad_accum=2)


class TestTrainerAccum:
    def test_videomae_trainer_runs_with_accum(self, frame_corpus, tmp_path):
        from test_trainer_videomae import tiny_train_cfg

        from bvc_tpu.training.trainer_videomae import run_pretraining

        cfg = tiny_train_cfg(frame_corpus, tmp_path, run_id="dev_1_g0_default_0_9")
        cfg.optim.grad_accum_steps = 2
        cfg.data.batch_size = 2  # ×8 devices → global 16 → microbatch 8
        summary = run_pretraining(cfg)
        assert np.isfinite(summary["train_loss"])

    def test_cli_flag_reaches_config(self):
        from bvc_tpu.cli.pretrain_jepa import build_parser, config_from_args

        args = build_parser().parse_args(
            ["-train_group", "g0", "--grad_accum_steps", "4"]
        )
        assert config_from_args(args).optim.grad_accum_steps == 4
