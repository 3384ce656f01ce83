"""LR/WD schedules (I-JEPA's WarmupCosineSchedule / CosineWDSchedule,
shipped disabled in the reference — ``predictive/helper.py:148-161``),
opt-in via ``OptimConfig.schedule`` / ``final_wd``."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bvc_tpu.training.optim import (
    cosine_wd,
    make_optimizer,
    schedule_steps,
    warmup_cosine_lr,
)
from bvc_tpu.utils.config import OptimConfig, TrainConfig


class TestScheduleMath:
    def test_warmup_cosine_shape(self):
        fn = warmup_cosine_lr(start=0.01, peak=0.1, final=0.001,
                              warmup_steps=10, total_steps=100)
        assert float(fn(0)) == pytest.approx(0.01)
        # linear warmup midpoint
        assert float(fn(5)) == pytest.approx(0.01 + 0.09 * 0.5)
        # peak reached at warmup boundary
        assert float(fn(10)) == pytest.approx(0.1)
        # cosine midpoint of (10, 100): final + (peak-final)/2
        assert float(fn(55)) == pytest.approx(0.001 + 0.099 * 0.5, rel=1e-5)
        # floor at/after the horizon
        assert float(fn(100)) == pytest.approx(0.001)
        assert float(fn(500)) == pytest.approx(0.001)

    def test_warmup_cosine_is_monotone_through_warmup(self):
        fn = warmup_cosine_lr(0.0, 0.1, 0.0, 20, 200)
        vals = [float(fn(t)) for t in range(21)]
        assert vals == sorted(vals)
        assert vals[-1] == pytest.approx(0.1)

    def test_cosine_wd_decreasing_and_clamped(self):
        fn = cosine_wd(ref=0.04, final=0.4, total_steps=50)  # increasing
        assert float(fn(0)) == pytest.approx(0.04)
        assert float(fn(50)) == pytest.approx(0.4)
        assert float(fn(200)) == pytest.approx(0.4)  # clamped high side
        dec = cosine_wd(ref=0.4, final=0.04, total_steps=50)
        assert float(dec(0)) == pytest.approx(0.4)
        assert float(dec(50)) == pytest.approx(0.04)
        assert float(dec(200)) == pytest.approx(0.04)

    def test_schedule_steps_horizon_math(self):
        cfg = TrainConfig(n_epoch=4, max_epoch_iters=0)
        cfg.data.n_trainsamples = 800
        cfg.data.batch_size = 12  # per-device

        class FakeMesh:
            class devices:
                size = 8

        cfg.optim.schedule = "warmup_cosine"
        cfg.optim.warmup_epochs = 1.0
        warmup, total = schedule_steps(cfg, FakeMesh)
        ipe = 800 // (12 * 8)  # 8
        assert warmup == ipe
        assert total == int(1.25 * 4 * ipe)
        # max_epoch_iters caps ipe
        cfg.max_epoch_iters = 3
        warmup, total = schedule_steps(cfg, FakeMesh)
        assert warmup == 3 and total == int(1.25 * 4 * 3)
        # no schedule configured → None
        cfg.optim.schedule = "none"
        assert schedule_steps(cfg, FakeMesh) is None

    def test_schedule_steps_seq_mesh_counts_data_axis_only(self):
        """Under a ('data','seq') mesh a whole seq group carries each
        batch row, so the horizon must use batch_size * data (the
        trainer's loader sizing), not batch_size * devices."""
        from bvc_tpu.parallel.seqpar import make_seq_mesh

        cfg = TrainConfig(n_epoch=4, max_epoch_iters=0)
        cfg.data.n_trainsamples = 40
        cfg.data.batch_size = 2
        cfg.optim.schedule = "warmup_cosine"
        cfg.optim.warmup_epochs = 1.0
        warmup, total = schedule_steps(cfg, make_seq_mesh(2, 4))
        ipe = 40 // (2 * 2)  # data axis 2, NOT 8 devices
        assert warmup == ipe == 10
        assert total == int(1.25 * 4 * ipe)


class TestScheduledOptimizer:
    def test_sgd_schedule_matches_hand_rollout(self):
        cfg = OptimConfig(name="sgd", lr=0.1, momentum=0.9, nesterov=True,
                          weight_decay=0.01, schedule="warmup_cosine",
                          warmup_epochs=0.0, start_lr=0.02, final_lr=0.0,
                          final_wd=0.001)
        warmup, total = 2, 8
        tx = make_optimizer(cfg, steps=(warmup, total))
        p = {"w": jnp.ones((3,)) * 2.0}
        st = tx.init(p)
        lr_fn = warmup_cosine_lr(0.02, 0.1, 0.0, warmup, total)
        wd_fn = cosine_wd(0.01, 0.001, total)
        trace = np.zeros(3)
        ref = np.ones(3) * 2.0
        g = np.ones(3) * 0.5
        for step in range(5):
            upd, st = tx.update({"w": jnp.asarray(g)}, st, p)
            p = optax.apply_updates(p, upd)
            # hand rollout: coupled wd → nesterov trace → scheduled lr
            geff = g + float(wd_fn(step)) * ref
            trace = 0.9 * trace + geff
            ref = ref - float(lr_fn(step)) * (geff + 0.9 * trace)
            np.testing.assert_allclose(np.asarray(p["w"]), ref, rtol=1e-5)

    def test_unscheduled_state_layout_unchanged(self):
        # schedules off → the FusedTx path with the same state structure
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        assert hasattr(tx, "fused_apply")
        tx2 = make_optimizer(
            OptimConfig(name="sgd", lr=0.1, momentum=0.9,
                        schedule="warmup_cosine"),
            steps=(1, 10),
        )
        assert not hasattr(tx2, "fused_apply")

    def test_schedule_without_steps_raises(self):
        with pytest.raises(ValueError, match="schedule"):
            make_optimizer(OptimConfig(schedule="warmup_cosine"))

    def test_invalid_schedule_raises(self):
        with pytest.raises(ValueError, match="invalid schedule"):
            make_optimizer(OptimConfig(schedule="cosine"), steps=(1, 10))

    def test_final_wd_without_wd_raises(self):
        with pytest.raises(ValueError, match="weight_decay"):
            make_optimizer(OptimConfig(weight_decay=0.0, final_wd=0.001),
                           steps=(1, 10))

    def test_adamw_lr_schedule(self):
        cfg = OptimConfig(name="adamw", lr=0.1, weight_decay=0.05,
                          schedule="warmup_cosine", final_lr=0.0)
        tx = make_optimizer(cfg, steps=(0, 4))
        p = {"w": jnp.ones((2,))}
        st = tx.init(p)
        upd, st = tx.update({"w": jnp.ones((2,))}, st, p)
        assert np.all(np.isfinite(np.asarray(upd["w"])))
        with pytest.raises(NotImplementedError):
            make_optimizer(
                OptimConfig(name="adamw", weight_decay=0.05, final_wd=0.01),
                steps=(0, 4),
            )


class TestTrainerWithSchedule:
    def test_videomae_stage_runs_and_resumes_schedule_position(
        self, frame_corpus, tmp_path
    ):
        from test_trainer_videomae import tiny_train_cfg

        from bvc_tpu.training.trainer_videomae import run_pretraining

        rid = "dev_1_g0_default_0_3"
        cfg = tiny_train_cfg(frame_corpus, tmp_path, run_id=rid)
        cfg.optim.schedule = "warmup_cosine"
        cfg.optim.warmup_epochs = 0.5
        cfg.optim.start_lr = 0.0
        cfg.optim.final_lr = 0.001
        cfg.save_every_epoch = True
        s1 = run_pretraining(cfg)
        assert np.isfinite(s1["train_loss"])

        # resume with one more epoch: the schedule count restores from the
        # checkpointed optimizer state (position survives preemption)
        cfg2 = tiny_train_cfg(frame_corpus, tmp_path, run_id=rid)
        cfg2.optim.schedule = "warmup_cosine"
        cfg2.optim.warmup_epochs = 0.5
        cfg2.optim.start_lr = 0.0
        cfg2.optim.final_lr = 0.001
        cfg2.n_epoch = 2
        cfg2.resume = True
        s2 = run_pretraining(cfg2)
        assert np.isfinite(s2["train_loss"])

    def test_cli_flags_reach_config(self):
        from bvc_tpu.cli.pretrain_videomae import build_parser, config_from_args

        args = build_parser().parse_args(
            ["-train_group", "g0", "--lr_schedule", "warmup_cosine",
             "--warmup_epochs", "2", "--start_lr", "0.001",
             "--final_lr", "0.0001", "--final_wd", "0.01",
             "--ipe_scale", "1.5", "--wd", "0.04"]
        )
        cfg = config_from_args(args)
        o = cfg.optim
        assert o.schedule == "warmup_cosine"
        assert o.warmup_epochs == 2.0
        assert o.start_lr == 0.001
        assert o.final_lr == 0.0001
        assert o.final_wd == 0.01
        assert o.ipe_scale == 1.5
        # sentinel off
        args2 = build_parser().parse_args(["-train_group", "g0"])
        assert config_from_args(args2).optim.final_wd is None
