"""JEPA family: multi-block collator, encoder/predictor, EMA train step,
end-to-end stage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.masks.multiblock import (
    MultiBlockMaskCollator,
    _block_size_from_u,
    update_mask_indices,
)
from bvc_tpu.models import jepa
from bvc_tpu.parallel import make_mesh, shard_batch
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import make_jepa_train_step, place_state, smooth_l1
from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig, TrainConfig


def jepa_cfg(**kw):
    d = dict(
        family="jepa", image_size=32, patch_size=8, num_frames=2, tubelet_size=1,
        hidden_size=32, depth=2, num_heads=4, pred_depth=1, pred_emb_dim=16,
        dtype="float32",
    )
    d.update(kw)
    return ModelConfig(**d)


class TestBlockSize:
    def test_reference_formula(self):
        # u=0 → scale=min_s, ar=min_ar; 14x14 grid, pred scale (.15,.2), AR (.75,1.5)
        h, w = _block_size_from_u(0.0, 14, 14, (0.15, 0.2), (0.75, 1.5))
        # max_keep=int(196*.15)=29, ar=.75 → h=round(sqrt(21.75))=5, w=round(sqrt(38.7))=6
        assert (h, w) == (5, 6)
        h, w = _block_size_from_u(1.0, 14, 14, (0.85, 1.0), (1.0, 1.0))
        assert (h, w) == (13, 13)  # sqrt(196)=14 clamped to <14


class TestCollator:
    def make(self, **kw):
        d = dict(input_size=32, patch_size=8, enc_mask_scale=(0.85, 1.0),
                 pred_mask_scale=(0.2, 0.25), aspect_ratio=(0.75, 1.5),
                 nenc=1, npred=2, min_keep=2, seed=0)
        d.update(kw)
        return MultiBlockMaskCollator(**d)

    def test_shapes_and_padding(self):
        c = self.make()
        enc, pred = c(batch_size=3)
        assert enc.shape == (1, 3, c.enc_cap)
        assert pred.shape == (2, 3, c.pred_cap)
        # valid prefixes, -1 suffixes
        for b in range(3):
            v = enc[0, b]
            n = (v >= 0).sum()
            assert (v[:n] >= 0).all() and (v[n:] == -1).all()

    def test_batch_min_truncation_equalizes_valid_lengths(self):
        c = self.make()
        enc, pred = c(batch_size=4)
        assert len({int((enc[0, b] >= 0).sum()) for b in range(4)}) == 1
        assert len({int((pred[m, b] >= 0).sum()) for m in range(2) for b in range(4)}) == 1

    def test_deterministic_per_step(self):
        c1, c2 = self.make(), self.make()
        e1, p1 = c1(2, step=5)
        e2, p2 = c2(2, step=5)
        np.testing.assert_array_equal(e1, e2)
        np.testing.assert_array_equal(p1, p2)
        e3, _ = c1(2, step=6)
        assert not np.array_equal(e1, e3)

    def test_no_overlap_constraint(self):
        c = self.make(npred=2, min_keep=1)
        enc, pred = c(2, step=0)
        for b in range(2):
            pred_set = set(pred[:, b][pred[:, b] >= 0].tolist())
            enc_set = set(enc[0, b][enc[0, b] >= 0].tolist())
            assert not (pred_set & enc_set)

    def test_blocks_are_rectangles(self):
        c = self.make(allow_overlap=True)
        _, pred = c(1, step=0)
        idx = pred[0, 0][pred[0, 0] >= 0]
        rows, cols = idx // c.width, idx % c.width
        assert len(idx) == (rows.max() - rows.min() + 1) * (cols.max() - cols.min() + 1)

    def test_update_mask_indices(self):
        m = np.array([[0, 5, -1]], np.int32)
        out = update_mask_indices(m, 32, 8, 2, 1, isencoder=False)
        np.testing.assert_array_equal(out, [[16, 21, -1]])  # +(T-1)*16
        out_e = update_mask_indices(m, 32, 8, 2, 1, isencoder=True)
        np.testing.assert_array_equal(out_e, [[0, 5, -1]])


class TestSmoothL1:
    def test_matches_torch_formula(self):
        d = jnp.array([-2.0, -0.5, 0.0, 0.3, 1.5])
        out = np.asarray(smooth_l1(d, jnp.zeros_like(d)))
        expected = [1.5, 0.125, 0.0, 0.045, 1.0]
        np.testing.assert_allclose(out, expected, rtol=1e-6)


class TestJepaModel:
    def test_encoder_masked_and_full(self):
        cfg = jepa_cfg()
        p = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
        video = jnp.array(np.random.default_rng(0).standard_normal((2, 2, 32, 32, 3)), jnp.float32)
        full = jepa.encoder_forward(p, video, cfg)
        assert full.shape == (2, 32, 32)
        keep = jnp.array([[0, 1, 2, -1], [4, 5, 6, 7]], jnp.int32)
        masked = jepa.encoder_forward(p, video, cfg, keep)
        assert masked.shape == (2, 4, 32)

    def test_padding_invisibility(self):
        """A padded slot must not change the other tokens' outputs."""
        cfg = jepa_cfg()
        p = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
        video = jnp.array(np.random.default_rng(0).standard_normal((1, 2, 32, 32, 3)), jnp.float32)
        keep_a = jnp.array([[3, 7, 9, -1]], jnp.int32)
        keep_b = jnp.array([[3, 7, 9, 11]], jnp.int32)
        out_a = np.asarray(jepa.encoder_forward(p, video, cfg, keep_a))
        out_b = np.asarray(jepa.encoder_forward(p, video, cfg, keep_b))
        # first three positions in a == same tokens encoded without pad only
        # if pad is invisible; compare against 3-token encode
        out_c = np.asarray(jepa.encoder_forward(p, video, cfg, jnp.array([[3, 7, 9]], jnp.int32)))
        np.testing.assert_allclose(out_a[:, :3], out_c, atol=1e-5)
        assert not np.allclose(out_b[:, :3], out_c, atol=1e-5)

    def test_predictor_shapes(self):
        cfg = jepa_cfg()
        pp = jepa.init_predictor_params(jax.random.PRNGKey(1), cfg)
        z = jnp.ones((2, 5, 32))
        enc_idx = jnp.array([[0, 1, 2, 3, -1]] * 2, jnp.int32)
        pred_idx = jnp.array([[[16, 17, -1]] * 2, [[20, 21, 22]] * 2], jnp.int32)
        out = jepa.predictor_forward(pp, z, enc_idx, pred_idx, cfg)
        assert out.shape == (2, 2, 3, 32)

    def test_target_features_are_layernormed(self):
        cfg = jepa_cfg()
        p = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
        video = jnp.array(np.random.default_rng(0).standard_normal((1, 2, 32, 32, 3)), jnp.float32)
        pred_idx = jnp.array([[[0, 1, 2, 3]]], jnp.int32)
        t = np.asarray(jepa.target_features(p, video, pred_idx, cfg))
        np.testing.assert_allclose(t.mean(-1), 0.0, atol=1e-4)
        np.testing.assert_allclose(t.std(-1), 1.0, atol=2e-2)

    def test_target_score_bf16_close_to_f32(self):
        # bf16-logit target encode (default, autocast-parity) must track
        # the full-f32 path closely — post-LayerNorm targets are
        # unit-scale, so atol is absolute
        from dataclasses import replace

        cfg = jepa_cfg()
        p = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
        video = jnp.array(
            np.random.default_rng(1).standard_normal((2, 2, 32, 32, 3)),
            jnp.float32)
        pred_idx = jnp.array([[[0, 1, 2, 3]] * 2], jnp.int32)
        t_bf16 = np.asarray(jepa.target_features(
            p, video, pred_idx, replace(cfg, target_score_bf16=True)))
        t_f32 = np.asarray(jepa.target_features(
            p, video, pred_idx, replace(cfg, target_score_bf16=False)))
        np.testing.assert_allclose(t_bf16, t_f32, atol=0.05)


class TestJepaTrainStep:
    def _setup(self):
        mesh = make_mesh()
        cfg = jepa_cfg()
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = jepa.init_params(jax.random.PRNGKey(0), cfg)
        import copy

        target = copy.deepcopy(params["encoder"])
        state = TrainState.create(params, tx, jax.random.PRNGKey(1), target_params=target)
        state = place_state(state, mesh)
        step = make_jepa_train_step(mesh, cfg, tx, total_steps=100)
        return mesh, cfg, state, step

    def _batch(self, mesh, B=8):
        rng = np.random.default_rng(0)
        collator = MultiBlockMaskCollator(
            input_size=32, patch_size=8, enc_mask_scale=(0.85, 1.0),
            pred_mask_scale=(0.2, 0.25), npred=2, min_keep=2, seed=0,
        )
        enc, pred = collator(B, step=0)
        enc = update_mask_indices(enc, 32, 8, 2, 1, True)
        pred = update_mask_indices(pred, 32, 8, 2, 1, False)
        batch = {
            "video": rng.standard_normal((B, 2, 32, 32, 3)).astype(np.float32),
            "enc_idx": enc[0],
            "pred_idx": pred.transpose(1, 0, 2),
        }
        return shard_batch(batch, mesh)

    def test_loss_decreases_and_ema_moves(self):
        mesh, cfg, state, step = self._setup()
        batch = self._batch(mesh)
        t0 = jax.device_get(state.target_params["patch_embed"]["kernel"])
        losses = []
        for _ in range(6):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        t1 = jax.device_get(state.target_params["patch_embed"]["kernel"])
        assert not np.allclose(t0, t1)  # EMA actually updates
        # but target stays close to its init (m≈0.996)
        online = jax.device_get(state.params["encoder"]["patch_embed"]["kernel"])
        assert np.abs(t1 - t0).max() < np.abs(online - t0).max() + 1e-9

    def test_ema_ramp_increases(self):
        mesh, cfg, state, step = self._setup()
        batch = self._batch(mesh)
        state, m0 = step(state, batch)
        state, m1 = step(state, batch)
        assert float(m0["ema_m"]) == pytest.approx(0.996, abs=1e-6)
        assert float(m1["ema_m"]) > float(m0["ema_m"])

    def test_masked_flash_route_full_step_matches_xla(self, monkeypatch):
        """The 768 MiB masked-flash auto-route (ops/attention.py
        ``masked_auto_impl``) exists for the JEPA bs-128 config but — on
        the dev box — the full routed step could not run on real hardware
        (remote-compile ceiling, PERFORMANCE.md round 3).  Force the
        route here (threshold 0, router told it is on TPU, flash kernels
        in interpret mode) and assert the FULL train step engages it and
        matches the XLA-path step's loss and updated params."""
        import bvc_tpu.ops.attention as attn_mod
        import bvc_tpu.ops.flash_attention as flash_mod

        # baseline: the masked-XLA path
        mesh, cfg, state, step = self._setup()
        batch = self._batch(mesh)
        state_a, metrics_a = step(state, batch)

        calls: list = []
        orig_flash = flash_mod.flash_attention

        def counting_flash(q, k, v, **kw):
            calls.append(tuple(q.shape))
            kw["interpret"] = True
            return orig_flash(q, k, v, **kw)

        monkeypatch.setattr(flash_mod, "flash_attention", counting_flash)
        monkeypatch.setattr(attn_mod, "MASKED_XLA_SCORE_BYTES_LIMIT", 0)
        orig_route = attn_mod.masked_auto_impl

        def tpu_route(b, h, n_q, n_k, on_tpu, bytes_per_elem=4):
            return orig_route(b, h, n_q, n_k, True, bytes_per_elem)

        monkeypatch.setattr(attn_mod, "masked_auto_impl", tpu_route)

        mesh2, cfg2, state2, step2 = self._setup()
        state_b, metrics_b = step2(state2, self._batch(mesh2))
        assert calls, "masked-flash route did not engage"
        assert float(metrics_b["loss"]) == pytest.approx(
            float(metrics_a["loss"]), rel=1e-4, abs=1e-6)
        for la, lb in zip(
            jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
            jax.tree_util.tree_leaves(jax.device_get(state_b.params)),
        ):
            np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-6)

    def test_autocast_scores_modes_agree(self):
        # bf16 logits on the gradient paths (reference full-autocast
        # quantization point, the round-3 default): trains with a finite
        # loss close to the f32-scores fallback
        import copy

        losses = {}
        for ac in (True, False):
            mesh = make_mesh()
            # bf16 compute: autocast_scores is gated on it (f32 mode
            # means "no autocast", keeping full-precision parity exact)
            cfg = jepa_cfg(dtype="bfloat16")
            cfg.autocast_scores = ac
            tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
            params = jepa.init_params(jax.random.PRNGKey(0), cfg)
            state = place_state(
                TrainState.create(params, tx, jax.random.PRNGKey(1),
                                  target_params=copy.deepcopy(params["encoder"])),
                mesh)
            step = make_jepa_train_step(mesh, cfg, tx, total_steps=100)
            _, metrics = step(state, self._batch(mesh))
            losses[ac] = float(metrics["loss"])
        assert np.isfinite(list(losses.values())).all()
        assert losses[True] == pytest.approx(losses[False], rel=0.02, abs=1e-3)


class TestJepaTrainerEndToEnd:
    def test_stage_and_chaining(self, frame_corpus, tmp_path):
        from bvc_tpu.training.trainer_jepa import run_pretraining

        cfg = TrainConfig(run_id="dev_1_g0_default_0_0", savedir=str(tmp_path),
                          n_epoch=1, max_epoch_iters=2, seed=0, log_freq=1)
        cfg.model = jepa_cfg()
        cfg.data.jpg_root = frame_corpus
        cfg.data.train_group = "g0"
        cfg.data.num_frames = 2
        cfg.data.tubelet_size = 1
        cfg.data.interval = 5
        cfg.data.image_size = 32
        cfg.data.n_trainsamples = 20
        cfg.data.batch_size = 1
        cfg.data.num_workers = 4
        cfg.data.segment_minutes = 0.02
        cfg.data.augs = "cg"
        cfg.data.crop_scale = (1.0, 1.0)
        cfg.mask.enc_mask_scale = (0.85, 1.0)
        cfg.mask.pred_mask_scale = (0.2, 0.25)
        cfg.mask.min_keep = 2
        cfg.optim.lr = 0.01
        cfg.optim.exclude_bias_and_norm_from_wd = True
        s1 = run_pretraining(cfg)
        assert np.isfinite(s1["train_loss"])
        csv = (tmp_path / "csvlog_dev_1_g0_default_0_0.csv").read_text().splitlines()
        assert csv[0] == "epoch,itr,loss,grad-FL,grad-LL,mask-A,mask-B,time (ms)"
        # stage 2 loads the 3-model checkpoint incl. optimizer
        cfg2 = TrainConfig(**{**cfg.__dict__})
        cfg2.run_id = "dev_2_g0_default_1_0"
        cfg2.init_checkpoint_path = s1["checkpoint"]
        s2 = run_pretraining(cfg2)
        assert np.isfinite(s2["train_loss"])


class TestDropPath:
    def test_branch_semantics(self):
        from bvc_tpu.models.vit import drop_path

        x = jnp.ones((512, 3, 4))
        out = np.asarray(drop_path(x, jnp.float32(0.5), jax.random.PRNGKey(0)))
        # rows are either all-zero or all 1/keep_prob (reference
        # vision_transformer.py:145-155 per-sample binarized scaling)
        row = out.reshape(512, -1)
        zero = np.all(row == 0.0, axis=1)
        scaled = np.all(np.isclose(row, 2.0), axis=1)
        assert np.all(zero | scaled)
        assert 0.3 < zero.mean() < 0.7

    def test_zero_rate_identity(self):
        from bvc_tpu.models.vit import drop_path

        x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 5)))
        out = drop_path(x, jnp.float32(0.0), jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))

    def test_run_blocks_schedule_changes_output_only_in_train(self):
        from bvc_tpu.models.vit import init_blocks, run_blocks

        cfg = jepa_cfg(drop_path_rate=0.5)
        blocks = init_blocks(jax.random.PRNGKey(0), cfg.depth, cfg.hidden_size)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 6, 32)), jnp.float32
        )
        base = run_blocks(blocks, x, cfg.num_heads)
        rates = np.linspace(0.0, 0.5, cfg.depth)
        dropped = run_blocks(blocks, x, cfg.num_heads,
                             drop_path_rates=rates, rng=jax.random.PRNGKey(3))
        assert not np.allclose(np.asarray(base), np.asarray(dropped))
        # layer 0 rate is 0.0 (linspace start) — a depth-1 stack with the
        # schedule is exactly the deterministic path
        one = jax.tree_util.tree_map(lambda l: l[:1], blocks)
        det = run_blocks(one, x, cfg.num_heads)
        sched = run_blocks(one, x, cfg.num_heads,
                           drop_path_rates=np.zeros(1), rng=jax.random.PRNGKey(4))
        np.testing.assert_allclose(np.asarray(det), np.asarray(sched), atol=1e-6)

    def test_train_step_wires_drop_path(self):
        mesh = make_mesh()
        cfg = jepa_cfg(drop_path_rate=0.3)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = jepa.init_params(jax.random.PRNGKey(0), cfg)
        import copy

        target = copy.deepcopy(params["encoder"])
        state = TrainState.create(params, tx, jax.random.PRNGKey(1),
                                  target_params=target)
        state = place_state(state, mesh)
        step = make_jepa_train_step(mesh, cfg, tx, total_steps=100)
        batch = TestJepaTrainStep._batch(TestJepaTrainStep(), mesh)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


class TestEmaFallback:
    """Reference schedule quirks (pretrain_jepa.py:309-311,426-429):
    uncapped ramp for total_steps+5 elements, then m=ema_fallback."""

    def _state_step(self, total_steps, at_step):
        mesh = make_mesh()
        cfg = jepa_cfg()
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.0))
        params = jepa.init_params(jax.random.PRNGKey(0), cfg)
        import copy

        target = copy.deepcopy(params["encoder"])
        state = TrainState.create(params, tx, jax.random.PRNGKey(1),
                                  target_params=target)
        state = state.replace(step=jnp.asarray(at_step, state.step.dtype)) \
            if hasattr(state, "replace") else TrainState(
                step=jnp.asarray(at_step, state.step.dtype), params=state.params,
                opt_state=state.opt_state, rng=state.rng,
                target_params=state.target_params, extra=state.extra)
        state = place_state(state, mesh)
        step = make_jepa_train_step(mesh, cfg, tx, total_steps=total_steps)
        batch = TestJepaTrainStep._batch(TestJepaTrainStep(), mesh)
        _, metrics = step(state, batch)
        return float(metrics["ema_m"])

    def test_ramp_exceeds_one_in_spare_elements(self):
        # step T+4 is the generator's last element: m = .996 + (T+4)*.004/T > 1
        m = self._state_step(total_steps=50, at_step=54)
        assert m == pytest.approx(0.996 + 54 * 0.004 / 50, abs=1e-6)
        assert m > 1.0

    def test_exhaustion_falls_back(self):
        m = self._state_step(total_steps=50, at_step=55)
        assert m == pytest.approx(0.998, abs=1e-7)


class TestPosInterpForward:
    def test_encoder_other_resolution_runs(self):
        cfg = jepa_cfg()
        params = jepa.init_params(jax.random.PRNGKey(0), cfg)
        video = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 2, 48, 48, 3)),
            jnp.float32,
        )
        out = jepa.encoder_forward(params["encoder"], video, cfg)
        assert out.shape == (2, 2 * 6 * 6, cfg.hidden_size)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_encoder_time_mismatch_raises(self):
        cfg = jepa_cfg()
        params = jepa.init_params(jax.random.PRNGKey(0), cfg)
        video = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        with pytest.raises(ValueError, match="time grid"):
            jepa.encoder_forward(params["encoder"], video, cfg)

    def test_image_vit_other_resolution_runs(self):
        from bvc_tpu.models import vit_image

        cfg = jepa_cfg()
        params = vit_image.init_params(jax.random.PRNGKey(0), cfg)
        images = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 48, 48, 3)), jnp.float32
        )
        out = vit_image.forward(params, images, cfg)
        assert out.shape == (2, 36, cfg.hidden_size)
        assert np.all(np.isfinite(np.asarray(out)))


class TestJepaResume:
    def _cfg(self, frame_corpus, tmp_path, run_id):
        cfg = TrainConfig(run_id=run_id, savedir=str(tmp_path),
                          n_epoch=1, max_epoch_iters=2, seed=0, log_freq=1)
        cfg.model = jepa_cfg()
        cfg.data.jpg_root = frame_corpus
        cfg.data.train_group = "g0"
        cfg.data.num_frames = 2
        cfg.data.tubelet_size = 1
        cfg.data.interval = 5
        cfg.data.image_size = 32
        cfg.data.n_trainsamples = 20
        cfg.data.batch_size = 1
        cfg.data.num_workers = 0
        cfg.data.segment_minutes = 0.02
        cfg.data.augs = "cg"
        cfg.data.crop_scale = (1.0, 1.0)
        cfg.mask.enc_mask_scale = (0.85, 1.0)
        cfg.mask.pred_mask_scale = (0.2, 0.25)
        cfg.mask.min_keep = 2
        cfg.optim.lr = 0.01
        cfg.optim.exclude_bias_and_norm_from_wd = True
        return cfg

    def test_kill_and_resume(self, frame_corpus, tmp_path):
        from bvc_tpu.training.checkpoint import load_meta
        from bvc_tpu.training.trainer_jepa import run_pretraining

        rid = "dev_1_g0_default_0_8"
        cfg = self._cfg(frame_corpus, tmp_path, rid)
        cfg.save_every_epoch = True
        s1 = run_pretraining(cfg)
        assert load_meta(s1["checkpoint"])["epoch"] == 1

        # resume targeting 2 epochs continues (EMA step restored: the
        # second epoch's ema_m continues the ramp rather than restarting)
        cfg2 = self._cfg(frame_corpus, tmp_path, rid)
        cfg2.n_epoch = 2
        cfg2.resume = True
        s2 = run_pretraining(cfg2)
        meta2 = load_meta(s2["checkpoint"])
        assert meta2["epoch"] == 2
        csv = (tmp_path / f"csvlog_{rid}.csv").read_text().splitlines()
        epochs = [row.split(",")[0] for row in csv[1:]]
        assert "1" in epochs and "2" in epochs and epochs == sorted(epochs)

        # resuming a complete run is a no-op
        s3 = run_pretraining(cfg2)
        assert load_meta(s3["checkpoint"])["epoch"] == 2
        assert load_meta(s3["checkpoint"])["loss"] == meta2["loss"]


class TestLegacyCheckpointChaining:
    def test_init_from_pre_resume_layout(self, frame_corpus, tmp_path):
        """Checkpoints written before step/rng were added must still chain."""
        import jax
        import copy

        from bvc_tpu.training.checkpoint import save_checkpoint
        from bvc_tpu.training.trainer_jepa import run_pretraining
        from bvc_tpu.training.optim import make_optimizer
        from bvc_tpu.training.state import TrainState

        cfg = TestJepaResume()._cfg(frame_corpus, tmp_path, "dev_2_g0_default_0_8")
        params = jepa.init_params(jax.random.PRNGKey(0), cfg.model)
        tx = make_optimizer(cfg.optim, params)
        st = TrainState.create(params, tx, jax.random.PRNGKey(1),
                               target_params=copy.deepcopy(params["encoder"]))
        legacy = tmp_path / "model_dev_1_g0_default_0_8.ckpt"
        save_checkpoint(legacy, {
            "encoder": jax.device_get(st.params["encoder"]),
            "predictor": jax.device_get(st.params["predictor"]),
            "target_encoder": jax.device_get(st.target_params),
            "opt": jax.device_get(st.opt_state),
            "epoch": np.int32(1),
        }, meta={"epoch": 1})
        cfg.init_checkpoint_path = str(legacy)
        out = run_pretraining(cfg)
        assert np.isfinite(out["train_loss"])


class TestCheapStageSkip:
    def test_completed_stage_skip_never_restores(self, frame_corpus, tmp_path,
                                                 monkeypatch):
        """Curriculum-level resume over a completed JEPA stage must decide
        from meta.json alone — no Orbax restore of the three-model +
        optimizer tree (at ViT-B scale that is hundreds of MB per
        skipped stage)."""
        from bvc_tpu.training import trainer_jepa
        from bvc_tpu.training.checkpoint import load_meta

        rid1, rid2 = "dev_1_g0_default_1_8", "dev_2_g1_default_2_8"
        cfg1 = TestJepaResume()._cfg(frame_corpus, tmp_path, rid1)
        s1 = trainer_jepa.run_pretraining(cfg1)

        cfg2 = TestJepaResume()._cfg(frame_corpus, tmp_path, rid2)
        cfg2.data.train_group = "g0"
        cfg2.init_checkpoint_path = s1["checkpoint"]
        s2 = trainer_jepa.run_pretraining(cfg2)
        assert load_meta(s2["checkpoint"])["epoch"] == 2

        def _boom(*a, **k):
            raise AssertionError("stage-skip paid a full checkpoint restore")

        monkeypatch.setattr(trainer_jepa, "load_checkpoint", _boom)
        cfg3 = TestJepaResume()._cfg(frame_corpus, tmp_path, rid2)
        cfg3.data.train_group = "g0"
        cfg3.init_checkpoint_path = s1["checkpoint"]
        cfg3.resume = True
        s3 = trainer_jepa.run_pretraining(cfg3)
        assert s3["checkpoint"] == s2["checkpoint"]
