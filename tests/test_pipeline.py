"""Pipeline-parallel VideoMAE (bvc_tpu/parallel/pipeline.py) vs the
single-chip / GSPMD paths.

Beyond-parity capability (like seqpar, SURVEY.md §5's extension points —
the reference's ViT-B fits one chip and needs no PP): the GPipe
microbatched step must be the SAME computation as the data-parallel
step — same masks (tube or random) from the same rng, same loss, same
updated params — with the encoder/decoder block stacks sharded ``P('pipe')``
on their depth axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.models import videomae
from bvc_tpu.parallel import make_mesh, shard_batch
from bvc_tpu.parallel.pipeline import (
    make_pipe_mesh,
    make_pipe_videomae_train_step,
    pipe_param_specs,
)
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import make_videomae_train_step, place_state
from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig


def _tiny_cfg():
    # depths divisible by every tested pipe size (2 and 4)
    return ModelConfig(
        image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
        hidden_size=32, depth=4, num_heads=4,
        decoder_hidden_size=16, decoder_depth=4, decoder_num_heads=2,
        dtype="float32",
    )


def _video(rng, b=8, t=4, s=32):
    return rng.integers(0, 255, (b, t, s, s, 3), dtype=np.uint8)


def _pipe_state(params, tx, mesh):
    from bvc_tpu.parallel.pipeline import pipe_state_shardings

    state = TrainState.create(params, tx, jax.random.PRNGKey(7))
    sh = pipe_state_shardings(state, mesh)
    placed = jax.device_put(state, sh)
    return jax.tree_util.tree_map(jnp.copy, placed)


class TestPipelineStep:
    @pytest.mark.parametrize(
        "data,pipe,microbatches", [(2, 4, 2), (4, 2, 1), (1, 4, 4), (2, 2, 4)]
    )
    def test_step_matches_gspmd_data_parallel(self, rng, data, pipe, microbatches):
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = _video(rng)

        mesh_dp = make_mesh()
        state_a = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(7)), mesh_dp
        )
        step_a = make_videomae_train_step(mesh_dp, cfg, mask_cfg, tx)
        state_a, metrics_a = step_a(state_a, shard_batch(video, mesh_dp))

        mesh_pp = make_pipe_mesh(data, pipe)
        state_b = _pipe_state(params, tx, mesh_pp)
        step_b = make_pipe_videomae_train_step(
            mesh_pp, cfg, mask_cfg, tx, num_microbatches=microbatches
        )
        state_b, metrics_b = step_b(state_b, shard_batch(video, mesh_pp))

        assert float(metrics_b["loss"]) == pytest.approx(
            float(metrics_a["loss"]), abs=2e-5
        )
        flat_a = jax.tree_util.tree_leaves(state_a.params)
        flat_b = jax.tree_util.tree_leaves(state_b.params)
        for la, lb in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-5
            )

    @pytest.mark.parametrize("data,pipe,microbatches,accum",
                             [(2, 4, 2, 2), (1, 4, 1, 4), (2, 2, 2, 2)])
    def test_grad_accum_composes_with_pipeline(self, rng, data, pipe,
                                               microbatches, accum):
        """``grad_accum > 1`` chunks the per-shard batch into sequential
        full pipeline passes; the optimizer step must equal the GSPMD DP
        step on the whole batch (masks are sampled for the full local
        batch before chunking, so the computation is identical)."""
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = _video(rng)

        mesh_dp = make_mesh()
        state_a = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(7)), mesh_dp
        )
        step_a = make_videomae_train_step(mesh_dp, cfg, mask_cfg, tx)
        state_a, metrics_a = step_a(state_a, shard_batch(video, mesh_dp))

        mesh_pp = make_pipe_mesh(data, pipe)
        state_b = _pipe_state(params, tx, mesh_pp)
        step_b = make_pipe_videomae_train_step(
            mesh_pp, cfg, mask_cfg, tx, num_microbatches=microbatches,
            grad_accum=accum,
        )
        state_b, metrics_b = step_b(state_b, shard_batch(video, mesh_pp))

        assert float(metrics_b["loss"]) == pytest.approx(
            float(metrics_a["loss"]), abs=2e-5
        )
        for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-5
            )

    def test_grad_accum_rejects_indivisible_batch(self, rng):
        cfg = _tiny_cfg()
        mesh = make_pipe_mesh(2, 4)
        tx = make_optimizer(OptimConfig(lr=0.1))
        state = _pipe_state(videomae.init_params(jax.random.PRNGKey(0), cfg),
                            tx, mesh)
        step = make_pipe_videomae_train_step(
            mesh, cfg, MaskConfig(sampler="tube", mask_ratio=0.5), tx,
            num_microbatches=1, grad_accum=3,
        )
        with pytest.raises(ValueError, match="grad_accum"):
            step(state, shard_batch(_video(rng), mesh))

    def test_block_params_and_momentum_are_stage_sharded(self, rng):
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        mesh = make_pipe_mesh(2, 4)
        state = _pipe_state(params, tx, mesh)
        step = make_pipe_videomae_train_step(mesh, cfg, mask_cfg, tx,
                                             num_microbatches=2)
        state, _ = step(state, shard_batch(_video(rng), mesh))

        def check(tree, what):
            qkv = tree["encoder"]["attn"]["qkv"]["kernel"]
            spec = qkv.sharding.spec
            assert spec and spec[0] == "pipe", (
                f"{what} encoder depth axis not pipe-sharded: {spec}"
            )
            # each shard holds depth/P layers
            shard_shape = qkv.sharding.shard_shape(qkv.shape)
            assert shard_shape[0] == cfg.depth // 4

        check(state.params, "params")
        # sgd momentum mirrors params via the tree-path suffix mapping
        mom = [l for l in jax.tree_util.tree_leaves_with_path(state.opt_state)
               if "qkv" in "/".join(str(k) for k in l[0])
               and l[1].shape[0] == cfg.depth]
        assert mom, "no stacked qkv momentum leaf found"
        assert mom[0][1].sharding.spec[0] == "pipe"

    def test_multi_step_loss_decreases(self, rng):
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        mesh = make_pipe_mesh(2, 4)
        state = _pipe_state(params, tx, mesh)
        step = make_pipe_videomae_train_step(mesh, cfg, mask_cfg, tx,
                                             num_microbatches=2)
        video = shard_batch(_video(rng), mesh)
        losses = []
        for _ in range(10):
            state, metrics = step(state, video)
            losses.append(float(metrics["loss"]))
        # masks resample each step, so individual losses are noisy —
        # compare window means
        assert np.mean(losses[-3:]) < np.mean(losses[:3])
        assert int(state.step) == 10

    def test_eval_step_matches_gspmd(self, rng):
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = _video(rng)

        mesh_dp = make_mesh()
        state_a = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(7)), mesh_dp
        )
        step_a = make_videomae_train_step(mesh_dp, cfg, mask_cfg, tx)
        m_a = step_a.eval_step(state_a, shard_batch(video, mesh_dp), 3)

        mesh_pp = make_pipe_mesh(2, 4)
        state_b = _pipe_state(params, tx, mesh_pp)
        step_b = make_pipe_videomae_train_step(mesh_pp, cfg, mask_cfg, tx,
                                               num_microbatches=2)
        m_b = step_b.eval_step(state_b, shard_batch(video, mesh_pp), 3)
        assert float(m_b["loss"]) == pytest.approx(float(m_a["loss"]), abs=2e-5)

    def test_random_sampler_matches_gspmd(self, rng):
        """The random sampler also has a fixed per-sample masked count, so
        it pipelines exactly like tube (only seqpar's TIME sharding needs
        tube's per-sheet invariant)."""
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="random", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = _video(rng)

        mesh_dp = make_mesh()
        state_a = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(7)), mesh_dp
        )
        step_a = make_videomae_train_step(mesh_dp, cfg, mask_cfg, tx)
        state_a, metrics_a = step_a(state_a, shard_batch(video, mesh_dp))

        mesh_pp = make_pipe_mesh(2, 4)
        state_b = _pipe_state(params, tx, mesh_pp)
        step_b = make_pipe_videomae_train_step(
            mesh_pp, cfg, mask_cfg, tx, num_microbatches=2
        )
        state_b, metrics_b = step_b(state_b, shard_batch(video, mesh_pp))

        assert float(metrics_b["loss"]) == pytest.approx(
            float(metrics_a["loss"]), abs=2e-5
        )
        for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-5
            )

    def test_rejects_unknown_sampler(self):
        cfg = _tiny_cfg()
        mesh = make_pipe_mesh(2, 4)
        tx = make_optimizer(OptimConfig(lr=0.1))
        with pytest.raises(ValueError, match="sampler"):
            make_pipe_videomae_train_step(
                mesh, cfg, MaskConfig(sampler="block", mask_ratio=0.5), tx
            )

    def test_rejects_indivisible_depth(self):
        import dataclasses

        cfg = dataclasses.replace(_tiny_cfg(), depth=3)
        mesh = make_pipe_mesh(2, 4)
        tx = make_optimizer(OptimConfig(lr=0.1))
        with pytest.raises(ValueError, match="divide over"):
            make_pipe_videomae_train_step(
                mesh, cfg, MaskConfig(sampler="tube", mask_ratio=0.5), tx
            )

    def test_rejects_indivisible_microbatch(self, rng):
        cfg = _tiny_cfg()
        mesh = make_pipe_mesh(2, 4)
        tx = make_optimizer(OptimConfig(lr=0.1))
        state = _pipe_state(videomae.init_params(jax.random.PRNGKey(0), cfg),
                            tx, mesh)
        step = make_pipe_videomae_train_step(
            mesh, cfg, MaskConfig(sampler="tube", mask_ratio=0.5), tx,
            num_microbatches=3,
        )
        with pytest.raises(ValueError, match="num_microbatches"):
            step(state, shard_batch(_video(rng), mesh))

    def test_param_specs_shape(self):
        cfg = _tiny_cfg()
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        specs = pipe_param_specs(params)
        assert specs["encoder"]["attn"]["qkv"]["kernel"][0] == "pipe"
        assert specs["decoder"]["mlp"]["fc1"]["kernel"][0] == "pipe"
        assert specs["patch_embed"]["kernel"] == ()  # replicated
        assert specs["decoder_head"]["kernel"] == ()


class TestTrainerPipeParallel:
    """The trainer routes to the pipeline-parallel step when the mesh has
    a 'pipe' axis (``--mesh data=2,pipe=4``) — same artifact contract."""

    def _cfg(self, frame_corpus, tmp_path, run_id="dev_1_g0_default_0_5"):
        from bvc_tpu.utils.config import TrainConfig

        cfg = TrainConfig(run_id=run_id, savedir=str(tmp_path),
                          n_epoch=1, max_epoch_iters=3, seed=0, log_freq=1)
        cfg.mesh_shape = {"data": 2, "pipe": 4}
        cfg.pipe_microbatches = 2
        cfg.data.jpg_root = frame_corpus
        cfg.data.train_group = "g0"
        cfg.data.num_frames = 4
        cfg.data.tubelet_size = 2
        cfg.data.image_size = 32
        cfg.data.n_trainsamples = 12
        cfg.data.batch_size = 2  # per data shard -> global batch 4
        cfg.data.num_workers = 2
        cfg.data.segment_minutes = 0.02
        cfg.model.image_size = 32
        cfg.model.patch_size = 8
        cfg.model.num_frames = 4
        cfg.model.tubelet_size = 2
        cfg.model.hidden_size = 32
        cfg.model.depth = 4
        cfg.model.num_heads = 4
        cfg.model.decoder_hidden_size = 16
        cfg.model.decoder_depth = 4
        cfg.model.decoder_num_heads = 2
        cfg.model.dtype = "float32"
        cfg.mask.mask_ratio = 0.75
        cfg.optim.lr = 0.01
        return cfg

    def test_trainer_runs_with_pipe_mesh(self, frame_corpus, tmp_path):
        from bvc_tpu.training.trainer_videomae import run_pretraining

        cfg = self._cfg(frame_corpus, tmp_path)
        summary = run_pretraining(cfg)
        assert np.isfinite(summary["train_loss"])
        assert (tmp_path / "csvlog_dev_1_g0_default_0_5.csv").exists()
        assert (tmp_path / "model_dev_1_g0_default_0_5.ckpt").is_dir()

    def test_trainer_rejects_bad_compositions(self, frame_corpus, tmp_path):
        from bvc_tpu.training.trainer_videomae import run_pretraining

        cfg = self._cfg(frame_corpus, tmp_path, "dev_1_g0_default_0_6")
        cfg.param_sharding = "fsdp"
        with pytest.raises(ValueError, match="stage sharding"):
            run_pretraining(cfg)
    def test_trainer_runs_pipe_with_random_sampler(self, frame_corpus,
                                                   tmp_path):
        """``--mask_sampler random`` on a pipe mesh — the CLI-level drive
        of the random-sampler pipeline support."""
        from bvc_tpu.training.trainer_videomae import run_pretraining

        cfg = self._cfg(frame_corpus, tmp_path, "dev_1_g0_default_0_8")
        cfg.mask.sampler = "random"
        summary = run_pretraining(cfg)
        assert np.isfinite(summary["train_loss"])

    def test_trainer_composes_pipe_with_grad_accum(self, frame_corpus,
                                                   tmp_path):
        """grad_accum is NOT redundant on a pipe mesh (VERDICT r4 task 5):
        it multiplies the optimizer-visible batch past one pass's
        activation budget.  The trainer must route it through."""
        from bvc_tpu.training.trainer_videomae import run_pretraining

        cfg = self._cfg(frame_corpus, tmp_path, "dev_1_g0_default_0_7")
        cfg.optim.grad_accum_steps = 2
        cfg.pipe_microbatches = 1  # each accum chunk is 1 row per shard
        summary = run_pretraining(cfg)
        assert np.isfinite(summary["train_loss"])
