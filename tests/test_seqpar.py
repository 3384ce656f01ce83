"""Sequence-parallel VideoMAE (bvc_tpu/parallel/seqpar.py) vs the
single-chip / GSPMD paths.

Beyond-parity capability (SURVEY.md §5 names sequence sharding as the
natural long-clip extension point; the reference itself has none): the
time-sharded step must be the SAME computation as the data-parallel
step — same masks from the same rng, same loss, same updated params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.models import videomae
from bvc_tpu.parallel import make_mesh, shard_batch
from bvc_tpu.parallel.seqpar import (
    make_seq_embed_fn,
    make_seq_mesh,
    make_seq_videomae_train_step,
    shard_seq_batch,
)
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import make_videomae_train_step, place_state
from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig


def _tiny_cfg(num_frames=8):
    return ModelConfig(
        image_size=32, patch_size=8, num_frames=num_frames, tubelet_size=2,
        hidden_size=32, depth=2, num_heads=4,
        decoder_hidden_size=16, decoder_depth=1, decoder_num_heads=2,
        dtype="float32",
    )


def _video(rng, b=8, t=8, s=32):
    return rng.integers(0, 255, (b, t, s, s, 3), dtype=np.uint8)


class TestSeqParallelStep:
    @pytest.mark.parametrize("data,seq", [(2, 4), (4, 2), (1, 4)])
    def test_step_matches_gspmd_data_parallel(self, rng, data, seq):
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

        mesh_sp = make_seq_mesh(data, seq)
        state_b = TrainState.create(params, tx, jax.random.PRNGKey(7))
        step_b = make_seq_videomae_train_step(mesh_sp, cfg, mask_cfg, tx)
        state_b, metrics_b = step_b(state_b, shard_seq_batch(video, mesh_sp))

        assert float(metrics_b["loss"]) == pytest.approx(
            float(metrics_a["loss"]), abs=2e-5
        )
        flat_a = jax.tree_util.tree_leaves(state_a.params)
        flat_b = jax.tree_util.tree_leaves(state_b.params)
        for la, lb in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-5
            )

    def test_multi_step_loss_decreases(self, rng):
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        mesh = make_seq_mesh(2, 4)
        state = TrainState.create(params, tx, jax.random.PRNGKey(7))
        step = make_seq_videomae_train_step(mesh, cfg, mask_cfg, tx)
        video = shard_seq_batch(_video(rng), mesh)
        losses = []
        for _ in range(5):
            state, metrics = step(state, video)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

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

        mesh_sp = make_seq_mesh(2, 4)
        state_b = TrainState.create(params, tx, jax.random.PRNGKey(7))
        step_b = make_seq_videomae_train_step(mesh_sp, cfg, mask_cfg, tx)
        m_b = step_b.eval_step(state_b, shard_seq_batch(video, mesh_sp), 3)
        assert float(m_b["loss"]) == pytest.approx(float(m_a["loss"]), abs=2e-5)

    def test_grad_accum_matches_plain(self, rng):
        # scan-accumulated microbatches must reproduce the single-shot
        # step exactly (same masks: sampled once for the whole local
        # batch before the split)
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = _video(rng)
        mesh = make_seq_mesh(2, 4)

        from bvc_tpu.training.probes import full_grad_probes

        losses = {}
        states = {}
        for accum in (1, 2):
            # place_state copies: the step donates its input state
            state = place_state(
                TrainState.create(params, tx, jax.random.PRNGKey(7)), mesh
            )
            step = make_seq_videomae_train_step(
                mesh, cfg, mask_cfg, tx, grad_accum=accum,
                grad_probes=full_grad_probes("videomae"),
            )
            state, metrics = step(state, shard_seq_batch(video, mesh))
            losses[accum] = float(metrics["loss"])
            states[accum] = state
            # lifted restriction: probes now run on the seq step
            assert any(k not in ("loss",) and "grad" in k for k in metrics)
        assert losses[2] == pytest.approx(losses[1], abs=2e-5)
        for la, lb in zip(
            jax.tree_util.tree_leaves(states[1].params),
            jax.tree_util.tree_leaves(states[2].params),
        ):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-5
            )

    def test_zero1_matches_replicated(self, rng):
        # seqpar x zero1: momentum sharded over 'data', same numerics
        cfg = _tiny_cfg()
        mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.5)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = _video(rng)
        mesh = make_seq_mesh(2, 4)

        results = {}
        for mode in ("replicated", "zero1"):
            state = place_state(
                TrainState.create(params, tx, jax.random.PRNGKey(7)),
                mesh, mode,
            )
            step = make_seq_videomae_train_step(
                mesh, cfg, mask_cfg, tx, param_mode=mode
            )
            losses = []
            for _ in range(3):
                state, metrics = step(state, shard_seq_batch(video, mesh))
                losses.append(float(metrics["loss"]))
            results[mode] = (losses, state)
        np.testing.assert_allclose(
            results["zero1"][0], results["replicated"][0], rtol=1e-5
        )
        # params replicated, at least the big momentum leaves data-sharded
        z_state = results["zero1"][1]
        for leaf in jax.tree_util.tree_leaves(z_state.params):
            assert leaf.sharding.is_fully_replicated
        assert any(
            hasattr(l, "sharding") and not l.sharding.is_fully_replicated
            for l in jax.tree_util.tree_leaves(z_state.opt_state)
        ), "zero1 must shard optimizer state over 'data'"
        for la, lb in zip(
            jax.tree_util.tree_leaves(results["replicated"][1].params),
            jax.tree_util.tree_leaves(z_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=2e-4, atol=2e-5
            )

    def test_rejects_fsdp_tp_param_modes(self):
        mesh = make_seq_mesh(2, 4)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1))
        for mode in ("fsdp", "tp"):
            with pytest.raises(ValueError, match="replicated"):
                make_seq_videomae_train_step(
                    mesh, _tiny_cfg(), MaskConfig(sampler="tube", mask_ratio=0.5),
                    tx, param_mode=mode,
                )

    def test_grad_accum_must_divide_local_rows(self, rng):
        mesh = make_seq_mesh(2, 4)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1))
        cfg = _tiny_cfg()
        step = make_seq_videomae_train_step(
            mesh, cfg, MaskConfig(sampler="tube", mask_ratio=0.5), tx,
            grad_accum=3,
        )
        state = TrainState.create(
            videomae.init_params(jax.random.PRNGKey(0), cfg), tx,
            jax.random.PRNGKey(7),
        )
        with pytest.raises(ValueError, match="divide"):
            # 8 rows / 2 data shards = 4 local rows; 3 does not divide 4
            step(state, shard_seq_batch(_video(rng), mesh))

    def test_rejects_random_sampler(self):
        mesh = make_seq_mesh(2, 4)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1))
        with pytest.raises(ValueError, match="tube"):
            make_seq_videomae_train_step(
                mesh, _tiny_cfg(), MaskConfig(sampler="random", mask_ratio=0.5), tx
            )

    def test_rejects_indivisible_sheets(self):
        mesh = make_seq_mesh(1, 8)  # 4 sheets over 8 shards
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1))
        with pytest.raises(ValueError, match="sheets"):
            make_seq_videomae_train_step(
                mesh, _tiny_cfg(), MaskConfig(sampler="tube", mask_ratio=0.5), tx
            )


class TestSeqParallelEmbed:
    def test_matches_single_chip_embed(self, rng):
        cfg = _tiny_cfg()
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = _video(rng, b=4)
        want = videomae.embed(params, jnp.asarray(video), cfg)
        mesh = make_seq_mesh(2, 4)
        embed_fn = make_seq_embed_fn(mesh, cfg)
        got = embed_fn(params, shard_seq_batch(video, mesh))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


class TestTrainerSeqParallel:
    """The trainer routes to the sequence-parallel step when the mesh has
    a 'seq' axis (``--mesh data=2,seq=4``) — same artifact contract."""

    def test_trainer_runs_with_seq_mesh(self, frame_corpus, tmp_path):
        from bvc_tpu.training.trainer_videomae import run_pretraining
        from bvc_tpu.utils.config import TrainConfig

        cfg = TrainConfig(run_id="dev_1_g0_default_0_3", savedir=str(tmp_path),
                          n_epoch=1, max_epoch_iters=3, seed=0, log_freq=1)
        cfg.mesh_shape = {"data": 2, "seq": 4}
        cfg.data.jpg_root = frame_corpus
        cfg.data.train_group = "g0"
        cfg.data.num_frames = 8
        cfg.data.tubelet_size = 2
        cfg.data.image_size = 32
        cfg.data.n_trainsamples = 12
        cfg.data.batch_size = 2  # x2 data shards -> global batch 4
        cfg.data.num_workers = 2
        cfg.data.segment_minutes = 0.02
        cfg.model.image_size = 32
        cfg.model.patch_size = 8
        cfg.model.num_frames = 8
        cfg.model.tubelet_size = 2
        cfg.model.hidden_size = 32
        cfg.model.depth = 2
        cfg.model.num_heads = 4
        cfg.model.decoder_hidden_size = 16
        cfg.model.decoder_depth = 1
        cfg.model.decoder_num_heads = 2
        cfg.model.dtype = "float32"
        cfg.mask.mask_ratio = 0.75
        cfg.optim.lr = 0.01
        summary = run_pretraining(cfg)
        assert np.isfinite(summary["train_loss"])
        assert (tmp_path / "csvlog_dev_1_g0_default_0_3.csv").exists()
        assert (tmp_path / "model_dev_1_g0_default_0_3.ckpt").is_dir()

    def test_trainer_rejects_bad_compositions(self, frame_corpus, tmp_path):
        from bvc_tpu.training.trainer_videomae import run_pretraining
        from bvc_tpu.utils.config import TrainConfig

        def cfg_with(**kw):
            cfg = TrainConfig(run_id="dev_1_g0_default_0_4",
                              savedir=str(tmp_path), n_epoch=1,
                              max_epoch_iters=1, seed=0)
            cfg.mesh_shape = {"data": 2, "seq": 4}
            cfg.data.jpg_root = frame_corpus
            cfg.data.train_group = "g0"
            cfg.model.image_size = 32
            cfg.model.patch_size = 8
            cfg.model.num_frames = 8
            cfg.model.tubelet_size = 2
            cfg.model.hidden_size = 32
            cfg.model.depth = 2
            cfg.model.num_heads = 4
            cfg.model.dtype = "float32"
            for k, v in kw.items():
                keys = k.split(".")
                obj = cfg
                for kk in keys[:-1]:
                    obj = getattr(obj, kk)
                setattr(obj, keys[-1], v)
            return cfg

        # fsdp/tp stay rejected (they shard the params the ring step holds
        # whole); zero1 + grad accumulation are supported as of round 4 —
        # equivalence covered in TestSeqParallelStep
        with pytest.raises(ValueError, match="replicated"):
            run_pretraining(cfg_with(param_sharding="fsdp"))


class TestSeqParallelExtraction:
    """Extraction routes to the sequence-parallel embed when the mesh has
    a 'seq' axis (cli/compute_embeddings --mesh data=2,seq=4 →
    evalbench/extract.py _seq_jit_embed)."""

    class _FakeDs:
        def __init__(self, n, shape):
            self.n, self.shape = n, shape

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            clip = rng.integers(0, 255, self.shape).astype(np.float32)
            return clip, f"v{i:03d}.mp4"

    def test_untrained_embed_routes_and_matches_single_device(self):
        from bvc_tpu.evalbench.extract import untrained_embed_fn

        cfg = _tiny_cfg()
        fn_seq = untrained_embed_fn("videomae", cfg, seed=0,
                                    mesh=make_seq_mesh(2, 4))
        fn_one = untrained_embed_fn("videomae", cfg, seed=0, mesh=None)
        video = np.random.default_rng(0).integers(
            0, 255, (4, 8, 32, 32, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(fn_seq(video)), np.asarray(fn_one(video)),
            rtol=1e-4, atol=1e-5,
        )
        assert fn_seq.feature_dim == cfg.hidden_size

    def test_extract_embeddings_over_seq_mesh(self):
        from bvc_tpu.evalbench.extract import (
            extract_embeddings, untrained_embed_fn,
        )

        cfg = _tiny_cfg()
        mesh_sp = make_seq_mesh(2, 4)
        fn = untrained_embed_fn("videomae", cfg, seed=0, mesh=mesh_sp)
        ds = self._FakeDs(7, (8, 32, 32, 3))  # 7 rows: last batch pads
        fnames, embs = extract_embeddings(fn, ds, batch_size=4,
                                          mesh=mesh_sp, num_workers=2)
        assert len(fnames) == 7
        assert embs.shape == (7, cfg.hidden_size)

    def test_jepa_seq_embed_matches_single_device(self):
        # round-4 lift: jepa extraction also rides the 'seq' mesh (ring
        # attention + psum'd token mean), matching jepa.embed exactly
        from bvc_tpu.evalbench.extract import untrained_embed_fn
        from bvc_tpu.models import jepa
        from bvc_tpu.utils.config import ModelConfig

        jcfg = ModelConfig(family="jepa", image_size=32, patch_size=8,
                           num_frames=8, tubelet_size=1, hidden_size=16,
                           depth=2, num_heads=2, dtype="float32")
        rng = np.random.default_rng(5)
        video = rng.integers(0, 255, (4, 8, 32, 32, 3), dtype=np.uint8
                             ).astype(np.float32)
        mesh_sp = make_seq_mesh(2, 4)
        fn_seq = untrained_embed_fn("jepa", jcfg, seed=0, mesh=mesh_sp)
        params = jepa.init_encoder_params(jax.random.PRNGKey(0), jcfg)
        want = jepa.embed(params, jnp.asarray(video), jcfg)
        np.testing.assert_allclose(
            np.asarray(fn_seq(video)), np.asarray(want), rtol=1e-4, atol=1e-5
        )
        assert fn_seq.feature_dim == jcfg.hidden_size

    def test_simclr_family_raises(self):
        from bvc_tpu.evalbench.extract import untrained_embed_fn
        from bvc_tpu.utils.config import ModelConfig

        scfg = ModelConfig(family="simclr", architecture="resnet18",
                           num_frames=2, tubelet_size=1)
        with pytest.raises(ValueError, match="seq"):
            untrained_embed_fn("simclr", scfg, mesh=make_seq_mesh(2, 4))


class TestProcessLocalSeqGuard:
    """Host-feed paths require each seq ring within one process
    (parallel/seqpar.py require_process_local_seq): hosts hand over
    full-time-axis batches, so a ring spanning processes cannot be fed."""

    def test_ring_locality_predicate(self):
        from bvc_tpu.parallel.seqpar import _rings_process_local

        # mesh [data=2, seq=4]: seq within a process -> ok
        ok = np.array([[0, 0, 0, 0], [1, 1, 1, 1]])
        assert _rings_process_local(ok, seq_ax=1)
        # seq spanning processes -> rejected
        bad = np.array([[0, 0, 1, 1], [0, 0, 1, 1]])
        assert not _rings_process_local(bad, seq_ax=1)
        # data axis spanning processes is fine as long as rings are local
        ok2 = np.array([[0, 0, 0, 0], [1, 1, 1, 1]])
        assert _rings_process_local(ok2.T, seq_ax=0)

    def test_single_process_short_circuits(self):
        from bvc_tpu.parallel.seqpar import require_process_local_seq

        require_process_local_seq(make_seq_mesh(2, 4))  # no raise

    def test_multiprocess_local_rings_pass(self, monkeypatch):
        import jax as _jax

        from bvc_tpu.parallel import seqpar

        monkeypatch.setattr(seqpar.jax, "process_count", lambda: 2)
        # all CPU devices report process_index 0 -> every ring is local
        seqpar.require_process_local_seq(make_seq_mesh(2, 4))

    def test_gather_output_matches_sharded_output(self):
        """gather_output=True (the multi-host replicated mode) returns the
        same values as the P('data')-sharded default."""
        cfg = _tiny_cfg()
        mesh_sp = make_seq_mesh(2, 4)
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = np.random.default_rng(1).integers(
            0, 255, (4, 8, 32, 32, 3)).astype(np.float32)
        placed = shard_seq_batch(video, mesh_sp)
        a = make_seq_embed_fn(mesh_sp, cfg)(params, placed)
        b = make_seq_embed_fn(mesh_sp, cfg, gather_output=True)(params, placed)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


class TestNonVideomaeTrainersRejectSeqMesh:
    """JEPA/SimCLR clips fit one chip; a 'seq' (or 'pipe') axis would
    replicate their whole step across it and inflate global_batch — the
    trainers refuse both up front (ADVICE r4)."""

    @pytest.mark.parametrize("family", ["jepa", "simclr"])
    @pytest.mark.parametrize("axis", ["seq", "pipe"])
    def test_raises(self, family, axis):
        from bvc_tpu.utils.config import TrainConfig

        cfg = TrainConfig(run_id="dev_1_g0_default_0_5", savedir="/tmp/x")
        cfg.mesh_shape = {"data": 2, axis: 4}
        if family == "jepa":
            from bvc_tpu.training.trainer_jepa import run_pretraining
        else:
            from bvc_tpu.training.trainer_simclr import run_pretraining
        with pytest.raises(ValueError, match="videomae-only"):
            run_pretraining(cfg)
