"""SimCLR family: InfoNCE quirk parity, ResNet, train step, end-to-end stage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.models import resnet
from bvc_tpu.objectives.contrastive import (
    info_nce_loss,
    interleaved_pair_masks,
    standard_pair_masks,
)
from bvc_tpu.parallel import make_mesh, shard_batch
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import make_simclr_train_step, place_state
from bvc_tpu.utils.config import OptimConfig, TrainConfig


class TestMasks:
    def test_special_matrix_parity(self):
        # get_special_matrix(4): 1 where |i-j|==1 (pretrain_simclr.py:86-91)
        pos, neg = interleaved_pair_masks(4)
        np.testing.assert_array_equal(
            pos.astype(int),
            [[0, 1, 0, 0], [1, 0, 1, 0], [0, 1, 0, 1], [0, 0, 1, 0]],
        )
        # neg = ~(pos | eye)
        np.testing.assert_array_equal(
            neg.astype(int),
            [[0, 0, 1, 1], [0, 0, 0, 1], [1, 0, 0, 0], [1, 1, 0, 0]],
        )

    def test_standard_masks(self):
        pos, _ = standard_pair_masks(4)
        np.testing.assert_array_equal(
            pos.astype(int),
            [[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
        )


class TestInfoNCE:
    def test_parity_mode_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((6, 8)).astype(np.float32)
        loss = float(info_nce_loss(jnp.array(feats), temperature=0.1, mode="parity"))
        # independent numpy computation of the reference's
        # logsumexp(all negatives) - mean(positives)
        f = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        sim = (f @ f.T) / 0.1
        pos, neg = interleaved_pair_masks(6)
        negs = sim[neg]
        m = negs.max()
        log_z = m + np.log(np.exp(negs - m).sum())
        expected = log_z - sim[pos].mean()
        assert loss == pytest.approx(float(expected), rel=1e-5)

    def test_standard_mode_decreases_with_aligned_pairs(self):
        # perfectly aligned pairs + orthogonal others → low loss
        e = np.eye(4, 8, dtype=np.float32)
        aligned = np.repeat(e[:2], 2, axis=0)  # pairs identical
        spread = np.eye(4, 8, dtype=np.float32)
        l_aligned = float(info_nce_loss(jnp.array(aligned), mode="standard"))
        l_spread = float(info_nce_loss(jnp.array(spread), mode="standard"))
        assert l_aligned < l_spread


class TestResNet:
    def test_forward_shapes_and_stats_update(self):
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 64)
        x = jnp.array(np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32)
        out, new_stats = resnet.apply(params, stats, x, "resnet18", training=True)
        assert out.shape == (2, 64)
        assert not np.allclose(
            np.asarray(new_stats["stem"]["mean"]), np.asarray(stats["stem"]["mean"])
        )

    def test_eval_uses_running_stats(self):
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 32)
        x = jnp.ones((2, 32, 32, 3))
        out1, s1 = resnet.apply(params, stats, x, "resnet18", training=False)
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: np.allclose(a, b), s1, stats)
        )

    def test_headless_features(self):
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 32)
        x = jnp.ones((1, 32, 32, 3))
        feats, _ = resnet.apply(params, stats, x, "resnet18", with_head=False)
        assert feats.shape == (1, 512)

    def test_resnet50_bottleneck(self):
        params, stats = resnet.init_params(jax.random.PRNGKey(1), "resnet50", 32)
        x = jnp.ones((1, 32, 32, 3))
        feats, _ = resnet.apply(params, stats, x, "resnet50", with_head=False)
        assert feats.shape == (1, 2048)

    def test_per_replica_bn_matches_independent_halves(self):
        # bn_groups=2 must equal applying BN to each half-batch
        # separately (the reference's per-rank DDP BatchNorm), with the
        # running stats following group 0 (torch broadcast_buffers).
        # _bn-level check is EXACT:
        from bvc_tpu.models.resnet import _bn

        p = {"scale": jnp.ones((3,)), "bias": jnp.zeros((3,))}
        s = {"mean": jnp.zeros((3,)), "var": jnp.ones((3,))}
        xb = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 5, 5, 3)), jnp.float32)
        yg, nsg = _bn(xb, p, s, True, groups=2)
        ya, nsa = _bn(xb[:2], p, s, True)
        yb, _ = _bn(xb[2:], p, s, True)
        np.testing.assert_allclose(np.asarray(yg[:2]), np.asarray(ya), atol=1e-6)
        np.testing.assert_allclose(np.asarray(yg[2:]), np.asarray(yb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(nsg["mean"]),
                                   np.asarray(nsa["mean"]), atol=1e-6)

        # network-level check is LOOSE: XLA CPU convs accumulate in a
        # batch-size-dependent order, so a [4]-batch run drifts ~1e-3
        # from two [2]-batch runs even for per-sample ops
        params, stats = resnet.init_params(jax.random.PRNGKey(2), "resnet18", 32)
        x = jnp.array(
            np.random.default_rng(1).standard_normal((4, 32, 32, 3)), jnp.float32)
        out_g, ns_g = resnet.apply(params, stats, x, "resnet18",
                                   training=True, bn_groups=2)
        out_a, ns_a = resnet.apply(params, stats, x[:2], "resnet18", training=True)
        np.testing.assert_allclose(np.asarray(out_g[:2]), np.asarray(out_a),
                                   rtol=0.05, atol=0.01)
        np.testing.assert_allclose(
            np.asarray(ns_g["stem"]["mean"]), np.asarray(ns_a["stem"]["mean"]),
            rtol=1e-3, atol=1e-4)
        # and clearly differs from global-stat normalization
        out_1, _ = resnet.apply(params, stats, x, "resnet18", training=True)
        assert float(np.abs(np.asarray(out_g) - np.asarray(out_1)).max()) > 0.01


class TestSimclrTrainStep:
    def test_loss_decreases(self):
        mesh = make_mesh()
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 32)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1), extra=stats), mesh
        )
        step = make_simclr_train_step(mesh, "resnet18", tx)
        batch = shard_batch(
            np.random.default_rng(0).standard_normal((8, 2, 32, 32, 3)).astype(np.float32),
            mesh,
        )
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_per_replica_bn_stats_mode(self):
        # bn_stats='per_replica' (reference DDP BN parity) must run on the
        # 8-device mesh and produce a finite loss DIFFERENT from the
        # global-stat default (the stats really changed scope)
        mesh = make_mesh()
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 32)
        video = np.random.default_rng(0).standard_normal(
            (16, 2, 32, 32, 3)).astype(np.float32)
        out = {}
        for mode in ("global", "per_replica"):
            state = place_state(
                TrainState.create(params, tx, jax.random.PRNGKey(1), extra=stats),
                mesh,
            )
            step = make_simclr_train_step(mesh, "resnet18", tx, bn_stats=mode)
            state, metrics = step(state, shard_batch(video, mesh))
            out[mode] = float(metrics["loss"])
        assert all(np.isfinite(v) for v in out.values())
        assert out["global"] != out["per_replica"]

    def test_per_replica_bn_raises_on_indivisible_batch(self):
        # asking for reference-DDP BN parity with a batch that cannot be
        # split into per-shard stat groups must raise, not silently fall
        # back to SyncBN semantics
        import pytest

        mesh = make_mesh()
        if mesh.shape.get("data", 1) <= 1:
            pytest.skip("needs a multi-device data axis")
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 32)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1), extra=stats),
            mesh,
        )
        step = make_simclr_train_step(mesh, "resnet18", tx, bn_stats="per_replica")
        bad = np.zeros((2, 2, 32, 32, 3), np.float32)  # 2*B=4 vs 8 shards
        with pytest.raises(ValueError, match="per_replica"):
            step(state, bad)


class TestSimclrTrainerEndToEnd:
    def test_stage(self, frame_corpus, tmp_path):
        from bvc_tpu.training.trainer_simclr import run_pretraining

        cfg = TrainConfig(run_id="dev_1_g0_default_0_0", savedir=str(tmp_path),
                          n_epoch=1, max_epoch_iters=2, seed=0, log_freq=1)
        cfg.model.family = "simclr"
        cfg.model.architecture = "resnet18"
        cfg.model.pred_emb_dim = 32
        cfg.data.jpg_root = frame_corpus
        cfg.data.train_group = "g0"
        cfg.data.interval = 5
        cfg.data.image_size = 32
        cfg.data.n_trainsamples = 20
        cfg.data.batch_size = 1
        cfg.data.num_workers = 4
        cfg.data.segment_minutes = 0.02
        cfg.data.augs = "cjo"
        cfg.optim.lr = 0.01
        s = run_pretraining(cfg)
        assert np.isfinite(s["train_loss"])
        csv = (tmp_path / "csvlog_dev_1_g0_default_0_0.csv").read_text().splitlines()
        assert csv[0] == "epoch,itr,train loss,grad-conv1,grad-fc0,time (ms)"


class TestPerReplicaNegatives:
    def test_replica_scoping_masks_cross_shard_pairs(self):
        from bvc_tpu.objectives.contrastive import info_nce_loss
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        feats = jnp.array(rng.standard_normal((8, 4)), jnp.float32)
        # 2 replicas of 2 samples (4 rows each)
        ids = jnp.array([0, 0, 0, 0, 1, 1, 1, 1])
        scoped = float(info_nce_loss(feats, 0.1, "parity", replica_ids=ids,
                                     n_replicas=2))
        global_ = float(info_nce_loss(feats, 0.1, "parity"))
        assert scoped != global_
        # reference semantics: each rank computes its own loss
        # (logsumexp over ITS negatives − mean of ITS positives) and DDP
        # averages — not a pooled logsumexp over all replicas' negatives
        f = np.asarray(feats)
        f = f / np.linalg.norm(f, axis=-1, keepdims=True)
        sim = (f @ f.T) / 0.1
        i = np.arange(8)[:, None]; j = np.arange(8)[None, :]
        per_rank = []
        for r in (0, 1):
            in_r = (i // 4 == r) & (j // 4 == r)
            pos = (np.abs(i - j) == 1) & in_r
            neg = ~((np.abs(i - j) == 1) | (i == j)) & in_r
            m = sim[neg].max()
            log_z = m + np.log(np.exp(sim[neg] - m).sum())
            per_rank.append(log_z - sim[pos].mean())
        assert scoped == pytest.approx(float(np.mean(per_rank)), rel=1e-5)

    def test_step_with_per_replica(self):
        from bvc_tpu.training.steps import make_simclr_train_step
        from bvc_tpu.parallel import make_mesh, shard_batch
        from bvc_tpu.training.state import TrainState
        from bvc_tpu.training.optim import make_optimizer
        from bvc_tpu.utils.config import OptimConfig

        # 4-shard mesh → 2 samples per replica (a 1-sample replica has no
        # negatives at all and the loss degenerates to -inf, as it would
        # in the reference at per-GPU batch 1)
        mesh = make_mesh({"data": 4}, jax.devices()[:4])
        tx = make_optimizer(OptimConfig(lr=0.01))
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 16)
        from bvc_tpu.training.steps import place_state

        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1), extra=stats), mesh
        )
        step = make_simclr_train_step(mesh, "resnet18", tx, negatives="per_replica")
        batch = shard_batch(
            np.random.default_rng(0).standard_normal((8, 2, 32, 32, 3)).astype(np.float32),
            mesh,
        )
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_blocks_match_replica_ids_path(self):
        # VERDICT r2 #6: the shard_map per-block formulation must equal
        # the replicated-matrix replica_ids path to 1e-6, in both modes
        from bvc_tpu.objectives.contrastive import (
            info_nce_loss,
            per_replica_info_nce_sharded,
        )
        from bvc_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh()  # 8-device data mesh
        S = mesh.shape["data"]
        rng = np.random.default_rng(1)
        feats_np = rng.standard_normal((S * 4, 16)).astype(np.float32)
        rows_per = feats_np.shape[0] // S
        ids = jnp.repeat(jnp.arange(S), rows_per)
        feats = shard_batch(feats_np, mesh)
        for mode in ("parity", "standard"):
            ref = float(info_nce_loss(jnp.asarray(feats_np), 0.1, mode,
                                      replica_ids=ids, n_replicas=S))
            got = float(jax.jit(
                lambda f: per_replica_info_nce_sharded(f, mesh, 0.1, mode)
            )(feats))
            assert got == pytest.approx(ref, abs=1e-6), mode

    def test_sharded_step_loss_matches_replica_ids_step(self):
        # the wired train step (which now routes per_replica through
        # shard_map) must produce the same first-step loss as computing
        # the replica_ids formulation on the same features
        from bvc_tpu.objectives.contrastive import info_nce_loss

        mesh = make_mesh({"data": 4}, jax.devices()[:4])
        tx = make_optimizer(OptimConfig(lr=0.01))
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 16)
        video = np.random.default_rng(0).standard_normal(
            (8, 2, 32, 32, 3)).astype(np.float32)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1), extra=stats), mesh
        )
        step = make_simclr_train_step(mesh, "resnet18", tx, negatives="per_replica")
        _, metrics = step(state, shard_batch(video, mesh))
        # recompute the loss on the same features with the segment path
        from bvc_tpu.models.videomae import normalize_on_device

        x = np.asarray(jax.device_get(normalize_on_device(jnp.asarray(video))))
        x = x.reshape(16, 32, 32, 3)
        feats, _ = resnet.apply(params, stats, jnp.asarray(x), "resnet18",
                                training=True)
        ids = jnp.repeat(jnp.arange(4), 4)
        ref = float(info_nce_loss(feats, 0.1, "parity", replica_ids=ids,
                                  n_replicas=4))
        assert float(metrics["loss"]) == pytest.approx(ref, abs=2e-5)


class TestToyboxSweep:
    def test_proc_result_folder_tb(self, tmp_path):
        import pandas as pd
        from bvc_tpu.evalbench.evaluators import proc_result_folder_tb

        rng = np.random.default_rng(0)
        fnames = [f"{c}_{i:02d}_pivothead_{t}.mp4"
                  for c in ["cat", "dog"] for i in range(6) for t in ["rxplus"]]
        centers = rng.standard_normal((2, 6)) * 5
        lab = [f.split("_")[0] for f in fnames]
        lab_idx = {l: i for i, l in enumerate(sorted(set(lab)))}
        X = np.stack([centers[lab_idx[l]] + 0.05 * rng.standard_normal(6) for l in lab])
        df = pd.DataFrame(X, columns=[f"dim{i}" for i in range(6)])
        df["fnames"] = fnames
        df.to_csv(tmp_path / "embeddings_dev_1_g0_default_0_0.csv", index=False)
        out = proc_result_folder_tb(str(tmp_path), "tb_cat", iter_per_stage=10,
                                    n_jobs=1, exemplar=True)
        assert len(out) == 1
        assert out["category"].iloc[0] == 1.0


class TestSimclrResume:
    def test_kill_and_resume(self, frame_corpus, tmp_path):
        from bvc_tpu.training.checkpoint import load_meta
        from bvc_tpu.training.trainer_simclr import run_pretraining
        from bvc_tpu.utils import TrainConfig

        rid = "na_1_g0_default_0_8"

        def cfg_for():
            cfg = TrainConfig(run_id=rid, savedir=str(tmp_path),
                              n_epoch=1, max_epoch_iters=2, seed=0, log_freq=1)
            cfg.model.family = "simclr"
            cfg.model.architecture = "resnet18"
            cfg.model.pred_emb_dim = 16
            cfg.data.jpg_root = frame_corpus
            cfg.data.train_group = "g0"
            cfg.data.num_frames = 2
            cfg.data.interval = 5
            cfg.data.image_size = 32
            cfg.data.n_trainsamples = 20
            cfg.data.batch_size = 1
            cfg.data.num_workers = 0
            cfg.data.segment_minutes = 0.02
            cfg.data.augs = "c"
            cfg.data.crop_scale = (1.0, 1.0)
            cfg.optim.lr = 0.01
            return cfg

        cfg = cfg_for()
        cfg.save_every_epoch = True
        s1 = run_pretraining(cfg)
        assert load_meta(s1["checkpoint"])["epoch"] == 1

        cfg2 = cfg_for()
        cfg2.n_epoch = 2
        cfg2.resume = True
        s2 = run_pretraining(cfg2)
        meta2 = load_meta(s2["checkpoint"])
        assert meta2["epoch"] == 2
        csv = (tmp_path / f"csvlog_{rid}.csv").read_text().splitlines()
        epochs = [row.split(",")[0] for row in csv[1:]]
        assert "1" in epochs and "2" in epochs and epochs == sorted(epochs)

        s3 = run_pretraining(cfg2)
        assert load_meta(s3["checkpoint"])["epoch"] == 2
        assert load_meta(s3["checkpoint"])["train_loss"] == meta2["train_loss"]


class TestPerReplicaVectorized:
    def test_segment_path_matches_unrolled_loop(self):
        """The vectorized per-replica parity loss equals the direct
        per-replica formula (reference per-rank loss + DDP grad mean)."""
        import jax.numpy as jnp
        from jax.scipy.special import logsumexp

        from bvc_tpu.objectives.contrastive import (
            _cosine_matrix,
            info_nce_loss,
            interleaved_pair_masks,
        )

        rng = np.random.default_rng(0)
        B, R = 16, 4
        feats = jnp.asarray(rng.standard_normal((2 * B, 8)), jnp.float32)
        replica_ids = jnp.asarray(np.repeat(np.arange(B) // (B // R), 2))

        n = feats.shape[0]
        sim = _cosine_matrix(feats) / 0.1
        pos_np, neg_np = interleaved_pair_masks(n)
        same = replica_ids[:, None] == replica_ids[None, :]
        neg = jnp.asarray(neg_np) & same
        pos = jnp.asarray(pos_np) & same
        losses = []
        for r in range(R):
            in_r = replica_ids[:, None] == r
            log_z = logsumexp(jnp.where(neg & in_r, sim, -jnp.inf).reshape(-1))
            p = pos & in_r
            pm = jnp.sum(jnp.where(p, sim, 0.0)) / jnp.maximum(jnp.sum(p), 1)
            losses.append(log_z - pm)
        want = float(jnp.mean(jnp.stack(losses)))
        got = float(info_nce_loss(feats, 0.1, "parity", replica_ids, R))
        assert got == pytest.approx(want, abs=1e-5)
