"""Parallelism semantics: shard_map collectives and parameter-sharding
mode equivalence for the full train step."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from bvc_tpu.models import videomae
from bvc_tpu.parallel import make_mesh, shard_batch
from bvc_tpu.parallel.collectives import all_gather_grad, psum_scalar
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import make_videomae_train_step, place_state
from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig


class TestShardMapCollectives:
    def test_all_gather_grad_forward_and_backward(self):
        mesh = make_mesh()

        @functools.partial(
            shard_map, mesh=mesh, in_specs=P("data"), out_specs=P()
        )
        def gather_loss(x):
            full = all_gather_grad(x, "data")  # [16] on every shard
            return psum_scalar(jnp.sum(full * full), "data")

        x = jnp.arange(16, dtype=jnp.float32)
        loss = gather_loss(x)
        assert float(loss) == pytest.approx(float(jnp.sum(x * x)))
        # backward: d/dx sum(x^2) = 2x, reduced correctly back to shards
        g = jax.grad(lambda v: gather_loss(v))(x)
        np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), rtol=1e-6)

    def test_psum_scalar_is_mean(self):
        mesh = make_mesh()

        @functools.partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
        def mean_loss(x):
            return psum_scalar(jnp.mean(x), "data")

        x = jnp.arange(8, dtype=jnp.float32)
        assert float(mean_loss(x)) == pytest.approx(3.5)


class TestParamShardingModes:
    """The same training computation under replicated / FSDP / TP layouts
    must produce identical losses — sharding is an execution detail."""

    def _run(self, mesh, param_mode, steps=3):
        cfg = ModelConfig(
            image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
            hidden_size=32, depth=2, num_heads=4,
            decoder_hidden_size=16, decoder_depth=1, decoder_num_heads=2,
            dtype="float32",
        )
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh, param_mode
        )
        step = make_videomae_train_step(
            mesh, cfg, MaskConfig(mask_ratio=0.75), tx, param_mode
        )
        data_size = mesh.shape["data"]
        video = np.random.default_rng(0).standard_normal(
            (2 * data_size, 4, 32, 32, 3)
        ).astype(np.float32)
        batch = shard_batch(video, mesh)
        losses = []
        for _ in range(steps):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        return losses

    def test_fsdp_matches_replicated(self):
        mesh = make_mesh()
        a = self._run(mesh, "replicated")
        b = self._run(mesh, "fsdp")
        np.testing.assert_allclose(a, b, rtol=1e-4)

    def test_zero1_matches_replicated(self):
        # ZeRO-1: replicated params, data-sharded optimizer state — same
        # losses, momentum memory sharded
        mesh = make_mesh()
        a = self._run(mesh, "replicated")
        b = self._run(mesh, "zero1")
        np.testing.assert_allclose(a, b, rtol=1e-4)

    def test_zero1_shards_opt_state_only(self):
        mesh = make_mesh()
        cfg = ModelConfig(
            image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
            hidden_size=32, depth=2, num_heads=4,
            decoder_hidden_size=16, decoder_depth=1, decoder_num_heads=2,
            dtype="float32",
        )
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh, "zero1"
        )
        # every param fully replicated on all devices
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.sharding.is_fully_replicated
        # at least the big momentum leaves are sharded over 'data'
        sharded = [
            leaf for leaf in jax.tree_util.tree_leaves(state.opt_state)
            if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
        ]
        assert sharded, "zero1 must shard optimizer state"
        # and the step runs + updates params
        step = make_videomae_train_step(
            mesh, cfg, MaskConfig(mask_ratio=0.75), tx, "zero1"
        )
        video = np.random.default_rng(0).standard_normal(
            (16, 4, 32, 32, 3)).astype(np.float32)
        state2, metrics = step(state, shard_batch(video, mesh))
        assert np.isfinite(float(metrics["loss"]))

    def test_fsdp_state_checkpoint_roundtrip_single_process(self, tmp_path):
        # single-process FSDP state (sharded over 8 local devices, fully
        # addressable) goes through save_checkpoint's host-gather path;
        # the restored tree must equal the saved one
        from bvc_tpu.training.checkpoint import load_checkpoint, save_checkpoint

        mesh = make_mesh()
        cfg = ModelConfig(
            image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
            hidden_size=32, depth=2, num_heads=4,
            decoder_hidden_size=16, decoder_depth=1, decoder_num_heads=2,
            dtype="float32",
        )
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh, "fsdp"
        )
        step = make_videomae_train_step(
            mesh, cfg, MaskConfig(mask_ratio=0.75), tx, "fsdp"
        )
        video = np.random.default_rng(0).standard_normal(
            (16, 4, 32, 32, 3)).astype(np.float32)
        state, _ = step(state, shard_batch(video, mesh))
        ck = tmp_path / "model_fsdp.ckpt"
        save_checkpoint(ck, {"model_state_dict": state.params,
                             "opt": state.opt_state})
        restored = load_checkpoint(ck)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(state.params))[0],
            jax.tree_util.tree_flatten_with_path(
                restored["model_state_dict"])[0],
        ):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tp_matches_replicated(self):
        mesh_tp = make_mesh({"data": 4, "model": 2})
        mesh_dp = make_mesh({"data": 4}, devices=jax.devices()[:4])
        # same per-step batch of 8 clips in both runs
        a = self._run(mesh_dp, "replicated")

        # tp run needs its own batch built over the 4-wide data axis
        b = self._run(mesh_tp, "tp")
        np.testing.assert_allclose(a, b, rtol=1e-4)

    def test_opt_state_sharding_follows_tree_path_not_shape(self):
        """Two SAME-SHAPE params under different TP rules (qkv column- vs
        proj row-parallel) must get distinct optimizer-state shardings —
        a (shape, dtype) first-match map would silently share one."""
        from bvc_tpu.training.steps import _tree_shardings

        mesh = make_mesh({"data": 4, "model": 2})
        D = 8  # square kernels: qkv [D, D] and proj [D, D] identical shape
        params = {
            "blocks": {
                "attn": {
                    "qkv": {"kernel": jnp.ones((D, D))},
                    "proj": {"kernel": jnp.ones((D, D))},
                }
            }
        }
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        state = TrainState.create(params, tx, jax.random.PRNGKey(0))
        sh = _tree_shardings(state, mesh, "tp")
        p_sh = sh.params["blocks"]["attn"]
        assert p_sh["qkv"]["kernel"].spec == P(None, "model")   # column
        assert p_sh["proj"]["kernel"].spec == P("model", None)  # row
        # the momentum trace must mirror each param's OWN sharding
        trace = None
        for entry in sh.opt_state:
            if hasattr(entry, "trace"):
                trace = entry.trace["blocks"]["attn"]
        assert trace is not None
        assert trace["qkv"]["kernel"].spec == P(None, "model")
        assert trace["proj"]["kernel"].spec == P("model", None)
        # scalars (e.g. nothing params-shaped) stay replicated: place and
        # run one no-op check that the state actually materialises
        placed = place_state(state, mesh, "tp")
        for got, want in zip(
            jax.tree_util.tree_leaves(placed.opt_state),
            jax.tree_util.tree_leaves(sh.opt_state),
        ):
            assert got.sharding.spec == want.spec

    def test_custom_layout_requires_target_sh_when_targets_exist(self):
        """ADVICE r4: a state carrying target_params (JEPA) with no
        target_sh must fail loudly at sharding-construction time, not as
        a device_put tree mismatch later."""
        import dataclasses

        from jax.sharding import NamedSharding

        from bvc_tpu.training.steps import tree_shardings_from_param_shardings

        mesh = make_mesh()
        params = {"w": jnp.ones((4, 4))}
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05))
        state = TrainState.create(params, tx, jax.random.PRNGKey(0))
        state = dataclasses.replace(
            state, target_params=jax.tree_util.tree_map(jnp.copy, params))
        p_sh = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)
        with pytest.raises(ValueError, match="target_sh"):
            tree_shardings_from_param_shardings(state, mesh, p_sh)
        # with target_sh given it succeeds
        sh = tree_shardings_from_param_shardings(
            state, mesh, p_sh, target_sh=p_sh)
        assert sh.target_params["w"].spec == P()
