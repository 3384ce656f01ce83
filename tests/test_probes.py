"""Opt-in fuller grad_logger stats (VERDICT r2 #9).

Parity targets: the reference's family-specific ``grad_logger`` meters —
``generative/loggingtools.py:98-119`` (3 named VideoMAE layers),
``predictive/loggingtools.py:98-112`` (all non-bias weights, first/last
qkv), ``contrastive/loggingtools.py:98-114`` (conv1/fc.0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bvc_tpu.training.probes import full_grad_probes, per_layer_weight_norms
from bvc_tpu.utils.config import ModelConfig


def _norm(x):
    return float(np.linalg.norm(np.asarray(x, np.float64).ravel()))


def _tree_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return float(np.sqrt(sum(np.sum(np.asarray(l, np.float64) ** 2) for l in leaves)))


class TestVideomaeProbes:
    def test_meter_over_named_layers(self):
        from bvc_tpu.models import videomae

        cfg = ModelConfig(family="videomae", image_size=32, patch_size=8,
                          num_frames=4, tubelet_size=2, hidden_size=16,
                          depth=2, num_heads=2, decoder_hidden_size=8,
                          decoder_depth=1, decoder_num_heads=2)
        grads = videomae.init_params(jax.random.PRNGKey(0), cfg)
        probes = full_grad_probes("videomae")
        vals = {
            k: float(jax.jit(fn)(grads)) for k, fn in probes.items()
        }
        named = [_tree_norm(grads["patch_embed"]),
                 _tree_norm(grads["enc_to_dec"]),
                 _tree_norm(grads["decoder_head"])]
        assert vals["gstat_avg"] == pytest.approx(np.mean(named), rel=1e-5)
        assert vals["gstat_min"] == pytest.approx(np.min(named), rel=1e-5)
        assert vals["gstat_max"] == pytest.approx(np.max(named), rel=1e-5)


class TestJepaProbes:
    def _grads(self):
        from bvc_tpu.models import jepa

        cfg = ModelConfig(family="jepa", image_size=32, patch_size=16,
                          num_frames=2, tubelet_size=1, hidden_size=16,
                          depth=2, num_heads=2, pred_emb_dim=8,
                          pred_depth=1)
        enc = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
        pred = jepa.init_predictor_params(jax.random.PRNGKey(1), cfg)
        return {"encoder": enc, "predictor": pred}

    def test_per_layer_norms_exclude_bias_and_1d(self):
        grads = self._grads()
        norms = np.asarray(jax.jit(per_layer_weight_norms)(grads))
        # manual recount with torch's len(p.shape) > 1 filter
        expected = []

        def visit(tree, path=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    visit(v, path + "/" + k)
                return
            arr = np.asarray(tree)
            if "bias" in path:
                return
            if "blocks" in path:
                if arr.ndim >= 3:
                    for i in range(arr.shape[0]):
                        expected.append(_norm(arr[i]))
            elif arr.ndim >= 2:
                expected.append(_norm(arr))

        visit(grads)
        assert norms.shape[0] == len(expected)
        np.testing.assert_allclose(np.sort(norms), np.sort(expected), rtol=1e-5)
        # the meter stats follow
        probes = full_grad_probes("jepa")
        assert float(probes["gstat_max"](grads)) == pytest.approx(
            np.max(expected), rel=1e-5)

    def test_stacked_qkv_layers_counted_individually(self):
        grads = self._grads()
        qkv = np.asarray(grads["encoder"]["blocks"]["attn"]["qkv"]["kernel"])
        norms = np.asarray(per_layer_weight_norms(grads))
        for i in range(qkv.shape[0]):  # each depth slice appears
            assert np.any(np.isclose(norms, _norm(qkv[i]), rtol=1e-5))


class TestSimclrProbes:
    def test_conv1_fc0_meter(self):
        from bvc_tpu.models import resnet

        params, _ = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 16)
        probes = full_grad_probes("simclr")
        named = [_tree_norm(params["stem"]["conv"]),
                 _tree_norm(params["head"]["fc1"])]
        assert float(probes["gstat_avg"](params)) == pytest.approx(
            np.mean(named), rel=1e-5)
        assert float(probes["gstat_min"](params)) == pytest.approx(
            np.min(named), rel=1e-5)


class TestProbesOptIn:
    def test_default_step_metrics_have_no_gstat_keys(self):
        # no-regression: the stats are strictly opt-in — the default step
        # computes nothing extra
        from bvc_tpu.models import resnet
        from bvc_tpu.parallel import make_mesh, shard_batch
        from bvc_tpu.training.optim import make_optimizer
        from bvc_tpu.training.state import TrainState
        from bvc_tpu.training.steps import make_simclr_train_step, place_state
        from bvc_tpu.utils.config import OptimConfig

        mesh = make_mesh()
        tx = make_optimizer(OptimConfig(lr=0.01))
        params, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 16)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1), extra=stats),
            mesh,
        )
        step = make_simclr_train_step(mesh, "resnet18", tx)
        batch = shard_batch(np.zeros((8, 2, 32, 32, 3), np.float32), mesh)
        _, metrics = step(state, batch)
        assert not any(k.startswith("gstat") for k in metrics)
