"""Fused single-pass SGD + one-pass grad metrics (VERDICT r2 #2).

The fused paths must be numerically identical to the optax chain /
separate-reduction formulations they replace.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bvc_tpu.training.optim import apply_gradients, make_optimizer, wd_mask
from bvc_tpu.utils.config import OptimConfig


def _tree(seed, stacked=True):
    rng = np.random.default_rng(seed)

    def a(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    t = {
        "patch_embed": {"kernel": a(12, 8), "bias": a(8)},
        "encoder": {"blocks": {"attn": {"qkv": {"kernel": a(3, 8, 24),
                                                "bias": a(3, 24)}}}},
        "decoder_head": {"kernel": a(8, 12), "bias": a(12)},
    }
    return t


class TestFusedSgd:
    @pytest.mark.parametrize("wd,momentum,nesterov", [
        (0.0, 0.9, True), (0.05, 0.9, True), (0.05, 0.9, False),
        (0.05, 0.0, True), (0.0, 0.0, False),
    ])
    def test_matches_optax_chain_over_steps(self, wd, momentum, nesterov):
        cfg = OptimConfig(name="sgd", lr=0.1, weight_decay=wd,
                          momentum=momentum, nesterov=nesterov)
        tx = make_optimizer(cfg)
        params_f = _tree(0)
        params_r = _tree(0)
        state_f = tx.init(params_f)
        state_r = tx.init(params_r)
        for step in range(4):
            grads = _tree(10 + step)
            # reference: the plain optax protocol on the SAME tx
            updates, state_r = tx.update(grads, state_r, params_r)
            params_r = optax.apply_updates(params_r, updates)
            # fused single-pass
            params_f, state_f = apply_gradients(tx, grads, state_f, params_f)
        for a, b in zip(jax.tree_util.tree_leaves(params_f),
                        jax.tree_util.tree_leaves(params_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(state_f),
                        jax.tree_util.tree_leaves(state_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_masked_weight_decay_matches(self):
        params = _tree(1)
        cfg = OptimConfig(name="sgd", lr=0.03, weight_decay=0.1,
                          momentum=0.9, nesterov=True,
                          exclude_bias_and_norm_from_wd=True)
        tx = make_optimizer(cfg, params)
        state_f = tx.init(params)
        state_r = tx.init(params)
        grads = _tree(2)
        updates, state_r = tx.update(grads, state_r, params)
        ref = optax.apply_updates(params, updates)
        fused, _ = apply_gradients(tx, grads, state_f, params)
        for a, b in zip(jax.tree_util.tree_leaves(fused),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_state_structure_unchanged(self):
        # checkpoints serialize the optax chain state; the fused tx must
        # keep that exact pytree structure
        params = _tree(3)
        cfg = OptimConfig(name="sgd", lr=0.1, weight_decay=0.01, momentum=0.9)
        tx = make_optimizer(cfg)
        s0 = tx.init(params)
        _, s1 = apply_gradients(tx, _tree(4), s0, params)
        assert jax.tree_util.tree_structure(s0) == jax.tree_util.tree_structure(s1)

    def test_adamw_falls_back_to_standard_protocol(self):
        params = _tree(5)
        tx = make_optimizer(OptimConfig(name="adamw", lr=1e-3))
        state = tx.init(params)
        new_p, new_s = apply_gradients(tx, _tree(6), state, params)
        updates, s_r = tx.update(_tree(6), state, params)
        ref = optax.apply_updates(params, updates)
        for a, b in zip(jax.tree_util.tree_leaves(new_p),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestFusedGradMetrics:
    def test_videomae_metrics_match_reference_formulation(self):
        from bvc_tpu.models import videomae
        from bvc_tpu.training.probes import videomae_grad_metrics
        from bvc_tpu.utils.config import ModelConfig

        cfg = ModelConfig(family="videomae", image_size=32, patch_size=8,
                          num_frames=4, tubelet_size=2, hidden_size=16,
                          depth=3, num_heads=2, decoder_hidden_size=8,
                          decoder_depth=2, decoder_num_heads=2)
        grads = videomae.init_params(jax.random.PRNGKey(0), cfg)
        got = {k: float(v) for k, v in
               jax.jit(videomae_grad_metrics)(grads).items()}
        ref = {
            "grad_norm": float(optax.global_norm(grads)),
            "grad_efl": float(optax.global_norm(grads["patch_embed"])),
            "grad_ell": float(optax.global_norm(
                jax.tree_util.tree_map(lambda x: x[-1], grads["encoder"]))),
            "grad_dll": float(optax.global_norm(grads["decoder_head"])),
        }
        for k in ref:
            assert got[k] == pytest.approx(ref[k], rel=1e-5), k

    def test_jepa_metrics_match(self):
        from bvc_tpu.models import jepa
        from bvc_tpu.training.probes import jepa_grad_metrics
        from bvc_tpu.utils.config import ModelConfig

        cfg = ModelConfig(family="jepa", image_size=32, patch_size=16,
                          num_frames=2, tubelet_size=1, hidden_size=16,
                          depth=2, num_heads=2, pred_emb_dim=8, pred_depth=1)
        grads = jepa.init_params(jax.random.PRNGKey(0), cfg)
        got = {k: float(v) for k, v in jepa_grad_metrics(grads).items()}
        qkv = grads["encoder"]["blocks"]["attn"]["qkv"]["kernel"]
        assert got["grad_norm"] == pytest.approx(
            float(optax.global_norm(grads)), rel=1e-5)
        assert got["grad_fl"] == pytest.approx(
            float(jnp.linalg.norm(qkv[0])), rel=1e-5)
        assert got["grad_ll"] == pytest.approx(
            float(jnp.linalg.norm(qkv[-1])), rel=1e-5)

    def test_simclr_metrics_match(self):
        from bvc_tpu.models import resnet
        from bvc_tpu.training.probes import simclr_grad_metrics

        grads, _ = resnet.init_params(jax.random.PRNGKey(0), "resnet18", 16)
        got = {k: float(v) for k, v in simclr_grad_metrics(grads).items()}
        assert got["grad_norm"] == pytest.approx(
            float(optax.global_norm(grads)), rel=1e-5)
        assert got["grad_conv1"] == pytest.approx(
            float(optax.global_norm(grads["stem"]["conv"])), rel=1e-5)
        assert got["grad_fc0"] == pytest.approx(
            float(optax.global_norm(grads["head"]["fc1"])), rel=1e-5)
