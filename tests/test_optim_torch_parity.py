"""Optimizer numerics vs torch.optim — every optimizer the reference can
select (``generative/pretrain_videomae.py:187-195``: SGD nesterov /
AdamW(0.9, 0.95) / Adam, all with torch-COUPLED weight decay except
AdamW's decoupled one; JEPA's WD-exclusion groups,
``predictive/helper.py:128-141``).

The trajectory-parity tests (test_trajectory_parity.py) already pin the
SGD default through whole models; this unit level isolates the update
rules themselves on a tiny synthetic tree over many steps with varying
gradients, so an optimizer-math regression cannot hide behind model
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from bvc_tpu.training.optim import apply_gradients, make_optimizer
from bvc_tpu.utils.config import OptimConfig

pytestmark = pytest.mark.parity

N_STEPS = 7


def _tree(rng):
    return {
        "w": rng.standard_normal((5, 4)).astype(np.float32),
        "b": rng.standard_normal((4,)).astype(np.float32),
        "scale": rng.standard_normal((4,)).astype(np.float32),
    }


def _grads(rng, like):
    return {k: rng.standard_normal(v.shape).astype(np.float32)
            for k, v in like.items()}


ORDER = ("w", "b", "scale")


def _run_ours(cfg: OptimConfig, params0, grad_seq):
    tx = make_optimizer(cfg, params_example=params0)
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    opt_state = tx.init(params)
    for g in grad_seq:
        params, opt_state = apply_gradients(
            tx, {k: jnp.asarray(v) for k, v in g.items()}, opt_state, params
        )
    return {k: np.asarray(v) for k, v in params.items()}


def _run_torch(make_opt, params0, grad_seq):
    tensors = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
               for k, v in params0.items()}
    opt = make_opt(tensors)
    for g in grad_seq:
        for k, p in tensors.items():
            p.grad = torch.from_numpy(g[k].copy())
        opt.step()
        opt.zero_grad()
    return {k: p.detach().numpy() for k, p in tensors.items()}


def _compare(ours, ref):
    for k in ORDER:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


@pytest.fixture()
def data():
    rng = np.random.default_rng(0)
    params0 = _tree(rng)
    grad_seq = [_grads(rng, params0) for _ in range(N_STEPS)]
    return params0, grad_seq


class TestOptimizerTorchParity:
    def test_sgd_nesterov_coupled_wd(self, data):
        params0, grad_seq = data
        ours = _run_ours(
            OptimConfig(name="sgd", lr=0.05, momentum=0.9, nesterov=True,
                        weight_decay=1e-3),
            params0, grad_seq)
        ref = _run_torch(
            lambda t: torch.optim.SGD(list(t.values()), lr=0.05,
                                      momentum=0.9, nesterov=True,
                                      weight_decay=1e-3),
            params0, grad_seq)
        _compare(ours, ref)

    def test_sgd_plain(self, data):
        params0, grad_seq = data
        ours = _run_ours(OptimConfig(name="sgd", lr=0.1, momentum=0.0,
                                     nesterov=False, weight_decay=0.0),
                         params0, grad_seq)
        ref = _run_torch(
            lambda t: torch.optim.SGD(list(t.values()), lr=0.1),
            params0, grad_seq)
        _compare(ours, ref)

    def test_adamw_betas_09_095(self, data):
        # pretrain_videomae.py:190-191 — decoupled wd, betas (0.9, 0.95)
        params0, grad_seq = data
        ours = _run_ours(
            OptimConfig(name="adamw", lr=1e-3, weight_decay=0.05,
                        adam_b1=0.9, adam_b2=0.95),
            params0, grad_seq)
        ref = _run_torch(
            lambda t: torch.optim.AdamW(list(t.values()), lr=1e-3,
                                        weight_decay=0.05,
                                        betas=(0.9, 0.95)),
            params0, grad_seq)
        _compare(ours, ref)

    def test_adam_coupled_wd(self, data):
        # pretrain_videomae.py:192-193 — torch.optim.Adam couples wd into
        # the gradient BEFORE the moment updates
        params0, grad_seq = data
        ours = _run_ours(
            OptimConfig(name="adam", lr=1e-3, weight_decay=1e-2,
                        adam_b1=0.9, adam_b2=0.999),
            params0, grad_seq)
        ref = _run_torch(
            lambda t: torch.optim.Adam(list(t.values()), lr=1e-3,
                                       weight_decay=1e-2),
            params0, grad_seq)
        _compare(ours, ref)

    def test_sgd_wd_exclusion_groups(self, data):
        # JEPA param groups: 1-D params take wd=0 (helper.py:128-141);
        # ours expresses the same split as a wd mask over ndim >= 2
        params0, grad_seq = data
        ours = _run_ours(
            OptimConfig(name="sgd", lr=0.03, momentum=0.9, nesterov=True,
                        weight_decay=1e-3,
                        exclude_bias_and_norm_from_wd=True),
            params0, grad_seq)

        def groups(t):
            wd_params = [p for k, p in t.items() if p.ndim >= 2]
            nowd = [p for k, p in t.items() if p.ndim < 2]
            return torch.optim.SGD(
                [{"params": wd_params},
                 {"params": nowd, "weight_decay": 0}],
                lr=0.03, momentum=0.9, nesterov=True, weight_decay=1e-3)

        ref = _run_torch(groups, params0, grad_seq)
        _compare(ours, ref)
        # and the exclusion is real: 1-D params end up different from the
        # all-wd run
        all_wd = _run_ours(
            OptimConfig(name="sgd", lr=0.03, momentum=0.9, nesterov=True,
                        weight_decay=1e-3),
            params0, grad_seq)
        assert not np.allclose(ours["b"], all_wd["b"])
