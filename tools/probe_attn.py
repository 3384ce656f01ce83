"""Probe attention implementations at the JEPA shapes on the local chip.

Times XLA vs Pallas-flash attention (fwd and fwd+bwd) at the shapes the
JEPA profile flagged, plus the full target-encoder forward under each
impl, with in-jit repetition and input-chaining (CSE defeat).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchlib import timed as _timed  # noqa: E402


def timed(fn, *args):
    """Adapter: chain the CSE-defeating perturbation through the first
    arg, treating the rest as static params (shared helper in _benchlib)."""
    rest = args[1:]
    return _timed(lambda r, x0: fn(x0, *r), rest, args[0])


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from bvc_tpu.ops.attention import _xla_attention
    from bvc_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)

    # JEPA shapes + the VideoMAE decoder shape (the flash default path)
    for (B, N, h, d) in [(64, 392, 12, 64), (256, 209, 12, 32),
                         (64, 169, 12, 64), (32, 1568, 6, 64)]:
        q = jnp.asarray(rng.standard_normal((B, N, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, N, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, N, h, d)), jnp.bfloat16)
        scale = d ** -0.5

        t_x = timed(lambda qq, kk, vv: _xla_attention(qq, kk, vv, scale), q, k, v)
        t_f = timed(lambda qq, kk, vv: flash_attention(qq, kk, vv, scale=scale),
                    q, k, v)

        def loss_x(qq, kk, vv):
            return _xla_attention(qq, kk, vv, scale).astype(jnp.float32).sum()

        def loss_f(qq, kk, vv):
            return flash_attention(qq, kk, vv, scale=scale).astype(jnp.float32).sum()

        gx = jax.grad(loss_x, argnums=(0, 1, 2))
        gf = jax.grad(loss_f, argnums=(0, 1, 2))
        t_xb = timed(lambda qq, kk, vv: gx(qq, kk, vv), q, k, v)
        t_fb = timed(lambda qq, kk, vv: gf(qq, kk, vv), q, k, v)
        print(f"[{B},{N},{h},{d}]  fwd  xla {t_x:6.2f}  flash {t_f:6.2f}   "
              f"fwd+bwd  xla {t_xb:6.2f}  flash {t_fb:6.2f}  ms")

    # full target-encoder forward under each impl
    from bvc_tpu.models import jepa
    from bvc_tpu.models.vit import run_blocks, layer_norm
    from bvc_tpu.ops.patchify import tubelet_patchify
    from bvc_tpu.utils.config import ModelConfig

    cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1)
    params = jepa.init_params(jax.random.PRNGKey(0), cfg)["encoder"]
    video = jnp.asarray(rng.standard_normal((64, 2, 224, 224, 3)), jnp.float32)

    def enc2(p, v, impl):
        tokens = tubelet_patchify(
            v, p["patch_embed"]["kernel"], p["patch_embed"]["bias"],
            cfg.tubelet_size, cfg.patch_size, jnp.bfloat16)
        tokens = tokens + jnp.asarray(jepa.encoder_pos_table(cfg), jnp.bfloat16)[None]
        x = run_blocks(p["blocks"], tokens, cfg.num_heads,
                       cfg.layer_norm_eps, False, impl, unroll=True)
        return layer_norm(x, p["norm"], cfg.layer_norm_eps)

    # single-call timing here: ~100 ms calls dwarf the ~1.3 ms dispatch,
    # and REPS-unrolling a 12-layer encoder overflows the remote-compile
    # request size on this box
    import time as _time

    from bvc_tpu.utils.profiling import sync

    def timed_single(fn, p, x):
        # params as a traced ARGUMENT: closing over the 87M-param tree
        # inlines it as MLIR constants and the remote compile helper
        # rejects the request body (HTTP 413).  Consume every output leaf
        # (grad pytrees included) so nothing is DCE'd.
        def consume(p_, x_):
            out = fn(p_, x_)
            return sum(jnp.sum(l, dtype=jnp.float32)
                       for l in jax.tree_util.tree_leaves(out))

        jfn = jax.jit(consume)
        sync(jfn(p, x))
        ts = []
        for _ in range(5):
            t0 = _time.perf_counter()
            sync(jfn(p, x))
            ts.append(_time.perf_counter() - t0)
        return sorted(ts)[2] * 1e3

    for impl in ("xla", "flash"):
        t = timed_single(lambda p, v: enc2(p, v, impl), params, video)
        print(f"target-encoder fwd 392tok impl={impl}: {t:7.2f} ms")
    for impl in ("xla", "flash"):
        # grads w.r.t. BOTH params and video: video-only grads would DCE
        # every dW GEMM (~1/3 of a real training backward)
        g = jax.grad(
            lambda p, v: enc2(p, v, impl).astype(jnp.float32).sum(),
            argnums=(0, 1))
        t = timed_single(g, params, video)
        print(f"target-encoder fwd+bwd 392tok impl={impl}: {t:7.2f} ms")


if __name__ == "__main__":
    main()
