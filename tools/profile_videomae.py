"""Decompose the VideoMAE-B train-step time on the local chip.

Times each stage of the headline bench step (encode fwd/fwd+bwd, decode
fwd/fwd+bwd, norm-pix targets, optimizer, probes) with in-jit repetition
(dispatch-free; see tools/_benchlib.py and PERFORMANCE.md).  Closes the
"remainder" gap in the PERFORMANCE.md step breakdown.

Usage: python tools/profile_videomae.py [batch_per_chip]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchlib import timed  # noqa: E402


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    import optax

    from bvc_tpu.masks.tube import tube_mask
    from bvc_tpu.models import videomae
    from bvc_tpu.models.videomae import (
        decode_masked, encode_visible, mask_partition, patch_targets,
        pretrain_loss,
    )
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    cfg = ModelConfig()
    grid = (cfg.num_time_steps, cfg.image_size // cfg.patch_size,
            cfg.image_size // cfg.patch_size)
    num_visible = cfg.seq_len - grid[0] * int(0.9 * grid[1] * grid[2])
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    opt_state = tx.init(params)

    raw = np.random.default_rng(0).integers(
        0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3), np.uint8)
    # pre-normalized f32 video so timed()'s additive CSE-defeating chain
    # is valid (normalize_on_device passes f32 through)
    video = jnp.asarray((raw.astype(np.float32) / 255.0 - 0.5) * 4.0)
    mask = tube_mask(jax.random.PRNGKey(1), B, grid, 0.9)
    visible_idx, masked_idx = jax.jit(
        lambda m: mask_partition(m, num_visible))(mask)
    print(f"B={B} tokens={cfg.seq_len} visible={num_visible}")

    t_fwd = timed(lambda p, v: pretrain_loss(p, v, mask, cfg, num_visible)[0],
                  params, video)
    print(f"loss fwd (whole model):           {t_fwd:7.2f} ms")

    # timed() consumes every output leaf, so returning the (value, grads)
    # tuple keeps the backward alive under XLA DCE
    vg = jax.value_and_grad(
        lambda p, v: pretrain_loss(p, v, mask, cfg, num_visible)[0])
    t_vg = timed(vg, params, video)
    print(f"loss fwd+bwd:                     {t_vg:7.2f} ms")

    t_encf = timed(lambda p, v: encode_visible(p, v, visible_idx, cfg),
                   params, video)
    print(f"encode fwd (patchify+12 layers):  {t_encf:7.2f} ms")

    enc_vg = jax.value_and_grad(
        lambda p, v: encode_visible(p, v, visible_idx, cfg)
        .astype(jnp.float32).sum())
    t_encb = timed(enc_vg, params, video)
    print(f"encode fwd+bwd:                   {t_encb:7.2f} ms")

    encoded = encode_visible(params, video, visible_idx, cfg)
    enc_f32 = encoded.astype(jnp.float32)

    t_decf = timed(
        lambda p, z: decode_masked(p, z.astype(encoded.dtype), visible_idx,
                                   masked_idx, cfg),
        params, enc_f32)
    print(f"decode fwd (bridge+4 layers+head):{t_decf:7.2f} ms")

    dec_vg = jax.value_and_grad(
        lambda p, z: decode_masked(p, z.astype(encoded.dtype), visible_idx,
                                   masked_idx, cfg).astype(jnp.float32).sum())
    t_decb = timed(dec_vg, params, enc_f32)
    print(f"decode fwd+bwd:                   {t_decb:7.2f} ms")

    t_tgt = timed(lambda p, v: patch_targets(v, cfg, masked_idx), params, video)
    print(f"norm-pix targets (masked only):   {t_tgt:7.2f} ms")

    grads = jax.jit(jax.grad(
        lambda p, v: pretrain_loss(p, v, mask, cfg, num_visible)[0]))(
        params, video)
    # grads/opt_state ride the `params` slot of timed(): closing over a
    # 94M-param tree inlines it as MLIR constants and the remote compile
    # helper rejects the program body (HTTP 413)

    # Every grad leaf gets the rep-dependent perturbation and the FULL
    # updated tree is returned: perturbing/returning a single leaf lets
    # XLA dead-code-eliminate the other ~94M params' updates and CSE the
    # rep-invariant ones — the same failure class the _benchlib fix
    # closed, just re-introduced at the call site.
    def opt_apply(tree, d):
        p, o, g = tree
        d0 = d.ravel()[0]
        g = jax.tree_util.tree_map(lambda l: l + d0.astype(l.dtype), g)
        updates, _ = tx.update(g, o, p)
        return optax.apply_updates(p, updates)

    dummy = jnp.zeros((8,), jnp.float32)
    t_opt = timed(opt_apply, (params, opt_state, grads), dummy)
    print(f"optimizer (SGD-nesterov update):  {t_opt:7.2f} ms")

    def probe(g, d):
        d0 = d.ravel()[0]
        g = jax.tree_util.tree_map(lambda l: l + d0.astype(l.dtype), g)
        return optax.global_norm(g)

    t_probe = timed(probe, grads, dummy)
    print(f"grad_norm probe:                  {t_probe:7.2f} ms")

    pieces = t_vg + t_tgt + t_opt + t_probe
    print(f"fwd+bwd + targets + opt + probe:  {pieces:7.2f} ms "
          f"→ {B / pieces * 1e3:.1f} clips/s bound")
    print(f"(model split: enc fwd+bwd {t_encb:.1f} + dec fwd+bwd {t_decb:.1f} "
          f"= {t_encb + t_decb:.1f} of {t_vg:.1f} ms)")


if __name__ == "__main__":
    main()
