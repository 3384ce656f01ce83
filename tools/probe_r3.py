"""Round-3 chip probes, batched into ONE process (tunnel warmup ~5-7 min
per process — see memory/PERFORMANCE.md).

Measures, in order:
  1. VideoMAE bs-48 step: fused SGD+metrics (new default) vs the plain
     optax protocol on the same transformation (r2 residual: SGD 7.7 ms +
     probes 7.7 ms standalone).
  2. VideoMAE bs-64 with the winner.
  3. JEPA bs-64 (new defaults) and bs-128 (masked-attention auto-route to
     key-bias flash — previously OOMed at compile).

Prints one JSON line per experiment.
"""

from __future__ import annotations

import copy
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402


def _measure(step, state, batch, iters=20):
    from bvc_tpu.utils.profiling import sync

    for _ in range(3):
        state, metrics = step(state, batch)
    sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    sync(metrics["loss"])
    dt = time.perf_counter() - t0
    return dt / iters, float(jax.device_get(metrics["loss"]))


def _plain_tx(tx):
    """Strip fused_apply → steps fall back to update+apply_updates."""
    import optax

    return optax.GradientTransformation(tx.init, tx.update)


def videomae_probe():
    from bvc_tpu.models import videomae
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_videomae_train_step, place_state
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig

    cfg = ModelConfig()
    mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.9)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)

    results = {}
    for name, the_tx, per_dev in [
        ("fused_bs48", tx, 48),
        ("plain_bs48", _plain_tx(tx), 48),
        ("fused_bs64", tx, 64),
    ]:
        B = per_dev * n_dev
        video = np.random.default_rng(0).integers(
            0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
            dtype=np.uint8)
        try:
            state = place_state(
                TrainState.create(params, the_tx, jax.random.PRNGKey(1)), mesh)
            step = make_videomae_train_step(mesh, cfg, mask_cfg, the_tx)
            sec, loss = _measure(step, state, shard_batch(video, mesh))
            cps = B / sec / n_dev
            results[name] = cps
            print(json.dumps({"probe": f"videomae_{name}",
                              "clips_per_sec_chip": round(cps, 2),
                              "ms_per_step": round(sec * 1e3, 2),
                              "loss": round(loss, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": f"videomae_{name}",
                              "error": str(e)[:300]}), flush=True)
        del video
    return results


def videomae_autocast_probe():
    """A/B: VideoMAE encoder bf16 logits vs f32, bs 48.

    The committed model deliberately does NOT route the encoder through
    autocast_scores (the bf16 arm measured a ~1% LOSS — the evidence
    this probe produces), so the bf16 arm is forced by wrapping the
    encoder's run_blocks."""
    from bvc_tpu.models import videomae
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_videomae_train_step, place_state
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig

    mesh = make_mesh()
    n_dev = mesh.devices.size
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    mask_cfg = MaskConfig(sampler="tube", mask_ratio=0.9)
    orig_run_blocks = videomae.run_blocks

    def forced_bf16(stacked, x, *a, **k):
        if x.shape[1] < 512:  # the 160-token encoder; decoder is 1568
            k["attn_impl"] = "xla_bf16"
        return orig_run_blocks(stacked, x, *a, **k)

    for ac in (False, True):
        videomae.run_blocks = forced_bf16 if ac else orig_run_blocks
        cfg = ModelConfig(autocast_scores=ac)
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        B = 48 * n_dev
        video = np.random.default_rng(0).integers(
            0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
            dtype=np.uint8)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh)
        step = make_videomae_train_step(mesh, cfg, mask_cfg, tx)
        sec, loss = _measure(step, state, shard_batch(video, mesh))
        cps = B / sec / n_dev
        print(json.dumps({"probe": f"vmae_bs48_autocast_{ac}",
                          "clips_per_sec_chip": round(cps, 2),
                          "ms_per_step": round(sec * 1e3, 2),
                          "loss": round(loss, 5)}), flush=True)
    videomae.run_blocks = orig_run_blocks


def jepa_autocast_probe():
    """A/B: autocast_scores (bf16 logits on the gradient paths, the
    reference's full-autocast quantization point) vs the f32 default,
    same process, bs 64."""
    from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
    from bvc_tpu.models import jepa
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_jepa_train_step, place_state
    from bvc_tpu.utils.config import ModelConfig, OptimConfig

    mesh = make_mesh()
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.03, momentum=0.9))
    for ac in (False, True):
        cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1,
                          autocast_scores=ac)
        collator = MultiBlockMaskCollator(
            input_size=cfg.image_size, patch_size=cfg.patch_size,
            enc_mask_scale=(0.85, 1.0), pred_mask_scale=(0.1, 0.2),
            nenc=1, npred=4, seed=0)
        params = jepa.init_params(jax.random.PRNGKey(0), cfg)
        B = 64 * mesh.devices.size
        video = np.random.default_rng(0).integers(
            0, 255, (B, 2, 224, 224, 3), dtype=np.uint8)
        enc_idx, pred_idx = collator(B, step=0)
        enc_idx = update_mask_indices(enc_idx, cfg.image_size, cfg.patch_size,
                                      cfg.num_frames, cfg.tubelet_size, True)
        pred_idx = update_mask_indices(pred_idx, cfg.image_size, cfg.patch_size,
                                       cfg.num_frames, cfg.tubelet_size, False)
        batch = {"video": video, "enc_idx": enc_idx[0],
                 "pred_idx": pred_idx.transpose(1, 0, 2)}
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1),
                              target_params=copy.deepcopy(params["encoder"])),
            mesh)
        step = make_jepa_train_step(mesh, cfg, tx, total_steps=10000)
        sec, loss = _measure(step, state, shard_batch(batch, mesh))
        cps = B / sec / mesh.devices.size
        print(json.dumps({"probe": f"jepa_bs64_autocast_{ac}",
                          "clips_per_sec_chip": round(cps, 2),
                          "ms_per_step": round(sec * 1e3, 2),
                          "loss": round(loss, 5)}), flush=True)


def jepa_probe():
    from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
    from bvc_tpu.models import jepa
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_jepa_train_step, place_state
    from bvc_tpu.utils.config import ModelConfig, OptimConfig

    cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1)
    collator = MultiBlockMaskCollator(
        input_size=cfg.image_size, patch_size=cfg.patch_size,
        enc_mask_scale=(0.85, 1.0), pred_mask_scale=(0.1, 0.2),
        nenc=1, npred=4, seed=0)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.03, momentum=0.9))
    params = jepa.init_params(jax.random.PRNGKey(0), cfg)

    for per_dev in (64, 128):
        B = per_dev * n_dev
        video = np.random.default_rng(0).integers(
            0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
            dtype=np.uint8)
        enc_idx, pred_idx = collator(B, step=0)
        enc_idx = update_mask_indices(enc_idx, cfg.image_size, cfg.patch_size,
                                      cfg.num_frames, cfg.tubelet_size,
                                      isencoder=True)
        pred_idx = update_mask_indices(pred_idx, cfg.image_size, cfg.patch_size,
                                       cfg.num_frames, cfg.tubelet_size,
                                       isencoder=False)
        batch = {"video": video, "enc_idx": enc_idx[0],
                 "pred_idx": pred_idx.transpose(1, 0, 2)}
        try:
            state = place_state(
                TrainState.create(params, tx, jax.random.PRNGKey(1),
                                  target_params=copy.deepcopy(params["encoder"])),
                mesh)
            step = make_jepa_train_step(mesh, cfg, tx, total_steps=10000)
            sec, loss = _measure(step, state, shard_batch(batch, mesh))
            cps = B / sec / n_dev
            print(json.dumps({"probe": f"jepa_bs{per_dev}",
                              "clips_per_sec_chip": round(cps, 2),
                              "ms_per_step": round(sec * 1e3, 2),
                              "loss": round(loss, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": f"jepa_bs{per_dev}",
                              "error": str(e)[:300]}), flush=True)
        del video, batch


def jepa128_probe():
    """Only the bs-128 leg (compile-helper flakes on big programs; a
    dedicated small process maximises the retry odds)."""
    from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
    from bvc_tpu.models import jepa
    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_jepa_train_step, place_state
    from bvc_tpu.utils.config import ModelConfig, OptimConfig

    cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1)
    collator = MultiBlockMaskCollator(
        input_size=cfg.image_size, patch_size=cfg.patch_size,
        enc_mask_scale=(0.85, 1.0), pred_mask_scale=(0.1, 0.2),
        nenc=1, npred=4, seed=0)
    mesh = make_mesh()
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.03, momentum=0.9))
    params = jepa.init_params(jax.random.PRNGKey(0), cfg)
    B = 128 * mesh.devices.size
    video = np.random.default_rng(0).integers(
        0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
        dtype=np.uint8)
    enc_idx, pred_idx = collator(B, step=0)
    enc_idx = update_mask_indices(enc_idx, cfg.image_size, cfg.patch_size,
                                  cfg.num_frames, cfg.tubelet_size, True)
    pred_idx = update_mask_indices(pred_idx, cfg.image_size, cfg.patch_size,
                                   cfg.num_frames, cfg.tubelet_size, False)
    batch = {"video": video, "enc_idx": enc_idx[0],
             "pred_idx": pred_idx.transpose(1, 0, 2)}
    state = place_state(
        TrainState.create(params, tx, jax.random.PRNGKey(1),
                          target_params=copy.deepcopy(params["encoder"])),
        mesh)
    step = make_jepa_train_step(mesh, cfg, tx, total_steps=10000)
    sec, loss = _measure(step, state, shard_batch(batch, mesh), iters=10)
    cps = B / sec / mesh.devices.size
    print(json.dumps({"probe": "jepa_bs128", "clips_per_sec_chip": round(cps, 2),
                      "ms_per_step": round(sec * 1e3, 2),
                      "loss": round(loss, 4)}), flush=True)


def target_probe():
    """JEPA target-encoder A/Bs (VERDICT r2 #8): unroll vs scan at
    [64, 392] depth 12, and attention impl variants."""
    import functools

    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/tools")
    from _benchlib import timed

    from bvc_tpu.models import jepa, vit
    from bvc_tpu.utils.config import ModelConfig

    cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1)
    params = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
    video = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 2, 224, 224, 3)).astype(np.float32))
    pred_idx = jnp.asarray(
        np.random.default_rng(1).integers(0, 392, (4, 64, 40)), jnp.int32)

    def tgt(p, v):
        return jepa.target_features(p, v, pred_idx, cfg)

    ms = timed(tgt, params, video)
    print(json.dumps({"probe": "target_baseline_unroll_bf16logits",
                      "ms": round(ms, 2)}), flush=True)

    orig = vit.run_blocks
    try:
        def forced(*a, **k):
            k["unroll"] = False
            return orig(*a, **k)

        jepa.run_blocks = forced
        ms_scan = timed(tgt, params, video)
        print(json.dumps({"probe": "target_scan_bf16logits",
                          "ms": round(ms_scan, 2)}), flush=True)
    finally:
        jepa.run_blocks = orig

    for impl_name, flag in [("f32_auto", False)]:
        cfg2 = ModelConfig(family="jepa", num_frames=2, tubelet_size=1,
                           target_score_bf16=flag)

        def tgt2(p, v, c=cfg2):
            return jepa.target_features(p, v, pred_idx, c)

        ms2 = timed(tgt2, params, video)
        print(json.dumps({"probe": f"target_{impl_name}", "ms": round(ms2, 2)}),
              flush=True)


def acct_probe():
    """Per-op accounting of the VideoMAE encoder at bs 48 (VERDICT r2
    #2: explain the ~73 TF/s encoder vs the ~113 TF K=768 roofline)."""
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/tools")
    from _benchlib import timed

    from bvc_tpu.models import vit
    from bvc_tpu.ops.attention import multi_head_attention

    B, N, D, H = 48, 160, 768, 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32)).astype(jnp.bfloat16)
    blocks = vit.init_blocks(jax.random.PRNGKey(0), 12, D, 4.0, True, 0.02)
    layer1 = jax.tree_util.tree_map(lambda l: l[0], blocks)

    flop = {}

    def report(name, ms, gflop):
        print(json.dumps({"probe": f"acct_{name}", "ms": round(ms, 3),
                          "gflop": round(gflop, 1),
                          "tflops": round(gflop / ms, 1)}), flush=True)

    M = B * N
    # dense components of one block
    qkv_w = layer1["attn"]["qkv"]["kernel"].astype(jnp.bfloat16)
    ms = timed(lambda w, xx: jnp.einsum("bnd,de->bne", xx, w), qkv_w, x)
    report("qkv_dense_fwd", ms, 2 * M * D * 3 * D / 1e9)

    mlp1 = layer1["mlp"]["fc1"]["kernel"].astype(jnp.bfloat16)
    ms = timed(lambda w, xx: jnp.einsum("bnd,de->bne", xx, w), mlp1, x)
    report("mlp_fc1_fwd", ms, 2 * M * D * 4 * D / 1e9)

    qkv = rng.standard_normal((B, N, H, 64)).astype(np.float32)
    q = jnp.asarray(qkv).astype(jnp.bfloat16)
    ms = timed(lambda p, xx: multi_head_attention(xx, xx, xx, impl="xla"), None, q)
    report("attention_160tok_fwd", ms, 2 * 2 * B * H * N * N * 64 / 1e9)

    # one full block fwd / fwd+bwd
    def blk(p, xx):
        return vit.block_apply(p, xx, H, 1e-6, "auto")

    ms = timed(blk, layer1, x)
    blk_gflop = (2 * M * D * 3 * D + 2 * M * D * D + 2 * 2 * M * 4 * D * D
                 + 2 * 2 * B * H * N * N * 64) / 1e9
    report("block_fwd", ms, blk_gflop)

    def blk_vg(p, xx):
        return jax.value_and_grad(
            lambda pp, v: jnp.sum(vit.block_apply(pp, v, H, 1e-6, "auto")
                                  .astype(jnp.float32)), argnums=(0, 1)
        )(p, xx)

    ms = timed(blk_vg, layer1, x)
    report("block_fwd_bwd", ms, 3 * blk_gflop)

    # full 12-layer encoder fwd+bwd (unrolled, as the step runs it)
    def enc_vg(p, xx):
        return jax.value_and_grad(
            lambda pp, v: jnp.sum(
                vit.run_blocks(pp, v, H, unroll=True).astype(jnp.float32)),
            argnums=(0, 1),
        )(p, xx)

    ms = timed(enc_vg, blocks, x)
    report("encoder12_fwd_bwd", ms, 3 * 12 * blk_gflop)


def jepa128_scan_probe():
    """bs-128 full JEPA step with SCAN-based block stacks: the unrolled
    3-network program exceeds the dev box's compile-helper size limit
    (HTTP 500); scanning shrinks the HLO ~12x and scan measured neutral
    for JEPA (88.6 vs 89.1 ms target encode) — if this compiles, the
    memory-routed masked-flash path is proven END-TO-END at bs 128."""
    from bvc_tpu.models import jepa, vit

    orig = vit.run_blocks

    def forced(*a, **k):
        k["unroll"] = False
        return orig(*a, **k)

    jepa.run_blocks = forced
    try:
        jepa128_probe()
    finally:
        jepa.run_blocks = orig


def flash128_probe():
    """The bs-128 JEPA predictor's masked attention in isolation: the
    full train-step program is rejected by the dev box's remote compile
    helper (HTTP 500 at that program size — infra, not HBM), so prove
    the memory-bound path at the op level: masked flash fwd+bwd at
    [512, 209, 12, 32] vs the XLA path that would materialise the
    1.07 GB f32 score tensor."""
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/tools")
    from _benchlib import timed

    from bvc_tpu.ops.attention import _xla_attention
    from bvc_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    B, N, H, D = 512, 209, 12, 32
    q = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    mask = np.ones((B, N), bool)
    mask[:, 160:] = False
    key_mask = jnp.asarray(mask)

    def fl(p, x):
        return flash_attention(x, x, x, key_mask=key_mask)

    def fl_vg(p, x):
        return jax.value_and_grad(
            lambda v: jnp.sum(flash_attention(v, v, v, key_mask=key_mask)
                              .astype(jnp.float32)))(x)

    def xl_vg(p, x):
        return jax.value_and_grad(
            lambda v: jnp.sum(_xla_attention(
                v, v, v, D ** -0.5, key_mask=key_mask).astype(jnp.float32)))(x)

    for name, fn in [("flash128_fwd", fl), ("flash128_fwd_bwd", fl_vg),
                     ("xla128_fwd_bwd", xl_vg)]:
        try:
            ms = timed(fn, None, q)
            print(json.dumps({"probe": name, "ms": round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:200]}), flush=True)


def flashtune_probe():
    """Flash block-size sweep at the DECODER shape at bs 48 (the r2
    defaults 784/784 were tuned at bs 32)."""
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/tools")
    from _benchlib import timed

    from bvc_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((48, 1568, 6, 64)).astype(np.float32)).astype(jnp.bfloat16)

    import itertools
    cfgs = [(784, 784, 784), (392, 784, 784), (784, 392, 392),
            (784, 1568, 784), (224, 784, 784), (784, 784, 392)]
    if len(sys.argv) > 2 and sys.argv[2] == "kv":
        # round-3b: whole-KV backward blocks
        cfgs = [(784, 784, 784), (784, 392, 1568), (784, 784, 1568),
                (784, 224, 1568), (392, 392, 1568)]
    for bq, bbq, bbk in cfgs:
        def vg(p, x, bq=bq, bbq=bbq, bbk=bbk):
            return jax.value_and_grad(
                lambda v: jnp.sum(flash_attention(
                    v, v, v, block_q=bq, bwd_block_q=bbq, bwd_block_k=bbk)
                    .astype(jnp.float32)))(x)

        try:
            ms = timed(vg, None, q)
            print(json.dumps({"probe": f"flashtune_q{bq}_bq{bbq}_bk{bbk}",
                              "ms": round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": f"flashtune_q{bq}_bq{bbq}_bk{bbk}",
                              "error": str(e)[:150]}), flush=True)


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    print(json.dumps({"devices": len(jax.devices()),
                      "backend": jax.default_backend()}), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "videomae"):
        videomae_probe()
    if which in ("all", "jepa"):
        jepa_probe()
    if which in ("jepa128", "r3b"):
        pass  # ordered below for r3b (big compile goes LAST)
    if which in ("target", "r3b"):
        _guard(target_probe)
    if which in ("acct", "r3b"):
        _guard(acct_probe)
    if which in ("jepa128", "r3b"):
        _guard(jepa128_probe)
    if which in ("flash128", "r3c"):
        _guard(flash128_probe)
    if which == "r3c":
        _guard(jepa128_probe)
    if which == "flashtune":
        _guard(flashtune_probe)
    if which == "jepa_ac":
        _guard(jepa_autocast_probe)
    if which == "vmae_ac":
        _guard(videomae_autocast_probe)
    if which == "jepa128scan":
        _guard(jepa128_scan_probe)


def _guard(fn):
    try:
        fn()
    except Exception as e:
        print(json.dumps({"probe": fn.__name__, "error": str(e)[:300]}),
              flush=True)


if __name__ == "__main__":
    main()
