"""Embedding-extraction throughput on the local chip (frames/sec).

The second north-star metric in BASELINE.json. Measures the jitted embed
cores the extractor drives (``evalbench/extract.py:_jit_embed``) —
VideoMAE classifier-head pooling, JEPA mean-pool, SimCLR last-frame —
on device-resident batches (the dev box's TPU tunnel moves H2D at
~34 MB/s, which would measure the network, not the chip; a real v5e
host feeds over PCIe — see PERFORMANCE.md provisioning math).
Reference analogue: the no-grad DDP loop in
``benchmarks/compute_embeddings_videomae.py:253-264`` on 4 GPUs.

Prints one JSON line per family. ``frames/sec`` counts frames actually
embedded: num_frames per clip for the video models, ONE for SimCLR
(it embeds only the last frame, ``compute_embeddings_simclr.py:227``).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchlib import BASELINE_CLIPS_PER_SEC_PER_ACCEL, ladder  # noqa: E402


def bench(family, batches=(256, 128, 64), quantize="none"):
    import jax

    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.parallel.sharding import batch_sharding, replicated_sharding
    from bvc_tpu.utils.config import ModelConfig
    from bvc_tpu.utils.profiling import sync

    n_dev = len(jax.devices())
    mesh = make_mesh()
    rep = replicated_sharding(mesh)

    if family == "videomae":
        from bvc_tpu.models import videomae

        cfg = ModelConfig()
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        if quantize == "int8":  # the --quantize int8 extractor path
            from bvc_tpu.ops.quant import quantize_encoder_tree

            params = quantize_encoder_tree(params, ("encoder",))
        core = lambda prm, v: videomae.embed(prm, v, cfg)
        frames_per_clip = cfg.num_frames
    elif family == "jepa":
        from bvc_tpu.models import jepa

        cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1)
        params = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
        if quantize == "int8":
            from bvc_tpu.ops.quant import quantize_encoder_tree

            params = quantize_encoder_tree(params, ("blocks",))
        core = lambda prm, v: jepa.embed(prm, v, cfg)
        frames_per_clip = cfg.num_frames
    else:
        if quantize == "int8":
            raise ValueError("int8 covers the ViT families only")
        import jax.numpy as jnp

        from bvc_tpu.models import resnet
        from bvc_tpu.models.videomae import normalize_on_device

        cfg = ModelConfig(family="simclr", architecture="resnet18",
                          num_frames=2, tubelet_size=1)
        p, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18")
        params = {"params": p, "stats": stats}
        # last frame only, normalized on device (the dataset transform
        # normalizes on host in the real extractor — same numerics)
        core = lambda tree, v: resnet.apply(
            tree["params"], tree["stats"], normalize_on_device(v[:, -1]),
            "resnet18", training=False, with_head=False)[0]
        frames_per_clip = 1

    placed = jax.device_put(params, rep)
    jfn = jax.jit(core, in_shardings=(rep, batch_sharding(mesh)),
                  out_shardings=rep)
    rng = np.random.default_rng(0)

    def build(per_device):
        B = per_device * n_dev
        video = rng.integers(
            0, 255, (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3),
            dtype=np.uint8)  # uint8 feed; normalization fuses in-jit
        g = shard_batch(video, mesh)
        out = jfn(placed, g)
        sync(out.astype(np.float32).sum())
        return g, B

    per_device, (g, B) = ladder(batches, build)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(placed, g)
    sync(out.astype(np.float32).sum())
    dt = time.perf_counter() - t0
    clips = B * iters / dt / n_dev
    tag = "_int8" if quantize == "int8" else ""
    print(json.dumps({
        "metric": f"{family}_embed_extraction{tag}_throughput",
        "value": round(clips * frames_per_clip, 1),
        "unit": "frames/sec/chip",
        "clips_per_sec_per_chip": round(clips, 1),
        "batch_per_chip": per_device,
        "vs_baseline": round(clips / BASELINE_CLIPS_PER_SEC_PER_ACCEL, 1),
    }), flush=True)


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for fam in ("videomae", "jepa", "simclr"):
        if which in (fam, "all"):
            bench(fam)
    if which in ("int8", "all"):
        bench("videomae", quantize="int8")


if __name__ == "__main__":
    main()
