"""Measured end-to-end training loop: packed corpus vs JPEG decode.

VERDICT r4 task 3's acceptance measurement.  Round-3 methodology
(PERFORMANCE.md "Measured end-to-end training loop"): synthetic
640x480 JPEG corpus at quality 85, VideoMAE-B 224px/16f, bs 32, the
real ``DataLoader`` + jitted train step, 30 timed batches after
compile, on this box's ONE core with the TPU behind the tunnel.  The
two environment ceilings: decode 22.8 clips/s on the core, H2D
33.7 MB/s → 14.7 clips/s; their serialization measured 8.2 clips/s.

The packed path removes the decode term entirely (memmap reads of
pre-cropped 224px uint8 rows, ~2.4 MB/clip sequential IO), so the loop
should rise to ≈ the H2D cap.  This probe measures BOTH paths in one
process plus the loader-only rates.

Usage: python tools/probe_packed_loop.py [n_frames=3000] [timed_batches=30]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(root: str, subj: str = "008MS", n: int = 3000) -> None:
    from PIL import Image

    d = os.path.join(root, subj)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    for i in range(n):
        arr = np.roll(base, shift=4 * i, axis=1)
        noise = rng.integers(0, 32, arr.shape, dtype=np.uint8)
        Image.fromarray((arr // 2 + noise)).save(
            os.path.join(d, f"frame_{i:05d}.jpg"), quality=85)
    print(f"corpus: {n} 640x480 frames in {time.perf_counter()-t0:.0f}s",
          flush=True)


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax

    from bvc_tpu.data.factory import make_dataset
    from bvc_tpu.data.loader import DataLoader
    from bvc_tpu.models import videomae
    from bvc_tpu.parallel import make_mesh
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import make_videomae_train_step, place_state
    from bvc_tpu.utils.config import (
        DataConfig, MaskConfig, ModelConfig, OptimConfig,
    )
    from bvc_tpu.utils.profiling import sync

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    timed_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    bs = 32

    tmp = tempfile.mkdtemp(prefix="packedloop_")
    jpg_root = os.path.join(tmp, "jpg")
    pack_root = os.path.join(tmp, "pack")
    build_corpus(jpg_root, n=n_frames)

    t0 = time.perf_counter()
    from bvc_tpu.data.packed import pack_corpus

    counts = pack_corpus(jpg_root, pack_root, image_size=224)
    dt = time.perf_counter() - t0
    print(f"pack: {sum(counts.values())} frames in {dt:.1f}s "
          f"({sum(counts.values())/dt:.0f} frames/s)", flush=True)

    def data_cfg(pack: bool) -> DataConfig:
        return DataConfig(
            jpg_root=jpg_root, train_group="g0", num_frames=16,
            n_trainsamples=(timed_batches + 6) * bs, image_size=224,
            batch_size=bs, num_workers=1, segment_minutes=0.5,
            pack_root=pack_root if pack else "", seed=0,
        )

    mesh = make_mesh()
    cfg = ModelConfig()
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)
    state = place_state(TrainState.create(params, tx, jax.random.PRNGKey(1)),
                        mesh)
    step = make_videomae_train_step(mesh, cfg, MaskConfig(mask_ratio=0.9), tx)

    def loader_for(pack: bool) -> DataLoader:
        ds = make_dataset("videomae", data_cfg(pack))["train"]
        return DataLoader(ds, mesh, bs, shuffle=True, seed=0, num_workers=1,
                          to_device=True)

    # loader-only rates (to_device=False: pure host pipeline)
    for pack in (False, True):
        ds = make_dataset("videomae", data_cfg(pack))["train"]
        ld = DataLoader(ds, mesh, bs, shuffle=True, seed=0, num_workers=1,
                        max_batches=12, to_device=False)
        it = ld.epoch(0)
        next(it)  # spin-up
        t0 = time.perf_counter()
        n = sum(1 for _ in it)
        r = n * bs / (time.perf_counter() - t0)
        print(f"loader-only [{'packed' if pack else 'decode'}]: "
              f"{r:.1f} clips/s", flush=True)

    results = {}
    for pack in (False, True):
        name = "packed" if pack else "decode"
        ld = loader_for(pack)
        it = ld.epoch(0)
        # compile + settle on the first two batches
        for _ in range(2):
            state, metrics = step(state, next(it))
        sync(metrics["loss"])
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            state, metrics = step(state, batch)
            n += 1
            if n >= timed_batches:
                break
        sync(metrics["loss"])
        dt = time.perf_counter() - t0
        results[name] = n * bs / dt
        print(f"end-to-end loop [{name}]: {results[name]:.1f} clips/s "
              f"({n} batches in {dt:.1f}s)", flush=True)

    print(f"speedup: {results['packed'] / results['decode']:.2f}x "
          f"(H2D cap on this box ~14.7 clips/s)", flush=True)


if __name__ == "__main__":
    main()
