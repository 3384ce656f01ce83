"""Per-step ICI communication tables for SCALING.md — real model dims,
virtual mesh.

Compiles the real VideoMAE-B (and optionally JEPA) train step over a
virtual 8-device CPU mesh in every parameter layout and prints the
collective accounting from the optimized HLO
(:mod:`bvc_tpu.parallel.analysis`): op counts, payload bytes, estimated
ring bytes/chip, and whether anything large runs inside a scan body.

The numbers are backend-independent: the SPMD partitioner inserts the
same collectives for an 8-way mesh whether the devices are virtual CPU
or a v5e pod slice — only the link bandwidth differs.  Combined with
v5e ICI bandwidth (~186 GB/s/link bidirectional per the public specs)
this gives the communication-time floor per layout before ever touching
a pod.

Usage: XLA-forced CPU happens inside; just run
``python tools/analyze_collectives.py [--family videomae] [--batch 8]``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _reexec_on_cpu_mesh(n_devices: int = 8) -> None:
    if os.environ.get("_BVC_ANALYZE_CHILD") == "1":
        return
    env = dict(os.environ)
    env["_BVC_ANALYZE_CHILD"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags = f"{flags} --xla_force_host_platform_device_count={n_devices}"
    env["XLA_FLAGS"] = flags.strip()
    parts = [_REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    env["PYTHONPATH"] = os.pathsep.join(dict.fromkeys(parts))
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import runpy, sys\nsys.argv = {[os.path.abspath(__file__)] + sys.argv[1:]!r}\n"
        f"runpy.run_path({os.path.abspath(__file__)!r}, run_name='__main__')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=_REPO)
    raise SystemExit(proc.returncode)


def _fmt_mb(b: float) -> str:
    return f"{b / 1e6:.1f} MB"


def _analyze(family: str, param_mode: str, mesh_shape, grad_accum: int, batch: int):
    import jax
    import numpy as np

    from bvc_tpu.parallel import make_mesh, shard_batch
    from bvc_tpu.parallel.analysis import comm_report, tree_bytes
    from bvc_tpu.training.optim import make_optimizer
    from bvc_tpu.training.state import TrainState
    from bvc_tpu.training.steps import (
        make_jepa_train_step,
        make_videomae_train_step,
        place_state,
    )
    from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig

    mesh = make_mesh(mesh_shape)
    data_size = mesh.shape["data"]
    B = batch * data_size * grad_accum

    if param_mode == "seq":
        # sequence(time)-parallel VideoMAE: ring attention over 'seq'
        # (parallel/seqpar.py) — per-hop ppermutes inside the attention
        # scans plus the one grad pmean
        assert family == "videomae", "sequence parallelism is videomae-only"
        from bvc_tpu.models import videomae as model_mod
        from bvc_tpu.parallel.seqpar import (
            make_seq_videomae_train_step, shard_seq_batch,
        )

        cfg = ModelConfig(dtype="bfloat16")
        params = model_mod.init_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_seq_videomae_train_step(
            mesh, cfg, MaskConfig(sampler="tube", mask_ratio=0.9), tx
        )
        video = np.zeros(
            (batch * data_size, cfg.num_frames, cfg.image_size,
             cfg.image_size, 3), np.uint8,
        )
        text = step.compiled_text(state, shard_seq_batch(video, mesh))
        return comm_report(text), tree_bytes(params)

    if family == "videomae":
        cfg = ModelConfig(dtype="bfloat16")
        from bvc_tpu.models import videomae as model_mod

        params = model_mod.init_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.1, momentum=0.9))
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh, param_mode
        )
        step = make_videomae_train_step(
            mesh, cfg, MaskConfig(sampler="tube", mask_ratio=0.9), tx,
            param_mode, grad_accum=grad_accum,
        )
        video = np.zeros(
            (B, cfg.num_frames, cfg.image_size, cfg.image_size, 3), np.uint8
        )
        batch_tree = shard_batch(video, mesh)
    elif family == "jepa":
        import copy

        from bvc_tpu.masks.multiblock import MultiBlockMaskCollator, update_mask_indices
        from bvc_tpu.models import jepa as model_mod

        cfg = ModelConfig(family="jepa", num_frames=2, tubelet_size=1,
                          dtype="bfloat16")
        params = model_mod.init_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.03, momentum=0.9), params)
        state = place_state(
            TrainState.create(params, tx, jax.random.PRNGKey(1),
                              target_params=copy.deepcopy(params["encoder"])),
            mesh, param_mode,
        )
        step = make_jepa_train_step(mesh, cfg, tx, total_steps=1000,
                                    param_mode=param_mode, grad_accum=grad_accum)
        col = MultiBlockMaskCollator(
            input_size=224, patch_size=16, enc_mask_scale=(0.85, 1.0),
            pred_mask_scale=(0.1, 0.2), npred=4, min_keep=10, seed=0,
        )
        enc_idx, pred_idx = col(B, step=0)
        enc_idx = update_mask_indices(enc_idx, 224, 16, 2, 1, True)
        pred_idx = update_mask_indices(pred_idx, 224, 16, 2, 1, False)
        batch_tree = shard_batch(
            {"video": np.zeros((B, 2, 224, 224, 3), np.uint8),
             "enc_idx": enc_idx[0], "pred_idx": pred_idx.transpose(1, 0, 2)},
            mesh,
        )
    else:
        raise ValueError(family)

    text = step.compiled_text(state, batch_tree)
    report = comm_report(text)
    return report, tree_bytes(params)


def main():
    _reexec_on_cpu_mesh()
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="videomae", choices=["videomae", "jepa"])
    ap.add_argument("--batch", type=int, default=2, help="per-chip microbatch")
    args = ap.parse_args()

    layouts = [
        ("dp", "replicated", None, 1),
        ("dp+accum4", "replicated", None, 4),
        ("fsdp", "fsdp", None, 1),
        ("tp2xdp4", "tp", {"data": 4, "model": 2}, 1),
    ]
    if args.family == "videomae":
        layouts.append(("dp2xseq4", "seq", {"data": 2, "seq": 4}, 1))
    rows = []
    for name, mode, mesh_shape, accum in layouts:
        report, param_bytes = _analyze(args.family, mode, mesh_shape, accum, args.batch)
        s = report.summary()
        big_loop = [op for op in report.loop_ops if op.payload_bytes >= 1024]
        rows.append({
            "layout": name,
            "param_bytes": param_bytes,
            "by_kind": {
                k: {kk: (round(vv, 1) if isinstance(vv, float) else vv)
                    for kk, vv in v.items()}
                for k, v in s["by_kind"].items()
            },
            "total_payload_bytes": s["total_payload_bytes"],
            "ring_bytes_per_chip": round(s["total_ring_bytes_per_chip"], 1),
            "large_collectives_in_scan": len(big_loop),
        })
        print(json.dumps(rows[-1]), flush=True)

    print("\n| layout | all-reduce | all-gather | reduce-scatter | ppermute | ring bytes/chip/step | in-scan |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        bk = r["by_kind"]

        def cell(kind):
            d = bk.get(kind)
            return f"{d['count']}x {_fmt_mb(d['payload_bytes'])}" if d else "—"

        print(
            f"| {r['layout']} | {cell('all-reduce')} | {cell('all-gather')} | "
            f"{cell('reduce-scatter')} | {cell('collective-permute')} | "
            f"{_fmt_mb(r['ring_bytes_per_chip'])} | "
            f"{r['large_collectives_in_scan']} |"
        )


if __name__ == "__main__":
    main()
