"""End-to-end curriculum smoke at flagship scale ON THE REAL CHIP.

The CPU-mesh test suite already exercises the whole stack at toy scale
(``tests/test_curriculum.py``); this tool re-runs the full pipeline —
synthetic JPEG corpus → curriculum driver (2 stages, checkpoint chaining)
→ SSv2-style embedding extraction sweep → kNN scoring — with the REAL
flagship-scale models on the attached TPU, proving the production path
end to end on hardware (the reference's whole-job analogue:
``slurmscripts/*/slurm_dev_def.bash:68-177``).

Usage: ``python tools/smoke_tpu_e2e.py
[generative|generative_long|predictive|predictive_unt|contrastive|control|rnd]``
(default generative = VideoMAE-B; predictive = JEPA ViT-B; contrastive =
SimCLR resnet18 — each at its reference preset shapes, shrunk only in
iteration count and sampling interval to fit the synthetic corpus;
``control`` = the complexity_control preset under condition
MatchedSpatial via a synthetic pickled seqlist corpus, reference
``controls.py:30-112``; ``rnd`` = the rnd curriculum's 'gr'
random-resampling path over a corpus carrying every age group,
reference ``slurmscripts/generative/slurm_rnd_def.bash``).

Prints one JSON summary line per run. Runtime ~10-15 min on the tunneled
dev box (dominated by tunnel warmup + 3 distinct jit compiles).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(root: str, n_frames: int = 240,
                 subjects: list[str] | None = None) -> None:
    """HOMEview-layout corpus: moving-gradient frames (JPEG-compressible,
    non-constant so norm-pix targets are well-conditioned)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    # default: two g0 + one g1 subject
    for subj in subjects or ["008MS", "009SS", "026AR"]:
        d = os.path.join(root, subj)
        os.makedirs(d, exist_ok=True)
        base = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        for i in range(n_frames):
            arr = np.roll(base, shift=3 * i, axis=1)
            noise = rng.integers(0, 32, arr.shape, dtype=np.uint8)
            Image.fromarray((arr // 2 + noise)).save(
                os.path.join(d, f"frame_{i:05d}.jpg"), quality=85
            )


def build_control_pkls(control_root: str, jpg_root: str,
                       groups=("g0", "g1"), seq_len: int = 16) -> None:
    """Synthetic pre-pickled path-seq lists, the Matched* input contract
    (``{control_root}/{group}_samples.pkl`` of jpg_root-relative paths —
    reference ``controls.py:44-58``)."""
    import pickle

    from bvc_tpu.data.indexing import get_fpathlist, get_group

    os.makedirs(control_root, exist_ok=True)
    for g in groups:
        seqs = []
        for subj in get_group(g):
            subj_dir = os.path.join(jpg_root, subj)
            if not os.path.isdir(subj_dir):
                continue
            rel = [p.replace(jpg_root, "")
                   for p in get_fpathlist(jpg_root, subj)]
            # dense stride-2 windows: a 1-subject group (g1 here) yields
            # ~113 seqs → seq-unit fold segments of 24 leave every fold
            # ≥24 seqs (stage 2 runs fold 2)
            seqs += [rel[i:i + seq_len]
                     for i in range(0, len(rel) - seq_len + 1, 2)]
        with open(os.path.join(control_root, f"{g}_samples.pkl"), "wb") as f:
            pickle.dump(seqs, f)


def build_ssv2_like(root: str, n_clips: int = 6, n_frames: int = 20) -> None:
    from PIL import Image

    rng = np.random.default_rng(11)
    for split in ["train", "val"]:
        for vid in range(n_clips):
            d = os.path.join(root, split, str(vid))
            os.makedirs(d, exist_ok=True)
            base = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
            for i in range(n_frames):
                Image.fromarray(np.roll(base, 5 * i, axis=0)).save(
                    os.path.join(d, f"{i}.jpg"), quality=85
                )


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import pandas as pd

    from bvc_tpu.curriculum.driver import run_curriculum
    from bvc_tpu.curriculum.presets import FAMILY_PRESETS
    from bvc_tpu.evalbench.scores import get_nn_score
    from bvc_tpu.utils.config import TrainConfig

    preset_name = sys.argv[1] if len(sys.argv) > 1 else "generative"
    curriculum = "rnd" if preset_name == "rnd" else "dev"
    condition = "MatchedSpatial" if preset_name == "control" else "default"
    preset_key = {"rnd": "generative",
                  "control": "complexity_control"}.get(preset_name, preset_name)
    t_start = time.perf_counter()
    work = tempfile.mkdtemp(prefix="bvc_smoke_")
    jpg_root = os.path.join(work, "jpg_root")
    ssv2_root = os.path.join(work, "ssv2")
    control_root = os.path.join(work, "pkls")
    savedir = os.path.join(work, "runs")
    if preset_name == "rnd":
        # 'gr' samples 3 subjects from EVERY group — the corpus must
        # carry all of them (homeview.py:170-193 registry)
        from bvc_tpu.data.indexing import AGE_GROUPS

        all_subjects = [s for g in AGE_GROUPS.values() for s in g]
        build_corpus(jpg_root, subjects=all_subjects)
    else:
        build_corpus(jpg_root)
    if preset_name == "control":
        build_control_pkls(control_root, jpg_root)
    build_ssv2_like(ssv2_root)

    # Real flagship models (VideoMAE-B / JEPA ViT-B / SimCLR resnet18),
    # shrunk only in ITERATION COUNT (and, for the pair-sampled families,
    # the slowness interval — the synthetic corpus has 240 frames/subject
    # vs the reference's ~80 min at 30 fps).
    shrink = dict(n_epoch=1, batch_size=8, max_epoch_iters=4,
                  n_trainsamples=64)
    if preset_name == "control":
        # 16-frame pickled seqs, step 2 → ~113 seqs for the 1-subject g1
        # stage; seq-unit fold segments of 24 keep all 3 folds non-empty
        shrink["n_trainsamples"] = 16
        shrink["max_epoch_iters"] = 2
    if preset_name in ("predictive", "predictive_unt", "contrastive"):
        # pair availability per fold-subject is ~(80 - interval) frames;
        # stage 2 trains on a single-subject group in this corpus.  Cap
        # the interval INSIDE each stage override too, so the reference's
        # per-stage lr schedule still executes on hardware.
        shrink["interval"] = 20
        shrink["n_trainsamples"] = 40
        shrink["stage_overrides"] = {
            k: {**v, "interval": min(int(v.get("interval", 20)), 20)}
            for k, v in FAMILY_PRESETS[preset_name].stage_overrides.items()
        }
    tiny = dataclasses.replace(FAMILY_PRESETS[preset_key], **shrink)
    base = TrainConfig(savedir=savedir, seed=0, log_freq=1)
    base.data.jpg_root = jpg_root
    # 240-frame subjects → ~80-frame fold segments so all 3 folds exist
    base.data.segment_minutes = 80 / (60 * 30.0)
    base.data.keep_val = False
    if preset_name == "control":
        base.data.control_data_root = control_root
        # fold segments are in SEQUENCE units for pickled seqlists
        base.data.segment_minutes = 24 / (60 * 30.0)

    results = run_curriculum(
        curriculum, tiny, base, n_stages=2, condition=condition,
        extraction=[{"ds_task": "ssv2", "vid_root": ssv2_root,
                     "frame_rate": 12, "batch_size": 4}],
        untrained_baseline=True,
    )

    # score one extracted CSV with synthetic labels (clip-id parity) to
    # drive the notebook-parity kNN scorer on real embeddings
    emb_dir = os.path.join(savedir, "benchmarks", "ssv2")
    stage2 = results["stages"][1]
    df = pd.read_csv(os.path.join(emb_dir, f"embeddings_{stage2['run_id']}.csv"))
    # SSv2 fnames are the clip-folder ids; synthetic label = id parity
    df["label"] = [int(str(f).rstrip("/").split("/")[-1]) % 2 for f in df["fnames"]]
    knn = get_nn_score(df, df, label="label")[1]

    losses = [s["train_loss"] for s in results["stages"]]
    summary = {
        "platform": jax.devices()[0].platform,
        "preset": preset_name,
        "stages": [s["run_id"] for s in results["stages"]],
        "stage_losses": [round(float(x), 4) for x in losses],
        "extraction_csvs": len(results.get("extraction", [])),
        "knn_top1": round(float(knn), 4),
        "wall_s": round(time.perf_counter() - t_start, 1),
        "ok": all(np.isfinite(losses)),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
