"""Curriculum driver: stage plans, config materialisation, 2-stage run."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ssv2_like(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ssv2_like")
    rng = np.random.default_rng(0)
    for split in ["train", "val"]:
        for vid in range(4):
            d = root / split / str(vid)
            d.mkdir(parents=True)
            for i in range(6):
                arr = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(root)

from bvc_tpu.curriculum.driver import build_stage_config, run_curriculum, stage_plan
from bvc_tpu.curriculum.presets import CURRICULA, FAMILY_PRESETS
from bvc_tpu.utils.config import TrainConfig


class TestStagePlan:
    def test_dev_plan_matches_bash(self):
        # slurm_dev_def.bash: stage groups g0,g1,g2; fold=(seed+stage)%3;
        # run_id=${curr}_${stage}_${group}_${condition}_${fold}_${seed}
        plan = stage_plan("dev", FAMILY_PRESETS["generative"], seed=101)
        assert [p["train_group"] for p in plan] == ["g0", "g1", "g2"]
        assert [p["fold"] for p in plan] == [(101 + s) % 3 for s in (1, 2, 3)]
        assert plan[0]["run_id"] == "dev_1_g0_default_0_101"
        assert plan[2]["run_id"] == "dev_3_g2_default_2_101"

    def test_adev_and_adult(self):
        plan = stage_plan("adev", FAMILY_PRESETS["generative"], seed=0)
        assert [p["train_group"] for p in plan] == ["g2", "g1", "g0"]
        plan = stage_plan("adult", FAMILY_PRESETS["generative"], seed=0)
        assert [p["train_group"] for p in plan] == ["g3", "g3", "g3"]

    def test_contrastive_stage_overrides(self):
        # lr 1e-2→1e-3→1e-4, interval 900→90→9
        # (slurmscripts/contrastive/slurm_dev_def.bash:101-157)
        preset = FAMILY_PRESETS["contrastive"]
        plan = stage_plan("dev", preset, seed=0)
        base = TrainConfig(savedir="/tmp/x")
        cfgs = [build_stage_config(preset, info, base) for info in plan]
        assert [c.optim.lr for c in cfgs] == [0.01, 1e-3, 1e-4]
        assert [c.data.interval for c in cfgs] == [900, 90, 9]

    def test_preset_env_blocks(self):
        g = FAMILY_PRESETS["generative"]
        assert (g.n_epoch, g.batch_size, g.lr, g.max_epoch_iters) == (5, 16, 0.1, 2000)
        p = FAMILY_PRESETS["predictive"]
        assert (p.n_epoch, p.max_epoch_iters, p.interval, p.augs) == (2, 5000, 300, "cg")
        assert FAMILY_PRESETS["generative_long"].n_epoch == 20

    def test_matched_condition_frame_override(self):
        preset = FAMILY_PRESETS["complexity_control"]
        info = stage_plan("dev", preset, 0, condition="MatchedSpatioTemporal")[0]
        base = TrainConfig(savedir="/tmp/x")
        base.data.condition = "MatchedSpatioTemporal"
        cfg = build_stage_config(preset, info, base)
        assert cfg.data.num_frames == 1 and cfg.model.num_frames == 1


class TestRunCurriculum:
    def test_two_stage_videomae_chain(self, frame_corpus, tmp_path):
        # shrink the generative preset to toy scale
        import dataclasses

        from bvc_tpu.curriculum import presets

        tiny = dataclasses.replace(
            FAMILY_PRESETS["generative"],
            n_epoch=1, batch_size=1, max_epoch_iters=2, n_trainsamples=16,
            num_frames=4, tubelet_size=2,
        )
        presets.FAMILY_PRESETS["_tiny_gen"] = tiny
        try:
            base = TrainConfig(savedir=str(tmp_path), seed=0, log_freq=1)
            base.data.jpg_root = frame_corpus
            base.data.image_size = 32
            # small segments so every fold of the 60-frame g1 subject is
            # non-empty (segment = 0.011*60*30 ≈ 19 frames)
            base.data.segment_minutes = 0.011
            base.data.num_workers = 2
            base.model.image_size = 32
            base.model.patch_size = 8
            base.model.hidden_size = 32
            base.model.depth = 2
            base.model.num_heads = 4
            base.model.decoder_hidden_size = 16
            base.model.decoder_depth = 1
            base.model.decoder_num_heads = 2
            base.model.dtype = "float32"
            base.mask.mask_ratio = 0.75
            results = run_curriculum("dev", "_tiny_gen", base, n_stages=2)
        finally:
            del presets.FAMILY_PRESETS["_tiny_gen"]

        assert len(results["stages"]) == 2
        # stage 2 was initialised from stage 1's checkpoint
        s1, s2 = results["stages"]
        assert s1["run_id"].startswith("dev_1_g0")
        assert s2["run_id"].startswith("dev_2_g1")
        assert (tmp_path / f"model_{s2['run_id']}.ckpt").is_dir()
        manifest = json.loads(
            (tmp_path / "curriculum_dev_default_0.json").read_text()
        )
        assert manifest["final_checkpoint"].endswith(f"model_{s2['run_id']}.ckpt")

    def test_curriculum_level_resume_skips_completed_stages(
        self, frame_corpus, tmp_path
    ):
        # a killed curriculum re-run with resume=y must skip finished
        # stages (via their checkpoints) instead of retraining stage 1
        import dataclasses

        from bvc_tpu.curriculum import presets

        tiny = dataclasses.replace(
            FAMILY_PRESETS["generative"],
            n_epoch=1, batch_size=1, max_epoch_iters=2, n_trainsamples=16,
            num_frames=4, tubelet_size=2,
        )
        presets.FAMILY_PRESETS["_tiny_gen2"] = tiny
        try:
            def mkbase():
                base = TrainConfig(savedir=str(tmp_path), seed=0, log_freq=1)
                base.data.jpg_root = frame_corpus
                base.data.image_size = 32
                base.data.segment_minutes = 0.011
                base.data.num_workers = 2
                base.model.image_size = 32
                base.model.patch_size = 8
                base.model.hidden_size = 32
                base.model.depth = 2
                base.model.num_heads = 4
                base.model.decoder_hidden_size = 16
                base.model.decoder_depth = 1
                base.model.decoder_num_heads = 2
                base.model.dtype = "float32"
                base.mask.mask_ratio = 0.75
                base.resume = True
                base.save_every_epoch = True
                return base

            # "preempted" run: only stage 1 completes
            run_curriculum("dev", "_tiny_gen2", mkbase(), n_stages=1)
            ck1 = tmp_path / "model_dev_1_g0_default_1_0.ckpt"
            assert ck1.is_dir()
            mtime = max(p.stat().st_mtime for p in ck1.rglob("*"))

            # restart the full curriculum: stage 1 must be SKIPPED (its
            # checkpoint untouched) and stage 2 trains from it
            results = run_curriculum("dev", "_tiny_gen2", mkbase(), n_stages=2)
            assert len(results["stages"]) == 2
            assert max(p.stat().st_mtime for p in ck1.rglob("*")) == mtime
            assert (tmp_path / "model_dev_2_g1_default_2_0.ckpt").is_dir()
        finally:
            del presets.FAMILY_PRESETS["_tiny_gen2"]


class TestCurriculumExtraction:
    def test_stages_plus_extraction_sweep(self, frame_corpus, tmp_path, ssv2_like):
        import dataclasses

        from bvc_tpu.curriculum import presets
        from bvc_tpu.curriculum.driver import run_curriculum
        from bvc_tpu.curriculum.presets import FAMILY_PRESETS

        tiny = dataclasses.replace(
            FAMILY_PRESETS["generative"],
            n_epoch=1, batch_size=1, max_epoch_iters=2, n_trainsamples=16,
            num_frames=4, tubelet_size=2,
        )
        base = TrainConfig(savedir=str(tmp_path), seed=0, log_freq=1)
        base.data.jpg_root = frame_corpus
        base.data.image_size = 32
        base.data.segment_minutes = 0.011
        base.data.num_workers = 2
        base.model.image_size = 32
        base.model.patch_size = 8
        base.model.hidden_size = 32
        base.model.depth = 1
        base.model.num_heads = 4
        base.model.decoder_hidden_size = 16
        base.model.decoder_depth = 1
        base.model.decoder_num_heads = 2
        base.model.dtype = "float32"
        base.mask.mask_ratio = 0.75
        results = run_curriculum(
            "dev", tiny, base, n_stages=1,
            extraction=[{"ds_task": "ssv2", "vid_root": ssv2_like,
                         "frame_rate": 12, "batch_size": 2}],
            untrained_baseline=True,
        )
        emb_dir = tmp_path / "benchmarks" / "ssv2"
        # stage-0 baseline + stage-1, train and test CSVs each
        assert (emb_dir / "embeddings_dev_0_na_default_0_0.csv").exists()
        assert (emb_dir / "embeddings_dev_1_g0_default_1_0.csv").exists()
        assert (emb_dir / "test" / "embeddings_dev_1_g0_default_1_0.csv").exists()
        assert len(results["extraction"]) == 4

    def test_extraction_task_quantize_reaches_embed_builders(
            self, tmp_path, ssv2_like, monkeypatch):
        """A task spec's 'quantize' key must reach the embed-fn builders
        (the --extract_quantize int8 CLI path)."""
        from bvc_tpu.curriculum.driver import _run_extraction
        from bvc_tpu.evalbench import extract as ex
        from bvc_tpu.utils.config import ModelConfig
        from bvc_tpu.utils.logging import get_logger

        seen = {}

        def fake_untrained(family, cfg, seed=0, mesh=None, quantize="none"):
            seen["quantize"] = quantize
            fn = lambda v: np.zeros((len(v), 4), np.float32)
            fn.feature_dim = 4
            return fn

        monkeypatch.setattr(ex, "untrained_embed_fn", fake_untrained)
        base = TrainConfig(savedir=str(tmp_path), seed=0)
        cfg = ModelConfig(image_size=32, patch_size=8, num_frames=4,
                          tubelet_size=2, dtype="float32")
        outs = _run_extraction(
            {"ds_task": "ssv2", "vid_root": ssv2_like, "frame_rate": 12,
             "batch_size": 2, "quantize": "int8"},
            ["na"], ["untrained_0_na_na_0_0"], cfg, "videomae", base,
            None, get_logger("t"),
        )
        assert seen["quantize"] == "int8"
        assert len(outs) == 2  # train + test CSVs

    def test_emit_script_carries_extract_quantize(self):
        from bvc_tpu.curriculum.driver import emit_script

        text = emit_script("dev", "generative", 0, extract={"ssv2": "$V"},
                           extract_quantize="int8")
        assert "--quantize int8" in text
        default = emit_script("dev", "generative", 0, extract={"ssv2": "$V"})
        assert "--quantize" not in default

    def test_extraction_rides_the_seq_mesh(self, frame_corpus, tmp_path,
                                           ssv2_like):
        """--mesh data=N,seq=M reaches the WHOLE chain: the trainer's
        time-sharded step AND the extraction sweep (run_curriculum builds
        the mesh from base.mesh_shape; previously extraction silently
        fell back to a single-device embed)."""
        import dataclasses

        from bvc_tpu.curriculum.driver import run_curriculum
        from bvc_tpu.curriculum.presets import FAMILY_PRESETS

        tiny = dataclasses.replace(
            FAMILY_PRESETS["generative"],
            n_epoch=1, batch_size=1, max_epoch_iters=2, n_trainsamples=16,
            num_frames=8, tubelet_size=2,
        )
        base = TrainConfig(savedir=str(tmp_path), seed=0, log_freq=1)
        base.mesh_shape = {"data": 2, "seq": 4}
        base.data.jpg_root = frame_corpus
        base.data.image_size = 32
        base.data.segment_minutes = 0.011
        base.data.num_workers = 2
        base.model.image_size = 32
        base.model.patch_size = 8
        base.model.hidden_size = 32
        base.model.depth = 1
        base.model.num_heads = 4
        base.model.decoder_hidden_size = 16
        base.model.decoder_depth = 1
        base.model.decoder_num_heads = 2
        base.model.dtype = "float32"
        base.mask.mask_ratio = 0.75
        results = run_curriculum(
            "dev", tiny, base, n_stages=1,
            extraction=[{"ds_task": "ssv2", "vid_root": ssv2_like,
                         "frame_rate": 12, "batch_size": 2}],
        )
        emb_dir = tmp_path / "benchmarks" / "ssv2"
        csv = emb_dir / "embeddings_dev_1_g0_default_1_0.csv"
        assert csv.exists()
        import pandas as pd

        df = pd.read_csv(csv)
        assert len(df) == 4  # all train samples embedded
        assert np.isfinite(df.filter(like="dim").to_numpy()).all()
