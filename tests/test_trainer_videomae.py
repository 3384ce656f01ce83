"""End-to-end VideoMAE stage training on the synthetic corpus (8-dev CPU mesh)."""

import numpy as np
import pytest

from bvc_tpu.training.trainer_videomae import run_pretraining
from bvc_tpu.utils.config import TrainConfig


def tiny_train_cfg(frame_corpus, tmp_path, run_id="dev_1_g0_default_0_0", **kw):
    cfg = TrainConfig(run_id=run_id, savedir=str(tmp_path), n_epoch=1,
                      max_epoch_iters=3, seed=0, log_freq=1)
    cfg.data.jpg_root = frame_corpus
    cfg.data.train_group = "g0"
    cfg.data.num_frames = 4
    cfg.data.tubelet_size = 2
    cfg.data.image_size = 32
    cfg.data.n_trainsamples = 24
    cfg.data.batch_size = 1  # ×8 devices → global batch 8
    cfg.data.num_workers = 4
    cfg.data.segment_minutes = 0.02
    cfg.data.keep_val = False
    cfg.model.image_size = 32
    cfg.model.patch_size = 8
    cfg.model.num_frames = 4
    cfg.model.tubelet_size = 2
    cfg.model.hidden_size = 32
    cfg.model.depth = 2
    cfg.model.num_heads = 4
    cfg.model.decoder_hidden_size = 16
    cfg.model.decoder_depth = 1
    cfg.model.decoder_num_heads = 2
    cfg.model.dtype = "float32"
    cfg.mask.mask_ratio = 0.75
    cfg.optim.lr = 0.01
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestTrainerEndToEnd:
    def test_stage_produces_artifacts(self, frame_corpus, tmp_path):
        cfg = tiny_train_cfg(frame_corpus, tmp_path)
        summary = run_pretraining(cfg)
        assert np.isfinite(summary["train_loss"])
        # artifact contract
        assert (tmp_path / "csvlog_dev_1_g0_default_0_0.csv").exists()
        assert (tmp_path / "params_dev_1_g0_default_0_0.yaml").exists()
        assert (tmp_path / "model_dev_1_g0_default_0_0.ckpt").is_dir()
        header = (tmp_path / "csvlog_dev_1_g0_default_0_0.csv").read_text().splitlines()
        assert header[0] == "epoch,itr,train loss,val loss,grad-EFL,grad-ELL,grad-DLL"
        assert len(header) == 1 + 3  # 3 train iters

    def test_stage_chaining_loads_checkpoint(self, frame_corpus, tmp_path):
        cfg1 = tiny_train_cfg(frame_corpus, tmp_path, run_id="dev_1_g0_default_0_0")
        s1 = run_pretraining(cfg1)
        cfg2 = tiny_train_cfg(frame_corpus, tmp_path, run_id="dev_2_g0_default_1_0")
        cfg2.init_checkpoint_path = s1["checkpoint"]
        s2 = run_pretraining(cfg2)
        assert (tmp_path / "model_dev_2_g0_default_1_0.ckpt").is_dir()
        # stage-2 training starts from stage-1 weights: loss should not
        # regress to the untrained level; just assert it ran and is finite
        assert np.isfinite(s2["train_loss"])

    def test_val_phase_logged(self, frame_corpus, tmp_path):
        cfg = tiny_train_cfg(frame_corpus, tmp_path, run_id="dev_1_g0_default_0_7")
        cfg.data.keep_val = True
        cfg.data.n_trainsamples = 16
        summary = run_pretraining(cfg)
        assert summary["val_loss"] > 0


class TestResume:
    def test_epoch_checkpointing_and_resume(self, frame_corpus, tmp_path):
        # run 1: two epochs with per-epoch saves, interrupt after epoch 1
        cfg = tiny_train_cfg(frame_corpus, tmp_path, run_id="dev_1_g0_default_0_9")
        cfg.n_epoch = 1
        cfg.save_every_epoch = True
        s1 = run_pretraining(cfg)
        from bvc_tpu.training.checkpoint import load_meta

        meta1 = load_meta(s1["checkpoint"])
        assert meta1["epoch"] == 1

        # run 2: same run-id, resume=True, target 2 epochs → continues
        # from epoch 1 instead of restarting
        cfg2 = tiny_train_cfg(frame_corpus, tmp_path, run_id="dev_1_g0_default_0_9")
        cfg2.n_epoch = 2
        cfg2.resume = True
        s2 = run_pretraining(cfg2)
        meta2 = load_meta(s2["checkpoint"])
        assert meta2["epoch"] == 2
        csv = (tmp_path / "csvlog_dev_1_g0_default_0_9.csv").read_text().splitlines()
        # resumed run APPENDS: epoch-1 rows survive, epoch-2 rows follow
        epochs = [row.split(",")[0] for row in csv[1:]]
        assert "1" in epochs and "2" in epochs
        assert epochs == sorted(epochs)

        # resuming an already-complete run is a no-op that preserves meta
        s3 = run_pretraining(cfg2)
        meta3 = load_meta(s3["checkpoint"])
        assert meta3["epoch"] == 2
        assert meta3["train_loss"] == meta2["train_loss"]
