"""CLI flag surface → TrainConfig mapping (reference-compatibility)."""

import pytest

from bvc_tpu.cli import pretrain_jepa, pretrain_simclr, pretrain_videomae
from bvc_tpu.cli.common import parse_mesh
from bvc_tpu.cli.compute_embeddings import build_parser as emb_parser, model_config_from_args


class TestVideomaeCLI:
    def test_reference_flags_map(self):
        args = pretrain_videomae.build_parser().parse_args([
            "-train_group", "g1", "-jpg_root", "/d", "-savedir", "/s",
            "-init_checkpoint_path", "/ck",
            "--mask_sampler", "random", "--mask_ratio", "0.8",
            "--ds_rate", "3", "--fold", "2", "--optim", "adamw",
            "--lr", "0.01", "--wd", "0.05", "--batch_size", "8",
            "--num_frames", "16", "--tubelet_size", "2",
            "--architecture", "base", "--n_epoch", "5",
            "--n_trainsamples", "128000", "--seed", "7",
            "--condition", "MatchedSpatial", "--max_epoch_iters", "2000",
            "--run_id", "dev_1_g1_MatchedSpatial_2_7", "--keep_val", "y",
        ])
        cfg = pretrain_videomae.config_from_args(args)
        assert cfg.data.train_group == "g1"
        assert cfg.data.ds_rate == 3 and cfg.data.fold == 2
        assert cfg.optim.name == "adamw" and cfg.optim.weight_decay == 0.05
        assert cfg.mask.sampler == "random" and cfg.mask.mask_ratio == 0.8
        assert cfg.data.keep_val is True
        assert cfg.model.layer_norm_eps == 1e-12
        assert cfg.run_id == "dev_1_g1_MatchedSpatial_2_7"

    def test_default_run_id_generated(self):
        args = pretrain_videomae.build_parser().parse_args(
            ["-train_group", "g0", "-jpg_root", "/d", "-savedir", "/s"])
        cfg = pretrain_videomae.config_from_args(args)
        assert cfg.run_id == "na_1_g0_default_0_0"


class TestJepaCLI:
    def test_scale_squashing(self):
        # --pred_mask_scale p → (p, p+0.05); --enc_mask_scale e → (e, e+0.15)
        # (pretrain_jepa.py:186-189)
        args = pretrain_jepa.build_parser().parse_args([
            "-train_group", "g0", "-jpg_root", "/d", "-savedir", "/s",
            "--enc_mask_scale", "0.85", "--pred_mask_scale", "0.1",
            "--allow_overlap", "y", "--interval", "300", "--augs", "cg",
            "--architecture", "small",
        ])
        cfg = pretrain_jepa.config_from_args(args)
        assert cfg.mask.enc_mask_scale == (0.85, 1.0)
        assert cfg.mask.pred_mask_scale == pytest.approx((0.1, 0.15))
        assert cfg.mask.allow_overlap is True
        assert cfg.model.hidden_size == 384 and cfg.model.depth == 12
        assert cfg.optim.exclude_bias_and_norm_from_wd is True
        assert cfg.data.interval == 300 and cfg.data.augs == "cg"


class TestSimclrCLI:
    def test_flags(self):
        args = pretrain_simclr.build_parser().parse_args([
            "-train_group", "g2", "-jpg_root", "/d", "-savedir", "/s",
            "--architecture", "resnet18", "--pred_emb_dim", "512",
            "--interval", "900", "--augs", "cjo",
        ])
        cfg = pretrain_simclr.config_from_args(args)
        assert cfg.model.architecture == "resnet18"
        assert cfg.model.pred_emb_dim == 512
        assert cfg.data.interval == 900 and cfg.data.augs == "cjo"


class TestEmbeddingsCLI:
    def test_family_model_configs(self):
        p = emb_parser()
        a = p.parse_args(["-ds_task", "ssv2", "-vid_root", "/v", "-savedir", "/s",
                          "--family", "jepa", "--architecture", "base",
                          "--num_frames", "2", "--tubelet_size", "1"])
        cfg = model_config_from_args(a)
        assert cfg.hidden_size == 768 and cfg.num_frames == 2
        a2 = p.parse_args(["-ds_task", "ssv2", "-vid_root", "/v", "-savedir", "/s",
                           "--family", "videomae"])
        assert model_config_from_args(a2).layer_norm_eps == 1e-12


class TestMeshParsing:
    def test_parse_mesh(self):
        assert parse_mesh("") == {}
        assert parse_mesh("data=4,model=2") == {"data": 4, "model": 2}
