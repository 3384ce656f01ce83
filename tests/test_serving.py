"""Serving artifacts (bvc_tpu/serving): export → save → load → call.

The exported StableHLO module must replay the extraction forward
(reference hot loop ``benchmarks/compute_embeddings_videomae.py:253-264``)
without bvc_tpu model code: batch-polymorphic, uint8 input contract,
all three families, the frozen int8 variant, and the CLI entry point
over a real checkpoint.
"""

import json

import jax
import numpy as np
import pytest

from bvc_tpu.serving.export import export_embed, load_artifact, save_artifact
from bvc_tpu.utils.config import ModelConfig


def _vmae_cfg():
    return ModelConfig(
        image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
        hidden_size=32, depth=2, num_heads=4,
        decoder_hidden_size=16, decoder_depth=1, decoder_num_heads=2,
        dtype="float32",
    )


class TestRoundTrip:
    def test_videomae_polymorphic_batch(self, tmp_path):
        from bvc_tpu.models import videomae

        cfg = _vmae_cfg()
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        exported, leaves, meta = export_embed("videomae", params, cfg)
        fn = load_artifact(save_artifact(tmp_path / "art", exported, leaves,
                                         meta))
        # one artifact serves multiple batch sizes
        for bs in (2, 5):
            video = np.random.default_rng(bs).integers(
                0, 255, (bs, 4, 32, 32, 3), np.uint8)
            ref = np.asarray(videomae.embed(params, video, cfg))
            np.testing.assert_allclose(fn(video), ref, atol=1e-5)
        assert fn.feature_dim == 32
        assert fn.meta["batch"] == "polymorphic"

    def test_jepa_int8_frozen(self, tmp_path):
        from bvc_tpu.models import jepa
        from bvc_tpu.ops.quant import quantize_encoder_tree

        cfg = ModelConfig(family="jepa", image_size=16, patch_size=8,
                          num_frames=2, tubelet_size=1, hidden_size=32,
                          depth=2, num_heads=4, dtype="float32")
        params = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
        exported, leaves, meta = export_embed("jepa", params, cfg,
                                              quantize="int8")
        fn = load_artifact(save_artifact(tmp_path / "art", exported, leaves,
                                         meta))
        video = np.random.default_rng(0).integers(
            0, 255, (3, 2, 16, 16, 3), np.uint8)
        ref = np.asarray(jepa.embed(
            quantize_encoder_tree(params, ("blocks",)), video, cfg))
        np.testing.assert_allclose(fn(video), ref, atol=1e-4)
        assert fn.meta["quantize"] == "int8"
        # int8 kernels really are frozen in the artifact
        assert any(l.dtype == np.int8 for l in leaves)

    def test_simclr_last_frame(self, tmp_path):
        from bvc_tpu.models import resnet
        from bvc_tpu.models.videomae import normalize_on_device

        cfg = ModelConfig(family="simclr", architecture="resnet18",
                          image_size=32, num_frames=2, tubelet_size=1)
        p, stats = resnet.init_params(jax.random.PRNGKey(0), "resnet18")
        exported, leaves, meta = export_embed(
            "simclr", {"params": p, "stats": stats}, cfg)
        fn = load_artifact(save_artifact(tmp_path / "art", exported, leaves,
                                         meta))
        video = np.random.default_rng(1).integers(
            0, 255, (2, 2, 32, 32, 3), np.uint8)
        ref, _ = resnet.apply(p, stats, normalize_on_device(
            jax.numpy.asarray(video[:, -1])), "resnet18",
            training=False, with_head=False)
        np.testing.assert_allclose(fn(video), np.asarray(ref), atol=1e-4)
        assert fn.feature_dim == 512

    def test_fixed_batch_and_rejections(self, tmp_path):
        from bvc_tpu.models import videomae

        cfg = _vmae_cfg()
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        exported, leaves, meta = export_embed("videomae", params, cfg,
                                              batch=3)
        assert meta["batch"] == 3
        fn = load_artifact(save_artifact(tmp_path / "art", exported, leaves,
                                         meta))
        video = np.random.default_rng(0).integers(
            0, 255, (3, 4, 32, 32, 3), np.uint8)
        assert fn(video).shape == (3, 32)
        with pytest.raises(Exception):  # wrong batch for a pinned artifact
            fn(video[:2])
        with pytest.raises(ValueError, match="quantize"):
            export_embed("videomae", params, cfg, quantize="fp8")
        with pytest.raises(ValueError, match="ViT"):
            export_embed("simclr", {"params": {}, "stats": {}}, cfg,
                         quantize="int8")


class TestServingCLI:
    def test_export_from_checkpoint(self, tmp_path):
        """End to end: save a real checkpoint, export via the CLI (jepa
        'tiny' — VideoMAE's CLI dims are pinned to ViT-B for reference
        parity), load the artifact, match the direct embed."""
        from bvc_tpu.cli.export_serving import main
        from bvc_tpu.models import jepa
        from bvc_tpu.models.vit import VIT_DIMS
        from bvc_tpu.training.checkpoint import save_checkpoint

        dim, depth, heads = VIT_DIMS["vit_tiny"]
        cfg = ModelConfig(family="jepa", architecture="vit_tiny",
                          image_size=32, num_frames=2, tubelet_size=1,
                          hidden_size=dim, depth=depth, num_heads=heads)
        params = jepa.init_encoder_params(jax.random.PRNGKey(3), cfg)
        ckpt = tmp_path / "model_dev_1_g0_default_0_0.ckpt"
        save_checkpoint(ckpt, {"encoder": params})

        out = tmp_path / "artifact"
        main(["-init_checkpoint_path", str(ckpt), "-out", str(out),
              "--family", "jepa", "--architecture", "tiny",
              "--image_size", "32", "--num_frames", "2",
              "--tubelet_size", "1"])
        meta = json.loads((out / "meta.json").read_text())
        assert meta["checkpoint"] == str(ckpt)
        fn = load_artifact(str(out))
        video = np.random.default_rng(0).integers(
            0, 255, (2, 2, 32, 32, 3), np.uint8)
        ref = np.asarray(jepa.embed(params, video, cfg))
        # the CLI exports at the family's real bf16 compute dtype while
        # the in-test reference runs under conftest's 'highest' matmul
        # precision — agreement is bf16-level, not f32-level
        np.testing.assert_allclose(fn(video), ref, atol=2e-2)
        cos = (fn(video) * ref).sum(-1) / (
            np.linalg.norm(fn(video), axis=-1) * np.linalg.norm(ref, axis=-1))
        assert cos.min() > 0.9999

    def test_cli_flag_parses(self):
        from bvc_tpu.cli.export_serving import build_parser

        args = build_parser().parse_args(
            ["-init_checkpoint_path", "na", "-out", "/tmp/x",
             "--quantize", "int8", "--batch", "4", "--platforms", "cpu"])
        assert args.quantize == "int8" and args.batch == 4
