"""W8A8 quantized inference path (ops/quant.py).

Opt-in extraction acceleration: int8 x int8 -> int32 MXU dots with
per-output-channel weight scales and dynamic per-token activation
scales.  These tests pin (a) the per-dense numeric error bound, (b)
end-to-end embedding agreement with the bf16/f32 path for both ViT
families through the extractor's own entry points, and (c) the
option-validation contract (simclr / seq-mesh / bad-mode rejections).
Reference anchor for what this accelerates: the no-grad extraction
loop ``benchmarks/compute_embeddings_videomae.py:253-264``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.models import jepa, videomae
from bvc_tpu.ops.quant import (
    qdense,
    quantize_blocks,
    quantize_encoder_tree,
    quantize_linear,
)
from bvc_tpu.utils.config import ModelConfig


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-30)


class TestQDense:
    def test_matches_f32_dense(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
        p = {
            "kernel": jnp.asarray(rng.standard_normal((64, 128)) * 0.05,
                                  jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(128) * 0.01, jnp.float32),
        }
        ref = x @ p["kernel"] + p["bias"]
        out = qdense(x, quantize_linear(p), jnp.float32)
        rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(
            np.asarray(ref))
        # per-token + per-channel symmetric quant at Din=64: the rms
        # quantization noise is ~(amax/127)/sqrt(12) per operand; 2% is
        # a loose envelope over it
        assert rel < 0.02, rel

    def test_no_bias(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
        p = {"kernel": jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)}
        qp = quantize_linear(p)
        assert "bias" not in qp
        ref = np.asarray(x @ p["kernel"])
        out = np.asarray(qdense(x, qp, jnp.float32))
        assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 0.02

    def test_extreme_rows_stay_finite(self):
        # all-zero token rows (scale floor) and huge rows (clip) must
        # not produce nan/inf
        x = jnp.concatenate([
            jnp.zeros((2, 16), jnp.float32),
            jnp.full((2, 16), 1e6, jnp.float32),
        ])
        p = {"kernel": jnp.eye(16, dtype=jnp.float32)}
        out = np.asarray(qdense(x, quantize_linear(p), jnp.float32))
        assert np.isfinite(out).all()
        assert np.abs(out[:2]).max() == 0.0

    def test_stacked_shapes_and_dtypes(self):
        rng = np.random.default_rng(2)
        p = {
            "kernel": jnp.asarray(rng.standard_normal((3, 16, 24)),
                                  jnp.float32),
            "bias": jnp.asarray(rng.standard_normal((3, 24)), jnp.float32),
        }
        qp = quantize_linear(p)
        assert qp["kernel_q"].shape == (3, 16, 24)
        assert qp["kernel_q"].dtype == jnp.int8
        assert qp["scale"].shape == (3, 24)
        # per-(layer, channel) scale: every channel's max |q| is 127
        q = np.asarray(qp["kernel_q"], np.int32)
        assert (np.abs(q).max(axis=1) == 127).all()


class TestQuantizedBlocks:
    def test_block_tree_structure(self):
        from bvc_tpu.models.vit import init_blocks
        from bvc_tpu.ops.quant import ALL_MATMULS

        stacked = init_blocks(jax.random.PRNGKey(0), depth=2, dim=32)
        q = quantize_blocks(stacked)
        # default = expansion matmuls only (the measured winners,
        # probe_quant_block.py); proj/fc2 pass through
        assert "kernel_q" in q["attn"]["qkv"]
        assert "kernel_q" in q["mlp"]["fc1"]
        assert "kernel_q" not in q["attn"]["proj"]
        assert "kernel_q" not in q["mlp"]["fc2"]
        # LN params untouched (same objects)
        assert q["ln1"] is stacked["ln1"]
        qall = quantize_blocks(stacked, ALL_MATMULS)
        assert "kernel_q" in qall["mlp"]["fc2"]
        with pytest.raises(ValueError, match="unknown block matmuls"):
            quantize_blocks(stacked, ("attn.qkv", "mlp.fc3"))

    def test_videomae_embed_agrees(self):
        cfg = ModelConfig(
            image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
            hidden_size=32, depth=2, num_heads=4,
            decoder_hidden_size=16, decoder_depth=1, decoder_num_heads=2,
            dtype="float32",
        )
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        video = np.random.default_rng(0).integers(
            0, 255, (3, 4, 32, 32, 3), np.uint8)
        ref = videomae.embed(params, jnp.asarray(video), cfg)
        qp = quantize_encoder_tree(params, ("encoder",))
        out = videomae.embed(qp, jnp.asarray(video), cfg)
        cos = _cos(ref, out)
        assert cos.min() > 0.995, cos

    def test_jepa_embed_agrees(self):
        cfg = ModelConfig(
            family="jepa", image_size=16, patch_size=8, num_frames=2,
            tubelet_size=1, hidden_size=32, depth=2, num_heads=4,
            dtype="float32",
        )
        params = jepa.init_encoder_params(jax.random.PRNGKey(0), cfg)
        video = np.random.default_rng(1).integers(
            0, 255, (3, 2, 16, 16, 3), np.uint8)
        ref = jepa.embed(params, jnp.asarray(video), cfg)
        out = jepa.embed(quantize_encoder_tree(params, ("blocks",)),
                         jnp.asarray(video), cfg)
        cos = _cos(ref, out)
        assert cos.min() > 0.995, cos


class TestExtractorWiring:
    def test_untrained_embed_fn_int8(self):
        from bvc_tpu.evalbench.extract import untrained_embed_fn

        cfg = ModelConfig(
            image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
            hidden_size=32, depth=2, num_heads=4,
            decoder_hidden_size=16, decoder_depth=1, decoder_num_heads=2,
            dtype="float32",
        )
        video = np.random.default_rng(2).integers(
            0, 255, (2, 4, 32, 32, 3), np.uint8)
        ref = untrained_embed_fn("videomae", cfg, seed=0)(video)
        out = untrained_embed_fn("videomae", cfg, seed=0,
                                 quantize="int8")(video)
        assert out.shape == ref.shape
        assert _cos(ref, out).min() > 0.995

    def test_rejections(self):
        from bvc_tpu.evalbench.extract import _check_quantize

        assert _check_quantize("videomae", None, "none") is False
        assert _check_quantize("jepa", None, "int8") is True
        with pytest.raises(ValueError, match="resnet"):
            _check_quantize("simclr", None, "int8")
        with pytest.raises(ValueError, match="quantize mode"):
            _check_quantize("videomae", None, "fp8")

        class FakeSeqMesh:
            axis_names = ("data", "seq")

        with pytest.raises(ValueError, match="sequence-parallel"):
            _check_quantize("videomae", FakeSeqMesh(), "int8")

    def test_mesh_dp_int8_matches_single_device(self):
        # the int8 param tree (int8 kernels + f32 scales) must replicate
        # over a data mesh exactly like the bf16 tree — the reference's
        # 4-GPU DDP extraction analogue with the quantized weights
        from bvc_tpu.evalbench.extract import untrained_embed_fn
        from bvc_tpu.parallel import make_mesh

        cfg = ModelConfig(
            family="jepa", image_size=16, patch_size=8, num_frames=2,
            tubelet_size=1, hidden_size=32, depth=2, num_heads=4,
            dtype="float32",
        )
        mesh = make_mesh()  # 8-device CPU mesh from conftest
        assert mesh.devices.size == 8
        video = np.random.default_rng(3).integers(
            0, 255, (8, 2, 16, 16, 3), np.uint8)
        single = untrained_embed_fn("jepa", cfg, seed=0, quantize="int8")(video)
        meshed = untrained_embed_fn("jepa", cfg, seed=0, mesh=mesh,
                                    quantize="int8")(video)
        # not bit-equal: the rank-1 dequant multiply fuses differently
        # under GSPMD (measured ~1.2e-5 on values ~1); 1e-4 pins "same
        # computation", not "same schedule"
        np.testing.assert_allclose(np.asarray(meshed), np.asarray(single),
                                   rtol=0, atol=1e-4)

    def test_cli_flag_parses(self):
        from bvc_tpu.cli.compute_embeddings import build_parser

        args = build_parser().parse_args([
            "-ds_task", "ssv2", "-vid_root", "/tmp/x", "-savedir", "/tmp/y",
            "--quantize", "int8",
        ])
        assert args.quantize == "int8"
