"""Golden tests for positional encodings.

Expected values were generated from the reference implementations
(``pretraining/predictive/vision_transformer.py`` ``PositionalEncoding3D`` /
``get_2d_sincos_pos_embed`` and HF transformers
``get_sinusoid_encoding_table``) — values only; implementations here are
independent.
"""

import numpy as np
import pytest

from bvc_tpu.models.posenc import positional_encoding_3d, sincos_2d, sinusoid_table_1d


class TestPositionalEncoding3D:
    def test_small_grid_matches_reference(self):
        out = positional_encoding_3d(2, 3, 4, 16)
        assert out.shape == (24, 16)
        assert out.sum() == pytest.approx(187.005005, abs=1e-3)
        np.testing.assert_allclose(
            out[0], [0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1], atol=1e-6
        )
        np.testing.assert_allclose(
            out[7],
            [0, 1, 0, 1, 0, 1, 0.841471, 0.540302, 0.046399, 0.998923,
             0.002154, 0.999998, 0.14112, -0.989992, 0.138798, 0.990321],
            atol=1e-5,
        )

    def test_vitb_grid_matches_reference(self):
        out = positional_encoding_3d(8, 14, 14, 768)
        assert out.shape == (1568, 768)
        assert out.sum() == pytest.approx(566974.875, rel=1e-5)
        assert np.abs(out).mean() == pytest.approx(0.555650, abs=1e-5)
        np.testing.assert_allclose(out[100, :6], [0, 1, 0, 1, 0, 1], atol=1e-6)
        np.testing.assert_allclose(
            out[1000, 250:256],
            [6.204688e-4, 0.9999998, 5.773909e-4, 0.9999998, 5.373039e-4, 1.0],
            atol=1e-6,
        )

    def test_channel_block_structure(self):
        # 3 equal channel blocks of ceil(C/6)*2 for t/y/x; x block truncated.
        out = positional_encoding_3d(2, 2, 2, 12)
        # t block = channels 0:4 — identical for all (y, x) at fixed t
        t0 = out.reshape(2, 2, 2, 12)
        assert np.allclose(t0[0, :, :, :4], t0[0, 0, 0, :4])
        assert not np.allclose(t0[0, 0, 0, :4], t0[1, 0, 0, :4])


class TestHFSinusoid:
    def test_matches_transformers_table(self):
        t = sinusoid_table_1d(10, 8)
        assert t.sum() == pytest.approx(35.667065, abs=1e-4)
        np.testing.assert_allclose(
            t[3],
            [0.14112, -0.989992, 0.29552, 0.955337, 0.029996, 0.99955, 0.003, 0.999996],
            atol=1e-5,
        )

    def test_even_sin_odd_cos(self):
        t = sinusoid_table_1d(4, 6)
        np.testing.assert_allclose(t[0, 0::2], 0.0, atol=1e-7)
        np.testing.assert_allclose(t[0, 1::2], 1.0, atol=1e-7)


class TestSincos2D:
    def test_matches_reference(self):
        g = sincos_2d(8, 3)
        assert g.shape == (9, 8)
        np.testing.assert_allclose(
            g[1],
            [0.841471, 0.01, 0.540302, 0.99995, 0.0, 0.0, 1.0, 1.0],
            atol=1e-5,
        )

    def test_cls_token_row(self):
        g = sincos_2d(8, 3, cls_token=True)
        assert g.shape == (10, 8)
        np.testing.assert_allclose(g[0], 0.0)


class TestInterpolatePosTable:
    """Golden vs torch F.interpolate — the reference resize
    (``vision_transformer_image.py:426-440``)."""

    def _torch_resize(self, tab, g, npatch):
        import math

        import torch
        import torch.nn.functional as F

        pe = torch.tensor(tab).reshape(1, g, g, tab.shape[-1]).permute(0, 3, 1, 2)
        out = F.interpolate(pe, scale_factor=math.sqrt(npatch / (g * g)),
                            mode="bicubic")
        return out.permute(0, 2, 3, 1).reshape(-1, tab.shape[-1]).numpy()

    @pytest.mark.parametrize("g,npatch", [(14, 256), (14, 49), (8, 100), (7, 81)])
    def test_matches_torch_bicubic(self, g, npatch):
        from bvc_tpu.models.posenc import interpolate_pos_table

        tab = np.random.default_rng(0).standard_normal((g * g, 24)).astype(np.float32)
        got = interpolate_pos_table(tab, npatch)
        want = self._torch_resize(tab, g, npatch)
        assert got.shape == (npatch, 24)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_cls_token_row_preserved(self):
        from bvc_tpu.models.posenc import interpolate_pos_table

        tab = np.random.default_rng(1).standard_normal((1 + 49, 8)).astype(np.float32)
        got = interpolate_pos_table(tab, 64, cls_token=True)
        assert got.shape == (65, 8)
        np.testing.assert_allclose(got[0], tab[0], atol=0)
        np.testing.assert_allclose(
            got[1:], self._torch_resize(tab[1:], 7, 64), atol=1e-5
        )

    def test_same_size_is_identity(self):
        from bvc_tpu.models.posenc import interpolate_pos_table

        tab = np.random.default_rng(2).standard_normal((49, 8)).astype(np.float32)
        np.testing.assert_array_equal(interpolate_pos_table(tab, 49), tab)

    def test_3d_spatial_resize_matches_per_slice_torch(self):
        from bvc_tpu.models.posenc import interpolate_pos_table_3d

        t, h, w, d = 3, 8, 8, 12
        tab = np.random.default_rng(3).standard_normal((t * h * w, d)).astype(np.float32)
        got = interpolate_pos_table_3d(tab, t, h, w, 12, 12)
        assert got.shape == (t * 12 * 12, d)
        grid = tab.reshape(t, h, w, d)
        for i in range(t):
            want = self._torch_resize(grid[i].reshape(h * w, d), h, 144)
            np.testing.assert_allclose(
                got.reshape(t, 144, d)[i], want, atol=1e-5
            )

    def test_truncation_prone_target_sizes(self):
        # int(14 * sqrt(3721/196)) floats to 60 — the resize must still
        # deliver the requested 61x61 grid (DINO's +0.1 pitfall)
        from bvc_tpu.models.posenc import interpolate_pos_table

        tab = np.random.default_rng(0).standard_normal((196, 8)).astype(np.float32)
        for g_new in (29, 45, 58, 61, 90):
            out = interpolate_pos_table(tab, g_new * g_new)
            assert out.shape == (g_new * g_new, 8)

    def test_3d_non_uniform_spatial_resize(self):
        from bvc_tpu.models.posenc import interpolate_pos_table_3d

        tab = np.random.default_rng(1).standard_normal((2 * 4 * 4, 6)).astype(np.float32)
        out = interpolate_pos_table_3d(tab, 2, 4, 4, 4, 8)
        assert out.shape == (2 * 4 * 8, 6)
