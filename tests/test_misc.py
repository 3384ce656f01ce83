"""MetricsPipe, image ViT, and runtime odds and ends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.models import vit_image
from bvc_tpu.training.metrics_pipe import MetricsPipe
from bvc_tpu.utils.config import ModelConfig


class TestMetricsPipe:
    def test_lag_one_ordering_and_flush(self):
        rows = []
        pipe = MetricsPipe(lambda itr, m: rows.append((itr, float(m["loss"]))),
                           time_every=2)
        for i in range(5):
            pipe.push(i, {"loss": jnp.asarray(float(i))})
        # after pushing 0..4, rows hold 0..3 (lag one)
        assert rows == [(0, 0.0), (1, 1.0), (2, 2.0), (3, 3.0)]
        pipe.flush()
        assert rows[-1] == (4, 4.0)

    def test_timing_estimates_positive(self):
        pipe = MetricsPipe(lambda itr, m: None, time_every=1)
        ms = pipe.push(0, {"loss": jnp.asarray(1.0)})
        assert ms >= 0.0


class TestImageViT:
    def test_forward_and_embed(self):
        cfg = ModelConfig(image_size=32, patch_size=8, hidden_size=32, depth=2,
                          num_heads=4, dtype="float32")
        params = vit_image.init_params(jax.random.PRNGKey(0), cfg)
        imgs = jnp.array(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                         jnp.float32)
        out = vit_image.forward(params, imgs, cfg)
        assert out.shape == (2, 16, 32)
        emb = vit_image.embed(params, imgs, cfg)
        assert emb.shape == (2, 32)
        keep = jnp.array([[0, 1, 2, -1]] * 2, jnp.int32)
        masked = vit_image.forward(params, imgs, cfg, keep)
        assert masked.shape == (2, 4, 32)

    def test_patchify_image_order(self):
        imgs = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        blocks = np.asarray(vit_image.patchify_image(imgs, 2))
        np.testing.assert_allclose(blocks[0, 0], [0, 1, 4, 5])
        np.testing.assert_allclose(blocks[0, 1], [2, 3, 6, 7])
