import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.models.initializers import depth_rescale_factor
from bvc_tpu.models.vit import (
    VIT_DIMS,
    block_apply,
    init_block,
    init_blocks,
    layer_norm,
    mask_gather,
    run_blocks,
)


class TestLayerNorm:
    def test_matches_numpy(self):
        x = jnp.array(np.random.default_rng(0).standard_normal((2, 5, 8)), jnp.float32)
        p = {"scale": jnp.full((8,), 2.0), "bias": jnp.full((8,), 0.5)}
        out = np.asarray(layer_norm(x, p, eps=1e-6))
        xn = np.asarray(x)
        expected = (xn - xn.mean(-1, keepdims=True)) / np.sqrt(xn.var(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(out, expected * 2.0 + 0.5, rtol=1e-5, atol=1e-5)

    def test_bf16_input_f32_stats(self):
        x = (jnp.ones((1, 2, 8)) * 3.0).astype(jnp.bfloat16)
        p = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}
        out = layer_norm(x, p)
        assert out.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


class TestBlocks:
    def test_scan_equals_python_loop(self):
        key = jax.random.PRNGKey(0)
        stacked = init_blocks(key, depth=3, dim=32)
        x = jnp.array(np.random.default_rng(1).standard_normal((2, 10, 32)), jnp.float32)

        out_scan = run_blocks(stacked, x, num_heads=4)
        # unstack and apply sequentially
        y = x
        for i in range(3):
            layer = jax.tree_util.tree_map(lambda a: a[i], stacked)
            y = block_apply(layer, y, num_heads=4)
        np.testing.assert_allclose(np.asarray(out_scan), np.asarray(y), rtol=1e-5, atol=1e-5)

    def test_remat_same_values(self):
        key = jax.random.PRNGKey(0)
        stacked = init_blocks(key, depth=2, dim=16)
        x = jnp.ones((1, 4, 16))
        a = run_blocks(stacked, x, num_heads=2, remat=False)
        b = run_blocks(stacked, x, num_heads=2, remat=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_depth_rescale(self):
        key = jax.random.PRNGKey(0)
        plain = init_blocks(key, depth=2, dim=16, depth_rescale=False)
        scaled = init_blocks(key, depth=2, dim=16, depth_rescale=True)
        for i in range(2):
            f = depth_rescale_factor(i + 1)
            np.testing.assert_allclose(
                np.asarray(scaled["attn"]["proj"]["kernel"][i]),
                np.asarray(plain["attn"]["proj"]["kernel"][i]) * f,
                rtol=1e-6,
            )
        # qkv untouched
        np.testing.assert_allclose(
            np.asarray(scaled["attn"]["qkv"]["kernel"]),
            np.asarray(plain["attn"]["qkv"]["kernel"]),
        )

    def test_block_is_residual(self):
        # zeroing attn-proj and fc2 kernels must make the block an identity
        key = jax.random.PRNGKey(0)
        p = init_block(key, dim=16)
        p["attn"]["proj"]["kernel"] = jnp.zeros_like(p["attn"]["proj"]["kernel"])
        p["attn"]["proj"]["bias"] = jnp.zeros_like(p["attn"]["proj"]["bias"])
        p["mlp"]["fc2"]["kernel"] = jnp.zeros_like(p["mlp"]["fc2"]["kernel"])
        p["mlp"]["fc2"]["bias"] = jnp.zeros_like(p["mlp"]["fc2"]["bias"])
        x = jnp.array(np.random.default_rng(0).standard_normal((1, 6, 16)), jnp.float32)
        out = block_apply(p, x, num_heads=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_bf16_forward(self):
        key = jax.random.PRNGKey(0)
        stacked = init_blocks(key, depth=2, dim=32)
        x = jnp.ones((2, 8, 32), jnp.bfloat16)
        out = run_blocks(stacked, x, num_heads=4)
        assert out.dtype == jnp.bfloat16


class TestDims:
    def test_factory_table_matches_reference(self):
        # vision_transformer.py:551-600
        assert VIT_DIMS["vit_base"] == (768, 12, 12)
        assert VIT_DIMS["vit_giant"] == (1408, 40, 16)


class TestMaskGather:
    def test_gathers_rows(self):
        x = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
        idx = jnp.array([[0, 2], [4, 1]])
        out = np.asarray(mask_gather(x, idx))
        np.testing.assert_allclose(out[0], np.asarray(x)[0, [0, 2]])
        np.testing.assert_allclose(out[1], np.asarray(x)[1, [4, 1]])


class TestAttentionProbs:
    def test_block_attention_probs(self):
        from bvc_tpu.models.vit import block_attention_probs

        key = jax.random.PRNGKey(0)
        p = init_block(key, dim=16)
        x = jnp.array(np.random.default_rng(0).standard_normal((2, 6, 16)), jnp.float32)
        probs = np.asarray(block_attention_probs(p, x, num_heads=2))
        assert probs.shape == (2, 2, 6, 6)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


class TestUnrolledBlocks:
    def test_unroll_matches_scan(self):
        from bvc_tpu.models.vit import init_blocks, run_blocks

        blocks = init_blocks(jax.random.PRNGKey(0), 4, 32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 24, 32)),
                        jnp.float32)
        a = run_blocks(blocks, x, 4)
        b = run_blocks(blocks, x, 4, unroll=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_unroll_with_drop_path_schedule_runs(self):
        from bvc_tpu.models.vit import init_blocks, run_blocks

        blocks = init_blocks(jax.random.PRNGKey(0), 3, 32)
        x = jnp.ones((2, 8, 32), jnp.float32)
        out = run_blocks(blocks, x, 4, drop_path_rates=np.linspace(0, 0.5, 3),
                         rng=jax.random.PRNGKey(1), unroll=True)
        assert np.all(np.isfinite(np.asarray(out)))
