import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.ops.attention import multi_head_attention, _xla_attention
from bvc_tpu.ops.flash_attention import flash_attention
from bvc_tpu.ops.patchify import patchify_pixels, tubelet_patchify


class TestPatchify:
    def test_matches_strided_conv(self):
        """Reshape+matmul patchify must equal Conv3d with stride=kernel —
        the op it re-expresses (reference vision_transformer.py:250-255)."""
        rng = np.random.default_rng(0)
        B, T, H, W, C = 2, 4, 8, 8, 3
        ts, p, D = 2, 4, 16
        video = rng.standard_normal((B, T, H, W, C)).astype(np.float32)
        kernel_flat = rng.standard_normal((C * ts * p * p, D)).astype(np.float32)
        bias = rng.standard_normal((D,)).astype(np.float32)

        out = tubelet_patchify(jnp.array(video), jnp.array(kernel_flat),
                               jnp.array(bias), ts, p, dtype=jnp.float32)

        # independent check via lax conv: NCDHW x OIDHW
        vid_ncdhw = jnp.array(video).transpose(0, 4, 1, 2, 3)
        w_oidhw = jnp.array(kernel_flat).T.reshape(D, C, ts, p, p)
        conv = jax.lax.conv_general_dilated(
            vid_ncdhw, w_oidhw, window_strides=(ts, p, p), padding="VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        conv = conv.reshape(B, D, -1).transpose(0, 2, 1) + bias
        np.testing.assert_allclose(np.asarray(out), np.asarray(conv), rtol=2e-4, atol=2e-4)

    def test_pixel_block_ordering(self):
        # token order: time-major then row-major spatial
        T, H, W, C, ts, p = 4, 4, 4, 1, 2, 2
        video = np.arange(T * H * W * C, dtype=np.float32).reshape(1, T, H, W, C)
        blocks = np.asarray(patchify_pixels(jnp.array(video), ts, p))
        assert blocks.shape == (1, (T // ts) * (H // p) * (W // p), ts * p * p)
        # first token = frames 0-1, rows 0-1, cols 0-1; feature order (c,dt,dh,dw)
        expected0 = [video[0, dt, dh, dw, 0] for dt in range(2) for dh in range(2) for dw in range(2)]
        np.testing.assert_allclose(blocks[0, 0], expected0)
        # token 1 is the next spatial patch (same time slab)
        expected1 = [video[0, dt, dh, dw + 2, 0] for dt in range(2) for dh in range(2) for dw in range(2)]
        np.testing.assert_allclose(blocks[0, 1], expected1)

    def test_roundtrip_shapes_vitb(self):
        video = jnp.zeros((1, 16, 224, 224, 3))
        blocks = patchify_pixels(video, 2, 16)
        assert blocks.shape == (1, 1568, 1536)


class TestAttention:
    def _qkv(self, B=2, N=64, h=4, d=8, seed=0):
        rng = np.random.default_rng(seed)
        return [jnp.array(rng.standard_normal((B, N, h, d)), dtype=jnp.float32)
                for _ in range(3)]

    def test_xla_matches_naive_softmax(self):
        q, k, v = self._qkv()
        out = multi_head_attention(q, k, v, impl="xla")
        # independent naive computation
        scale = q.shape[-1] ** -0.5
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
        m = logits.max(-1, keepdims=True)
        p = np.exp(logits - m)
        p /= p.sum(-1, keepdims=True)
        expected = np.einsum("bhqk,bkhd->bqhd", p, v)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)

    def test_xla_bf16_scores_close_to_f32(self):
        # bf16-stored logits (the JEPA target encoder's autocast-parity
        # mode): same math, bf16 quantization of the score tensor only
        q, k, v = self._qkv(N=48)
        ref = np.asarray(multi_head_attention(q, k, v, impl="xla"))
        out = np.asarray(multi_head_attention(q, k, v, impl="xla_bf16"))
        np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.03)
        assert not np.array_equal(out, ref)  # it really quantized

    def test_xla_bf16_defers_to_flash_at_long_sequences(self, monkeypatch):
        # at n >= 512 unmasked on TPU, materializing even bf16 [B,h,N,N]
        # logits defeats the flash kernels' purpose — xla_bf16 must route
        # to flash there (16-frame JEPA configs reach 1568 tokens)
        import bvc_tpu.ops.attention as attn
        import bvc_tpu.ops.flash_attention as fa

        monkeypatch.setattr(attn.jax, "default_backend", lambda: "tpu")
        called = {}

        def fake_flash(q, k, v, scale=None, key_mask=None):
            called["flash"] = True
            return q

        monkeypatch.setattr(fa, "flash_attention", fake_flash)
        q, k, v = self._qkv(N=512)
        attn.multi_head_attention(q, k, v, impl="xla_bf16")
        assert called.get("flash")
        # short sequences stay on the bf16 XLA path
        called.clear()
        q, k, v = self._qkv(N=64)
        attn.multi_head_attention(q, k, v, impl="xla_bf16")
        assert not called

    def test_masked_auto_routes_by_score_memory(self):
        # VERDICT r2 #3: masked 'auto' stays on XLA while the f32 score
        # tensor fits (XLA's fused bwd is faster), but routes to the
        # key-bias flash kernels once it would exceed the HBM budget —
        # the bs-128 JEPA predictor case that OOMed
        from bvc_tpu.ops.attention import masked_auto_impl

        # off-TPU always XLA
        assert masked_auto_impl(512, 12, 209, 209, on_tpu=False) == "xla"
        # bs-64 predictor: [256, 12, 209, 209] ≈ 536 MB → XLA
        assert masked_auto_impl(256, 12, 209, 209, on_tpu=True) == "xla"
        # bs-128 predictor: ≈ 1.07 GiB → flash
        assert masked_auto_impl(512, 12, 209, 209, on_tpu=True) == "flash"

    def test_xla_bf16_masked_also_routes_by_memory(self, monkeypatch):
        # the autocast path must not bypass the big-batch flash escape
        # hatch: masked xla_bf16 consults the router at 2 bytes/score
        import bvc_tpu.ops.attention as attn
        import bvc_tpu.ops.flash_attention as fa

        monkeypatch.setattr(attn.jax, "default_backend", lambda: "tpu")
        called = {}
        monkeypatch.setattr(
            fa, "flash_attention",
            lambda q, k, v, scale=None, key_mask=None: called.setdefault(
                "flash", True) and q,
        )
        q, k, v = self._qkv(N=16)
        mask = jnp.asarray(np.ones((2, 16), bool))
        # under the limit: stays on the bf16 XLA path
        attn.multi_head_attention(q, k, v, impl="xla_bf16", key_mask=mask)
        assert not called
        # over the limit (shrunk for the test): routes to flash
        monkeypatch.setattr(attn, "MASKED_XLA_SCORE_BYTES_LIMIT", 1)
        attn.multi_head_attention(q, k, v, impl="xla_bf16", key_mask=mask)
        assert called.get("flash")

    def test_xla_bf16_respects_key_mask(self):
        q, k, v = self._qkv(N=16)
        mask = np.ones((2, 16), bool)
        mask[:, 10:] = False
        out = np.asarray(multi_head_attention(q, k, v, impl="xla_bf16",
                                              key_mask=jnp.asarray(mask)))
        # masked keys must not influence the output: perturbing them is a
        # no-op
        k2 = jnp.asarray(np.asarray(k).copy())
        k2 = k2.at[:, 10:].set(99.0)
        out2 = np.asarray(multi_head_attention(q, k2, v, impl="xla_bf16",
                                               key_mask=jnp.asarray(mask)))
        np.testing.assert_allclose(out, out2, rtol=1e-6, atol=1e-6)

    def test_flash_matches_xla_interpret(self):
        q, k, v = self._qkv(B=1, N=128, h=2, d=16)
        ref = multi_head_attention(q, k, v, impl="xla")
        out = flash_attention(q, k, v, block_q=32, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_flash_nondivisible_blocks_fall_back_to_divisors(self):
        q, k, v = self._qkv(B=1, N=96, h=1, d=8)
        ref = multi_head_attention(q, k, v, impl="xla")
        out = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_flash_grads_match_xla_divisor_path(self):
        # N % 8 == 0 → unpadded maskless path; checks the pre-scaled-q
        # chain rule (dq gets the scale, dk must NOT)
        q, k, v = self._qkv(B=2, N=64, h=2, d=16, seed=1)
        w = jnp.asarray(np.random.default_rng(2).standard_normal((64, 1)),
                        jnp.float32)

        def loss(f):
            return lambda a, b, c: jnp.sum(f(a, b, c) * w[None, :, None, :] )

        g_ours = jax.grad(loss(lambda a, b, c: flash_attention(
            a, b, c, block_q=32, block_k=32, bwd_block_q=32, bwd_block_k=32,
            interpret=True)), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(lambda a, b, c: multi_head_attention(
            a, b, c, impl="xla")), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_flash_key_mask_matches_xla(self):
        # per-sample key masks (JEPA static-cap padding) route through the
        # bias kernels; outputs at VALID key sets must match XLA exactly
        q, k, v = self._qkv(B=3, N=130, h=2, d=16, seed=5)
        rng = np.random.default_rng(6)
        key_mask = jnp.asarray(rng.random((3, 130)) > 0.4)
        # ensure every sample keeps at least a few keys
        key_mask = key_mask.at[:, :4].set(True)
        ref = multi_head_attention(q, k, v, impl="xla", key_mask=key_mask)
        out = flash_attention(q, k, v, interpret=True, key_mask=key_mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_flash_key_mask_grads_match_xla(self):
        q, k, v = self._qkv(B=2, N=64, h=2, d=16, seed=7)
        rng = np.random.default_rng(8)
        key_mask = jnp.asarray(rng.random((2, 64)) > 0.3)
        key_mask = key_mask.at[:, :4].set(True)

        def loss(f):
            return lambda a, b, c: jnp.sum(f(a, b, c) ** 2)

        g_ours = jax.grad(loss(lambda a, b, c: flash_attention(
            a, b, c, interpret=True, key_mask=key_mask)),
            argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(lambda a, b, c: multi_head_attention(
            a, b, c, impl="xla", key_mask=key_mask)),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
        # masked-key grad rows must be exactly zero for dk/dv
        masked = ~np.asarray(key_mask)
        np.testing.assert_allclose(np.asarray(g_ours[1])[masked], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_ours[2])[masked], 0.0, atol=1e-6)

    def test_flash_key_mask_multi_key_block(self):
        # N=300 pads to Np=384; block_k=128 forces num_kb=3 so the
        # in-kernel lane-dim bias slicing runs at non-zero offsets
        # (offsets are 128-aligned by construction — Mosaic requirement)
        q, k, v = self._qkv(B=2, N=300, h=2, d=16, seed=9)
        rng = np.random.default_rng(10)
        key_mask = jnp.asarray(rng.random((2, 300)) > 0.4)
        key_mask = key_mask.at[:, :4].set(True)

        def loss(f):
            return lambda a, b, c: jnp.sum(f(a, b, c) ** 2)

        flash = lambda a, b, c: flash_attention(
            a, b, c, block_k=128, bwd_block_k=128, interpret=True,
            key_mask=key_mask)
        ref = lambda a, b, c: multi_head_attention(
            a, b, c, impl="xla", key_mask=key_mask)
        np.testing.assert_allclose(np.asarray(flash(q, k, v)),
                                   np.asarray(ref(q, k, v)),
                                   rtol=1e-5, atol=1e-5)
        g_ours = jax.grad(loss(flash), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_flash_grads_match_xla_padded_path(self):
        # N = 90 (not a sublane multiple) → padded+masked path
        q, k, v = self._qkv(B=1, N=90, h=2, d=16, seed=3)

        def loss(f):
            return lambda a, b, c: jnp.sum(f(a, b, c) ** 2)

        g_ours = jax.grad(loss(lambda a, b, c: flash_attention(
            a, b, c, interpret=True)), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss(lambda a, b, c: multi_head_attention(
            a, b, c, impl="xla")), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ours, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
