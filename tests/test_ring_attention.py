"""Ring attention (sequence parallelism) vs the dense path.

The reference has no sequence parallelism (SURVEY.md §5) — these tests
pin the beyond-parity ring path to the framework's own dense attention:
same outputs, same gradients, on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from bvc_tpu.ops.attention import _xla_attention, multi_head_attention
from bvc_tpu.ops.ring_attention import ring_attention


def _mesh(shape):
    names = tuple(shape.keys())
    sizes = tuple(shape.values())
    n = int(np.prod(sizes))
    return Mesh(np.array(jax.devices()[:n]).reshape(sizes), names)


def _qkv(rng, B=2, N=32, h=3, d=8, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, N, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((B, N, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((B, N, h, d)), dtype)
    return q, k, v


def _ring_over_mesh(mesh, fn, key_mask=None):
    spec = P(None, "seq", None, None)
    in_specs = (spec, spec, spec)
    if key_mask is not None:
        in_specs = in_specs + (P(None, "seq"),)
    return jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=spec)
    )


class TestRingAttention:
    @pytest.mark.parametrize("seq_shards", [2, 4, 8])
    def test_matches_dense_unmasked(self, rng, seq_shards):
        mesh = _mesh({"seq": seq_shards})
        q, k, v = _qkv(rng)
        dense = _xla_attention(q, k, v, q.shape[-1] ** -0.5)
        ring = _ring_over_mesh(
            mesh, lambda qq, kk, vv: ring_attention(qq, kk, vv, "seq")
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    def test_matches_dense_masked(self, rng):
        mesh = _mesh({"seq": 4})
        q, k, v = _qkv(rng)
        key_mask = jnp.asarray(rng.random((2, 32)) > 0.3)
        dense = _xla_attention(q, k, v, q.shape[-1] ** -0.5, key_mask=key_mask)
        ring = _ring_over_mesh(
            mesh,
            lambda qq, kk, vv, km: ring_attention(qq, kk, vv, "seq", key_mask=km),
            key_mask=True,
        )(q, k, v, key_mask)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    def test_fully_masked_rows_match_dense(self, rng):
        # a sample whose every key is masked: dense softmax over the
        # -1e30 bias goes uniform; the online merge must agree, not nan
        mesh = _mesh({"seq": 4})
        q, k, v = _qkv(rng)
        key_mask = jnp.zeros((2, 32), bool).at[1].set(True)
        dense = _xla_attention(q, k, v, q.shape[-1] ** -0.5, key_mask=key_mask)
        ring = _ring_over_mesh(
            mesh,
            lambda qq, kk, vv, km: ring_attention(qq, kk, vv, "seq", key_mask=km),
            key_mask=True,
        )(q, k, v, key_mask)
        assert np.isfinite(np.asarray(ring)).all()
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_dense(self, rng):
        mesh = _mesh({"seq": 4})
        q, k, v = _qkv(rng)
        w = jnp.asarray(rng.standard_normal((2, 32, 3, 8)), jnp.float32)

        def dense_loss(qq, kk, vv):
            return jnp.sum(_xla_attention(qq, kk, vv, qq.shape[-1] ** -0.5) * w)

        spec = P(None, "seq", None, None)

        def ring_loss(qq, kk, vv, ww):
            out = ring_attention(qq, kk, vv, "seq")
            return jax.lax.psum(jnp.sum(out * ww), "seq")

        ring_grads = jax.jit(
            jax.grad(
                jax.shard_map(
                    ring_loss, mesh=mesh,
                    in_specs=(spec, spec, spec, spec), out_specs=P(),
                ),
                argnums=(0, 1, 2),
            )
        )(q, k, v, w)
        dense_grads = jax.grad(dense_loss, argnums=(0, 1, 2))(q, k, v)
        for rg, dg in zip(ring_grads, dense_grads):
            np.testing.assert_allclose(np.asarray(rg), np.asarray(dg),
                                       rtol=1e-4, atol=1e-4)

    def test_impl_string_routes_to_ring(self, rng):
        mesh = _mesh({"seq": 4})
        q, k, v = _qkv(rng)
        dense = _xla_attention(q, k, v, q.shape[-1] ** -0.5)
        ring = _ring_over_mesh(
            mesh,
            lambda qq, kk, vv: multi_head_attention(qq, kk, vv, impl="ring:seq"),
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    def test_composes_with_data_axis(self, rng):
        # batch over 'data', tokens over 'seq' — the layout seqpar uses
        mesh = _mesh({"data": 2, "seq": 4})
        q, k, v = _qkv(rng)
        dense = _xla_attention(q, k, v, q.shape[-1] ** -0.5)
        spec = P("data", "seq", None, None)
        ring = jax.jit(
            jax.shard_map(
                lambda qq, kk, vv: ring_attention(qq, kk, vv, "seq"),
                mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            )
        )(q, k, v)
        np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)
