"""Accuracy bounds of the polynomial erf-GELU fast path (ops/gelu.py).

Reference semantics: the torch side uses exact-erf ``nn.GELU()``
(HF VideoMAE MLP; JEPA ``vision_transformer.py`` Mlp) — the polynomial
must stay below bf16 resolution of that form everywhere.

Coefficient derivation (reproducible):

    c = 4.0; deg = 7
    xs = linspace(1e-8, c, 40001); u = xs**2
    target = erf(xs / sqrt(2)) / xs
    # Chebyshev basis in u on [0, c^2]; Lawson-iterated weighted
    # least squares, weight ~ 0.5 * u so the minimax criterion is
    # absolute *gelu* error (= 0.5 * x^2 * erf-relative error), 3000
    # reweighting rounds; convert to monomials in u.

giving max abs gelu error 3.79e-5 inside the clamp and 1.27e-4 at the
|x| = 4 boundary (the true erfc tail mass) — both asserted below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.ops.gelu import gelu, gelu_poly


def _exact64(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _dexact64(x):
    from scipy.special import erf

    return 0.5 * (1.0 + erf(x / np.sqrt(2.0))) + x * np.exp(
        -x * x / 2.0
    ) / np.sqrt(2.0 * np.pi)


@pytest.fixture(scope="module")
def grid():
    # every bf16-representable magnitude in [2^-10, 8] plus zero and sign
    mags = np.concatenate(
        [2.0 ** np.arange(-10, 3.01, 1.0)[:, None] * (1 + np.arange(256) / 256.0)[None, :]]
    ).ravel()
    mags = mags[mags <= 8.0]
    xs = np.concatenate([-mags[::-1], [0.0], mags])
    return xs.astype(np.float64)


def test_forward_error_bound(grid):
    got = np.asarray(gelu_poly(jnp.asarray(grid, jnp.float32)), np.float64)
    err = np.abs(got - _exact64(grid))
    assert err.max() < 1.5e-4  # 1.27e-4 boundary + f32 eval noise
    inside = np.abs(grid) <= 3.98
    assert err[inside].max() < 5e-5


def test_gradient_error_bound(grid):
    dg = jax.vmap(jax.grad(lambda x: gelu_poly(x)))(
        jnp.asarray(grid, jnp.float32)
    )
    derr = np.abs(np.asarray(dg, np.float64) - _dexact64(grid))
    # worst case 2.8e-3 sits exactly at the |x|=4 clamp boundary
    assert derr.max() < 3.5e-3
    inside = np.abs(grid) <= 3.9
    assert derr[inside].max() < 1e-3


def test_below_bf16_resolution(grid):
    """The poly-vs-exact gap never exceeds one bf16 ulp of the OUTPUT
    at magnitudes >= gelu's own minimum — i.e. downstream bf16 consumers
    cannot tell the forms apart beyond last-bit rounding ties."""
    exact = _exact64(grid)
    got = np.asarray(gelu_poly(jnp.asarray(grid, jnp.float32)), np.float64)
    err = np.abs(got - exact)
    # bf16 ulp at |exact| (floor at the ulp of gelu's min magnitude 0.17)
    mag = np.maximum(np.abs(exact), 0.17)
    ulp = 2.0 ** (np.floor(np.log2(mag)) - 8)
    assert (err <= ulp).all()


def test_dtype_dispatch():
    x32 = jnp.linspace(-3, 3, 101, dtype=jnp.float32)
    # f32: exact path, bit-identical to jax.nn.gelu
    np.testing.assert_array_equal(
        np.asarray(gelu(x32)), np.asarray(jax.nn.gelu(x32, approximate=False))
    )
    # bf16: poly path, bit-identical to gelu_poly
    xb = x32.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(gelu(xb), np.float32), np.asarray(gelu_poly(xb), np.float32)
    )
    assert gelu(xb).dtype == jnp.bfloat16
    with pytest.raises(ValueError):
        gelu(x32, impl="nope")


def test_bf16_output_close_to_truth():
    """End-of-pipe check at the production dtype: bf16 in, bf16 out.

    Ground truth is f64 gelu of the bf16 input, rounded to bf16.  The
    poly path stays within one output ulp of it everywhere; notably
    ``jax.nn.gelu`` itself does NOT (XLA evaluates erf in bf16 for bf16
    inputs — measured up to ~6 ulp off on this grid), so the polynomial
    is strictly *more* faithful to the reference's f32-erf semantics
    than the 'exact' impl at this dtype, as well as faster."""
    xs = jnp.asarray(np.linspace(-6, 6, 4097), jnp.bfloat16)
    x64 = np.asarray(xs, np.float64)
    truth = jnp.asarray(_exact64(x64)).astype(jnp.bfloat16)
    a = np.asarray(gelu(xs, impl="poly"), np.float32)
    t = np.asarray(truth, np.float32)
    diff = np.abs(a - t)
    # true bf16 ulp: 7 stored mantissa bits -> spacing 2^(e-7); <= 1 ulp
    # everywhere (the residual cases are rounding ties where the f64
    # truth sits within the poly's 4e-5 band of a bf16 midpoint)
    ulp = 2.0 ** (np.floor(np.log2(np.maximum(np.abs(t), 0.125))) - 7)
    assert (diff <= ulp + 1e-7).all()
    # and the claim above: the bf16-erf 'exact' path is farther from
    # truth than the poly path on this grid
    b = np.asarray(gelu(xs, impl="exact"), np.float32)
    assert np.abs(b - t).max() > diff.max()
