"""Exact-erf GELU with a below-bf16-resolution polynomial fast path.

The reference's transformers use exact-erf GELU (HF ``ViTMAELayer`` /
the JEPA ``vision_transformer.py`` MLP both call ``nn.GELU()``, whose
default is the erf form — not the tanh approximation).  On the v5e the
erf expansion is the VPU-transcendental hotspot of the VideoMAE decoder
and the JEPA target encoder: PERFORMANCE.md's round-4 decoder ledger
measures the (48, 1568, 1536) GELU at 1.78 ms — 3.2x its HBM roof —
because XLA's f32 erf takes the branchy small/large-argument path
(polynomial + exp-based erfc + select) on every element.

``gelu_poly`` replaces it with a single clamped odd-polynomial form::

    erf(x / sqrt(2)) ~= x * P(x^2),   P of degree 7  (8 FMAs)
    gelu(x) = 0.5 * x * (1 + x * P(x^2))   clamped to x / 0 outside |x|<=4

evaluated in f32 regardless of input dtype (matching ``jax.nn.gelu``'s
upcast behaviour for bf16 inputs).  Accuracy, verified in
``tests/test_gelu.py`` against the exact form:

- max abs error 3.8e-5 inside |x| <= 4; 1.3e-4 at the clamp boundary
  (= 0.5 * 4 * erfc(4 / sqrt(2)), the true tail mass);
- the autodiff derivative (a pure polynomial — no exp, unlike the true
  gelu' = Phi(x) + x * phi(x)) is within 2.8e-3 of the true derivative,
  and that worst case sits exactly at |x| = 4;
- both bounds are below bf16 input resolution at the magnitudes where
  they occur (bf16 ulp at |x| = 4 is 3.1e-2), so feeding the result into
  the bf16 fc2 matmul is indistinguishable from the exact form at the
  one place parity could leak.

The coefficients come from a Lawson-iterated weighted least-squares fit
(minimax in *gelu* error, not erf error) in a Chebyshev basis on
x^2 in [0, 16]; the derivation lives in tests/test_gelu.py's module
docstring so the constants stay reproducible.

``impl='auto'`` uses the polynomial only for sub-f32 inputs (bf16/f16):
full-f32 callers — parity tests, float64-less numeric checks — keep
XLA's exact erf, so the fast path can never mask a genuine f32
comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# P(u) with u = x^2: erf(x / sqrt(2)) ~= x * P(x^2) on |x| <= 4,
# minimax-weighted for absolute gelu error (see module docstring).
GELU_ERF_POLY_COEF: tuple[float, ...] = (
    7.9734678899e-01,
    -1.3177568632e-01,
    1.9010796243e-02,
    -2.0129805657e-03,
    1.4971004030e-04,
    -7.3142603991e-06,
    2.0839182688e-07,
    -2.6025839423e-09,
)

_CLAMP = 4.0


def gelu_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Clamped-polynomial erf-GELU; f32 internals, input dtype out."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    u = xf * xf
    p = jnp.float32(GELU_ERF_POLY_COEF[-1])
    for c in GELU_ERF_POLY_COEF[-2::-1]:
        p = p * u + jnp.float32(c)
    g = 0.5 * xf * (1.0 + xf * p)
    g = jnp.where(xf > _CLAMP, xf, g)
    g = jnp.where(xf < -_CLAMP, jnp.float32(0.0), g)
    return g.astype(dtype)


def gelu(x: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """Erf-GELU (the reference's ``nn.GELU()`` semantics).

    impl:
      - ``'auto'``: polynomial for sub-f32 inputs (where its error is
        below the input format's own resolution), exact erf for f32+;
      - ``'exact'``: ``jax.nn.gelu(approximate=False)`` always;
      - ``'poly'``: the polynomial always (tests / probes).
    """
    if impl == "auto":
        impl = "poly" if jnp.finfo(x.dtype).bits < 32 else "exact"
    if impl == "poly":
        return gelu_poly(x)
    if impl == "exact":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown gelu impl {impl!r}")
