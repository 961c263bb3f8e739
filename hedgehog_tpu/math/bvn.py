"""Bivariate standard-normal CDF Φ₂(h, k; ρ) — the closed-form primitive
behind compound (Geske) and two-asset rainbow (Stulz) pricing.

Genz's single-integral form (the identity behind Drezner-Wesolowsky):

    Φ₂(h, k; ρ) = Φ(h)·Φ(k)
                + (1/2π) ∫₀^{asin ρ} exp(−(h² − 2hk·sinθ + k²)/(2cos²θ)) dθ

evaluated with ONE fixed 64-node Gauss-Legendre rule on the θ-interval —
static shape, jit/vmap-friendly, and smooth in (h, k, ρ), so AD
correlation-vega flows.  Near |ρ| → 1 the integrand develops a boundary
layer at θ = ±π/2 that a global rule cannot resolve; |ρ| ≤ 0.99 holds
≤2e-9 absolute against scipy's Genz implementation (tests/unit/test_bvn.py)
— comfortably beyond any market correlation.  The |ρ| = 1 limits are exact
by construction: Φ₂(h, k; 1) = Φ(min(h, k)), Φ₂(h, k; −1) = max(Φ(h) −
Φ(−k), 0), recovered continuously as the integral closes the gap.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import norm

__all__ = ["bvn_cdf"]

# 64-point Gauss-Legendre on [0, 1].  Kept as NUMPY constants so that
# `import hedgehog_tpu` never executes a device computation: a module-scope
# `jnp.asarray` runs `convert_element_type` on the default backend at import
# time, which breaks the multichip dryrun contract on hosts whose accelerator
# runtime fails to initialize (the import raises before any fallback guard
# can run).  numpy operands fold into the trace at first jit instead.
_GL_X, _GL_W = np.polynomial.legendre.leggauss(64)
_GL_X = (_GL_X + 1.0) / 2.0
_GL_W = _GL_W / 2.0


def bvn_cdf(h, k, rho):
    """P(X ≤ h, Y ≤ k) for standard bivariate normal with correlation ρ.

    Broadcasts over all three arguments; |ρ| is clipped to 1 − 1e-12 (the
    limits are approached continuously — see module docstring)."""
    h = jnp.asarray(h, jnp.float64)
    k = jnp.asarray(k, jnp.float64)
    rho = jnp.clip(jnp.asarray(rho, jnp.float64), -1.0 + 1e-12, 1.0 - 1e-12)
    upper = jnp.arcsin(rho)
    theta = upper[..., None] * _GL_X  # (…, 64)
    sin_t = jnp.sin(theta)
    cos2 = 1.0 - sin_t * sin_t
    hh, kk = h[..., None], k[..., None]
    expo = jnp.exp(-(hh * hh - 2.0 * hh * kk * sin_t + kk * kk) / (2.0 * cos2))
    integral = upper * jnp.sum(_GL_W * expo, axis=-1)
    return norm.cdf(h) * norm.cdf(k) + integral / (2.0 * jnp.pi)
