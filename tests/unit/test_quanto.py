"""Quanto pricing via the carry helper (market/inputs.py::
quanto_dividend_yield — beyond the reference's single-currency scope).

The helper folds the quanto drift adjustment into ``dividend_yield`` so a
plain domestic BlackScholesInputs prices the fixed-FX payoff.  The oracle
is a genuinely independent FOREIGN-measure Monte Carlo with the explicit
Radon-Nikodym weight (X₀/X_T)·e^{(r_d−r_f)T} — no quanto formula appears
in it, only the measure change."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)
S0, K = 100.0, 105.0
R_D, R_F, Q = 0.05, 0.02, 0.01
SIG, SIG_X, RHO = 0.25, 0.12, -0.35


def _quanto_analytic():
    y = hh.quanto_dividend_yield(R_D, R_F, Q, SIG, SIG_X, RHO)
    mkt = hh.BlackScholesInputs(REF, R_D, S0, SIG, dividend_yield=y)
    opt = hh.VanillaOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    return float(hh.solve(hh.PricingProblem(opt, mkt), hh.BlackScholesAnalytic()).price)


def test_quanto_vs_foreign_measure_mc():
    T = 1.0
    n = 1 << 19
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    z1 = jax.random.normal(k1, (n,), dtype=jnp.float64)
    z2 = RHO * z1 + jnp.sqrt(1 - RHO**2) * jax.random.normal(
        k2, (n,), dtype=jnp.float64)
    z1, z2 = jnp.concatenate([z1, -z1]), jnp.concatenate([z2, -z2])
    # foreign measure: S drifts r_f − q; X (domestic-per-foreign) drifts
    # r_d − r_f + σ_x² (1/X is a foreign-traded asset)
    s_T = S0 * jnp.exp((R_F - Q - 0.5 * SIG**2) * T + SIG * z1)
    x_ratio = jnp.exp((R_D - R_F + SIG_X**2 - 0.5 * SIG_X**2) * T + SIG_X * z2)
    rn = (1.0 / x_ratio) * np.exp((R_D - R_F) * T)  # (X₀/X_T)·e^{(r_d−r_f)T}
    mc = float(np.exp(-R_D * T) * jnp.mean(jnp.maximum(s_T - K, 0.0) * rn))
    np.testing.assert_allclose(_quanto_analytic(), mc, rtol=5e-3)


def test_quanto_adjustment_direction():
    """Negative asset-FX correlation RAISES the quanto call (drift gains
    −ρσσ_x); zero FX vol or correlation recovers the plain foreign-measure
    price discounted domestically."""
    base = _quanto_analytic()
    y0 = hh.quanto_dividend_yield(R_D, R_F, Q, SIG, 0.0, RHO)
    mkt0 = hh.BlackScholesInputs(REF, R_D, S0, SIG, dividend_yield=y0)
    opt = hh.VanillaOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    plain = float(hh.solve(hh.PricingProblem(opt, mkt0), hh.BlackScholesAnalytic()).price)
    assert base > plain  # ρ < 0 ⇒ higher drift ⇒ dearer call
    np.testing.assert_allclose(
        float(hh.quanto_dividend_yield(R_D, R_F, Q, SIG, SIG_X, 0.0)),
        R_D - R_F + Q, rtol=1e-15)
