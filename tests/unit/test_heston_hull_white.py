"""Heston-Hull-White hybrid (beyond-reference: equity smile under
STOCHASTIC rates — the long-dated structured-products model).  The
three-factor conditional mixing estimator is pinned at its two exactly-
solvable corners (σ_v → 0: the Black-Scholes-Hull-White closed form;
σ_r → 0: the plain Heston mixing estimator), the hybrid forward is
martingale-exact, and AD greeks flow in every parameter including the
rate-vol and equity-rate correlation."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.models.hull_white import hw_b, hw_gamma

REF, EXP = dt.date(2024, 1, 1), dt.date(2024, 12, 31)  # T = 1
T = 1.0


def _opt(strike=100.0, cp=None):
    return hh.VanillaOption(strike, EXP, hh.European(), cp or hh.Call(), hh.Spot())


def _mc(trajectories=80_000, steps=32, seed=0):
    return hh.MonteCarlo(
        hh.HestonHullWhiteDynamics(), hh.HestonQE(conditional=True),
        hh.SimulationConfig(trajectories=trajectories, steps=steps, seed=seed,
                            variance_reduction=hh.Antithetic()))


def _hhw(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho_sv=-0.6,
         a=0.1, sigma_r=0.012, rho_sr=-0.3):
    return hh.HestonHullWhiteInputs(REF, 0.03, 100.0, V0, kappa, theta,
                                    sigma, rho_sv, a, sigma_r, rho_sr)


def _bshw_price(strike, s_s, a, sr, rho_sr, r=0.03, spot=100.0, cp=1.0):
    """Black-Scholes-Hull-White closed form (Brigo-Mercurio): lognormal S
    under Gaussian rates — Black on the T-forward with total variance
    σ²T + 2ρσσ_r(T − B(T))/a + σ_r²Γ(T)."""
    from scipy.stats import norm as snorm

    b = float(hw_b(a, T))
    g = float(hw_gamma(a, T))
    tot = s_s**2 * T + 2 * rho_sr * s_s * sr * (T - b) / a + sr**2 * g
    p0t = np.exp(-r * T)
    f = spot / p0t
    sd = np.sqrt(tot)
    d1 = (np.log(f / strike) + 0.5 * tot) / sd
    return p0t * cp * (f * snorm.cdf(cp * d1) - strike * snorm.cdf(cp * (d1 - sd)))


def test_bs_hull_white_corner():
    """σ_v → 0, V0 = θ: deterministic equity variance under stochastic
    rates — the BS-HW closed form, incl. the 2ρσσ_r cross term."""
    s_s, a, sr, rho_sr = 0.2, 0.1, 0.015, -0.3
    m = _hhw(V0=s_s**2, theta=s_s**2, sigma=1e-8, rho_sv=0.0,
             a=a, sigma_r=sr, rho_sr=rho_sr)
    for k in (90.0, 100.0, 110.0):
        p = float(hh.solve(hh.PricingProblem(_opt(k), m), _mc()).price)
        assert p == pytest.approx(_bshw_price(k, s_s, a, sr, rho_sr), rel=2e-3), k


def test_heston_corner():
    """σ_r → 0: the hybrid collapses onto the plain Heston mixing
    estimator (statistical agreement — the draw layouts differ)."""
    m = _hhw(rho_sv=-0.7, sigma_r=1e-10, rho_sr=0.0)
    p = float(hh.solve(hh.PricingProblem(_opt(), m), _mc()).price)
    hm = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    ph = float(hh.solve(hh.PricingProblem(_opt(), hm), hh.MonteCarlo(
        hh.HestonDynamics(), hh.HestonQE(conditional=True),
        hh.SimulationConfig(trajectories=80_000, steps=32, seed=0,
                            variance_reduction=hh.Antithetic()))).price)
    assert p == pytest.approx(ph, rel=3e-3)


def test_parity_and_martingale_discount():
    """Call − put = S₀ − K·P(0,T): the pathwise stochastic discount is
    exactly unbiased (the HW martingale identity), so hybrid parity holds
    to MC error at any step count."""
    m = _hhw()
    call = float(hh.solve(hh.PricingProblem(_opt(cp=hh.Call()), m),
                          _mc(60_000, 16, seed=5)).price)
    put = float(hh.solve(hh.PricingProblem(_opt(cp=hh.Put()), m),
                         _mc(60_000, 16, seed=5)).price)
    expected = 100.0 - 100.0 * float(np.exp(-0.03 * T))
    assert call - put == pytest.approx(expected, abs=3e-2)


def test_refinement_consistency():
    m = _hhw()
    p_c = float(hh.solve(hh.PricingProblem(_opt(), m), _mc(40_000, 8, seed=7)).price)
    p_f = float(hh.solve(hh.PricingProblem(_opt(), m), _mc(40_000, 48, seed=7)).price)
    assert p_c == pytest.approx(p_f, rel=1.5e-2)


def test_ad_greeks_full_hybrid():
    """jax.grad through the three-factor estimator: delta matches FD; the
    rate-vol vega and the equity-rate correlation greek are finite (the
    QE zero-variance sqrt is double-where guarded)."""
    def price(sp, sr, rho):
        m = hh.HestonHullWhiteInputs(REF, 0.03, sp, 0.04, 2.0, 0.04, 0.3,
                                     -0.6, 0.1, sr, rho)
        return hh.solve(hh.PricingProblem(_opt(), m), _mc(8_000, 16, seed=1)).price

    g = jax.grad(price, argnums=(0, 1, 2))(100.0, 0.012, -0.3)
    assert all(np.isfinite(float(x)) for x in g)
    fd = float(price(100.5, 0.012, -0.3) - price(99.5, 0.012, -0.3))
    assert float(g[0]) == pytest.approx(fd, rel=1e-3)


def test_strike_grid_and_dispatch_guards():
    m = _hhw()
    ks = jnp.asarray([90.0, 100.0, 110.0])
    grid = hh.solve(hh.PricingProblem(_opt(ks), m), _mc(4_000, 8)).price
    singles = [float(hh.solve(hh.PricingProblem(_opt(float(k)), m),
                              _mc(4_000, 8)).price) for k in ks]
    np.testing.assert_allclose(np.asarray(grid), singles, rtol=1e-12)
    with pytest.raises(TypeError, match="conditional mixing"):
        hh.solve(hh.PricingProblem(_opt(), m), hh.MonteCarlo(
            hh.HestonHullWhiteDynamics(), hh.HestonQE(),
            hh.SimulationConfig(trajectories=64)))
    with pytest.raises(ValueError, match="qmc"):
        hh.solve(hh.PricingProblem(_opt(), m), hh.MonteCarlo(
            hh.HestonHullWhiteDynamics(), hh.HestonQE(conditional=True),
            hh.SimulationConfig(trajectories=64, qmc=True)))
