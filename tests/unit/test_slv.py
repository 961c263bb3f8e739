"""Stochastic-local-vol model family (beyond-reference; models/slv.py).

The defining SLV property replaces an external oracle: a leverage surface
calibrated by the particle method must make the model reprice the market
vanilla surface it was built from — at EVERY mixing fraction.  Degenerate
corners pin the pieces: mixing = 0 collapses to pure local vol (E[V|S] is
the deterministic CIR mean, exactly known), and a flat input surface makes
the target price a closed-form Black-Scholes value.
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2025, 1, 1)
EXPIRY = dt.date(2026, 1, 1)


def _flat_market(mixing=1.0, sigma_flat=0.2):
    return hh.SLVInputs(
        REF, 0.03, 100.0, V0=0.04, kappa=2.0, theta=0.05, sigma=0.6,
        rho=-0.7, sigma_surface=sigma_flat, mixing=mixing,
    )


def _skew_surface():
    strikes = np.array([70.0, 85.0, 100.0, 115.0, 130.0])
    tenors = np.array([0.5, 1.5])
    vols = np.stack([np.clip(0.25 - 0.10 * np.log(strikes / 100.0), 0.12, 0.45)] * 2)
    return hh.RectVolSurface(REF, tenors, strikes, vols, interp_strike="cubic")


def _mc(paths=2**15, steps=24, seed=7):
    return hh.MonteCarlo(
        hh.SLVDynamics(), hh.EulerMaruyama(),
        hh.SimulationConfig(trajectories=paths, steps=steps,
                            variance_reduction=hh.Antithetic(), seed=seed),
    )


def _bs_price(payoff, sigma_or_surface):
    return hh.solve(
        hh.PricingProblem(payoff, hh.BlackScholesInputs(REF, 0.03, 100.0, sigma_or_surface)),
        hh.BlackScholesAnalytic(),
    ).price


def test_flat_surface_reprice_full_mixing():
    """Full Heston vol-of-vol, flat 20% target surface: the calibrated
    leverage must flatten the Heston smile back to the BS price."""
    m = _flat_market(mixing=1.0)
    lev = hh.calibrate_leverage(m, EXPIRY, steps=24, paths=16384, bins=51, seed=1)
    payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    p = hh.solve(hh.PricingProblem(payoff, m.with_leverage(lev)), _mc()).price
    np.testing.assert_allclose(float(p), float(_bs_price(payoff, 0.2)), rtol=1.5e-2)


def test_mixing_zero_is_pure_local_vol():
    """mixing = 0 makes V deterministic, E[V|S] = V(t) exactly, so the
    leverage collapses to sigma_loc/sqrt(V(t)) and SLV IS local vol: on a
    flat surface the effective vol is exactly flat."""
    m = _flat_market(mixing=0.0)
    lev = hh.calibrate_leverage(m, EXPIRY, steps=24, paths=8192, bins=41, seed=2)
    payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    p = hh.solve(hh.PricingProblem(payoff, m.with_leverage(lev)), _mc()).price
    np.testing.assert_allclose(float(p), float(_bs_price(payoff, 0.2)), rtol=1e-2)


def test_skew_surface_reprice():
    """The real Gyongy test: SLV with full mixing must reprice a SKEWED
    vanilla surface across strikes."""
    surf = _skew_surface()
    m = hh.SLVInputs(REF, 0.03, 100.0, V0=0.0625, kappa=1.5, theta=0.0625,
                     sigma=0.5, rho=-0.6, sigma_surface=surf, mixing=1.0)
    lev = hh.calibrate_leverage(m, EXPIRY, steps=32, paths=32768, bins=51, seed=3)
    # wings regularized by the shrinkage prior, not the hard cap
    assert float(lev.values.max()) < 10.0
    m2 = m.with_leverage(lev)
    mc = _mc(paths=2**16, steps=32, seed=11)
    bsm = hh.BlackScholesInputs(REF, 0.03, 100.0, surf)
    for K in (85.0, 100.0, 115.0):
        payoff = hh.VanillaOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot())
        p = hh.solve(hh.PricingProblem(payoff, m2), mc).price
        pb = hh.solve(hh.PricingProblem(payoff, bsm), hh.BlackScholesAnalytic()).price
        np.testing.assert_allclose(float(p), float(pb), rtol=2e-2)


def test_uncalibrated_market_raises():
    m = _flat_market()
    payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    with pytest.raises(ValueError, match="calibrate_leverage"):
        hh.solve(hh.PricingProblem(payoff, m), _mc(paths=64, steps=2))


def test_carr_madan_rejects_slv():
    m = _flat_market()
    payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    with pytest.raises(TypeError, match="no terminal law"):
        hh.solve(hh.PricingProblem(payoff, m), hh.CarrMadan(dynamics=hh.SLVDynamics()))


def test_ad_delta_through_calibration():
    """jax.grad flows through calibrate_leverage into the price (the
    leverage is a smooth function of the market), matching same-seed FD."""
    surf = _skew_surface()

    def price_of_spot(s):
        m = hh.SLVInputs(REF, 0.02, s, V0=0.0625, kappa=1.5, theta=0.0625,
                         sigma=0.5, rho=-0.6, sigma_surface=surf, mixing=1.0)
        lev = hh.calibrate_leverage(m, EXPIRY, steps=10, paths=4096, bins=41, seed=3)
        payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
        cfg = hh.SimulationConfig(trajectories=8192, steps=10,
                                  variance_reduction=hh.Antithetic(), seed=11)
        return hh.solve(
            hh.PricingProblem(payoff, m.with_leverage(lev)),
            hh.MonteCarlo(hh.SLVDynamics(), hh.EulerMaruyama(), cfg),
        ).price

    d_ad = float(jax.grad(price_of_spot)(100.0))
    eps = 0.5
    d_fd = float((price_of_spot(100.0 + eps) - price_of_spot(100.0 - eps)) / (2 * eps))
    # piecewise-linear interpolation kinks make AD/FD agree only to first
    # order at small particle counts
    np.testing.assert_allclose(d_ad, d_fd, rtol=1e-1)
    assert 0.3 < d_ad < 0.9


def test_grid_composition_asian_and_american():
    """The SLV stepper feeds the generic grid consumers: Asians price
    below the vanilla, LSM American puts dominate the European put."""
    m = _flat_market(mixing=1.0)
    lev = hh.calibrate_leverage(m, EXPIRY, steps=16, paths=8192, bins=41, seed=4)
    m2 = m.with_leverage(lev)
    mc = _mc(paths=8192, steps=16, seed=9)

    asian = hh.AsianOption(100.0, EXPIRY, observations=16,
                           averaging=hh.ArithmeticAverage())
    p_asian = hh.solve(hh.PricingProblem(asian, m2), mc).price
    vanilla = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    p_van = hh.solve(hh.PricingProblem(vanilla, m2), mc).price
    assert 0.0 < float(p_asian) < float(p_van)

    eur_put = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Put(), hh.Spot())
    am_put = hh.VanillaOption(100.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())
    p_eur = hh.solve(hh.PricingProblem(eur_put, m2), mc).price
    p_am = hh.solve(hh.PricingProblem(am_put, m2), hh.LSM(mc, degree=4)).price
    assert float(p_am) >= float(p_eur) - 0.05


def test_qmc_stream_supported():
    m = _flat_market(mixing=1.0)
    lev = hh.calibrate_leverage(m, EXPIRY, steps=8, paths=4096, bins=41, seed=5)
    cfg = hh.SimulationConfig(trajectories=4096, steps=8,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    mc = hh.MonteCarlo(hh.SLVDynamics(), hh.EulerMaruyama(), cfg)
    payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    p = hh.solve(hh.PricingProblem(payoff, m.with_leverage(lev)), mc).price
    np.testing.assert_allclose(float(p), float(_bs_price(payoff, 0.2)), rtol=2e-2)


def test_leverage_surface_lookup_clamps():
    lev = hh.LeverageSurface(
        t_grid=jnp.array([0.0, 0.5]),
        x_grid=jnp.array([4.0, 4.5, 5.0]),
        values=jnp.array([[1.0, 2.0, 3.0], [2.0, 3.0, 4.0]]),
    )
    # zero-order hold in t; clamped linear in x
    assert float(hh.leverage_at(lev, 0.2, jnp.array(4.25))) == pytest.approx(1.5)
    assert float(hh.leverage_at(lev, 0.9, jnp.array(3.0))) == pytest.approx(2.0)
    assert float(hh.leverage_at(lev, -0.1, jnp.array(9.0))) == pytest.approx(3.0)
