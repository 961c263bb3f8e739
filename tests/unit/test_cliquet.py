"""Locally-capped cliquets (beyond-reference payoff, the classic equity
structured coupon): per-period clipped returns decompose as bull call
spreads on the forward return, giving a flat-vol BS closed form the grid
MC must reproduce exactly (GBM grid returns are exact at any step count)."""

import datetime as dt

import jax
import numpy as np
import pytest

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2024, 12, 31)  # T = 1 (ACT/365)


def _cliquet(floor=0.0, cap=0.05, n=12):
    return hh.Cliquet(EXPIRY, observations=n, local_floor=floor,
                      local_cap=cap, notional=100.0)


def test_closed_form_vs_mc():
    mkt = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    pa = float(hh.solve(hh.PricingProblem(_cliquet(), mkt),
                        hh.BlackScholesAnalytic()).price)
    cfg = hh.SimulationConfig(trajectories=1 << 15, steps=12,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    pm = float(hh.solve(
        hh.PricingProblem(_cliquet(), mkt),
        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)).price)
    assert pm == pytest.approx(pa, rel=2e-3)


def test_cap_floor_limits():
    """cap = floor pins the coupon exactly; a huge cap with floor −1 is the
    sum of raw returns, whose expectation is n·(e^{rτ} − 1)."""
    mkt = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    pinned = _cliquet(floor=0.02, cap=0.02)
    p = float(hh.solve(hh.PricingProblem(pinned, mkt), hh.BlackScholesAnalytic()).price)
    D = np.exp(-0.03 * 365 / 365)
    assert p == pytest.approx(D * 100.0 * 12 * 0.02, rel=1e-10)

    raw = _cliquet(floor=-1.0, cap=100.0)
    p_raw = float(hh.solve(hh.PricingProblem(raw, mkt), hh.BlackScholesAnalytic()).price)
    tau = 1.0 / 12.0
    want = D * 100.0 * 12 * (np.exp(0.03 * tau) - 1.0)
    assert p_raw == pytest.approx(want, rel=1e-6)


def test_heston_cliquet_prices_the_forward_skew():
    """The cliquet's value is forward-smile sensitive — the Heston MC price
    differs from flat-BS at matched total variance, and prices sanely."""
    hmkt = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=12,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    p = float(hh.solve(hh.PricingProblem(_cliquet(), hmkt),
                       hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg)).price)
    assert 0.0 < p < 100.0


def test_cliquet_vega_by_ad():
    def price(sig):
        mkt = hh.BlackScholesInputs(REF, 0.03, 100.0, sig)
        return hh.solve(hh.PricingProblem(_cliquet(), mkt),
                        hh.BlackScholesAnalytic()).price

    g = float(jax.grad(price)(0.2))
    h = 1e-5
    fd = (float(price(0.2 + h)) - float(price(0.2 - h))) / (2 * h)
    assert g == pytest.approx(fd, rel=1e-6)


def test_cliquet_guards():
    cl = _cliquet()
    mkt = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    cfg = hh.SimulationConfig(trajectories=64, steps=7)
    with pytest.raises(ValueError, match="observations"):
        hh.solve(hh.PricingProblem(cl, mkt),
                 hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg))
