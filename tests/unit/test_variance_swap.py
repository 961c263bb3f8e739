"""Variance swaps (beyond-reference payoff): discrete realized-variance
payout with the exact discrete BS closed form, the continuous Heston fair
strike as the MC oracle, and grid MC under any dynamics."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2024, 12, 31)  # T = 1 (ACT/365)


def test_bs_discrete_fair_strike_exact():
    """Under GBM each log return is N(μdt, σ²dt), so the discrete fair
    strike is σ² + μ²T/n exactly — a swap struck there has zero value."""
    n, sig, r = 252, 0.2, 0.03
    mu = r - 0.5 * sig**2
    fair = sig**2 + mu**2 * 1.0 / n
    vs = hh.VarianceSwap(fair, EXPIRY, observations=n, notional=100.0)
    mkt = hh.BlackScholesInputs(REF, r, 100.0, sig)
    p = float(hh.solve(hh.PricingProblem(vs, mkt), hh.BlackScholesAnalytic()).price)
    assert p == pytest.approx(0.0, abs=1e-12)
    # linearity in the strike: value(K) = D·N·(fair − K)
    vs2 = hh.VarianceSwap(0.03, EXPIRY, observations=n, notional=100.0)
    p2 = float(hh.solve(hh.PricingProblem(vs2, mkt), hh.BlackScholesAnalytic()).price)
    D = float(np.exp(-r * 1.0))
    assert p2 == pytest.approx(D * 100.0 * (fair - 0.03), rel=1e-10)


def test_bs_mc_agreement():
    vs = hh.VarianceSwap(0.04, EXPIRY, observations=64, notional=100.0)
    mkt = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    pa = float(hh.solve(hh.PricingProblem(vs, mkt), hh.BlackScholesAnalytic()).price)
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=64,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    pm = float(hh.solve(
        hh.PricingProblem(vs, mkt),
        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)).price)
    # value at K=0.04 is ~0 + drift term: compare ABSOLUTE on the notional
    assert pm == pytest.approx(pa, abs=5e-2)


def test_heston_fair_strike_oracle():
    """A swap struck at the continuous Heston fair strike
    θ + (V0−θ)(1−e^{−κT})/(κT) is worth ~0 under the QE grid MC (the
    residual bounds the O(dt) discrete-sampling correction)."""
    hmkt = hh.HestonInputs(REF, 0.03, 100.0, 0.06, 2.0, 0.04, 0.3, -0.7)
    fair = float(hh.heston_variance_swap_strike(hmkt, 1.0))
    assert 0.04 < fair < 0.06  # between θ and V0
    vs = hh.VarianceSwap(fair, EXPIRY, observations=252, notional=100.0)
    cfg = hh.SimulationConfig(trajectories=1 << 13, steps=252,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    p = float(hh.solve(
        hh.PricingProblem(vs, hmkt),
        hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg)).price)
    # value in variance units = p/(D·N) ≈ sampling correction; bound at 5e-4
    assert abs(p) / (np.exp(-0.03) * 100.0) < 5e-4


def test_variance_swap_vega_by_ad():
    """d(value)/dσ = 2σ·D·N + O(1/n) — AD through the analytic solve."""
    n = 252

    def price(sig):
        vs = hh.VarianceSwap(0.04, EXPIRY, observations=n, notional=100.0)
        mkt = hh.BlackScholesInputs(REF, 0.03, 100.0, sig)
        return hh.solve(hh.PricingProblem(vs, mkt), hh.BlackScholesAnalytic()).price

    g = float(jax.grad(price)(0.2))
    D = float(np.exp(-0.03))
    assert g == pytest.approx(2 * 0.2 * D * 100.0, rel=1e-2)


def test_variance_swap_guards():
    vs = hh.VarianceSwap(0.04, EXPIRY, observations=64)
    smile = hh.RectVolSurface(REF, jnp.asarray([0.5, 1.0, 2.0]),
                              jnp.asarray([90.0, 100.0, 110.0]),
                              jnp.full((3, 3), 0.2))
    with pytest.raises(TypeError, match="LocalVolDynamics"):
        hh.solve(hh.PricingProblem(vs, hh.BlackScholesInputs(REF, 0.03, 100.0, smile)),
                 hh.BlackScholesAnalytic())
    cfg = hh.SimulationConfig(trajectories=128, steps=32)
    with pytest.raises(ValueError, match="observations"):
        hh.solve(hh.PricingProblem(vs, hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)),
                 hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg))


def test_mc_path_values_rejects_grid_payoffs():
    from hedgehog_tpu.methods.montecarlo import mc_path_values

    vs = hh.VarianceSwap(0.04, EXPIRY, observations=16)
    cfg = hh.SimulationConfig(trajectories=64, steps=16)
    method = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    with pytest.raises(TypeError, match="through solve"):
        mc_path_values(hh.PricingProblem(vs, hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)), method)
