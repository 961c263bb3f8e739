"""Asian options (discrete fixed-strike averages) — beyond the reference's
vanilla-only taxonomy.  The geometric average under GBM is lognormal with a
known closed form (BlackScholesAnalytic), which serves as the agreement
oracle for the grid-MC estimator; arithmetic Asians are MC-only, pinned by
the AM-GM ordering and the forward identity of the average.
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # T = 1 under ACT/365
R, SPOT, K, SIGMA = 0.05, 100.0, 100.0, 0.2
T, N_OBS = 1.0, 12
H = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)


def _mkt():
    return hh.BlackScholesInputs(REF, R, SPOT, SIGMA)


def _asian(averaging, cp=None, n=N_OBS):
    return hh.AsianOption(K, EXPIRY, n, hh.European(), cp or hh.Call(), hh.Spot(), averaging)


def _geo_closed_form(cp_sign, n=N_OBS):
    m = np.log(SPOT) + (R - 0.5 * SIGMA**2) * T * (n + 1) / (2 * n)
    s2 = SIGMA**2 * T * (n + 1) * (2 * n + 1) / (6 * n * n)
    f = np.exp(m + 0.5 * s2)
    s = np.sqrt(s2)
    d1 = (np.log(f / K) + 0.5 * s2) / s
    d2 = d1 - s
    D = np.exp(-R * T)
    return D * cp_sign * (f * norm.cdf(cp_sign * d1) - K * norm.cdf(cp_sign * d2))


def _mc(payoff, strat, n_paths=1 << 15, market=None, dyn=None, seed=0):
    cfg = hh.SimulationConfig(trajectories=n_paths, steps=payoff.observations,
                              variance_reduction=hh.Antithetic(), seed=seed)
    prob = hh.PricingProblem(payoff, market or _mkt())
    return float(hh.solve(prob, hh.MonteCarlo(dyn or hh.LognormalDynamics(), strat, cfg)).price)


def test_geometric_closed_form():
    for cp, sign in ((hh.Call(), 1.0), (hh.Put(), -1.0)):
        p = float(hh.solve(hh.PricingProblem(_asian(hh.GeometricAverage(), cp), _mkt()),
                           hh.BlackScholesAnalytic()).price)
        np.testing.assert_allclose(p, _geo_closed_form(sign), rtol=1e-12)


def test_geometric_mc_matches_closed_form():
    # GBM gridpoint marginals are exact → agreement limited by MC noise only
    p_mc = _mc(_asian(hh.GeometricAverage()), hh.EulerMaruyama())
    np.testing.assert_allclose(p_mc, _geo_closed_form(1.0), rtol=2e-2)


def test_arithmetic_dominates_geometric_and_forward_identity():
    p_arith = _mc(_asian(hh.ArithmeticAverage()), hh.EulerMaruyama())
    p_geo = _mc(_asian(hh.GeometricAverage()), hh.EulerMaruyama())
    assert p_arith > p_geo  # AM ≥ GM pointwise, strict for σ > 0
    # put-call parity of the average: C − P = D·(E[A] − K),
    # E[A] = S0·(1/n)·Σ e^{r·t_i}
    p_put = _mc(_asian(hh.ArithmeticAverage(), hh.Put()), hh.EulerMaruyama())
    t_i = np.arange(1, N_OBS + 1) * T / N_OBS
    ea = SPOT * np.mean(np.exp(R * t_i))
    np.testing.assert_allclose(p_arith - p_put, np.exp(-R * T) * (ea - K),
                               rtol=2e-2, atol=0.05)


def test_heston_asian_two_grids_agree():
    market = hh.HestonInputs(REF, 0.03, SPOT, *H.values())
    a = _asian(hh.ArithmeticAverage(), n=16)
    p_qe = _mc(a, hh.HestonQE(), market=market, dyn=hh.HestonDynamics())
    p_cond = _mc(a, hh.HestonQE(conditional=True), market=market,
                 dyn=hh.HestonDynamics(), seed=1)
    np.testing.assert_allclose(p_qe, p_cond, rtol=2e-2)


def test_asian_delta_via_ad():
    # closed-form geometric delta vs jax.grad through the analytic solve
    def price(s):
        m = hh.BlackScholesInputs(REF, R, s, SIGMA)
        return hh.solve(hh.PricingProblem(_asian(hh.GeometricAverage()), m),
                        hh.BlackScholesAnalytic()).price

    d_ad = float(jax.grad(price)(jnp.float64(SPOT)))
    eps = 1e-4
    d_fd = (float(price(SPOT + eps)) - float(price(SPOT - eps))) / (2 * eps)
    np.testing.assert_allclose(d_ad, d_fd, rtol=1e-6)
    # MC pathwise delta (smooth in S0 through the grid) matches
    def mc_price(s):
        m = hh.BlackScholesInputs(REF, R, s, SIGMA)
        cfg = hh.SimulationConfig(trajectories=1 << 14, steps=N_OBS,
                                  variance_reduction=hh.Antithetic(), seed=0)
        return hh.solve(hh.PricingProblem(_asian(hh.GeometricAverage()), m),
                        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)).price
    d_mc = float(jax.grad(mc_price)(jnp.float64(SPOT)))
    np.testing.assert_allclose(d_mc, d_ad, rtol=5e-2)


def test_asian_guards():
    prob = hh.PricingProblem(_asian(hh.ArithmeticAverage()), _mkt())
    with pytest.raises(TypeError, match="no lognormal closed form"):
        hh.solve(prob, hh.BlackScholesAnalytic())
    with pytest.raises(TypeError, match="path-independent"):
        hh.solve(prob, hh.CarrMadan(1.0, 32.0, hh.LognormalDynamics()))
    with pytest.raises(TypeError, match="running-average state"):
        hh.solve(prob, hh.CoxRossRubinsteinMethod(64))
    # steps ≠ observations is a contract violation, not silently re-dated
    cfg = hh.SimulationConfig(trajectories=256, steps=6,
                              variance_reduction=hh.Antithetic(), seed=0)
    with pytest.raises(ValueError, match="fixing dates"):
        hh.solve(prob, hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg))
