"""CEV model family (methods/cev.py — beyond the reference's lognormal +
Heston scope): Schroder noncentral-χ² closed form vs scipy goldens, exact
put-call parity, downward skew, Euler-grid MC agreement, LSM American on
the CEV grid, and AD greeks including ∂price/∂β."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # T = 1
S0, RATE, Q, BETA = 100.0, 0.05, 0.01, 0.5
SIGMA = 0.2 * S0 ** (1 - BETA)  # ~20% lognormal-equivalent at the spot


def _market(**kw):
    kw.setdefault("dividend_yield", Q)
    return hh.CEVInputs(REF, RATE, S0, SIGMA, BETA, **kw)


def _vanilla(K, cp=None, style=None):
    return hh.VanillaOption(K, EXPIRY, style or hh.European(), cp or hh.Call(), hh.Spot())


def _price(payoff, market=None, method=None):
    return float(
        hh.solve(hh.PricingProblem(payoff, market or _market()),
                 method or hh.CEVAnalytic()).price
    )


def test_ncx2_cdf_vs_scipy():
    from scipy.stats import chi2, ncx2

    cases = [(5.0, 3.0, 2.0), (100.0, 4.0, 200.0), (2500.0, 20.0, 2400.0),
             (40.0, 0.5, 30.0)]
    for x, k, lam in cases:
        np.testing.assert_allclose(
            float(hh.ncx2_cdf(x, k, lam)), float(ncx2.cdf(x, k, lam)),
            rtol=1e-10, err_msg=str((x, k, lam)))
    # λ = 0 degenerates to the central χ²
    np.testing.assert_allclose(
        float(hh.ncx2_cdf(1.0, 2.5, 0.0)), float(chi2.cdf(1.0, 2.5)), rtol=1e-12)


def test_cev_call_vs_scipy_golden():
    """Hull's a/b/c CEV formula rebuilt with scipy.stats.ncx2 as the
    oracle — the engines must agree to quadrature precision."""
    from scipy.stats import ncx2

    mu, ob, T = RATE - Q, 1 - BETA, 1.0
    v = SIGMA**2 * (np.exp(2 * mu * ob * T) - 1) / (2 * mu * ob)
    D = np.exp(-RATE * T)
    for K in (80.0, 100.0, 120.0):
        a = K ** (2 * ob) / (ob**2 * v)
        c = S0 ** (2 * ob) * np.exp(2 * mu * ob * T) / (ob**2 * v)
        golden = S0 * np.exp(-Q * T) * (1 - ncx2.cdf(a, 1 / ob + 2, c)) - K * D * ncx2.cdf(c, 1 / ob, a)
        np.testing.assert_allclose(_price(_vanilla(K)), golden, rtol=1e-9)


def test_put_call_parity_exact():
    T, D = 1.0, np.exp(-RATE * 1.0)
    for K in (85.0, 105.0):
        c = _price(_vanilla(K, hh.Call()))
        p = _price(_vanilla(K, hh.Put()))
        np.testing.assert_allclose(c - p, S0 * np.exp(-Q * T) - K * D, atol=1e-10)


def test_cev_produces_downward_skew():
    """β < 1 ⇒ implied lognormal vol decreases in strike (the equity skew)."""
    ivs = []
    for K in (80.0, 100.0, 120.0):
        mkt0 = hh.CEVInputs(REF, RATE, S0, SIGMA, BETA)  # q = 0 for the BS inverter
        c = _price(_vanilla(K), mkt0)
        ivs.append(float(hh.implied_vol(c, K, 1.0, S0, RATE)))
    assert ivs[0] > ivs[1] > ivs[2], ivs


def test_euler_mc_agrees_with_closed_form():
    cfg = hh.SimulationConfig(trajectories=1 << 15, steps=200,
                              variance_reduction=hh.Antithetic(), seed=0)
    mc = hh.MonteCarlo(hh.CEVDynamics(), hh.EulerMaruyama(), cfg)
    for K in (90.0, 110.0):
        pm = _price(_vanilla(K), method=mc)
        pa = _price(_vanilla(K))
        np.testing.assert_allclose(pm, pa, rtol=2e-2)


def test_digital_is_strike_derivative():
    dig = hh.DigitalOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    pd = _price(dig)
    dK = jax.grad(lambda K: hh.solve(
        hh.PricingProblem(_vanilla(K), _market()), hh.CEVAnalytic()).price
    )(jnp.float64(100.0))
    np.testing.assert_allclose(pd, -float(dK), rtol=1e-9)
    put = hh.DigitalOption(100.0, EXPIRY, hh.European(), hh.Put(), hh.Spot())
    np.testing.assert_allclose(
        pd + _price(put), np.exp(-RATE * 1.0), rtol=1e-10)  # cash digi parity


def test_greeks_flow_including_beta():
    opt = _vanilla(100.0)

    def pr(s, sg, b):
        m = hh.CEVInputs(REF, RATE, s, sg, b, dividend_yield=Q)
        return hh.solve(hh.PricingProblem(opt, m), hh.CEVAnalytic()).price

    g = jax.grad(pr, argnums=(0, 1, 2))(
        jnp.float64(S0), jnp.float64(SIGMA), jnp.float64(BETA))
    assert all(bool(jnp.isfinite(x)) for x in g)
    assert 0.3 < float(g[0]) < 0.9  # delta
    assert float(g[1]) > 0.0        # CEV-scale vega
    # FD check on the β sensitivity (gammainc grad-in-a path)
    eps = 1e-5
    fd = (pr(S0, SIGMA, BETA + eps) - pr(S0, SIGMA, BETA - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g[2]), float(fd), rtol=1e-5)


def test_lsm_american_on_cev_grid():
    cfg = hh.SimulationConfig(trajectories=1 << 13, steps=50,
                              variance_reduction=hh.Antithetic(), seed=0)
    mc = hh.MonteCarlo(hh.CEVDynamics(), hh.EulerMaruyama(), cfg)
    am = _price(_vanilla(110.0, hh.Put(), hh.American()), method=hh.LSM(mc, 4))
    eu = _price(_vanilla(110.0, hh.Put()))
    assert am > eu  # early-exercise premium on the ITM put
    assert am < eu * 1.3


def test_cev_strike_grid_contract():
    """Array strikes follow the framework's in-method grid contract
    (leading strike axis) — the ncx2 window broadcasts per strike."""
    Ks = jnp.array([80.0, 95.0, 110.0])
    grid = hh.solve(
        hh.PricingProblem(
            hh.VanillaOption(Ks, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
            _market()),
        hh.CEVAnalytic()).price
    singles = [_price(_vanilla(float(k))) for k in Ks]
    np.testing.assert_allclose(np.asarray(grid), singles, rtol=1e-12)


def test_cev_validation_and_method_guards():
    with pytest.raises(ValueError, match="beta"):
        hh.CEVInputs(REF, RATE, S0, SIGMA, 1.3)
    with pytest.raises(TypeError, match="CEVInputs"):
        hh.solve(hh.PricingProblem(_vanilla(100.0),
                                   hh.BlackScholesInputs(REF, RATE, S0, 0.2)),
                 hh.CEVAnalytic())
    with pytest.raises(TypeError, match="European-only"):
        _price(_vanilla(100.0, hh.Put(), hh.American()))
