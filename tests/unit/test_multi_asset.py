"""Multi-asset Black-Scholes (beyond-reference: the reference is
single-asset throughout): Margrabe exchange (exact), Kirk spreads
(approximation bounded by MC), geometric baskets (exact oracle) vs the
correlated exact terminal sampler, plus correlation greeks by AD and
construction-time correlation validation."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2024, 12, 31)  # T = 1 (ACT/365)


def _market(rho=0.5):
    return hh.MultiAssetBSInputs(
        REF, 0.03, jnp.asarray([100.0, 95.0]), jnp.asarray([0.25, 0.2]),
        jnp.asarray([[1.0, rho], [rho, 1.0]]),
    )


def _mc(payoff, mkt, n=1 << 16):
    cfg = hh.SimulationConfig(trajectories=n, steps=1,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    return float(hh.solve(
        hh.PricingProblem(payoff, mkt),
        hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)).price)


def test_margrabe_exact_vs_mc():
    ex = hh.SpreadOption(0.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    pa = float(hh.solve(hh.PricingProblem(ex, _market()), hh.BlackScholesAnalytic()).price)
    assert _mc(ex, _market()) == pytest.approx(pa, rel=5e-4)
    # rho = 1, equal vols would kill the exchange; rho = -1 maximizes it
    hi = float(hh.solve(hh.PricingProblem(ex, _market(-0.9)), hh.BlackScholesAnalytic()).price)
    lo = float(hh.solve(hh.PricingProblem(ex, _market(0.9)), hh.BlackScholesAnalytic()).price)
    assert hi > lo > 0


def test_kirk_vs_mc():
    for K, tol in ((5.0, 3e-3), (15.0, 6e-3)):
        sp = hh.SpreadOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot())
        pk = float(hh.solve(hh.PricingProblem(sp, _market()), hh.BlackScholesAnalytic()).price)
        assert _mc(sp, _market()) == pytest.approx(pk, rel=tol), K


def test_geometric_basket_exact_vs_mc_and_am_gm():
    w = jnp.asarray([0.6, 0.4])
    gb = hh.BasketOption(95.0, EXPIRY, w, hh.European(), hh.Call(), hh.Spot(),
                         geometric=True)
    ab = hh.BasketOption(95.0, EXPIRY, w, hh.European(), hh.Call(), hh.Spot())
    pg = float(hh.solve(hh.PricingProblem(gb, _market()), hh.BlackScholesAnalytic()).price)
    assert _mc(gb, _market()) == pytest.approx(pg, rel=5e-4)
    assert _mc(ab, _market()) >= pg  # AM-GM
    with pytest.raises(TypeError, match="no lognormal closed form"):
        hh.solve(hh.PricingProblem(ab, _market()), hh.BlackScholesAnalytic())


def test_correlation_greek_by_ad():
    ex = hh.SpreadOption(0.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())

    def price(rho):
        return hh.solve(hh.PricingProblem(ex, _market(rho)), hh.BlackScholesAnalytic()).price

    g = float(jax.grad(price)(0.5))
    fd = (float(price(0.501)) - float(price(0.499))) / 0.002
    assert g == pytest.approx(fd, rel=1e-6)
    assert g < 0  # a spread hates correlation


def test_correlation_validation():
    with pytest.raises(ValueError, match="symmetric"):
        hh.MultiAssetBSInputs(REF, 0.03, jnp.asarray([1.0, 1.0]),
                              jnp.asarray([0.2, 0.2]),
                              jnp.asarray([[1.0, 0.5], [0.2, 1.0]]))
    with pytest.raises(ValueError, match="unit diagonal"):
        hh.MultiAssetBSInputs(REF, 0.03, jnp.asarray([1.0, 1.0]),
                              jnp.asarray([0.2, 0.2]),
                              jnp.asarray([[1.1, 0.5], [0.5, 1.0]]))
    with pytest.raises(ValueError, match="positive semi-definite"):
        hh.MultiAssetBSInputs(REF, 0.03, jnp.asarray([1.0, 1.0, 1.0]),
                              jnp.asarray([0.2, 0.2, 0.2]),
                              jnp.asarray([[1.0, 0.99, -0.99],
                                           [0.99, 1.0, 0.99],
                                           [-0.99, 0.99, 1.0]]))


def test_three_asset_basket():
    mkt = hh.MultiAssetBSInputs(
        REF, 0.03, jnp.asarray([100.0, 95.0, 110.0]),
        jnp.asarray([0.25, 0.2, 0.3]),
        jnp.asarray([[1.0, 0.5, 0.2], [0.5, 1.0, 0.4], [0.2, 0.4, 1.0]]),
    )
    w = jnp.asarray([0.4, 0.3, 0.3])
    gb = hh.BasketOption(100.0, EXPIRY, w, hh.European(), hh.Put(), hh.Spot(),
                         geometric=True)
    pg = float(hh.solve(hh.PricingProblem(gb, mkt), hh.BlackScholesAnalytic()).price)
    assert _mc(gb, mkt) == pytest.approx(pg, rel=2e-3)
