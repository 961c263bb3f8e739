"""Bivariate-normal closed-form family (beyond the reference's taxonomy):
bvn_cdf vs scipy, two-asset rainbows (Stulz) vs correlated MC, Geske
compound options (all four variants) vs the exact decision-date MC oracle,
and the simple chooser with its structural bounds."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)
T1 = dt.date(2024, 7, 1)


def test_bvn_cdf_vs_scipy():
    from scipy.stats import multivariate_normal as mvn

    rng = np.random.default_rng(0)
    for rho in (-0.99, -0.7, 0.0, 0.5, 0.95, 0.99):
        for _ in range(8):
            h, k = rng.uniform(-3.5, 3.5, 2)
            ref = mvn(cov=[[1, rho], [rho, 1]]).cdf([h, k])
            np.testing.assert_allclose(
                float(hh.bvn_cdf(h, k, rho)), ref, atol=5e-13,
                err_msg=str((h, k, rho)))
    # correlation sensitivity is smooth (AD = FD)
    g = float(jax.grad(lambda r: hh.bvn_cdf(0.5, -0.3, r))(0.6))
    fd = (float(hh.bvn_cdf(0.5, -0.3, 0.6 + 1e-6))
          - float(hh.bvn_cdf(0.5, -0.3, 0.6 - 1e-6))) / 2e-6
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def _mkt2():
    return hh.MultiAssetBSInputs(
        REF, 0.05, jnp.array([100.0, 95.0]), jnp.array([0.25, 0.3]),
        jnp.array([[1.0, 0.4], [0.4, 1.0]]),
        dividend_yields=jnp.array([0.01, 0.02]),
    )


def _mc(paths=1 << 16):
    cfg = hh.SimulationConfig(trajectories=paths, steps=1,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    return hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)


@pytest.mark.parametrize("best", [True, False])
@pytest.mark.parametrize("cp", [hh.Call(), hh.Put()])
def test_rainbow_analytic_vs_mc(best, cp):
    rb = hh.RainbowOption(100.0, EXPIRY, best=best, call_put=cp)
    pa = float(hh.solve(hh.PricingProblem(rb, _mkt2()), hh.BlackScholesAnalytic()).price)
    pm = float(hh.solve(hh.PricingProblem(rb, _mkt2()), _mc()).price)
    np.testing.assert_allclose(pa, pm, rtol=2e-3)


def test_rainbow_identities():
    """max + min = S1 + S2 pointwise ⇒ c_max + c_min = c1 + c2; best ≥
    worst; ρ → 1 with equal vols/carries collapses max = min = S1-vanilla
    when the assets are identical."""
    mkt = _mkt2()
    T = hh.yearfrac(REF, EXPIRY)
    D = float(hh.df(mkt.rate, hh.to_ticks(EXPIRY)))
    s = np.asarray(mkt.spots) * np.exp(-np.asarray(mkt.dividend_yields) * T)
    c_min, c_max, p_min, p_max = [np.asarray(x) for x in hh.rainbow_prices(
        s[0], s[1], 0.25, 0.3, 0.4, 100.0, T, D)]
    from hedgehog_tpu.methods.black_scholes import bs_price

    c1 = float(bs_price(s[0] / D, 100.0, 0.25, T, D, 1.0))
    c2 = float(bs_price(s[1] / D, 100.0, 0.3, T, D, 1.0))
    np.testing.assert_allclose(c_min + c_max, c1 + c2, rtol=1e-12)
    assert c_max > c_min >= 0.0 and p_max >= 0.0 and p_min > p_max
    same = hh.rainbow_prices(s[0], s[0], 0.25, 0.25, 0.999999, 100.0, T, D)
    np.testing.assert_allclose(float(same[0]), c1, rtol=1e-3)


@pytest.mark.parametrize("w1", [hh.Call(), hh.Put()])
@pytest.mark.parametrize("w2", [hh.Call(), hh.Put()])
def test_compound_geske_vs_mc(w1, w2):
    bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=0.01)
    co = hh.CompoundOption(4.0, T1, 100.0, EXPIRY, call_put=w1, inner_call_put=w2)
    pa = float(hh.solve(hh.PricingProblem(co, bs), hh.BlackScholesAnalytic()).price)
    pm = float(hh.solve(hh.PricingProblem(co, bs), _mc()).price)
    np.testing.assert_allclose(pa, pm, rtol=3e-3)


def test_compound_parity_and_delta():
    """Call-on-X − put-on-X = value-of-X − K₁·D(t₁) (decision-date parity),
    and the Geske delta (AD through the IFT critical spot) matches FD."""
    bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=0.01)
    inner = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    inner_p = float(hh.solve(hh.PricingProblem(inner, bs), hh.BlackScholesAnalytic()).price)
    D1 = float(hh.df(bs.rate, hh.to_ticks(T1)))
    coc = float(hh.solve(hh.PricingProblem(
        hh.CompoundOption(4.0, T1, 100.0, EXPIRY), bs), hh.BlackScholesAnalytic()).price)
    poc = float(hh.solve(hh.PricingProblem(
        hh.CompoundOption(4.0, T1, 100.0, EXPIRY, call_put=hh.Put()), bs),
        hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(coc - poc, inner_p - 4.0 * D1, rtol=1e-9)

    def price(s):
        m = hh.BlackScholesInputs(REF, 0.05, s, 0.25, dividend_yield=0.01)
        return hh.solve(hh.PricingProblem(
            hh.CompoundOption(4.0, T1, 100.0, EXPIRY), m),
            hh.BlackScholesAnalytic()).price

    g = float(jax.grad(price)(jnp.float64(100.0)))
    fd = (float(price(100.01)) - float(price(99.99))) / 0.02
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_chooser_vs_mc_and_bounds():
    bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=0.01)
    ch = hh.ChooserOption(100.0, EXPIRY, T1)
    pa = float(hh.solve(hh.PricingProblem(ch, bs), hh.BlackScholesAnalytic()).price)
    pm = float(hh.solve(hh.PricingProblem(ch, bs), _mc()).price)
    np.testing.assert_allclose(pa, pm, rtol=2e-3)
    c = float(hh.solve(hh.PricingProblem(
        hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()), bs),
        hh.BlackScholesAnalytic()).price)
    p = float(hh.solve(hh.PricingProblem(
        hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Put(), hh.Spot()), bs),
        hh.BlackScholesAnalytic()).price)
    assert max(c, p) <= pa <= c + p
    # choose date → expiry: the chooser becomes the straddle
    late = hh.ChooserOption(100.0, EXPIRY, dt.date(2024, 12, 30))
    pl = float(hh.solve(hh.PricingProblem(late, bs), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(pl, c + p, rtol=2e-2)


def test_guards():
    surf = hh.RectVolSurface(REF, jnp.array([0.5, 1.0]), jnp.array([90.0, 110.0]),
                             0.2 * jnp.ones((2, 2)))
    bs_surf = hh.BlackScholesInputs(REF, 0.05, 100.0, surf)
    with pytest.raises(TypeError, match="flat vol"):
        hh.solve(hh.PricingProblem(hh.ChooserOption(100.0, EXPIRY, T1), bs_surf),
                 hh.BlackScholesAnalytic())
    with pytest.raises(ValueError, match="precede"):
        hh.CompoundOption(4.0, EXPIRY, 100.0, T1)
    with pytest.raises(TypeError, match="two-asset"):
        m3 = hh.MultiAssetBSInputs(REF, 0.05, jnp.ones(3) * 100.0,
                                   jnp.ones(3) * 0.2, jnp.eye(3))
        hh.solve(hh.PricingProblem(hh.RainbowOption(100.0, EXPIRY), m3),
                 hh.BlackScholesAnalytic())
