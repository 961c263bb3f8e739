"""VIX futures/options under Heston (beyond-reference volatility asset
class; methods/vix.py).

Oracles: exact-transition Monte Carlo (Poisson-mixed gamma draws of the
CIR law), the deterministic-variance σ_v → 0 limit (exact closed form),
and put-call parity against the futures price."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.methods.vix import vix_params

REF = dt.date(2025, 1, 1)
EXPIRY = dt.date(2025, 7, 1)
R = 0.03


def _market(sigma_v=0.6, kappa=2.0, theta=0.05, v0=0.04, rho=-0.7):
    return hh.HestonInputs(REF, R, 100.0, v0, kappa, theta, sigma_v, rho)


def _mc_vix(m, n=1_000_000, seed=0):
    """Exact V_T draws: V_T = c̄·χ'²(d, λ) via the Poisson-gamma mixture."""
    T = float(hh.yearfrac(REF, EXPIRY))
    a, b, c_bar, d, lam = [float(x) for x in vix_params(m, T, 30.0 / 365.0)]
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    N = jax.random.poisson(k1, lam / 2.0, (n,))
    G = jax.random.gamma(k2, d / 2.0 + N) * 2.0
    return 100.0 * jnp.sqrt(a * c_bar * G + b), T


def test_future_matches_exact_mc():
    m = _market()
    f = hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), m), hh.VIXAnalytic()).price
    vix, _ = _mc_vix(m)
    np.testing.assert_allclose(float(f), float(jnp.mean(vix)), rtol=1e-3)


@pytest.mark.parametrize("K", [15.0, 20.0, 25.0])
def test_options_match_exact_mc_and_parity(K):
    m = _market()
    vix, T = _mc_vix(m)
    disc = np.exp(-R * T)
    c = hh.solve(hh.PricingProblem(hh.VIXOption(K, EXPIRY), m), hh.VIXAnalytic()).price
    p = hh.solve(
        hh.PricingProblem(hh.VIXOption(K, EXPIRY, call_put=hh.Put()), m),
        hh.VIXAnalytic(),
    ).price
    mc_c = disc * float(jnp.mean(jnp.maximum(vix - K, 0.0)))
    np.testing.assert_allclose(float(c), mc_c, rtol=5e-3)
    f = hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), m), hh.VIXAnalytic()).price
    # put-call parity on the forward: C − P = df·(F − K)
    np.testing.assert_allclose(float(c) - float(p), disc * (float(f) - K), rtol=1e-10)


def test_deterministic_variance_limit_exact():
    """σ_v → 0: V_T is its CIR mean, VIX future = 100·√(a·m_T + b)."""
    m = _market(sigma_v=1e-6)
    T = float(hh.yearfrac(REF, EXPIRY))
    f = hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), m), hh.VIXAnalytic()).price
    a, b, *_ = [float(x) for x in vix_params(m, T, 30.0 / 365.0)]
    m_t = 0.05 + (0.04 - 0.05) * np.exp(-2.0 * T)
    np.testing.assert_allclose(float(f), 100.0 * np.sqrt(a * m_t + b), rtol=1e-9)


def test_branch_continuity_in_sigma_v():
    """The exact-series ↔ Edgeworth switch (λ crossing ~4e4) moves the
    future by less than a basis point."""
    prices = []
    for s in (0.0022, 0.0018):  # straddle the λ ≈ 4.2e4 switch
        m = _market(sigma_v=s)
        prices.append(float(
            hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), m), hh.VIXAnalytic()).price
        ))
    assert abs(prices[0] - prices[1]) / prices[0] < 1e-4


def test_feller_violating_regime():
    """d < 2 (density diverges at v=0): the survival form needs no density,
    convexity bound √(a·E[V]+b) still dominates."""
    m = _market(sigma_v=1.0, kappa=1.0, theta=0.04, v0=0.04, rho=-0.9)
    T = float(hh.yearfrac(REF, EXPIRY))
    f = hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), m), hh.VIXAnalytic()).price
    a, b, c_bar, d, lam = [float(x) for x in vix_params(m, T, 30.0 / 365.0)]
    assert d < 2.0
    upper = 100.0 * np.sqrt(a * c_bar * (d + lam) + b)
    assert 0.0 < float(f) < upper  # Jensen: E[√X] < √E[X]
    vix, _ = _mc_vix(m)
    np.testing.assert_allclose(float(f), float(jnp.mean(vix)), rtol=2e-3)


def test_ad_greeks_full_heston_vector():
    """jax.grad through the quadrature for all five Heston parameters."""
    def fut(params):
        v0, kappa, theta, sigma, rho = params
        m = hh.HestonInputs(REF, R, 100.0, v0, kappa, theta, sigma, rho)
        return hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), m), hh.VIXAnalytic()).price

    p0 = jnp.array([0.04, 2.0, 0.05, 0.6, -0.7])
    g = jax.grad(fut)(p0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(g[0]) > 0  # dF/dV0 > 0
    assert float(g[2]) > 0  # dF/dθ > 0
    assert float(g[4]) == 0.0  # spot-vol correlation never enters VIX
    # FD cross-check on V0 and the shape-parameter chain (κ enters
    # d = 4κθ/σ², covered by the internal linearization)
    for i, eps in ((0, 1e-5), (1, 1e-4), (3, 1e-4)):
        fd = (fut(p0.at[i].add(eps)) - fut(p0.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4)


def test_bates_vix_carries_the_jump_convexity():
    """The CBOE VIX is the log-contract strip, so S-jumps ADD
    2λ(e^{μ+σ²/2} − 1 − μ) to VIX² — Bates VIX exceeds the Heston VIX of
    the same variance block by exactly that b-shift (λ → 0 recovers it)."""
    lam_j, mu_j, sig_j = 0.3, -0.1, 0.15
    mh = _market()
    mb = hh.BatesInputs(REF, R, 100.0, 0.04, 2.0, 0.05, 0.6, -0.7, lam_j, mu_j, sig_j)
    T = float(hh.yearfrac(REF, EXPIRY))
    _, bh, *_ = vix_params(mh, T, 30.0 / 365.0)
    _, bb, *_ = vix_params(mb, T, 30.0 / 365.0)
    jump = 2.0 * lam_j * (np.exp(mu_j + 0.5 * sig_j**2) - 1.0 - mu_j)
    np.testing.assert_allclose(float(bb) - float(bh), jump, rtol=1e-12)
    fh = hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), mh), hh.VIXAnalytic()).price
    fb = hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), mb), hh.VIXAnalytic()).price
    assert float(fb) > float(fh)
    # quadrature vs exact-transition MC under the jump-shifted affine map
    vix_b, _ = _mc_vix(mb)
    np.testing.assert_allclose(float(fb), float(jnp.mean(vix_b)), rtol=1e-3)
    mb0 = hh.BatesInputs(REF, R, 100.0, 0.04, 2.0, 0.05, 0.6, -0.7, 0.0, mu_j, sig_j)
    fb0 = hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), mb0), hh.VIXAnalytic()).price
    np.testing.assert_allclose(float(fb0), float(fh), rtol=1e-12)


def test_slv_market_rejected():
    """SLVInputs carries a (κ, θ, σ, V0) block too, but its VIX is
    E[L²V] with mixing-scaled vol-of-vol — duck-typing must not price it
    as pure Heston."""
    m = hh.SLVInputs(REF, R, 100.0, 0.04, 2.0, 0.05, 0.6, -0.7, 0.2)
    with pytest.raises(TypeError, match="pure Heston/Bates"):
        hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), m), hh.VIXAnalytic())


def test_wrong_market_and_payoff_raise():
    bs = hh.BlackScholesInputs(REF, R, 100.0, 0.2)
    with pytest.raises(TypeError, match="CIR variance block"):
        hh.solve(hh.PricingProblem(hh.VIXFuture(EXPIRY), bs), hh.VIXAnalytic())
    m = _market()
    van = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    with pytest.raises(TypeError, match="VIXFuture/VIXOption"):
        hh.solve(hh.PricingProblem(van, m), hh.VIXAnalytic())
