"""Lookback options — continuously-monitored running-extremum contracts,
beyond the reference's vanilla-only taxonomy:

- BlackScholesAnalytic: Goldman-Sosin-Gatto (floating strike) /
  Conze-Viswanathan (fixed strike) closed forms with a general cost of
  carry, derived from the drifted-BM extremum law (incl. exact b→0 limits)
- MonteCarlo: per-segment Brownian-bridge extremum draws by inverse CDF —
  exact for GBM grids at ANY step count (one bridge suffices for
  BlackScholesExact), the Heston conditional grid carries the per-segment
  integrated variance

The agreement structure mirrors the reference's test strategy: the closed
form and the bridge MC are independent methods that must agree, plus the
exact floating↔fixed parity identities that tie all four contracts together.
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # T = 1 under ACT/365
R, Q, SPOT, SIGMA = 0.05, 0.02, 100.0, 0.25
T = hh.yearfrac(REF, EXPIRY)


def _market(r=R, q=Q, sigma=SIGMA):
    return hh.BlackScholesInputs(REF, r, SPOT, sigma, dividend_yield=q)


def _lookback(style, cp, strike=0.0, running=None):
    return hh.LookbackOption(
        EXPIRY, strike, style, cp, hh.European(), hh.Spot(),
        running_extremum=running,
    )


def _analytic(payoff, market=None):
    prob = hh.PricingProblem(payoff, market or _market())
    return float(hh.solve(prob, hh.BlackScholesAnalytic()).price)


ALL_CONTRACTS = [
    (hh.FloatingStrike(), hh.Call(), 0.0),
    (hh.FloatingStrike(), hh.Put(), 0.0),
    (hh.FixedStrike(), hh.Call(), 100.0),
    (hh.FixedStrike(), hh.Call(), 110.0),
    (hh.FixedStrike(), hh.Put(), 100.0),
    (hh.FixedStrike(), hh.Put(), 90.0),
]


def test_parity_identities():
    """Exact identities tying floating to fixed at K = S (both K ≥ m and
    K ≤ M hold with fresh extrema): c_float = p_fix(K) − K·D + S·e^{−qT}
    and p_float = c_fix(K) − S·e^{−qT} + K·D."""
    m = _market()
    D = float(hh.df(m.rate, EXPIRY))
    se = SPOT * np.exp(-Q * float(T))
    K = SPOT
    c_float = _analytic(_lookback(hh.FloatingStrike(), hh.Call()))
    p_float = _analytic(_lookback(hh.FloatingStrike(), hh.Put()))
    c_fix = _analytic(_lookback(hh.FixedStrike(), hh.Call(), K))
    p_fix = _analytic(_lookback(hh.FixedStrike(), hh.Put(), K))
    np.testing.assert_allclose(c_float, p_fix - K * D + se, rtol=1e-12)
    np.testing.assert_allclose(p_float, c_fix - se + K * D, rtol=1e-12)


def test_closed_form_sanity():
    """A lookback dominates its vanilla counterpart; fixed-strike prices are
    monotone in strike; floating payouts are nonnegative-valued options."""
    m = _market()
    for K in (90.0, 100.0, 110.0):
        van = hh.PricingProblem(
            hh.VanillaOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot()), m
        )
        c_van = float(hh.solve(van, hh.BlackScholesAnalytic()).price)
        c_fix = _analytic(_lookback(hh.FixedStrike(), hh.Call(), K))
        assert c_fix > c_van  # max_T ≥ S_T pathwise
    ks = [85.0, 95.0, 105.0, 115.0]
    calls = [_analytic(_lookback(hh.FixedStrike(), hh.Call(), k)) for k in ks]
    assert all(a > b for a, b in zip(calls, calls[1:]))
    puts = [_analytic(_lookback(hh.FixedStrike(), hh.Put(), k)) for k in ks]
    assert all(a < b for a, b in zip(puts, puts[1:]))
    assert _analytic(_lookback(hh.FloatingStrike(), hh.Call())) > 0.0
    assert _analytic(_lookback(hh.FloatingStrike(), hh.Put())) > 0.0


@pytest.mark.parametrize("style,cp,K", ALL_CONTRACTS)
def test_exact_bridge_mc_matches_closed_form(style, cp, K):
    """ONE exact bridge over [0, T] (BlackScholesExact) prices the
    continuous lookback without discretization bias — agreement with the
    closed form to pure MC noise."""
    payoff = _lookback(style, cp, K)
    ref = _analytic(payoff)
    cfg = hh.SimulationConfig(trajectories=1 << 18, steps=1, seed=7,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)
    price = float(hh.solve(hh.PricingProblem(payoff, _market()), mc).price)
    np.testing.assert_allclose(price, ref, rtol=7e-3)


def test_euler_grid_mc_matches_closed_form():
    """Stepped GBM grids are exact too — 48 segments agree with the closed
    form at MC-noise tolerance (floating call + fixed put corners)."""
    cfg = hh.SimulationConfig(trajectories=1 << 17, steps=48, seed=11,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    for style, cp, K in [(hh.FloatingStrike(), hh.Call(), 0.0),
                         (hh.FixedStrike(), hh.Put(), 105.0)]:
        payoff = _lookback(style, cp, K)
        ref = _analytic(payoff)
        price = float(hh.solve(hh.PricingProblem(payoff, _market()), mc).price)
        np.testing.assert_allclose(price, ref, rtol=1e-2)


def test_zero_carry_limit_branch():
    """r = q makes the cost of carry exactly zero — the σ²/2b pole routes
    through the Taylor-limit branch, which must agree with the exact MC."""
    m = _market(r=0.03, q=0.03)
    payoff = _lookback(hh.FloatingStrike(), hh.Put())
    ref = float(hh.solve(hh.PricingProblem(payoff, m), hh.BlackScholesAnalytic()).price)
    cfg = hh.SimulationConfig(trajectories=1 << 18, steps=1, seed=3,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)
    price = float(hh.solve(hh.PricingProblem(payoff, m), mc).price)
    np.testing.assert_allclose(price, ref, rtol=7e-3)
    # continuity across the branch: b = ±1e-9 brackets the b = 0 value
    lo = float(hh.solve(hh.PricingProblem(payoff, _market(r=0.03 - 1e-9, q=0.03)),
                        hh.BlackScholesAnalytic()).price)
    hi = float(hh.solve(hh.PricingProblem(payoff, _market(r=0.03 + 1e-9, q=0.03)),
                        hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(ref, 0.5 * (lo + hi), rtol=1e-7)


def test_running_extremum():
    """An already-running window: closed form and exact MC agree, the fixed
    call is floored at D·(M − K), and seeding with the spot equals fresh."""
    M = 120.0
    payoff = _lookback(hh.FixedStrike(), hh.Call(), 105.0, running=M)
    ref = _analytic(payoff)
    D = float(hh.df(_market().rate, EXPIRY))
    assert ref > D * (M - 105.0)
    cfg = hh.SimulationConfig(trajectories=1 << 18, steps=1, seed=5,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)
    price = float(hh.solve(hh.PricingProblem(payoff, _market()), mc).price)
    np.testing.assert_allclose(price, ref, rtol=7e-3)
    fresh = _analytic(_lookback(hh.FloatingStrike(), hh.Put()))
    seeded = _analytic(_lookback(hh.FloatingStrike(), hh.Put(), running=SPOT))
    np.testing.assert_allclose(fresh, seeded, rtol=1e-14)


def test_heston_conditional_grid_lookback():
    """Lookbacks on the conditional Heston bridge grid: refinement
    consistency (16 vs 64 segments) and the σ_vol→0, V0=θ corner collapses
    to the flat-vol closed form."""
    hm = hh.HestonInputs(REF, R, SPOT, V0=0.0625, kappa=2.0, theta=0.0625,
                         sigma=1e-4, rho=0.0)
    payoff = _lookback(hh.FloatingStrike(), hh.Call())
    ref = _analytic(payoff, _market(q=0.0, sigma=0.25))

    def price(steps, paths=1 << 16, seed=9):
        cfg = hh.SimulationConfig(trajectories=paths, steps=steps, seed=seed,
                                  variance_reduction=hh.Antithetic())
        mc = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg)
        return float(hh.solve(hh.PricingProblem(payoff, hm), mc).price)

    p16, p64 = price(16), price(64)
    np.testing.assert_allclose(p16, p64, rtol=2e-2)
    np.testing.assert_allclose(p64, ref, rtol=2e-2)


def test_lookback_delta_pathwise_ad():
    """jax.grad through the exact-bridge MC solve (pathwise delta) matches
    the closed form's AD delta — the bridge extremum draw is smooth."""
    payoff = _lookback(hh.FixedStrike(), hh.Call(), 105.0)
    cfg = hh.SimulationConfig(trajectories=1 << 16, steps=1, seed=13,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)
    lens = hh.SpotLens()
    base = hh.PricingProblem(payoff, _market())

    def mc_price(s):
        return hh.solve(lens.set(base, s), mc).price

    def an_price(s):
        return hh.solve(lens.set(base, s), hh.BlackScholesAnalytic()).price

    d_mc = float(jax.grad(mc_price)(jnp.asarray(SPOT)))
    d_an = float(jax.grad(an_price)(jnp.asarray(SPOT)))
    np.testing.assert_allclose(d_mc, d_an, rtol=3e-2)
    # FD cross-check on the closed form itself
    eps = 1e-4 * SPOT
    fd = (float(an_price(jnp.asarray(SPOT + eps)))
          - float(an_price(jnp.asarray(SPOT - eps)))) / (2 * eps)
    np.testing.assert_allclose(d_an, fd, rtol=1e-6)


def test_unsupported_routes_raise():
    payoff = _lookback(hh.FloatingStrike(), hh.Call())
    prob = hh.PricingProblem(payoff, _market())
    with pytest.raises(TypeError, match="running-extremum"):
        hh.solve(prob, hh.CoxRossRubinsteinMethod(64))
    with pytest.raises(TypeError, match="path"):
        hh.solve(prob, hh.CarrMadan())
    hprob = hh.PricingProblem(
        payoff, hh.HestonInputs(REF, R, SPOT, V0=0.04, kappa=2.0, theta=0.04,
                                sigma=0.3, rho=-0.5),
    )
    cfg = hh.SimulationConfig(trajectories=128, steps=4, seed=1)
    with pytest.raises(TypeError, match="lookback grids"):
        hh.solve(hprob, hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg))
    surf = hh.BlackScholesInputs(
        REF, R, SPOT,
        hh.RectVolSurface(REF, [0.5, 1.0], [90.0, 110.0],
                          [[0.2, 0.21], [0.22, 0.23]]),
    )
    with pytest.raises(TypeError, match="flat vol"):
        hh.solve(hh.PricingProblem(payoff, surf), hh.BlackScholesAnalytic())


def test_zero_vol_deterministic():
    """σ = 0: the path is S·e^{b·t}; the extremum and payout are
    deterministic."""
    m = _market(r=0.05, q=0.0, sigma=0.0)
    D = np.exp(-0.05 * float(T))
    # floating call: S_T − min = S(e^{rT} − 1)
    c = _analytic(_lookback(hh.FloatingStrike(), hh.Call()), m)
    np.testing.assert_allclose(c, D * SPOT * (np.exp(0.05 * float(T)) - 1.0),
                               rtol=1e-12)
    # fixed put with K below the whole path is worthless
    p = _analytic(_lookback(hh.FixedStrike(), hh.Put(), 80.0), m)
    assert p == 0.0
