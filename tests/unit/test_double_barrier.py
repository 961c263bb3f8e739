"""Double-barrier options — continuously-monitored corridors, beyond the
reference's vanilla-only taxonomy:

- BlackScholesAnalytic: reflection image series (the Ikeda-Kunitomo family,
  derived from the no-exit density, evaluated in log space)
- MonteCarlo: per-segment TWO-SIDED Brownian-bridge no-exit products —
  exact for GBM grids at any step count (one bridge suffices for
  BlackScholesExact), conditional Heston grid via integrated variance

Agreement tests tie the closed form to the bridge MC, to the
single-barrier Reiner-Rubinstein limits, and to in-out parity.
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


def _market(r=R, q=Q, sigma=SIGMA):
    return hh.BlackScholesInputs(REF, r, SPOT, sigma, dividend_yield=q)


def _dbl(K, L, U, cp=None, knock=None, rebate=0.0, at_hit=False):
    return hh.DoubleBarrierOption(
        K, EXPIRY, L, U, hh.European(), cp or hh.Call(), hh.Spot(),
        knock or hh.KnockOut(), rebate, at_hit,
    )


def _analytic(payoff, market=None):
    prob = hh.PricingProblem(payoff, market or _market())
    return float(hh.solve(prob, hh.BlackScholesAnalytic()).price)


CONTRACTS = [
    (100.0, 80.0, 125.0, hh.Call()),
    (90.0, 80.0, 125.0, hh.Call()),
    (100.0, 80.0, 125.0, hh.Put()),
    (110.0, 70.0, 140.0, hh.Put()),
    (100.0, 95.0, 110.0, hh.Call()),   # tight corridor: deep image terms
]


def test_in_out_parity_and_bounds():
    for K, L, U, cp in CONTRACTS:
        van = hh.PricingProblem(
            hh.VanillaOption(K, EXPIRY, hh.European(), cp, hh.Spot()), _market()
        )
        v = float(hh.solve(van, hh.BlackScholesAnalytic()).price)
        out = _analytic(_dbl(K, L, U, cp))
        inn = _analytic(_dbl(K, L, U, cp, hh.KnockIn()))
        np.testing.assert_allclose(out + inn, v, rtol=1e-10)
        assert 0.0 <= out <= v + 1e-12 and 0.0 <= inn <= v + 1e-12


def test_single_barrier_limits():
    """U → far / L → tiny collapses the corridor to the Reiner-Rubinstein
    single-barrier prices (independent implementations must agree)."""
    K = 100.0
    do_single = hh.BarrierOption(K, EXPIRY, 85.0, hh.European(), hh.Call(),
                                 hh.Spot(), hh.Down(), hh.KnockOut())
    do_ref = _analytic(do_single)
    dbl = _analytic(_dbl(K, 85.0, 1e6))
    np.testing.assert_allclose(dbl, do_ref, rtol=1e-9)
    uo_single = hh.BarrierOption(K, EXPIRY, 130.0, hh.European(), hh.Call(),
                                 hh.Spot(), hh.Up(), hh.KnockOut())
    uo_ref = _analytic(uo_single)
    dbl_u = _analytic(_dbl(K, 1e-6, 130.0))
    np.testing.assert_allclose(dbl_u, uo_ref, rtol=1e-9)


def test_corridor_monotonicity():
    """Widening the corridor raises the knock-out price toward vanilla."""
    K, cp = 100.0, hh.Call()
    prices = [_analytic(_dbl(K, L, U, cp))
              for L, U in [(95.0, 106.0), (90.0, 115.0), (80.0, 130.0),
                           (60.0, 170.0), (20.0, 400.0)]]
    assert all(a < b for a, b in zip(prices, prices[1:]))
    van = hh.PricingProblem(
        hh.VanillaOption(K, EXPIRY, hh.European(), cp, hh.Spot()), _market()
    )
    v = float(hh.solve(van, hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(prices[-1], v, rtol=1e-3)


def test_already_outside():
    out = _analytic(_dbl(100.0, 101.0, 125.0))        # spot below L
    assert out == 0.0
    inn = _analytic(_dbl(100.0, 101.0, 125.0, knock=hh.KnockIn()))
    van = hh.PricingProblem(
        hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
        _market(),
    )
    np.testing.assert_allclose(
        inn, float(hh.solve(van, hh.BlackScholesAnalytic()).price), rtol=1e-12
    )
    reb = _analytic(_dbl(100.0, 101.0, 125.0, rebate=3.0))
    D = float(hh.df(_market().rate, EXPIRY))
    np.testing.assert_allclose(reb, 3.0 * D, rtol=1e-12)


@pytest.mark.parametrize("K,L,U,cp", CONTRACTS)
def test_exact_bridge_mc_matches_closed_form(K, L, U, cp):
    """ONE exact bridge over [0, T] with the two-sided no-exit factor —
    agreement with the image series to pure MC noise (both directions of
    the knock)."""
    cfg = hh.SimulationConfig(trajectories=1 << 18, steps=1, seed=17,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)
    for knock in (hh.KnockOut(), hh.KnockIn()):
        payoff = _dbl(K, L, U, cp, knock)
        ref = _analytic(payoff)
        price = float(hh.solve(hh.PricingProblem(payoff, _market()), mc).price)
        np.testing.assert_allclose(price, ref, rtol=2e-2, atol=5e-3)


def test_euler_grid_mc_matches_closed_form():
    cfg = hh.SimulationConfig(trajectories=1 << 17, steps=48, seed=19,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    payoff = _dbl(100.0, 80.0, 125.0)
    ref = _analytic(payoff)
    price = float(hh.solve(hh.PricingProblem(payoff, _market()), mc).price)
    np.testing.assert_allclose(price, ref, rtol=2e-2)


def test_rebate_parity_and_one_touch():
    """KI(R) + KO(R at expiry) = vanilla + R·D; the double one-touch
    (at-hit) exceeds the at-expiry rebate leg (earlier payment)."""
    K, L, U, Rb = 100.0, 85.0, 120.0, 4.0
    D = float(hh.df(_market().rate, EXPIRY))
    van = hh.PricingProblem(
        hh.VanillaOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
        _market(),
    )
    v = float(hh.solve(van, hh.BlackScholesAnalytic()).price)
    ko = _analytic(_dbl(K, L, U, rebate=Rb))
    ki = _analytic(_dbl(K, L, U, knock=hh.KnockIn(), rebate=Rb))
    np.testing.assert_allclose(ko + ki, v + Rb * D, rtol=1e-10)
    # at-hit rebate: closed form refuses, MC prices it above the at-expiry leg
    with pytest.raises(TypeError, match="one-touch"):
        _analytic(_dbl(K, L, U, rebate=Rb, at_hit=True))
    cfg = hh.SimulationConfig(trajectories=1 << 16, steps=64, seed=23,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    at_hit = float(hh.solve(
        hh.PricingProblem(_dbl(K, L, U, rebate=Rb, at_hit=True), _market()), mc
    ).price)
    at_exp = float(hh.solve(
        hh.PricingProblem(_dbl(K, L, U, rebate=Rb), _market()), mc
    ).price)
    assert at_hit > at_exp


def test_heston_conditional_grid_double_barrier():
    """Refinement consistency on the conditional Heston bridge grid and the
    σ_vol→0 corner collapsing to the flat-vol image series."""
    hm = hh.HestonInputs(REF, R, SPOT, V0=0.0625, kappa=2.0, theta=0.0625,
                         sigma=1e-4, rho=0.0)
    payoff = _dbl(100.0, 80.0, 130.0)
    ref = _analytic(payoff, _market(q=0.0, sigma=0.25))

    def price(steps, paths=1 << 16, seed=29):
        cfg = hh.SimulationConfig(trajectories=paths, steps=steps, seed=seed,
                                  variance_reduction=hh.Antithetic())
        mc = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg)
        return float(hh.solve(hh.PricingProblem(payoff, hm), mc).price)

    p16, p64 = price(16), price(64)
    np.testing.assert_allclose(p16, p64, rtol=3e-2)
    np.testing.assert_allclose(p64, ref, rtol=3e-2)


def test_double_barrier_delta_ad():
    """AD delta through the closed form matches central FD; AD through the
    bridge MC (smooth factors) matches the closed form."""
    payoff = _dbl(100.0, 80.0, 125.0)
    lens = hh.SpotLens()
    base = hh.PricingProblem(payoff, _market())

    def an_price(s):
        return hh.solve(lens.set(base, s), hh.BlackScholesAnalytic()).price

    d_an = float(jax.grad(an_price)(jnp.asarray(SPOT)))
    eps = 1e-4 * SPOT
    fd = (float(an_price(jnp.asarray(SPOT + eps)))
          - float(an_price(jnp.asarray(SPOT - eps)))) / (2 * eps)
    np.testing.assert_allclose(d_an, fd, rtol=1e-6)

    # pathwise MC delta: the knock-OUT's delta is a tiny cancellation
    # (~2e-3) with large per-path variance, so the MC comparison runs on
    # the knock-IN (delta ≈ the vanilla's) where the relative tolerance is
    # meaningful
    ki = _dbl(100.0, 80.0, 125.0, knock=hh.KnockIn())
    base_ki = hh.PricingProblem(ki, _market())
    d_an_ki = float(jax.grad(
        lambda s: hh.solve(lens.set(base_ki, s), hh.BlackScholesAnalytic()).price
    )(jnp.asarray(SPOT)))
    cfg = hh.SimulationConfig(trajectories=1 << 17, steps=1, seed=31,
                              variance_reduction=hh.Antithetic())
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)
    d_mc = float(jax.grad(
        lambda s: hh.solve(lens.set(base_ki, s), mc).price
    )(jnp.asarray(SPOT)))
    np.testing.assert_allclose(d_mc, d_an_ki, rtol=5e-2)


def test_unsupported_routes_raise():
    payoff = _dbl(100.0, 80.0, 125.0)
    prob = hh.PricingProblem(payoff, _market())
    with pytest.raises(TypeError, match="single-barrier bridge"):
        hh.solve(prob, hh.CoxRossRubinsteinMethod(64))
    with pytest.raises(TypeError, match="path"):
        hh.solve(prob, hh.CarrMadan())


def test_zero_vol_deterministic():
    m = _market(r=0.05, q=0.0, sigma=0.0)
    D = np.exp(-0.05 * float(hh.yearfrac(REF, EXPIRY)))
    sT = SPOT * np.exp(0.05 * float(hh.yearfrac(REF, EXPIRY)))
    # corridor wide enough: deterministic path never exits → intrinsic
    p = _analytic(_dbl(100.0, 80.0, 125.0), m)
    np.testing.assert_allclose(p, D * (sT - 100.0), rtol=1e-12)
    # upper barrier below the deterministic terminal → knocked out
    assert _analytic(_dbl(100.0, 80.0, 104.0), m) == 0.0
