"""Autocallable notes (beyond-reference structured product; see
core/payoffs.py::Autocallable and montecarlo.py::_solve_autocall_mc).

Oracles: degenerate schedules collapse to exact discounted cashflows; the
periods=2 discrete-KI snowball has an exact bivariate-normal value (every
leg is a rectangle probability of the correlated (logS_1, logS_2) pair,
with the knock-in airbag leg priced under the share measure)."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.stats import norm

import hedgehog_tpu as hh

REF = dt.date(2025, 1, 1)
EXPIRY = dt.date(2026, 1, 1)
R, S0, SIG = 0.03, 100.0, 0.2


def _bs_market():
    return hh.BlackScholesInputs(REF, R, S0, SIG)


def _mc(paths=2**15, steps=48, seed=3):
    return hh.MonteCarlo(
        hh.LognormalDynamics(), hh.EulerMaruyama(),
        hh.SimulationConfig(trajectories=paths, steps=steps,
                            variance_reduction=hh.Antithetic(), seed=seed),
    )


def test_always_calls_first_date_exact():
    """autocall_barrier=0: redeems at t_1 with one coupon, exactly."""
    T = float(hh.yearfrac(REF, EXPIRY))
    po = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=0.0,
                         coupon=0.05, knock_in_barrier=0.0)
    p = hh.solve(hh.PricingProblem(po, _bs_market()), _mc()).price
    np.testing.assert_allclose(float(p), 1.05 * np.exp(-R * T / 4), rtol=1e-12)


def test_never_calls_never_ki_exact():
    """Unreachable barriers: the full snowball coupon stack at expiry."""
    T = float(hh.yearfrac(REF, EXPIRY))
    po = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1e9, coupon=0.05,
                         knock_in_barrier=1e-12, ki_monitoring="observations")
    p = hh.solve(hh.PricingProblem(po, _bs_market()), _mc()).price
    np.testing.assert_allclose(float(p), 1.20 * np.exp(-R * T), rtol=1e-12)


def test_always_ki_is_airbag_leg():
    """KI certain, never called: value = df·E[min(S_T, S0)]/S0 =
    1 − call(S0)/S0 (covered-call identity)."""
    po = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1e9, coupon=0.05,
                         knock_in_barrier=1e9, ki_monitoring="observations")
    p = hh.solve(hh.PricingProblem(po, _bs_market()), _mc(paths=2**16)).price
    call = hh.solve(
        hh.PricingProblem(hh.VanillaOption(S0, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
                          _bs_market()),
        hh.BlackScholesAnalytic(),
    ).price
    np.testing.assert_allclose(float(p), 1.0 - float(call) / S0, rtol=1e-3)


def _bvn_rect(a1, b1, a2, b2, rho):
    """P(a1 < X ≤ b1, a2 < Y ≤ b2) for standard bivariate normal."""
    c = hh.bvn_cdf
    return (c(b1, b2, rho) - c(a1, b2, rho) - c(b1, a2, rho) + c(a1, a2, rho))


def test_two_period_snowball_matches_bvn_closed_form():
    """periods=2, discrete KI at the two observation dates: every leg is a
    rectangle probability of the correlated standardized (logS_1, logS_2)
    — the airbag expectation via the share-measure drift shift."""
    T = float(hh.yearfrac(REF, EXPIRY))
    t1, t2 = T / 2, T
    b_ac, b_ki, c = 1.0, 0.7, 0.04
    po = hh.Autocallable(EXPIRY, periods=2, autocall_barrier=b_ac, coupon=c,
                         knock_in_barrier=b_ki, ki_monitoring="observations")
    p = hh.solve(hh.PricingProblem(po, _bs_market()),
                 _mc(paths=2**17, steps=2, seed=5)).price

    # standardized coordinates: z_i = (ln(K/S0) − (r − σ²/2)t_i)/(σ√t_i)
    def z(level, t, shift=0.0):
        return (np.log(level) - (R - 0.5 * SIG**2 + shift * SIG**2) * t) / (SIG * np.sqrt(t))

    rho12 = np.sqrt(t1 / t2)
    lo, hi = -50.0, 50.0
    d1, d2 = np.exp(-R * t1), np.exp(-R * t2)

    # leg 1: called at t1 (S1 ≥ B): digital
    p1 = 1.0 - float(norm.cdf(z(b_ac, t1)))
    v = d1 * (1.0 + c) * p1
    # leg 2: S1 < B, S2 ≥ B → (1+2c) at T
    p2 = float(_bvn_rect(lo, z(b_ac, t1), z(b_ac, t2), hi, rho12))
    # leg 3: uncalled, no KI: S1 ∈ [Bki, B), S2 ∈ [Bki, B) → (1+2c) at T
    p3 = float(_bvn_rect(z(b_ki, t1), z(b_ac, t1), z(b_ki, t2), z(b_ac, t2), rho12))
    v += d2 * (1.0 + 2 * c) * (p2 + p3)
    # leg 4 (airbag): uncalled AND KI → S_T/S0 at T; value = d2·F/S0·P̃ with
    # the share-measure drift (+σ²); region = {S1<B, S2<B} − {S1,S2 ∈ [Bki,B)}
    pa = float(_bvn_rect(lo, z(b_ac, t1, 1.0), lo, z(b_ac, t2, 1.0), rho12))
    pb = float(_bvn_rect(z(b_ki, t1, 1.0), z(b_ac, t1, 1.0),
                         z(b_ki, t2, 1.0), z(b_ac, t2, 1.0), rho12))
    fwd = np.exp(R * t2)  # F/S0
    v += d2 * fwd * (pa - pb)

    np.testing.assert_allclose(float(p), v, rtol=4e-3)


def test_continuous_ki_below_discrete():
    """Bridge-monitored KI triggers more often than observation-date KI, so
    the (investor-long) note is worth less."""
    mkt = _bs_market()
    po_c = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1.0, coupon=0.03,
                           knock_in_barrier=0.8, ki_monitoring="continuous")
    po_d = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1.0, coupon=0.03,
                           knock_in_barrier=0.8, ki_monitoring="observations")
    mc = _mc(paths=2**15, steps=48)
    p_c = float(hh.solve(hh.PricingProblem(po_c, mkt), mc).price)
    p_d = float(hh.solve(hh.PricingProblem(po_d, mkt), mc).price)
    assert p_c < p_d


def test_phoenix_memory_coupons():
    """Phoenix with coupon barrier 0: a sure coupon at every date while
    alive; with barriers unreachable it is an annuity + principal."""
    T = float(hh.yearfrac(REF, EXPIRY))
    po = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1e9, coupon=0.01,
                         knock_in_barrier=1e-12, coupon_barrier=0.0,
                         ki_monitoring="observations")
    p = hh.solve(hh.PricingProblem(po, _bs_market()), _mc()).price
    t_obs = np.arange(1, 5) * T / 4
    exact = 0.01 * np.exp(-R * t_obs).sum() + np.exp(-R * T)
    np.testing.assert_allclose(float(p), exact, rtol=1e-12)

    # memory: an unreachable coupon barrier except at maturity pays nothing
    # (coupon stream needs the barrier); reachable-only-at-end + memory pays
    # all 4 coupons iff S_T ≥ B_cpn — monotone in the coupon barrier
    po_hi = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1e9, coupon=0.01,
                            knock_in_barrier=1e-12, coupon_barrier=0.9,
                            ki_monitoring="observations")
    po_lo = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1e9, coupon=0.01,
                            knock_in_barrier=1e-12, coupon_barrier=0.5,
                            ki_monitoring="observations")
    mc = _mc()
    p_hi = float(hh.solve(hh.PricingProblem(po_hi, _bs_market()), mc).price)
    p_lo = float(hh.solve(hh.PricingProblem(po_lo, _bs_market()), mc).price)
    assert p_lo > p_hi


def test_heston_conditional_grid_and_coupon_monotonicity():
    hm = hh.HestonInputs(REF, R, S0, 0.04, 2.0, 0.05, 0.6, -0.7)
    mc = hh.MonteCarlo(
        hh.HestonDynamics(), hh.HestonQE(conditional=True),
        hh.SimulationConfig(trajectories=2**14, steps=48,
                            variance_reduction=hh.Antithetic(), seed=3),
    )
    prices = []
    for c in (0.01, 0.03):
        po = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1.0, coupon=c,
                             knock_in_barrier=0.7)
        prices.append(float(hh.solve(hh.PricingProblem(po, hm), mc).price))
    assert prices[1] > prices[0]
    assert 0.8 < prices[0] < 1.1


def test_step_alignment_validation():
    po = hh.Autocallable(EXPIRY, periods=5, autocall_barrier=1.0, coupon=0.03,
                         knock_in_barrier=0.7)
    with pytest.raises(ValueError, match="multiple of"):
        hh.solve(hh.PricingProblem(po, _bs_market()), _mc(steps=48))
    with pytest.raises(ValueError, match="ki_monitoring"):
        hh.Autocallable(EXPIRY, ki_monitoring="grid")


def test_continuous_ki_vega_is_negative():
    """Pathwise AD vega: higher vol hurts the note (more KI mass, earlier
    coupons lost) — the smooth bridge KI leg carries real gradient."""
    def price_of_vol(sig):
        mkt = hh.BlackScholesInputs(REF, R, S0, sig)
        po = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1.0,
                             coupon=0.03, knock_in_barrier=0.8)
        return hh.solve(hh.PricingProblem(po, mkt), _mc(paths=2**13, steps=24)).price

    v = float(jax.grad(price_of_vol)(0.2))
    assert v < 0.0


def test_auto_monitoring_resolves_per_grid():
    """The default ki_monitoring='auto' picks the continuous bridge where
    the grid carries bridge factors (GBM Euler) and observation dates on
    grids that don't (Merton) — the documented 'any MC grid' contract
    works out of the box on every dynamics."""
    po_auto = hh.Autocallable(EXPIRY, periods=4, knock_in_barrier=0.8)
    po_cont = hh.Autocallable(EXPIRY, periods=4, knock_in_barrier=0.8,
                              ki_monitoring="continuous")
    po_obs = hh.Autocallable(EXPIRY, periods=4, knock_in_barrier=0.8,
                             ki_monitoring="observations")
    m = _mc()
    pa = float(hh.solve(hh.PricingProblem(po_auto, _bs_market()), m).price)
    pc = float(hh.solve(hh.PricingProblem(po_cont, _bs_market()), m).price)
    assert pa == pc  # bridge grid -> continuous
    mm = hh.MertonInputs(REF, R, S0, SIG, 0.3, -0.1, 0.15)
    m_j = hh.MonteCarlo(
        hh.MertonJumpDynamics(), hh.EulerMaruyama(),
        hh.SimulationConfig(trajectories=2**14, steps=48,
                            variance_reduction=hh.Antithetic(), seed=3),
    )
    pja = float(hh.solve(hh.PricingProblem(po_auto, mm), m_j).price)
    pjo = float(hh.solve(hh.PricingProblem(po_obs, mm), m_j).price)
    assert pja == pjo  # no bridge factors -> observation dates
