"""Day-count conventions (beyond-reference: src/date_functions.jl is
ACT/365-fixed only; core/dates.py adds ACT/360, ACT/365.25, 30E/360 and
ACT/ACT ISDA behind the same ``yearfrac`` boundary).

Linear conventions are jit/grad-compatible (constant tick slope, so the
tick-theta convention of greeks_problem.jl:472-475 stays well-defined);
calendar conventions evaluate at the concrete-date boundary and raise a
clear TypeError under tracing.
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.core.dates import (
    ACT365F,
    Act360,
    Act365Fixed,
    Act36525,
    ActActISDA,
    Thirty360E,
    to_ticks,
    yearfrac,
)
from hedgehog_tpu.market.inputs import market_yearfrac

D1, D2 = dt.date(2024, 1, 1), dt.date(2025, 1, 1)  # 366 days (leap year)


def test_linear_conventions_are_tick_scales():
    days = (D2 - D1).days
    assert float(yearfrac(D1, D2)) == pytest.approx(days / 365.0)
    assert float(yearfrac(D1, D2, Act365Fixed())) == pytest.approx(days / 365.0)
    assert float(yearfrac(D1, D2, Act360())) == pytest.approx(days / 360.0)
    assert float(yearfrac(D1, D2, Act36525())) == pytest.approx(days / 365.25)


def test_thirty360e_goldens():
    dc = Thirty360E()
    # 2024-01-31 → 2024-03-31: both month-end days clamp to 30 → 60/360
    assert yearfrac(dt.date(2024, 1, 31), dt.date(2024, 3, 31), dc) == pytest.approx(1 / 6)
    # plain month: 30/360
    assert yearfrac(dt.date(2024, 2, 15), dt.date(2024, 3, 15), dc) == pytest.approx(30 / 360)
    # full year = exactly 1 regardless of leap
    assert yearfrac(D1, D2, dc) == pytest.approx(1.0)


def test_actact_isda_golden():
    # 2023-07-01 → 2024-07-01 spans a non-leap and a leap year:
    # 184/365 + 182/366
    got = yearfrac(dt.date(2023, 7, 1), dt.date(2024, 7, 1), ActActISDA())
    assert got == pytest.approx(184 / 365 + 182 / 366, abs=1e-12)
    # antisymmetry
    assert yearfrac(dt.date(2024, 7, 1), dt.date(2023, 7, 1), ActActISDA()) == pytest.approx(-got)


def test_calendar_convention_raises_under_tracing():
    dc = Thirty360E()

    def f(ticks):
        return yearfrac(to_ticks(D1), ticks, dc)

    with pytest.raises(TypeError, match="concrete dates"):
        jax.jit(f)(jnp.float64(to_ticks(D2)))


def test_daycount_objects_are_static_safe():
    # hashable, ==-comparable singletons → usable as jit static args
    assert Act360() == Act360()
    assert hash(Act360()) == hash(Act360())
    assert Act360() != Act365Fixed()


def test_bs_price_under_act360():
    """An ACT/360 market must price exactly the BS closed form evaluated at
    T = days/360 (vol and rate both scale through the same T)."""
    from scipy.stats import norm

    mkt = hh.BlackScholesInputs(D1, 0.05, 100.0, 0.2, daycount=Act360())
    opt = hh.VanillaOption(90.0, D2, hh.European(), hh.Call(), hh.Spot())
    got = float(hh.solve(hh.PricingProblem(opt, mkt), hh.BlackScholesAnalytic()).price)

    T = (D2 - D1).days / 360.0
    d1 = (np.log(100.0 / 90.0) + (0.05 + 0.5 * 0.04) * T) / (0.2 * np.sqrt(T))
    d2 = d1 - 0.2 * np.sqrt(T)
    want = 100.0 * norm.cdf(d1) - 90.0 * np.exp(-0.05 * T) * norm.cdf(d2)
    assert got == pytest.approx(want, rel=1e-12)
    # and it differs from the ACT/365 price (the convention is live)
    base = float(hh.solve(
        hh.PricingProblem(opt, hh.BlackScholesInputs(D1, 0.05, 100.0, 0.2)),
        hh.BlackScholesAnalytic()).price)
    assert abs(got - base) > 1e-3


def test_daycount_consistent_across_methods():
    """Analytic, CRR and exact-MC all see the same ACT/360 maturity: CRR's
    discretization offset from the closed form is convention-independent
    (the convention is threaded everywhere, not just into one method)."""
    opt = hh.VanillaOption(100.0, D2, hh.European(), hh.Call(), hh.Spot())

    def solve_pair(mkt):
        prob = hh.PricingProblem(opt, mkt)
        bs = float(hh.solve(prob, hh.BlackScholesAnalytic()).price)
        crr = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(400)).price)
        return bs, crr

    bs360, crr360 = solve_pair(hh.BlackScholesInputs(D1, 0.03, 100.0, 0.2,
                                                     daycount=Act360()))
    bs365, crr365 = solve_pair(hh.BlackScholesInputs(D1, 0.03, 100.0, 0.2))
    assert crr360 == pytest.approx(bs360, abs=6e-3)
    assert (crr360 - bs360) == pytest.approx(crr365 - bs365, abs=2e-4)

    cfg = hh.SimulationConfig(trajectories=1 << 15, steps=1,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    p_mc = float(hh.solve(
        hh.PricingProblem(opt, hh.BlackScholesInputs(D1, 0.03, 100.0, 0.2,
                                                     daycount=Act360())),
        hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)
    ).price)
    assert p_mc == pytest.approx(bs360, rel=2e-3)


def test_heston_act360_consistency():
    """Carr-Madan and the exact-mixing MC agree under ACT/360 (both route
    their maturity through market_yearfrac)."""
    mkt = hh.HestonInputs(D1, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7,
                          daycount=Act360())
    opt = hh.VanillaOption(100.0, D2, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(opt, mkt)
    cm = float(hh.solve(prob, hh.CarrMadan(1.0, "auto", hh.HestonDynamics())).price)
    cm365 = float(hh.solve(
        hh.PricingProblem(opt, hh.HestonInputs(D1, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)),
        hh.CarrMadan(1.0, "auto", hh.HestonDynamics())).price)
    assert abs(cm - cm365) > 1e-3  # convention is live
    cfg = hh.SimulationConfig(trajectories=1 << 15, steps=2,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    mc = float(hh.solve(
        prob, hh.MonteCarlo(hh.HestonDynamics(), hh.HestonExactMixing(), cfg)
    ).price)
    assert mc == pytest.approx(cm, rel=2e-3)


def test_curve_daycount():
    """A FlatRateCurve built through an ACT/360 market discounts at
    T = days/360; an explicit curve keeps its own convention."""
    from hedgehog_tpu.market.rate_curve import df

    mkt = hh.BlackScholesInputs(D1, 0.05, 100.0, 0.2, daycount=Act360())
    got = float(df(mkt.rate, D2))
    assert got == pytest.approx(np.exp(-0.05 * 366 / 360), rel=1e-12)
    explicit = hh.FlatRateCurve(D1, 0.05)  # ACT/365 default
    assert float(df(explicit, D2)) == pytest.approx(np.exp(-0.05 * 366 / 365), rel=1e-12)


def test_market_yearfrac_default_matches_reference():
    mkt = hh.BlackScholesInputs(D1, 0.05, 100.0, 0.2)
    assert float(market_yearfrac(mkt, to_ticks(D2))) == pytest.approx(366 / 365)
    assert mkt.daycount == ACT365F


def test_theta_in_ticks_under_linear_convention():
    """Tick-theta (the reference's convention) stays AD-well-defined for
    linear day-counts: d(price)/d(expiry ticks) scales with 365/360."""
    mkt360 = hh.BlackScholesInputs(D1, 0.05, 100.0, 0.2, daycount=Act360())
    mkt365 = hh.BlackScholesInputs(D1, 0.05, 100.0, 0.2)
    opt = hh.VanillaOption(100.0, D2, hh.European(), hh.Call(), hh.Spot())

    def price(mkt, ticks):
        o = hh.VanillaOption(100.0, ticks, hh.European(), hh.Call(), hh.Spot())
        return hh.solve(hh.PricingProblem(o, mkt), hh.BlackScholesAnalytic()).price

    ticks = jnp.float64(to_ticks(D2))
    g360 = float(jax.grad(lambda t: price(mkt360, t))(ticks))
    g365 = float(jax.grad(lambda t: price(mkt365, t))(ticks))
    assert np.isfinite(g360) and np.isfinite(g365)
    assert g360 != g365  # different slope through the convention


def test_lsm_discount_under_act360():
    """LSM's per-step discount must live in the market's convention (review
    finding: a tick round-trip scaled every step by 365/360): American put
    LSM on an Act360 market tracks CRR on the same market."""
    mkt = hh.BlackScholesInputs(D1, 0.05, 100.0, 0.2, daycount=Act360())
    am = hh.VanillaOption(105.0, D2, hh.American(), hh.Put(), hh.Spot())
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=50,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    p_lsm = float(hh.solve(
        hh.PricingProblem(am, mkt),
        hh.LSM(hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg), 4)).price)
    p_crr = float(hh.solve(hh.PricingProblem(am, mkt),
                           hh.CoxRossRubinsteinMethod(500)).price)
    assert p_lsm == pytest.approx(p_crr, rel=2e-2)
