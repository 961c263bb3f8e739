"""Discrete cash dividends (market/dividends.py) — beyond-reference.

Two conventions, each pinned to its own oracle:

- ESCROWED (terminal-law engines): BS analytic with a schedule equals BS on
  the PV-reduced spot EXACTLY; Carr-Madan / exact MC / CRR(European) agree
  through the shared forward_spot.
- SPOT MODEL (grid engines): the PDE jump conditions and the grid-MC
  ex-date drops discretize the same piecewise-lognormal model and agree at
  MC tolerance; American calls gain a just-before-ex-div exercise premium
  (zero without dividends — the classic qualitative signature).

Engines whose math a schedule would silently break must raise instead.
"""

import datetime as dt
import math

import jax
import jax.numpy as jnp
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
EX_DATES = [dt.date(2024, 4, 1), dt.date(2024, 10, 1)]


def _schedule(amts=(2.0, 2.0)):
    return hh.DividendSchedule(EX_DATES, list(amts))


def _mkt(divs=None, **kw):
    return hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2, dividends=divs, **kw)


def _vo(cp=None, style=None, strike=100.0):
    return hh.VanillaOption(strike, EXPIRY, style or hh.European(),
                            cp or hh.Call(), hh.Spot())


def _cfg(paths=1 << 15, steps=48):
    return hh.SimulationConfig(trajectories=paths, steps=steps,
                               variance_reduction=hh.Antithetic(), seed=0,
                               qmc=True)


def test_dividend_pv_and_masking():
    mkt = _mkt(_schedule())
    T = hh.yearfrac(REF, EXPIRY)
    t1 = hh.yearfrac(REF, EX_DATES[0])
    t2 = hh.yearfrac(REF, EX_DATES[1])
    expected = 2.0 * math.exp(-0.03 * t1) + 2.0 * math.exp(-0.03 * t2)
    assert float(hh.dividend_pv(mkt, T)) == pytest.approx(expected, rel=1e-12)
    # a window before the second ex-date drops it
    assert float(hh.dividend_pv(mkt, 0.5 * (t1 + t2))) == pytest.approx(
        2.0 * math.exp(-0.03 * t1), rel=1e-12
    )
    # ex-dates after the expiry are ignored
    late = hh.DividendSchedule([dt.date(2026, 1, 1)], [5.0])
    assert float(hh.dividend_pv(_mkt(late), T)) == 0.0


def test_escrowed_engines_agree():
    """BS == spot-PV oracle exactly; CM/exact-MC/CRR through forward_spot."""
    mkt = _mkt(_schedule())
    T = hh.yearfrac(REF, EXPIRY)
    pv = float(hh.dividend_pv(mkt, T))
    oracle_mkt = hh.BlackScholesInputs(REF, 0.03, 100.0 - pv, 0.2)
    for cp in (hh.Call(), hh.Put()):
        prob = hh.PricingProblem(_vo(cp), mkt)
        p = float(hh.solve(prob, hh.BlackScholesAnalytic()).price)
        p_or = float(hh.solve(hh.PricingProblem(_vo(cp), oracle_mkt),
                              hh.BlackScholesAnalytic()).price)
        assert p == pytest.approx(p_or, abs=1e-12)
        cm = float(hh.solve(prob, hh.CarrMadan(1.0, "auto",
                                               hh.LognormalDynamics())).price)
        assert cm == pytest.approx(p, rel=1e-6)
        mc = float(hh.solve(prob, hh.MonteCarlo(
            hh.LognormalDynamics(), hh.BlackScholesExact(), _cfg())).price)
        assert mc == pytest.approx(p, rel=3e-3)
    crr = float(hh.solve(hh.PricingProblem(_vo(), mkt),
                         hh.CoxRossRubinsteinMethod(800)).price)
    p_call = float(hh.solve(hh.PricingProblem(_vo(), mkt),
                            hh.BlackScholesAnalytic()).price)
    assert crr == pytest.approx(p_call, rel=2e-3)


def test_put_call_parity_with_schedule():
    """call − put = (S − PV(divs))e^{−qT} − K·D for BS analytic AND CM."""
    mkt = _mkt(_schedule(), dividend_yield=0.01)
    T = hh.yearfrac(REF, EXPIRY)
    lhs_f = float(hh.forward_spot(mkt, T)) - 100.0 * math.exp(-0.03 * T)
    for method in (hh.BlackScholesAnalytic(),
                   hh.CarrMadan(1.0, "auto", hh.LognormalDynamics())):
        c = float(hh.solve(hh.PricingProblem(_vo(hh.Call()), mkt), method).price)
        p = float(hh.solve(hh.PricingProblem(_vo(hh.Put()), mkt), method).price)
        assert c - p == pytest.approx(lhs_f, rel=1e-6, abs=1e-6)


def test_spot_model_pde_matches_grid_mc():
    divs = hh.DividendSchedule([dt.date(2024, 6, 1)], [5.0])
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividends=divs)
    pde = hh.PDEMethod(space_steps=300, time_steps=120)
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                       _cfg(1 << 16, 48))
    for cp in (hh.Call(), hh.Put()):
        prob = hh.PricingProblem(_vo(cp), mkt)
        p_pde = float(hh.solve(prob, pde).price)
        p_mc = float(hh.solve(prob, mc).price)
        assert p_mc == pytest.approx(p_pde, rel=5e-3)
    # the convention gap vs escrowed is real but small (escrowed lognormal
    # rides a PV-shifted spot): a couple of percent here, not 20
    p_esc = float(hh.solve(hh.PricingProblem(_vo(), mkt),
                           hh.BlackScholesAnalytic()).price)
    p_pde = float(hh.solve(hh.PricingProblem(_vo(), mkt), pde).price)
    assert abs(p_pde - p_esc) / p_esc < 0.05
    assert p_pde != pytest.approx(p_esc, rel=1e-4)  # genuinely different models


def test_american_call_exercises_before_ex_div():
    divs = hh.DividendSchedule([dt.date(2024, 6, 1)], [5.0])
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividends=divs)
    pde = hh.PDEMethod(space_steps=300, time_steps=120)
    eu = float(hh.solve(hh.PricingProblem(_vo(), mkt), pde).price)
    am = float(hh.solve(hh.PricingProblem(_vo(style=hh.American()), mkt),
                        pde).price)
    assert am > eu + 0.05  # a real just-before-ex-div premium
    # without dividends the American call IS the European call
    mkt0 = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    eu0 = float(hh.solve(hh.PricingProblem(_vo(), mkt0), pde).price)
    am0 = float(hh.solve(hh.PricingProblem(_vo(style=hh.American()), mkt0),
                         pde).price)
    assert am0 == pytest.approx(eu0, rel=1e-3)
    # Hull's escrowed CRR sees a comparable premium over ITS European limit
    crr_am = float(hh.solve(hh.PricingProblem(_vo(style=hh.American()), mkt),
                            hh.CoxRossRubinsteinMethod(800)).price)
    crr_eu = float(hh.solve(hh.PricingProblem(_vo(), mkt),
                            hh.CoxRossRubinsteinMethod(800)).price)
    prem_crr = crr_am - crr_eu
    prem_pde = am - eu
    assert prem_crr > 0.05
    assert prem_crr == pytest.approx(prem_pde, rel=0.4)


def test_american_put_lsm_matches_pde():
    divs = hh.DividendSchedule([dt.date(2024, 6, 1)], [4.0])
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividends=divs)
    po = _vo(hh.Put(), hh.American())
    pde = hh.PDEMethod(space_steps=300, time_steps=120)
    p_pde = float(hh.solve(hh.PricingProblem(po, mkt), pde).price)
    lsm = hh.LSM(hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                               _cfg(1 << 15, 48)), 4)
    p_lsm = float(hh.solve(hh.PricingProblem(po, mkt), lsm).price)
    assert p_lsm == pytest.approx(p_pde, rel=2e-2)


def test_knock_out_pde_with_dividends_is_sane():
    divs = hh.DividendSchedule([dt.date(2024, 6, 1)], [3.0])
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividends=divs)
    pde = hh.PDEMethod(space_steps=300, time_steps=120)
    van = float(hh.solve(hh.PricingProblem(_vo(), mkt), pde).price)
    doc = hh.BarrierOption(100.0, EXPIRY, 130.0, hh.European(), hh.Call(),
                           hh.Spot(), hh.Up(), hh.KnockOut())
    ko = float(hh.solve(hh.PricingProblem(doc, mkt), pde).price)
    ki = float(hh.solve(hh.PricingProblem(
        hh.BarrierOption(100.0, EXPIRY, 130.0, hh.European(), hh.Call(),
                         hh.Spot(), hh.Up(), hh.KnockIn()), mkt), pde).price)
    assert 0.0 < ko < van
    assert ko + ki == pytest.approx(van, rel=1e-8)  # in-out parity, same engine
    # bridge MC on the Euler grid prices the same spot model
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                       _cfg(1 << 16, 48))
    ko_mc = float(hh.solve(hh.PricingProblem(doc, mkt), mc).price)
    assert ko_mc == pytest.approx(ko, rel=2e-2)


def test_dividend_gradients_flow():
    divs = _schedule()
    mkt = _mkt(divs)
    prob = hh.PricingProblem(_vo(), mkt)

    def price_of_amounts(amts):
        import dataclasses

        m = dataclasses.replace(
            mkt, dividends=dataclasses.replace(divs, amounts=amts)
        )
        return hh.solve(hh.PricingProblem(_vo(), m),
                        hh.BlackScholesAnalytic()).price

    g = jax.grad(price_of_amounts)(jnp.array([2.0, 2.0]))
    # ∂C/∂D_i = −df(t_i)·∂C/∂S: negative for a call, |g| < 1
    assert (g < 0.0).all() and (g > -1.0).all()
    # AD delta through the PDE with a schedule runs and is a call delta
    pde = hh.PDEMethod(space_steps=200, time_steps=80)
    delta = jax.grad(
        lambda s: hh.solve(hh.PricingProblem(
            _vo(), hh.BlackScholesInputs(REF, 0.03, s, 0.2, dividends=divs)),
            pde).price
    )(jnp.float64(100.0))
    assert 0.3 < float(delta) < 0.8


def test_degenerate_and_guards():
    # empty schedule == no dividends at all
    empty = hh.DividendSchedule([], [])
    p0 = float(hh.solve(hh.PricingProblem(_vo(), _mkt()),
                        hh.BlackScholesAnalytic()).price)
    pe = float(hh.solve(hh.PricingProblem(_vo(), _mkt(empty)),
                        hh.BlackScholesAnalytic()).price)
    assert pe == pytest.approx(p0, abs=1e-12)

    mkt = _mkt(_schedule())
    barrier = hh.BarrierOption(100.0, EXPIRY, 130.0, hh.European(), hh.Call(),
                               hh.Spot(), hh.Up(), hh.KnockOut())
    with pytest.raises(TypeError, match="escrowed"):
        hh.solve(hh.PricingProblem(barrier, mkt), hh.BlackScholesAnalytic())
    with pytest.raises(TypeError, match="barrier CRR"):
        hh.solve(hh.PricingProblem(barrier, mkt), hh.CoxRossRubinsteinMethod(100))
    with pytest.raises(TypeError, match="one-bridge"):
        hh.solve(hh.PricingProblem(barrier, mkt), hh.MonteCarlo(
            hh.LognormalDynamics(), hh.BlackScholesExact(), _cfg(1 << 10)))
    with pytest.raises(TypeError, match="DividendSchedule"):
        hh.solve(hh.PricingProblem(
            hh.VarianceSwap(EXPIRY, 0.04, observations=48), mkt),
            hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                          _cfg(1 << 10)))
    with pytest.raises(ValueError, match="matching"):
        hh.DividendSchedule(EX_DATES, [1.0])


def test_bermudan_pde_exercises_on_ex_date():
    """A Bermudan whose single exercise date IS the ex-date must see the
    cum-dividend (pre-drop) value — it captures (most of) the American
    call's just-before-ex-div premium instead of only the post-drop slice."""
    ex = dt.date(2024, 7, 1)
    divs = hh.DividendSchedule([ex], [6.0])
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividends=divs)
    pde = hh.PDEMethod(space_steps=300, time_steps=120)
    eu = float(hh.solve(hh.PricingProblem(_vo(), mkt), pde).price)
    am = float(hh.solve(hh.PricingProblem(_vo(style=hh.American()), mkt),
                        pde).price)
    bm = float(hh.solve(
        hh.PricingProblem(_vo(style=hh.Bermudan([ex])), mkt), pde).price)
    assert eu <= bm + 1e-12 and bm <= am + 1e-12
    assert bm > eu + 0.05  # the premium exists on the single ex-date right
    # one ex-date means the American only ever exercises just before the
    # drop, so the single-date Bermudan recovers (almost) all of it
    assert bm == pytest.approx(am, rel=2e-2)


def test_calendar_daycount_with_schedule():
    """Calendar conventions (30E/360) price eagerly with a schedule — the
    ex-date year fractions evaluate per date at the concrete boundary."""
    mkt360 = _mkt(_schedule(), daycount=hh.Thirty360E())
    p360 = float(hh.solve(hh.PricingProblem(_vo(), mkt360),
                          hh.BlackScholesAnalytic()).price)
    p365 = float(hh.solve(hh.PricingProblem(_vo(), _mkt(_schedule())),
                          hh.BlackScholesAnalytic()).price)
    assert p360 == pytest.approx(p365, rel=2e-2)  # basis gap only


def test_escrowed_spot_exceeding_schedule_raises():
    """PV(schedule) >= spot has no lognormal escrowed model — eager
    pricing raises a clear error instead of silent NaN."""
    big = hh.DividendSchedule(EX_DATES, [60.0, 60.0])
    with pytest.raises(ValueError, match="escrowed spot"):
        hh.solve(hh.PricingProblem(_vo(), _mkt(big)), hh.BlackScholesAnalytic())
