"""American/Bermudan knock-IN options on the CRR lattice.

No in-out parity exists under early exercise (knocking in leaves a LIVE
American option), so the engine prices the hit-time quadrature

    KI = ∫ D(0,t) · V_live(t, H) dF(t) + R·D(0,T)·(1 − F(T))

with the closed-form first-passage law F and the live option's lattice
value at the barrier (methods/crr.py::_solve_crr_knock_in_early).  The
anchors below pin every limit the engine must respect; the parity cases
(carry-free calls) double as an agreement test against the independent
European knock-in parity engine.
"""

import datetime as dt

import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # T = 1 under ACT/365
R, SPOT, SIGMA = 0.05, 100.0, 0.25


def _market():
    return hh.BlackScholesInputs(REF, R, SPOT, SIGMA)


def _ki(strike, barrier, style, cp, direction, rebate=0.0):
    return hh.BarrierOption(
        strike, EXPIRY, barrier, style, cp, hh.Spot(), direction,
        hh.KnockIn(), rebate=rebate,
    )


def _price(payoff, steps=1000):
    return float(
        hh.solve(hh.PricingProblem(payoff, _market()),
                 hh.CoxRossRubinsteinMethod(steps)).price
    )


def test_american_up_in_call_equals_european_parity():
    """Carry-free American call = European call, so the American knock-in
    engine must agree with the European in-out parity engine (measured
    3.5e-4 rel at 2000 steps; both converge to the Reiner-Rubinstein
    analytic, the quadrature engine FASTER than the parity engine)."""
    am = _price(_ki(100.0, 120.0, hh.American(), hh.Call(), hh.Up()), 2000)
    eu = _price(_ki(100.0, 120.0, hh.European(), hh.Call(), hh.Up()), 2000)
    an = float(hh.solve(
        hh.PricingProblem(_ki(100.0, 120.0, hh.European(), hh.Call(), hh.Up()),
                          _market()),
        hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(am, eu, rtol=1e-3)
    np.testing.assert_allclose(am, an, rtol=5e-4)


def test_immediate_knock_in_is_american_vanilla():
    """Barrier at the spot: knocked at inception — the contract IS the live
    American vanilla."""
    ki = _price(_ki(110.0, 100.0, hh.American(), hh.Put(), hh.Up()))
    van = float(
        hh.solve(hh.PricingProblem(
            hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot()),
            _market()), hh.CoxRossRubinsteinMethod(1000)).price
    )
    np.testing.assert_allclose(ki, van, rtol=1e-4)


def test_american_knock_in_put_bounds():
    """KI_am ∈ [KI_eu, vanilla American]; KI_am + KO_am superreplicates the
    vanilla American (the holder of both can mimic any vanilla strategy)."""
    aki = _price(_ki(110.0, 85.0, hh.American(), hh.Put(), hh.Down()))
    eki = _price(_ki(110.0, 85.0, hh.European(), hh.Put(), hh.Down()))
    ako = float(hh.solve(
        hh.PricingProblem(
            hh.BarrierOption(110.0, EXPIRY, 85.0, hh.American(), hh.Put(),
                             hh.Spot(), hh.Down(), hh.KnockOut()),
            _market()),
        hh.CoxRossRubinsteinMethod(1000)).price)
    van = float(hh.solve(
        hh.PricingProblem(
            hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot()),
            _market()),
        hh.CoxRossRubinsteinMethod(1000)).price)
    assert eki < aki <= van * (1 + 1e-12), (eki, aki, van)
    assert aki + ako >= van - 1e-6


def test_american_knock_in_step_convergence():
    """O(ΔT): successive refinements contract (measured 12.0308 / 12.0330 /
    12.0333 at 250/500/1000 steps)."""
    p250 = _price(_ki(110.0, 85.0, hh.American(), hh.Put(), hh.Down()), 250)
    p500 = _price(_ki(110.0, 85.0, hh.American(), hh.Put(), hh.Down()), 500)
    p1000 = _price(_ki(110.0, 85.0, hh.American(), hh.Put(), hh.Down()), 1000)
    assert abs(p1000 - p500) < abs(p500 - p250) + 1e-6
    np.testing.assert_allclose(p500, p1000, rtol=2e-4)


def test_american_knock_in_rebate_is_european_no_touch_bond():
    """A knock-in rebate pays R at expiry iff NEVER touched — an exercise-
    free leg, so KI_am(R) − KI_am(0) must equal the no-touch bond the
    EUROPEAN knock-in parity engine prices (same lattice, same R)."""
    Rb = 2.0
    am_r = _price(_ki(110.0, 85.0, hh.American(), hh.Put(), hh.Down(), Rb))
    am_0 = _price(_ki(110.0, 85.0, hh.American(), hh.Put(), hh.Down()))
    eu_r = _price(_ki(110.0, 85.0, hh.European(), hh.Put(), hh.Down(), Rb))
    eu_0 = _price(_ki(110.0, 85.0, hh.European(), hh.Put(), hh.Down()))
    # the quadrature engine's bond R·(1−F(T)) is closed-form exact; the gap
    # is the parity engine's lattice no-touch error (measured 2.8e-3 rel at
    # 1000 steps shrinking to 1.5e-3 at 4000)
    np.testing.assert_allclose(am_r - am_0, eu_r - eu_0, rtol=5e-3)


def test_bermudan_knock_in_between_european_and_american():
    quarterly = hh.Bermudan([dt.date(2024, 4, 1), dt.date(2024, 7, 1),
                             dt.date(2024, 10, 1)])
    eu = _price(_ki(110.0, 85.0, hh.European(), hh.Put(), hh.Down()))
    be = _price(_ki(110.0, 85.0, quarterly, hh.Put(), hh.Down()))
    am = _price(_ki(110.0, 85.0, hh.American(), hh.Put(), hh.Down()))
    assert eu - 1e-9 <= be <= am + 1e-9, (eu, be, am)


def test_knock_in_call_dominates_with_nearer_barrier():
    """Monotonicity in the barrier: a down-in with a HIGHER barrier knocks
    in more often, so it must be worth more."""
    near = _price(_ki(100.0, 95.0, hh.American(), hh.Put(), hh.Down()), 500)
    far = _price(_ki(100.0, 80.0, hh.American(), hh.Put(), hh.Down()), 500)
    assert near > far > 0.0
