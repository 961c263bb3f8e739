"""Bermudan exercise style — beyond the reference's European/American
taxonomy (src/payoffs/payoffs.jl): exercise on a discrete date set, snapped
to the lattice/grid times (core.payoffs.bermudan_step_mask).

Pins: Bermudan(()) ≡ European, Bermudan(every grid date) ≡ American
(bit-exact on the lattice), European ≤ Bermudan ≤ American with strict
gaps for a deep put, and CRR/LSM agreement on the quarterly schedule.
"""

import datetime as dt

import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)
QUARTERS = (dt.date(2024, 4, 1), dt.date(2024, 7, 1), dt.date(2024, 10, 1))


def _mkt():
    return hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)


def _put(style):
    return hh.VanillaOption(110.0, EXPIRY, style, hh.Put(), hh.Spot())


def test_crr_degenerate_limits_and_ordering():
    crr = hh.CoxRossRubinsteinMethod(1000)
    p_eu = float(hh.solve(hh.PricingProblem(_put(hh.European()), _mkt()),
                          hh.BlackScholesAnalytic()).price)
    p_am = float(hh.solve(hh.PricingProblem(_put(hh.American()), _mkt()), crr).price)
    p_b0 = float(hh.solve(hh.PricingProblem(_put(hh.Bermudan(())), _mkt()), crr).price)
    p_bq = float(hh.solve(hh.PricingProblem(_put(hh.Bermudan(QUARTERS)), _mkt()), crr).price)
    all_dates = tuple(hh.add_yearfrac(hh.to_ticks(REF), t)
                      for t in np.arange(1, 1000) / 1000.0)
    p_ball = float(hh.solve(hh.PricingProblem(_put(hh.Bermudan(all_dates)), _mkt()), crr).price)
    assert p_b0 == pytest.approx(p_eu, rel=2e-3)  # lattice error only
    assert p_ball == p_am  # bit-exact: mask all True ≡ American
    assert p_eu < p_bq < p_am
    assert p_bq > p_eu + 0.05 and p_am > p_bq + 0.01


@pytest.mark.slow
def test_lsm_quarterly_matches_crr():
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=48,
                              variance_reduction=hh.Antithetic(), seed=0,
                              qmc=True)
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    prob = hh.PricingProblem(_put(hh.Bermudan(QUARTERS)), _mkt())
    p_lsm = float(hh.solve(prob, hh.LSM(mc, 4)).price)
    p_crr = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(1000)).price)
    assert p_lsm == pytest.approx(p_crr, rel=2e-2)


@pytest.mark.slow
def test_heston_conditional_bermudan_ordering():
    hm = hh.HestonInputs(REF, 0.05, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    cfg = hh.SimulationConfig(trajectories=1 << 13, steps=48,
                              variance_reduction=hh.Antithetic(), seed=0,
                              qmc=True)
    mc = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg)
    p_b = float(hh.solve(hh.PricingProblem(_put(hh.Bermudan(QUARTERS)), hm),
                         hh.LSM(mc, 3)).price)
    p_a = float(hh.solve(hh.PricingProblem(_put(hh.American()), hm),
                         hh.LSM(mc, 3)).price)
    p_e = float(hh.solve(hh.PricingProblem(_put(hh.European()), hm), mc).price)
    assert p_e - 0.05 <= p_b <= p_a + 0.05
    assert p_b > p_e + 0.3  # quarterly rights are genuinely valuable here


def test_bermudan_barrier_knock_out():
    """The exercise mask composes with the knock-out survival state on both
    engines."""
    am = hh.BarrierOption(110.0, EXPIRY, 80.0, hh.Bermudan(QUARTERS),
                          hh.Put(), hh.Spot(), hh.Down(), hh.KnockOut())
    crr_b = float(hh.solve(hh.PricingProblem(am, _mkt()),
                           hh.CoxRossRubinsteinMethod(1000)).price)
    eu = hh.BarrierOption(110.0, EXPIRY, 80.0, hh.European(), hh.Put(),
                          hh.Spot(), hh.Down(), hh.KnockOut())
    crr_e = float(hh.solve(hh.PricingProblem(eu, _mkt()),
                           hh.CoxRossRubinsteinMethod(1000)).price)
    amr = hh.BarrierOption(110.0, EXPIRY, 80.0, hh.American(), hh.Put(),
                           hh.Spot(), hh.Down(), hh.KnockOut())
    crr_a = float(hh.solve(hh.PricingProblem(amr, _mkt()),
                           hh.CoxRossRubinsteinMethod(1000)).price)
    assert crr_e < crr_b < crr_a
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=48,
                              variance_reduction=hh.Antithetic(), seed=0,
                              qmc=True)
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    p_lsm = float(hh.solve(hh.PricingProblem(am, _mkt()), hh.LSM(mc, 4)).price)
    assert p_lsm == pytest.approx(crr_b, rel=2e-2)


def test_guards():
    crr = hh.CoxRossRubinsteinMethod(100)
    # European-only methods reject Bermudan
    with pytest.raises(TypeError, match="European"):
        hh.solve(hh.PricingProblem(_put(hh.Bermudan(QUARTERS)), _mkt()),
                 hh.BlackScholesAnalytic())
    # exercise dates beyond expiry are rejected, not silently dropped
    with pytest.raises(ValueError, match="outside"):
        hh.solve(hh.PricingProblem(_put(hh.Bermudan((dt.date(2025, 6, 1),))),
                                   _mkt()), crr)
    # Bermudan knock-ins price via the hit-time quadrature (no parity is
    # USED — the engine integrates the live Bermudan's barrier value), and
    # must sit between the European and American knock-in prices
    ki = hh.BarrierOption(110.0, EXPIRY, 80.0, hh.Bermudan(QUARTERS),
                          hh.Put(), hh.Spot(), hh.Down(), hh.KnockIn())
    ki_be = float(hh.solve(hh.PricingProblem(ki, _mkt()), crr).price)
    import dataclasses

    ki_eu = float(hh.solve(hh.PricingProblem(
        dataclasses.replace(ki, exercise_style=hh.European()), _mkt()), crr).price)
    ki_am = float(hh.solve(hh.PricingProblem(
        dataclasses.replace(ki, exercise_style=hh.American()), _mkt()), crr).price)
    assert ki_eu - 5e-3 <= ki_be <= ki_am + 1e-9, (ki_eu, ki_be, ki_am)
    # Bermudan masks are concrete lattice structure: jitting over the
    # problem raises a directed TypeError instead of a tracer leak
    import jax

    with pytest.raises(TypeError, match="concrete"):
        jax.jit(lambda p: hh.solve(p, crr).price)(
            hh.PricingProblem(_put(hh.Bermudan(QUARTERS)), _mkt())
        )
