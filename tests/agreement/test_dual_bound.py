"""Andersen-Broadie primal-dual bounds for LSM (methods/duality.py) — the
framework certifying its own American prices: lower ≤ CRR truth ≤ upper
(in expectation), a tight gap for a well-specified basis, and the
no-early-exercise degenerate corner pinned to the European closed form.
The reference validates LSM against CRR only
(test/agreement/american_options.jl); the dual bound is beyond-reference."""

import datetime as dt

import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.methods.duality import lsm_dual_bound

REF, EXP = dt.date(2024, 1, 1), dt.date(2024, 12, 31)  # T = 1


def _lsm(trajectories=20_000, steps=24, degree=5, seed=0):
    return hh.LSM(
        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                      hh.SimulationConfig(trajectories=trajectories,
                                          steps=steps, seed=seed)),
        degree=degree)


def test_american_put_brackets_crr():
    """Deep-ITM American put: [lower, upper] brackets CRR(2000) within 3σ
    and the certified gap stays a few percent of the price."""
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.3)
    prob = hh.PricingProblem(
        hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot()), mkt)
    truth = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(2000)).price)
    db = lsm_dual_bound(prob, _lsm(), n_outer=4096, n_inner=128)
    lo, up = float(db.lower), float(db.upper)
    assert lo - 3 * float(db.se_lower) <= truth <= up + 3 * float(db.se_upper)
    assert lo <= up
    assert float(db.gap) < 0.05 * truth
    # the primal (in-sample) estimate sits inside the certified interval
    assert lo - 3 * float(db.se_lower) <= float(db.primal) <= up + 3 * float(db.se_upper)


def test_american_call_no_dividends_is_european():
    """Without dividends early exercise of a call is never optimal: both
    bounds collapse onto the European closed form (the policy should
    essentially never exercise, and the dual certifies that)."""
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    prob = hh.PricingProblem(
        hh.VanillaOption(100.0, EXP, hh.American(), hh.Call(), hh.Spot()), mkt)
    euro = float(hh.solve(hh.PricingProblem(
        hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot()), mkt),
        hh.BlackScholesAnalytic()).price)
    db = lsm_dual_bound(prob, _lsm(), n_outer=4096, n_inner=96)
    assert float(db.lower) - 3 * float(db.se_lower) <= euro
    assert float(db.upper) + 3 * float(db.se_upper) >= euro
    assert float(db.gap) < 0.06 * euro


def test_bermudan_brackets_lattice():
    """Quarterly Bermudan put: the dual respects the exercise-date mask —
    the interval brackets the Bermudan lattice (dates snapped the same
    way) and sits BELOW the American lattice price."""
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.3)
    dates = [dt.date(2024, 4, 1), dt.date(2024, 7, 1), dt.date(2024, 10, 1)]
    berm = hh.VanillaOption(110.0, EXP, hh.Bermudan(dates), hh.Put(), hh.Spot())
    prob = hh.PricingProblem(berm, mkt)
    truth = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(2000)).price)
    amer = float(hh.solve(hh.PricingProblem(
        hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot()), mkt),
        hh.CoxRossRubinsteinMethod(2000)).price)
    db = lsm_dual_bound(prob, _lsm(), n_outer=4096, n_inner=96)
    lo, up = float(db.lower), float(db.upper)
    assert lo - 3 * float(db.se_lower) <= truth <= up + 3 * float(db.se_upper)
    assert lo - 3 * float(db.se_lower) < amer


def test_misspecified_basis_widens_the_gap():
    """A degree-1 basis cannot represent the put's continuation value: the
    certified gap must be clearly wider than the degree-5 policy's — the
    self-audit property the tool exists for."""
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.3)
    prob = hh.PricingProblem(
        hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot()), mkt)
    db_good = lsm_dual_bound(prob, _lsm(degree=5), n_outer=2048, n_inner=64)
    db_bad = lsm_dual_bound(prob, _lsm(degree=1), n_outer=2048, n_inner=64)
    assert float(db_bad.gap) > 1.5 * float(db_good.gap)


def test_smoke_bracket_small():
    """Small smoke-tier run: the interval is ordered, finite, and loosely
    brackets the lattice (full-size assertions live in the slow tier)."""
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.3)
    prob = hh.PricingProblem(
        hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot()), mkt)
    truth = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(500)).price)
    db = lsm_dual_bound(prob, _lsm(6_000, 12, seed=3), n_outer=512, n_inner=32)
    lo, up = float(db.lower), float(db.upper)
    assert np.isfinite(lo) and np.isfinite(up) and lo <= up
    assert lo - 4 * float(db.se_lower) <= truth <= up + 4 * float(db.se_upper)


def test_scope_guards():
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.3)
    heston = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    put = hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot())
    lsm_h = hh.LSM(hh.MonteCarlo(hh.HestonDynamics(), hh.EulerMaruyama(),
                                 hh.SimulationConfig(trajectories=256, steps=8)))
    with pytest.raises(TypeError, match="LognormalDynamics"):
        lsm_dual_bound(hh.PricingProblem(put, heston), lsm_h, 128, 16)
    barrier = hh.BarrierOption(110.0, EXP, 80.0, exercise_style=hh.American(),
                               call_put=hh.Put(), direction=hh.Down(),
                               knock=hh.KnockOut())
    with pytest.raises(TypeError, match="plain-vanilla"):
        lsm_dual_bound(hh.PricingProblem(barrier, mkt), _lsm(256, 8), 128, 16)


def test_heston_conditional_policy_certified():
    """The (S, V) joint-basis conditional-LSM policy certifies under the
    QE-bridge nested sampler: the interval brackets an independent
    Euler-grid LSM primal, and the lower bound respects the primal."""
    REF_, EXP_ = dt.date(2024, 1, 1), dt.date(2024, 12, 31)
    m = hh.HestonInputs(REF_, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    put = hh.VanillaOption(110.0, EXP_, hh.American(), hh.Put(), hh.Spot())
    prob = hh.PricingProblem(put, m)
    lsm_c = hh.LSM(
        hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True),
                      hh.SimulationConfig(trajectories=20_000, steps=24, seed=0)),
        degree=3)
    db = lsm_dual_bound(prob, lsm_c, n_outer=1024, n_inner=64)
    lo, up = float(db.lower), float(db.upper)
    assert np.isfinite(lo) and np.isfinite(up) and lo <= up
    p_euler = float(hh.solve(prob, hh.LSM(
        hh.MonteCarlo(hh.HestonDynamics(), hh.EulerMaruyama(),
                      hh.SimulationConfig(trajectories=30_000, steps=48, seed=2)),
        degree=4)).price)
    assert lo - 3 * float(db.se_lower) <= p_euler
    assert up + 3 * float(db.se_upper) >= p_euler - 0.05
    assert lo - 3 * float(db.se_lower) <= float(db.primal) <= up + 3 * float(db.se_upper)
