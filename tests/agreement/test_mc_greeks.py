"""MC greeks vs analytic — completes the reference tier
greeks_agreement.jl:170-241: delta (AD, rtol 3e-2), gamma (FD bump 0.1,
rtol 2e-1), vega (AD, rtol 1e-1), rho (AD, rtol 1e-2) at 100k paths."""

import datetime as dt

import pytest

from hedgehog_tpu import (
    AnalyticGreek,
    BlackScholesAnalytic,
    BlackScholesExact,
    BlackScholesInputs,
    Call,
    European,
    FiniteDifference,
    ForwardAD,
    GreekProblem,
    LognormalDynamics,
    MonteCarlo,
    PricingProblem,
    SecondOrderGreekProblem,
    SimulationConfig,
    Spot,
    SpotLens,
    VanillaOption,
    VolLens,
    ZeroRateSpineLens,
    solve,
)

REF = dt.date(2020, 1, 1)
PAYOFF = VanillaOption(1.0, dt.date(2021, 1, 1), European(), Call(), Spot())
MARKET = BlackScholesInputs(REF, 0.03, 1.0, 1.0)
PROB = PricingProblem(PAYOFF, MARKET)

MC = MonteCarlo(
    LognormalDynamics(), BlackScholesExact(), SimulationConfig(trajectories=100_000, seed=42)
)
BS = BlackScholesAnalytic()


def test_mc_price():
    assert float(solve(PROB, MC).price) == pytest.approx(
        float(solve(PROB, BS).price), rel=3e-2
    )


def test_mc_delta_ad():
    mc = float(solve(GreekProblem(PROB, SpotLens()), ForwardAD(), MC).greek)
    an = float(solve(GreekProblem(PROB, SpotLens()), AnalyticGreek(), BS).greek)
    assert mc == pytest.approx(an, rel=3e-2)


def test_mc_gamma_fd():
    gp = SecondOrderGreekProblem(PROB, SpotLens(), SpotLens())
    mc = float(solve(gp, FiniteDifference(1e-1), MC).greek)
    an = float(solve(gp, AnalyticGreek(), BS).greek)
    assert mc == pytest.approx(an, rel=2e-1)


def test_mc_vega_ad():
    gp = GreekProblem(PROB, VolLens(1, 1))
    mc = float(solve(gp, ForwardAD(), MC).greek)
    an = float(solve(gp, AnalyticGreek(), BS).greek)
    assert mc == pytest.approx(an, rel=1e-1)


def test_mc_rho_ad():
    gp = GreekProblem(PROB, ZeroRateSpineLens(0))
    mc = float(solve(gp, ForwardAD(), MC).greek)
    an = float(solve(gp, ForwardAD(), BS).greek)
    assert mc == pytest.approx(an, rel=1e-2)
