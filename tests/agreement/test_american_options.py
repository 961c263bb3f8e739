"""LSM vs CRR agreement for American options, mirroring reference
test/agreement/american_options.jl."""

import datetime as dt

import pytest

from hedgehog_tpu import (
    American,
    Antithetic,
    BlackScholesAnalytic,
    BlackScholesExact,
    BlackScholesInputs,
    Call,
    CoxRossRubinsteinMethod,
    European,
    LognormalDynamics,
    LSM,
    MonteCarlo,
    PricingProblem,
    Put,
    SimulationConfig,
    Spot,
    VanillaOption,
    solve,
)

REF = dt.date(2020, 1, 1)
EXPIRY_1Y = dt.date(2021, 1, 1)


def lsm_method(trajectories, steps, degree, seed):
    cfg = SimulationConfig(
        trajectories=trajectories, steps=steps, variance_reduction=Antithetic(), seed=seed
    )
    return LSM(MonteCarlo(LognormalDynamics(), BlackScholesExact(), cfg), degree)


def test_american_put_lsm_vs_crr():
    payoff = VanillaOption(100.0, EXPIRY_1Y, American(), Put(), Spot())
    market = BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    prob = PricingProblem(payoff, market)
    crr = float(solve(prob, CoxRossRubinsteinMethod(1000)).price)
    lsm = float(solve(prob, lsm_method(25_000, 100, 5, 12345)).price)
    assert lsm == pytest.approx(crr, rel=0.02)


def test_american_call_high_rate_lsm_vs_crr():
    payoff = VanillaOption(100.0, EXPIRY_1Y, American(), Call(), Spot())
    market = BlackScholesInputs(REF, 0.15, 120.0, 0.3)
    prob = PricingProblem(payoff, market)
    crr = float(solve(prob, CoxRossRubinsteinMethod(800)).price)
    lsm = float(solve(prob, lsm_method(15_000, 100, 5, 54321)).price)
    assert lsm == pytest.approx(crr, rel=0.03)


@pytest.mark.parametrize("strike", [80.0, 90.0, 100.0, 110.0, 120.0])
def test_multiple_strike_agreement(strike):
    expiry = dt.date(2020, 7, 1)  # ~6M
    payoff = VanillaOption(strike, expiry, American(), Put(), Spot())
    market = BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    prob = PricingProblem(payoff, market)
    crr = float(solve(prob, CoxRossRubinsteinMethod(500)).price)
    lsm = float(solve(prob, lsm_method(10_000, 50, 4, int(strike) * 1000)).price)
    tol = 0.05 if strike < 100.0 else 0.03
    assert lsm == pytest.approx(crr, rel=tol)


def test_early_exercise_premium_consistency():
    market = BlackScholesInputs(REF, 0.03, 100.0, 0.3)
    amer = PricingProblem(VanillaOption(110.0, EXPIRY_1Y, American(), Put(), Spot()), market)
    euro = PricingProblem(VanillaOption(110.0, EXPIRY_1Y, European(), Put(), Spot()), market)

    euro_bs = float(solve(euro, BlackScholesAnalytic()).price)
    amer_crr = float(solve(amer, CoxRossRubinsteinMethod(800)).price)
    amer_lsm = float(solve(amer, lsm_method(40_000, 100, 5, 0)).price)

    assert amer_crr >= euro_bs
    assert amer_lsm >= euro_bs
    premium_crr = amer_crr - euro_bs
    premium_lsm = amer_lsm - euro_bs
    assert premium_lsm == pytest.approx(premium_crr, rel=0.04)


def test_lsm_rejects_european():
    payoff = VanillaOption(100.0, EXPIRY_1Y, European(), Put(), Spot())
    market = BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    with pytest.raises(TypeError):
        solve(PricingProblem(payoff, market), lsm_method(1000, 10, 3, 0))
