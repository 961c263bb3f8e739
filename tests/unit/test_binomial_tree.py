"""CRR regression goldens mirroring reference test/unit/binomial_tree.jl."""

import datetime as dt

import pytest

from hedgehog_tpu import (
    American,
    BlackScholesInputs,
    Call,
    CoxRossRubinsteinMethod,
    Forward,
    PricingProblem,
    Put,
    Spot,
    VanillaOption,
    solve,
)

REF = dt.date(2020, 1, 1)
EXPIRY = dt.date(2020, 12, 31)  # REF + 365 days
MARKET = BlackScholesInputs(REF, 0.2, 1.0, 0.4)


def test_american_call_on_spot_golden():
    assert (EXPIRY - REF).days == 365
    payoff = VanillaOption(1.0, EXPIRY, American(), Call(), Spot())
    sol = solve(PricingProblem(payoff, MARKET), CoxRossRubinsteinMethod(80))
    assert float(sol.price) == pytest.approx(0.25225758542934945, abs=1e-8)


def test_american_put_on_forward_golden():
    payoff = VanillaOption(1.0, EXPIRY, American(), Put(), Forward())
    sol = solve(PricingProblem(payoff, MARKET), CoxRossRubinsteinMethod(80))
    assert float(sol.price) == pytest.approx(0.07409148128021317, abs=1e-8)


def test_crr_converges_to_bs_european():
    from hedgehog_tpu import BlackScholesAnalytic, European

    payoff = VanillaOption(1.1, EXPIRY, European(), Put(), Spot())
    prob = PricingProblem(payoff, MARKET)
    bs = float(solve(prob, BlackScholesAnalytic()).price)
    crr = float(solve(prob, CoxRossRubinsteinMethod(100)).price)
    assert crr == pytest.approx(bs, abs=1e-3)


def test_american_geq_european_put():
    from hedgehog_tpu import European

    amer = VanillaOption(1.1, EXPIRY, American(), Put(), Spot())
    euro = VanillaOption(1.1, EXPIRY, European(), Put(), Spot())
    pa = float(solve(PricingProblem(amer, MARKET), CoxRossRubinsteinMethod(200)).price)
    pe = float(solve(PricingProblem(euro, MARKET), CoxRossRubinsteinMethod(200)).price)
    assert pa >= pe - 1e-12
