"""MC-vs-analytic agreement + antithetic effectiveness, mirroring reference
test/agreement/montecarlo_black_scholes.jl: 4 scenarios (exact/EM ×
antithetic on/off), 5 trials × 10k paths, price rtol 2e-2, and the
statistical assertion that antithetic reduces trial variance."""

import dataclasses
import datetime as dt

import numpy as np
import pytest

from hedgehog_tpu import (
    Antithetic,
    BlackScholesAnalytic,
    BlackScholesExact,
    BlackScholesInputs,
    Call,
    EulerMaruyama,
    European,
    LognormalDynamics,
    MonteCarlo,
    NoVarianceReduction,
    PricingProblem,
    SimulationConfig,
    Spot,
    VanillaOption,
    solve,
)

REF = dt.date(2020, 1, 1)
EXPIRY = dt.date(2021, 1, 1)
PAYOFF = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
MARKET = BlackScholesInputs(REF, 0.05, 100.0, 0.20)
PROB = PricingProblem(PAYOFF, MARKET)
N = 10_000

SCENARIOS = {
    "exact": (BlackScholesExact(), 1, NoVarianceReduction()),
    "exact_anti": (BlackScholesExact(), 1, Antithetic()),
    "euler": (EulerMaruyama(), 100, NoVarianceReduction()),
    "euler_anti": (EulerMaruyama(), 100, Antithetic()),
}


def run_trials(strategy, steps, vr, n_trials=5):
    prices = []
    for trial in range(n_trials):
        cfg = SimulationConfig(trajectories=N, steps=steps, variance_reduction=vr, seed=42 + trial)
        method = MonteCarlo(LognormalDynamics(), strategy, cfg)
        prices.append(float(solve(PROB, method).price))
    return np.array(prices)


REFERENCE_PRICE = float(solve(PROB, BlackScholesAnalytic()).price)
RESULTS = {name: run_trials(*spec) for name, spec in SCENARIOS.items()}


@pytest.mark.parametrize("name", list(SCENARIOS))
def test_mc_price_agreement(name):
    assert RESULTS[name].mean() == pytest.approx(REFERENCE_PRICE, rel=2e-2)


def test_antithetic_variance_reduction_exact():
    assert RESULTS["exact"].var(ddof=1) / RESULTS["exact_anti"].var(ddof=1) > 1.0


def test_antithetic_variance_reduction_euler():
    assert RESULTS["euler"].var(ddof=1) / RESULTS["euler_anti"].var(ddof=1) > 1.0


def test_same_config_same_price():
    cfg = SimulationConfig(trajectories=N, steps=1, seed=7)
    m = MonteCarlo(LognormalDynamics(), BlackScholesExact(), cfg)
    p1 = float(solve(PROB, m).price)
    p2 = float(solve(PROB, m).price)
    assert p1 == p2


def test_mc_rejects_american():
    from hedgehog_tpu import American

    amer = VanillaOption(100.0, EXPIRY, American(), Call(), Spot())
    with pytest.raises(TypeError):
        solve(
            PricingProblem(amer, MARKET),
            MonteCarlo(LognormalDynamics(), BlackScholesExact(), SimulationConfig(100)),
        )


def test_pathwise_delta_vs_analytic():
    """AD through the seeded simulator (pathwise derivative) ≈ analytic delta,
    reference greeks_agreement.jl:170-241 (delta rtol 3e-2 at 100k paths)."""
    from hedgehog_tpu import AnalyticGreek, ForwardAD, GreekProblem, SpotLens

    cfg = SimulationConfig(trajectories=100_000, steps=1, seed=42)
    m = MonteCarlo(LognormalDynamics(), BlackScholesExact(), cfg)
    gp = GreekProblem(PROB, SpotLens())
    delta_mc = float(solve(gp, ForwardAD(), m).greek)
    delta_an = float(solve(gp, AnalyticGreek(), BlackScholesAnalytic()).greek)
    assert delta_mc == pytest.approx(delta_an, rel=3e-2)

    price_mc = float(solve(PROB, m).price)
    assert price_mc == pytest.approx(REFERENCE_PRICE, rel=3e-2)
