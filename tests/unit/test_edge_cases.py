"""Edge cases a production user will hit: negative rates, expiry at the
reference date, tiny/degenerate configs, deep moneyness."""

import datetime as dt

import jax
import jax.numpy as jnp
import pytest

from hedgehog_tpu import (
    BlackScholesAnalytic,
    BlackScholesExact,
    BlackScholesInputs,
    Call,
    CoxRossRubinsteinMethod,
    European,
    LognormalDynamics,
    MonteCarlo,
    PricingProblem,
    Put,
    SimulationConfig,
    Spot,
    VanillaOption,
    solve,
)

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)


def test_negative_rates():
    market = BlackScholesInputs(REF, -0.01, 100.0, 0.2)
    call = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
    put = VanillaOption(100.0, EXPIRY, European(), Put(), Spot())
    c = float(solve(PricingProblem(call, market), BlackScholesAnalytic()).price)
    p = float(solve(PricingProblem(put, market), BlackScholesAnalytic()).price)
    T = 366 / 365
    D = jnp.exp(0.01 * T)
    # parity still holds with D > 1
    assert c - p == pytest.approx(float(100.0 - 100.0 * D), abs=1e-10)
    # CRR agrees
    crr = float(solve(PricingProblem(put, market), CoxRossRubinsteinMethod(400)).price)
    assert crr == pytest.approx(p, rel=1e-3)  # CRR O(1/n) on an ~8.5 price


def test_expiry_at_reference_date():
    market = BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    opt = VanillaOption(90.0, REF, European(), Call(), Spot())
    price = float(solve(PricingProblem(opt, market), BlackScholesAnalytic()).price)
    assert price == pytest.approx(10.0)  # T=0 → intrinsic


def test_single_path_mc():
    market = BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    opt = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
    cfg = SimulationConfig(trajectories=1, steps=1, seed=0)
    p = float(solve(PricingProblem(opt, market), MonteCarlo(LognormalDynamics(), BlackScholesExact(), cfg)).price)
    assert jnp.isfinite(p) and p >= 0.0


def test_deep_moneyness_bounds():
    market = BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    T = 366 / 365
    D = float(jnp.exp(-0.05 * T))
    # deep ITM call → S − K·D; deep OTM → 0
    itm = VanillaOption(1.0, EXPIRY, European(), Call(), Spot())
    otm = VanillaOption(1e4, EXPIRY, European(), Call(), Spot())
    p_itm = float(solve(PricingProblem(itm, market), BlackScholesAnalytic()).price)
    p_otm = float(solve(PricingProblem(otm, market), BlackScholesAnalytic()).price)
    assert p_itm == pytest.approx(100.0 - 1.0 * D, abs=1e-8)
    assert 0.0 <= p_otm < 1e-10


def test_grad_finite_at_atm_forward():
    """d1=0 exactly (K=F): gradients must stay finite (no 0/0 in the branchless
    select)."""
    market = BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    T = 366 / 365
    F = 100.0 * float(jnp.exp(0.05 * T))
    opt = VanillaOption(F, EXPIRY, European(), Call(), Spot())
    prob = PricingProblem(opt, market)
    from hedgehog_tpu import SpotLens

    g = jax.grad(lambda s: solve(SpotLens().set(prob, s), BlackScholesAnalytic()).price)(100.0)
    assert jnp.isfinite(g)


def test_zero_strike_put_is_worthless():
    market = BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    put = VanillaOption(1e-12, EXPIRY, European(), Put(), Spot())
    p = float(solve(PricingProblem(put, market), BlackScholesAnalytic()).price)
    assert 0.0 <= p < 1e-10
