"""Stress grid for the conditional (mixing) estimator — the flagship path.

Mirrors the Broadie-Kaya stress tier (test_bk_stress.py): the mixing
estimator must track Carr-Madan across mean-reversion × vol-of-vol ×
maturity, including strongly Feller-violating corners (2κθ ≪ σ²) where the
QE ψ > 1.5 exponential branch dominates and V spends time at zero.
"""

import datetime as dt

import jax.numpy as jnp
import pytest

from hedgehog_tpu import (
    Antithetic,
    Call,
    CarrMadan,
    European,
    HestonDynamics,
    HestonInputs,
    HestonQE,
    MonteCarlo,
    PricingProblem,
    SimulationConfig,
    Spot,
    VanillaOption,
    add_yearfrac,
    solve,
    to_ticks,
)

REF = dt.date(2020, 1, 1)
SPOT = 100.0


@pytest.mark.parametrize("kappa", [0.5, 2.0, 5.0])
@pytest.mark.parametrize("sigma", [0.1, 0.3, 0.8])
@pytest.mark.parametrize("T", [0.25, 2.0])
def test_mixing_vs_carr_madan_stress(kappa, sigma, T):
    theta = v0 = 0.04  # sigma=0.8 rows violate Feller 2κθ ≥ σ² badly
    market = HestonInputs(REF, 0.03, SPOT, v0, kappa, theta, sigma, -0.7)
    expiry = int(add_yearfrac(to_ticks(REF), T))
    payoff = VanillaOption(100.0, expiry, European(), Call(), Spot())
    prob = PricingProblem(payoff, market)
    cm = float(solve(prob, CarrMadan(1.0, "auto", HestonDynamics(), nodes=512)).price)

    steps = max(8, int(16 * T))
    cfg = SimulationConfig(
        trajectories=20_000, steps=steps, variance_reduction=Antithetic(),
        seed=17, qmc=True,
    )
    p = float(solve(prob, MonteCarlo(HestonDynamics(), HestonQE(conditional=True), cfg)).price)
    assert p == pytest.approx(cm, rel=2e-2), (kappa, sigma, T, p, cm)
