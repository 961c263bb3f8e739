"""Heston MC vs Carr-Madan agreement mirroring reference
test/agreement/montecarlo_heston.jl: EM (5k paths × 100 steps, 5 trials) vs
Fourier at rtol 5e-2 plus antithetic variance-reduction check.
(The Broadie-Kaya tier is in test_broadie_kaya.py.)"""

import datetime as dt

import numpy as np
import pytest

from hedgehog_tpu import (
    Antithetic,
    Call,
    CarrMadan,
    EulerMaruyama,
    European,
    HestonDynamics,
    HestonInputs,
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
# spot, strike, r, V0, kappa, theta, sigma, rho (montecarlo_heston.jl:13-22)
MARKET = HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
PAYOFF = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
PROB = PricingProblem(PAYOFF, MARKET)

CM_PRICE = float(solve(PROB, CarrMadan(1.0, 32.0, HestonDynamics())).price)


def run_trials(vr, trajectories, n_trials=5):
    prices = []
    for trial in range(n_trials):
        cfg = SimulationConfig(
            trajectories=trajectories, steps=100, variance_reduction=vr, seed=42 + trial
        )
        m = MonteCarlo(HestonDynamics(), EulerMaruyama(), cfg)
        prices.append(float(solve(PROB, m).price))
    return np.array(prices)


PLAIN = run_trials(NoVarianceReduction(), 5000)
ANTI = run_trials(Antithetic(), 2500)  # pairs → same total path count


def test_heston_em_vs_carr_madan():
    assert PLAIN.mean() == pytest.approx(CM_PRICE, rel=5e-2)
    assert ANTI.mean() == pytest.approx(CM_PRICE, rel=5e-2)


def test_heston_antithetic_variance_reduction():
    assert PLAIN.var(ddof=1) / ANTI.var(ddof=1) > 1.0


def test_heston_cf_known_identity():
    """φ(-i) = E[S_T]/1 = S0·e^{rT} (martingale identity) — sanity anchor for
    the CF math ported from heston.jl:307-319."""
    from hedgehog_tpu import heston_cf

    val = heston_cf(-1j, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7, 0.03, 1.0)
    assert complex(val).real == pytest.approx(100.0 * np.exp(0.03), rel=1e-12)
    assert abs(complex(val).imag) < 1e-10
    # φ(0) = 1
    assert complex(heston_cf(0.0, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7, 0.03, 1.0)) == pytest.approx(
        1.0
    )
