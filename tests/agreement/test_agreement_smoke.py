"""Agreement-SMOKE tier: one representative per heavy agreement family,
sized to run inside the fast (`-m "not slow"`) budget (r3 verdict item 5).

The full stress tiers (test_bk_stress.py, test_mixing_stress.py,
test_american_options.py, test_broadie_kaya.py) are in the slow list and may
never run under the driver's wall-clock budget; this file guarantees each
family's core agreement claim — Broadie-Kaya exact sampling, LSM-vs-CRR
early exercise, and the conditional mixing estimator in a Feller-violating
corner — is exercised on EVERY fast run, at reduced path counts with
correspondingly relaxed (but still meaningful) tolerances.
"""

import datetime as dt

import pytest

import hedgehog_tpu as hh

REF = dt.date(2025, 1, 1)
EXPIRY = dt.date(2025, 12, 31)


def test_broadie_kaya_smoke():
    """BK exact Heston terminal sampling vs Carr-Madan (reference
    montecarlo_heston.jl:205 at rtol 2e-2 with 10k paths; 4k paths here →
    3e-2)."""
    market = hh.HestonInputs(REF, 0.05, 100.0, 0.04, 1.5, 0.04, 0.3, -0.6)
    payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(payoff, market)
    cm = float(hh.solve(prob, hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())).price)
    cfg = hh.SimulationConfig(trajectories=2_000, steps=1, seed=42)
    p = float(hh.solve(prob, hh.MonteCarlo(hh.HestonDynamics(),
                                           hh.HestonBroadieKaya(), cfg)).price)
    assert p == pytest.approx(cm, rel=4e-2)


def test_american_put_smoke():
    """LSM vs CRR American put (reference american_options.jl:51 at rtol
    2e-2 with 20k×50; 8k×25 QMC here → same 2e-2, QMC keeps the noise
    down)."""
    market = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    put = hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())
    prob = hh.PricingProblem(put, market)
    cfg = hh.SimulationConfig(trajectories=8_000, steps=25,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    lsm = float(hh.solve(prob, hh.LSM(
        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg), 4)).price)
    crr = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(500)).price)
    assert lsm == pytest.approx(crr, rel=2e-2)
    # American ≥ European (american_options.jl:197)
    eu = float(hh.solve(
        hh.PricingProblem(
            hh.VanillaOption(110.0, EXPIRY, hh.European(), hh.Put(), hh.Spot()),
            market,
        ),
        hh.BlackScholesAnalytic(),
    ).price)
    assert lsm > eu


def test_mixing_feller_violating_smoke():
    """Conditional mixing estimator vs Carr-Madan in ONE Feller-violating
    corner (2κθ = 0.04 ≪ σ_v² = 0.64) — the hardest row of the full stress
    grid, 8k QMC pairs."""
    market = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 0.5, 0.04, 0.8, -0.7)
    payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(payoff, market)
    cm = float(hh.solve(prob, hh.CarrMadan(1.0, "auto", hh.HestonDynamics(),
                                           nodes=512)).price)
    cfg = hh.SimulationConfig(trajectories=8_000, steps=16,
                              variance_reduction=hh.Antithetic(), seed=17, qmc=True)
    p = float(hh.solve(prob, hh.MonteCarlo(hh.HestonDynamics(),
                                           hh.HestonQE(conditional=True), cfg)).price)
    assert p == pytest.approx(cm, rel=2e-2)
