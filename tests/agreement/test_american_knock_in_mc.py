"""American knock-IN LSM (hit-time estimator) vs the CRR hit-law quadrature.

Two genuinely independent engines: the lattice integrates the live option's
barrier value against the CLOSED-FORM first-passage law (methods/crr.py);
LSM integrates the regression-fitted barrier value against the PER-PATH
first-hit-segment distribution from bridge factors (methods/lsm.py) — the
only engine that carries the hit-time variance state under Heston."""

import datetime as dt

import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # T = 1

pytestmark = pytest.mark.slow

KI = hh.BarrierOption(110.0, EXPIRY, 85.0, hh.American(), hh.Put(),
                      hh.Spot(), hh.Down(), hh.KnockIn())


def _price(payoff, market, method):
    return float(hh.solve(hh.PricingProblem(payoff, market), method).price)


def _cond_mc(steps=100, paths=1 << 14, qmc=False):
    cfg = hh.SimulationConfig(trajectories=paths, steps=steps,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=qmc)
    return hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg)


def test_gbm_lsm_vs_crr_quadrature():
    """GBM grid: both engines see the SAME dynamics — measured −0.05% at
    2^14 QMC paths × 100 steps vs CRR(1000)."""
    bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=100,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    lsm = _price(KI, bs, hh.LSM(mc, 4))
    crr = _price(KI, bs, hh.CoxRossRubinsteinMethod(1000))
    assert lsm == pytest.approx(crr, rel=2e-2)


def test_gbm_bermudan_and_otm_barrier_corners():
    """The barrier-LOCALIZED second regression covers the corners the
    ITM-policy fit cannot: a Bermudan knock-in must track the Bermudan
    lattice (not the American — the live value at the barrier takes the
    exercise max only at exercise dates; measured −0.2% vs +1.7% for the
    unmasked fit), and a down-in CALL's OTM barrier is interpolated, not
    extrapolated (measured −1.9%)."""
    import dataclasses

    bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=100,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    quarterly = hh.Bermudan([dt.date(2024, 4, 1), dt.date(2024, 7, 1),
                             dt.date(2024, 10, 1)])
    kib = dataclasses.replace(KI, exercise_style=quarterly)
    crr_b = _price(kib, bs, hh.CoxRossRubinsteinMethod(1000))
    lsm_b = _price(kib, bs, hh.LSM(mc, 4))
    assert lsm_b == pytest.approx(crr_b, rel=2e-2)
    # and strictly below the American knock-in (the unmasked-fit failure
    # mode priced the Bermudan AT the American)
    lsm_a = _price(KI, bs, hh.LSM(mc, 4))
    assert lsm_b < lsm_a

    kic = hh.BarrierOption(100.0, EXPIRY, 80.0, hh.American(), hh.Call(),
                           hh.Spot(), hh.Down(), hh.KnockIn())
    crr_c = _price(kic, bs, hh.CoxRossRubinsteinMethod(1000))
    lsm_c = _price(kic, bs, hh.LSM(mc, 4))
    assert lsm_c == pytest.approx(crr_c, rel=5e-2)


def test_knocked_at_inception_is_vanilla_lsm():
    """Barrier already breached at t=0: the estimator must return the SAME
    induction's vanilla American price exactly."""
    bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    cfg = hh.SimulationConfig(trajectories=1 << 13, steps=50,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
    ki0 = hh.BarrierOption(110.0, EXPIRY, 100.0, hh.American(), hh.Put(),
                           hh.Spot(), hh.Up(), hh.KnockIn())
    van = hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())
    p_ki = _price(ki0, bs, hh.LSM(mc, 4))
    p_v = _price(van, bs, hh.LSM(mc, 4))
    assert p_ki == pytest.approx(p_v, rel=1e-12)


def test_heston_degenerate_limit_matches_bs():
    """σ_v → 0 with V0 = θ: the conditional Heston grid degenerates to BS
    with vol √θ — the LSM knock-in must recover the lattice answer
    (measured +0.2%)."""
    hm = hh.HestonInputs(REF, 0.05, 100.0, 0.0625, 2.0, 0.0625, 1e-3, 0.0)
    bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    p_h = _price(KI, hm, hh.LSM(_cond_mc(), 3))
    p_bs = _price(KI, bs, hh.CoxRossRubinsteinMethod(1000))
    assert p_h == pytest.approx(p_bs, rel=2e-2)


def test_heston_bounds_and_premium():
    """Real Heston market: KI_eu ≤ KI_am ≤ vanilla American, with a real
    early-exercise premium conditional on knocking in (measured ~9%)."""
    hm = hh.HestonInputs(REF, 0.05, 100.0, 0.0625, 2.0, 0.0625, 0.4, -0.6)
    mc = _cond_mc()
    ki_am = _price(KI, hm, hh.LSM(mc, 3))
    import dataclasses

    ki_eu = _price(dataclasses.replace(KI, exercise_style=hh.European()), hm, mc)
    van_am = _price(hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(),
                                     hh.Spot()), hm, hh.LSM(mc, 3))
    assert ki_eu < ki_am <= van_am, (ki_eu, ki_am, van_am)
    assert ki_am > ki_eu * 1.02  # the premium is material, not noise


def test_heston_refinement_consistency():
    """Doubling the time resolution moves the price by less than the MC
    noise band — the midpoint hit-value pairing is O(Δt)."""
    hm = hh.HestonInputs(REF, 0.05, 100.0, 0.0625, 2.0, 0.0625, 0.4, -0.6)
    p50 = _price(KI, hm, hh.LSM(_cond_mc(steps=50), 3))
    p100 = _price(KI, hm, hh.LSM(_cond_mc(steps=100), 3))
    assert p50 == pytest.approx(p100, rel=3e-2)


def test_rebate_pays_iff_never_touched():
    """KI rebate leg: R·D(T)·P(never hit) — monotone in R, and equal to the
    EUROPEAN knock-in's rebate increment on the same grid (the leg is
    exercise-free)."""
    import dataclasses

    hm = hh.HestonInputs(REF, 0.05, 100.0, 0.0625, 2.0, 0.0625, 0.4, -0.6)
    mc = _cond_mc(steps=50)
    Rb = 2.0
    am_r = _price(dataclasses.replace(KI, rebate=Rb), hm, hh.LSM(mc, 3))
    am_0 = _price(KI, hm, hh.LSM(mc, 3))
    eu_r = _price(dataclasses.replace(KI, exercise_style=hh.European(), rebate=Rb), hm, mc)
    eu_0 = _price(dataclasses.replace(KI, exercise_style=hh.European()), hm, mc)
    assert am_r - am_0 == pytest.approx(eu_r - eu_0, rel=1e-6)
