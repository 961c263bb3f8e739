"""Barrier options — continuously-monitored single barriers, beyond the
reference's vanilla-only taxonomy:

- BlackScholesAnalytic: Reiner-Rubinstein closed form (zero rebate), with
  knock-out recovered by in-out parity
- MonteCarlo: per-segment Brownian-bridge no-crossing products on path
  grids (exact for GBM at ANY step count — gridpoint marginals and bridges
  are both exact — so MC must agree with the closed form to pure noise),
  and the Heston conditional bridge grid with per-segment integrated
  variance

The agreement structure mirrors the reference's test strategy: the closed
form and the bridge MC are independent methods that must agree.
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # T = 1 under ACT/365
R, SPOT, SIGMA = 0.05, 100.0, 0.25
H = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)


def _bs_market(sigma=SIGMA):
    return hh.BlackScholesInputs(REF, R, SPOT, sigma)


def _barrier(strike, barrier, cp=None, direction=None, knock=None):
    return hh.BarrierOption(
        strike, EXPIRY, barrier, hh.European(), cp or hh.Call(), hh.Spot(),
        direction or hh.Down(), knock or hh.KnockOut(),
    )


ALL_COMBOS = [
    (hh.Call(), hh.Down(), 100.0, 90.0),   # cd: K above barrier
    (hh.Call(), hh.Down(), 85.0, 90.0),    # cd: K below barrier
    (hh.Call(), hh.Up(), 100.0, 125.0),    # cu: K below barrier
    (hh.Call(), hh.Up(), 130.0, 125.0),    # cu: K above barrier
    (hh.Put(), hh.Down(), 100.0, 90.0),
    (hh.Put(), hh.Down(), 85.0, 90.0),
    (hh.Put(), hh.Up(), 100.0, 125.0),
    (hh.Put(), hh.Up(), 130.0, 125.0),
]


def _analytic(strike, barrier, cp, direction, knock):
    prob = hh.PricingProblem(_barrier(strike, barrier, cp, direction, knock), _bs_market())
    return float(hh.solve(prob, hh.BlackScholesAnalytic()).price)


def test_in_out_parity_and_positivity():
    for cp, direction, K, B in ALL_COMBOS:
        p_out = _analytic(K, B, cp, direction, hh.KnockOut())
        p_in = _analytic(K, B, cp, direction, hh.KnockIn())
        vanilla = float(hh.solve(
            hh.PricingProblem(hh.VanillaOption(K, EXPIRY, hh.European(), cp, hh.Spot()),
                              _bs_market()),
            hh.BlackScholesAnalytic()).price)
        np.testing.assert_allclose(p_out + p_in, vanilla, rtol=1e-10)
        assert p_out >= 0.0 and p_in >= 0.0
        assert p_out <= vanilla + 1e-12 and p_in <= vanilla + 1e-12


def test_far_barrier_is_vanilla():
    vanilla = float(hh.solve(
        hh.PricingProblem(hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
                          _bs_market()),
        hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(_analytic(100.0, 500.0, hh.Call(), hh.Up(), hh.KnockOut()),
                               vanilla, rtol=1e-6)
    np.testing.assert_allclose(_analytic(100.0, 20.0, hh.Call(), hh.Down(), hh.KnockOut()),
                               vanilla, rtol=1e-6)


def test_already_touched_barrier():
    # down barrier at/above spot: knocked at t=0 → in = vanilla, out = 0
    vanilla = float(hh.solve(
        hh.PricingProblem(hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
                          _bs_market()),
        hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(
        _analytic(100.0, 100.0, hh.Call(), hh.Down(), hh.KnockIn()), vanilla, rtol=1e-12)
    assert _analytic(100.0, 100.0, hh.Call(), hh.Down(), hh.KnockOut()) == 0.0


def _mc_price(payoff, strat, n=1 << 16, steps=1, market=None, seed=0):
    cfg = hh.SimulationConfig(trajectories=n, steps=steps,
                              variance_reduction=hh.Antithetic(), seed=seed)
    dyn = hh.HestonDynamics() if isinstance(strat, hh.HestonQE) else hh.LognormalDynamics()
    prob = hh.PricingProblem(payoff, market or _bs_market())
    return float(hh.solve(prob, hh.MonteCarlo(dyn, strat, cfg)).price)


def test_gbm_exact_bridge_mc_matches_closed_form():
    """One exact terminal draw + one bridge over [0,T] is an UNBIASED
    continuous-barrier GBM estimator — agreement limited only by MC noise."""
    for cp, direction, K, B in ALL_COMBOS:
        for knock in (hh.KnockOut(), hh.KnockIn()):
            ref = _analytic(K, B, cp, direction, knock)
            mc = _mc_price(_barrier(K, B, cp, direction, knock), hh.BlackScholesExact())
            np.testing.assert_allclose(mc, ref, rtol=3e-2, atol=3e-2)


def test_gbm_euler_grid_bridge_matches_closed_form():
    # log-Euler GBM gridpoints and bridges are exact → unbiased at ANY steps
    ref = _analytic(100.0, 90.0, hh.Call(), hh.Down(), hh.KnockOut())
    mc = _mc_price(_barrier(100.0, 90.0), hh.EulerMaruyama(), steps=8)
    np.testing.assert_allclose(mc, ref, rtol=2e-2)


def test_heston_conditional_grid_barrier():
    market = hh.HestonInputs(REF, 0.03, SPOT, *H.values())
    ko = _barrier(100.0, 85.0, hh.Call(), hh.Down(), hh.KnockOut())
    ki = _barrier(100.0, 85.0, hh.Call(), hh.Down(), hh.KnockIn())
    p_ko = _mc_price(ko, hh.HestonQE(conditional=True), steps=16, market=market)
    p_ki = _mc_price(ki, hh.HestonQE(conditional=True), steps=16, market=market)
    vanilla = float(hh.solve(
        hh.PricingProblem(hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
                          market),
        hh.CarrMadan(1.0, "auto", hh.HestonDynamics())).price)
    # in + out = vanilla: holds per-path against the grid's OWN terminal
    # samples; against the independent Fourier vanilla it is an MC-level check
    np.testing.assert_allclose(p_ko + p_ki, vanilla, rtol=2e-2)
    assert 0.0 < p_ko < vanilla
    # refinement consistency: 16 vs 48 segments agree (bias ≪ tolerance)
    p_ko_fine = _mc_price(ko, hh.HestonQE(conditional=True), steps=48,
                          market=market, seed=1)
    np.testing.assert_allclose(p_ko, p_ko_fine, rtol=3e-2)


def test_barrier_delta_pathwise_ad_vs_analytic():
    """The bridge products are smooth → jax.grad through the MC solve gives
    a real barrier delta, matching the closed form's."""
    def analytic_price(s):
        m = hh.BlackScholesInputs(REF, R, s, SIGMA)
        return hh.solve(hh.PricingProblem(_barrier(100.0, 90.0), m),
                        hh.BlackScholesAnalytic()).price

    def mc_price(s):
        m = hh.BlackScholesInputs(REF, R, s, SIGMA)
        cfg = hh.SimulationConfig(trajectories=1 << 15, steps=1,
                                  variance_reduction=hh.Antithetic(), seed=0)
        return hh.solve(hh.PricingProblem(_barrier(100.0, 90.0), m),
                        hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), cfg)).price

    d_an = float(jax.grad(analytic_price)(jnp.float64(SPOT)))
    d_mc = float(jax.grad(mc_price)(jnp.float64(SPOT)))
    np.testing.assert_allclose(d_mc, d_an, rtol=7e-2)


def test_barrier_unsupported_routes_raise():
    """Methods that cannot see the path reject barriers; CRR and LSM now
    PRICE knock-outs (test_barrier_crr.py / test_american_barrier.py), so
    only their genuinely-unsupported corners raise (American knock-ins —
    no in-out parity — and non-bridge grids)."""
    ko = _barrier(100.0, 90.0)
    prob = hh.PricingProblem(ko, _bs_market())
    with pytest.raises(TypeError, match="path-independent"):
        hh.solve(prob, hh.CarrMadan(1.0, 32.0, hh.LognormalDynamics()))
    cfg = hh.SimulationConfig(trajectories=256, steps=2,
                              variance_reduction=hh.Antithetic(), seed=0)
    hmkt = hh.HestonInputs(REF, 0.03, SPOT, *H.values())
    # HestonExactMixing became a supported bridge grid in round 4 (exact
    # transitions + sampled per-segment ∫V); the non-conditional QE
    # terminal-only strategy remains a non-bridge grid and still raises
    with pytest.raises(TypeError, match="barrier grids need"):
        hh.solve(hh.PricingProblem(ko, hmkt),
                 hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg))
    am = hh.BarrierOption(100.0, EXPIRY, 90.0, hh.American())
    with pytest.raises(TypeError):
        hh.solve(hh.PricingProblem(am, _bs_market()), hh.BlackScholesAnalytic())
    # American knock-ins now PRICE on both engines (CRR hit-time
    # quadrature, LSM hit-time estimator); a non-bridge grid still raises
    am_ki = hh.BarrierOption(100.0, EXPIRY, 90.0, hh.American(),
                             knock=hh.KnockIn())
    with pytest.raises(TypeError, match="barrier grids need"):
        hh.solve(hh.PricingProblem(am_ki, hmkt),
                 hh.LSM(hh.MonteCarlo(hh.HestonDynamics(), hh.EulerMaruyama(), cfg), 3))


def test_zero_vol_barrier_deterministic():
    # σ=0, r>0: forward path rises monotonically from 100 toward ~105.13
    mkt = _bs_market(0.0)
    up_in = hh.PricingProblem(_barrier(95.0, 103.0, hh.Call(), hh.Up(), hh.KnockIn()), mkt)
    up_out = hh.PricingProblem(_barrier(95.0, 103.0, hh.Call(), hh.Up(), hh.KnockOut()), mkt)
    D = np.exp(-R * 1.0)
    intrinsic = D * (SPOT / D - 95.0)
    np.testing.assert_allclose(
        float(hh.solve(up_in, hh.BlackScholesAnalytic()).price), intrinsic, rtol=1e-12)
    assert float(hh.solve(up_out, hh.BlackScholesAnalytic()).price) == 0.0


# ---- rebates (Reiner-Rubinstein E/F blocks + bridge-MC rebate legs) --------


def _rebate_barrier(knock, rebate, at_hit=False, strike=100.0, barrier=120.0,
                    direction=None):
    return hh.BarrierOption(
        strike, EXPIRY, barrier, hh.European(), hh.Call(), hh.Spot(),
        direction or hh.Up(), knock, rebate, at_hit,
    )


def test_rebate_in_out_parity():
    """KI(R) + KO(R at expiry) = vanilla + R·D(T): the rebate pays R at
    expiry in exactly one of the two states."""
    van = float(hh.solve(
        hh.PricingProblem(hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
                          _bs_market()), hh.BlackScholesAnalytic()).price)
    D = float(np.exp(-R * 1.0))
    for Rb in (0.0, 1.0, 5.0):
        for direction, Hb in ((hh.Up(), 120.0), (hh.Down(), 85.0)):
            ki = float(hh.solve(hh.PricingProblem(
                _rebate_barrier(hh.KnockIn(), Rb, barrier=Hb, direction=direction),
                _bs_market()), hh.BlackScholesAnalytic()).price)
            ko = float(hh.solve(hh.PricingProblem(
                _rebate_barrier(hh.KnockOut(), Rb, barrier=Hb, direction=direction),
                _bs_market()), hh.BlackScholesAnalytic()).price)
            assert ki + ko == pytest.approx(van + Rb * D, rel=1e-10)


def test_rebate_at_hit_dominates_at_expiry():
    """Paying the rebate earlier is worth more (r > 0), and both reduce to
    the zero-rebate price at R = 0."""
    base = float(hh.solve(hh.PricingProblem(
        _rebate_barrier(hh.KnockOut(), 0.0), _bs_market()),
        hh.BlackScholesAnalytic()).price)
    at_exp = float(hh.solve(hh.PricingProblem(
        _rebate_barrier(hh.KnockOut(), 3.0), _bs_market()),
        hh.BlackScholesAnalytic()).price)
    at_hit = float(hh.solve(hh.PricingProblem(
        _rebate_barrier(hh.KnockOut(), 3.0, at_hit=True), _bs_market()),
        hh.BlackScholesAnalytic()).price)
    assert base < at_exp < at_hit
    # the at-hit leg is bounded by the undiscounted rebate
    assert at_hit - base < 3.0


def test_rebate_mc_agreement():
    """Bridge MC with the rebate legs matches the closed form: at-expiry via
    the exact single bridge; at-hit via a stepped grid (midpoint-discounted
    first-hit-segment distribution, O(dt) hit-time resolution)."""
    Rb = 3.0
    ko_exp = float(hh.solve(hh.PricingProblem(
        _rebate_barrier(hh.KnockOut(), Rb), _bs_market()),
        hh.BlackScholesAnalytic()).price)
    mc_exp = _mc_price(_rebate_barrier(hh.KnockOut(), Rb), hh.BlackScholesExact(),
                       n=1 << 16)
    assert mc_exp == pytest.approx(ko_exp, rel=3e-3)

    ko_hit = float(hh.solve(hh.PricingProblem(
        _rebate_barrier(hh.KnockOut(), Rb, at_hit=True), _bs_market()),
        hh.BlackScholesAnalytic()).price)
    cfg = hh.SimulationConfig(trajectories=1 << 15, steps=64,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    mc_hit = float(hh.solve(
        hh.PricingProblem(_rebate_barrier(hh.KnockOut(), Rb, at_hit=True), _bs_market()),
        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)).price)
    assert mc_hit == pytest.approx(ko_hit, rel=5e-3)

    ki = float(hh.solve(hh.PricingProblem(
        _rebate_barrier(hh.KnockIn(), Rb), _bs_market()),
        hh.BlackScholesAnalytic()).price)
    mc_ki = _mc_price(_rebate_barrier(hh.KnockIn(), Rb), hh.BlackScholesExact(),
                      n=1 << 16)
    assert mc_ki == pytest.approx(ki, rel=3e-3)


def test_rebate_at_hit_rejected_for_knock_in():
    with pytest.raises(ValueError, match="knock-outs only"):
        _rebate_barrier(hh.KnockIn(), 1.0, at_hit=True)


def test_rebate_greeks_finite():
    """AD through both rebate conventions (closed form and bridge MC)."""
    def f(s, at_hit):
        prob = hh.PricingProblem(_rebate_barrier(hh.KnockOut(), 3.0, at_hit), _bs_market())
        return hh.solve(hh.SpotLens().set(prob, s), hh.BlackScholesAnalytic()).price

    for at_hit in (False, True):
        g = float(jax.grad(f)(100.0, at_hit))
        assert np.isfinite(g)
    # already-touched spot: flat in S (price pinned at the rebate), no NaN
    g0 = float(jax.grad(f)(125.0, True))
    assert g0 == pytest.approx(0.0, abs=1e-10)


def test_zero_vol_at_hit_rebate_discounts_at_the_hit_time():
    """σ = 0 with r > 0: the forward path crosses an up-barrier at the KNOWN
    time t_hit = ln(H/S)/r, so the at-hit rebate is worth R·e^{−r·t_hit} —
    strictly more than the at-expiry leg's R·D(T)."""
    mkt = _bs_market(0.0)  # r = 0.05
    Rb, Hb = 3.0, 102.0  # f_T ≈ 105.1 crosses 102 at t_hit = ln(1.02)/0.05
    ko_hit = hh.BarrierOption(200.0, EXPIRY, Hb, hh.European(), hh.Call(),
                              hh.Spot(), hh.Up(), hh.KnockOut(), Rb, True)
    ko_exp = hh.BarrierOption(200.0, EXPIRY, Hb, hh.European(), hh.Call(),
                              hh.Spot(), hh.Up(), hh.KnockOut(), Rb, False)
    p_hit = float(hh.solve(hh.PricingProblem(ko_hit, mkt), hh.BlackScholesAnalytic()).price)
    p_exp = float(hh.solve(hh.PricingProblem(ko_exp, mkt), hh.BlackScholesAnalytic()).price)
    t_hit = np.log(Hb / SPOT) / R
    assert p_hit == pytest.approx(Rb * np.exp(-R * t_hit), rel=1e-10)
    assert p_exp == pytest.approx(Rb * np.exp(-R * 1.0), rel=1e-10)
    assert p_hit > p_exp
