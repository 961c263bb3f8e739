"""American knock-out barrier LSM vs the bridge-corrected CRR lattice.

The LSM estimator (methods/lsm.py::_solve_lsm_knock_out) carries the
per-segment Brownian-bridge no-cross factors through the stopping state; the
lattice (methods/crr.py::_solve_crr_knock_out) carries the same factors on
its contraction edges.  Both price CONTINUOUS monitoring; LSM's exercise
dates are the grid times, so for contracts whose exercise boundary hugs the
barrier (up-and-out calls) LSM is a lower bound with an O(√Δt) gap — the
tests pin the tight case (down-and-out put), the bounded case, the rebate
legs, and the Heston conditional grid.
"""

import datetime as dt

import jax
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)

pytestmark = pytest.mark.slow


def _market():
    return hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)


def _mc(steps=100, paths=1 << 15):
    cfg = hh.SimulationConfig(
        trajectories=paths, steps=steps,
        variance_reduction=hh.Antithetic(), seed=0, qmc=True,
    )
    return hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)


def _amer_ko(**kw):
    kw.setdefault("strike", 110.0)
    kw.setdefault("direction", hh.Down())
    kw.setdefault("call_put", hh.Put())
    return hh.BarrierOption(
        expiry=EXPIRY, exercise_style=hh.American(), knock=hh.KnockOut(), **kw
    )


def test_down_out_put_vs_crr():
    """Exercise region far from the barrier: LSM and the lattice agree
    tightly (measured +0.03% at 200 steps × 2^15 QMC pairs after the
    first-passage-exercise correction; the deep-barrier KO put ≈ the
    vanilla American put, as it should)."""
    prob = hh.PricingProblem(_amer_ko(barrier=80.0), _market())
    lsm = float(hh.solve(prob, hh.LSM(_mc(steps=200), 4)).price)
    crr = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(2000)).price)
    assert lsm == pytest.approx(crr, rel=1e-2)


def test_up_out_call_is_bounded_lower_estimate():
    """Exercise boundary hugs the barrier — the contract the r3-verdict
    item-6 correction exists for.  With first-passage exercise (hit mass
    pays intrinsic(H)) BOTH engines converge to the continuous-exercise
    price ≈ 10.32 at an O(Δt) rate: LSM 10.466/10.393/10.356 at
    100/200/400 steps vs CRR 10.343/10.329/10.324 at 500/2000/4000 —
    versus the old grid-date-only policy's O(√Δt) lower bound
    (9.46/9.70/9.87 at 200/400/800 vs a rebate-absorbing lattice's 10.09)."""
    prob = hh.PricingProblem(
        _amer_ko(strike=100.0, barrier=120.0, direction=hh.Up(),
                 call_put=hh.Call()),
        _market(),
    )
    lsm = float(hh.solve(prob, hh.LSM(_mc(steps=200), 4)).price)
    crr = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(2000)).price)
    assert 0.98 * crr <= lsm <= 1.01 * crr


@pytest.mark.parametrize("at_hit", [False, True])
def test_rebate_legs_vs_crr(at_hit):
    """Rebate-active configuration (up-out PUT: the barrier sits where the
    put has no intrinsic, so hits are never preempted by exercise).
    Measured agreement ≤3bp at 2^15 QMC pairs."""
    prob = hh.PricingProblem(
        _amer_ko(strike=100.0, barrier=120.0, direction=hh.Up(),
                 call_put=hh.Put(), rebate=3.0, rebate_at_hit=at_hit),
        _market(),
    )
    lsm = float(hh.solve(prob, hh.LSM(_mc(), 4)).price)
    crr = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(2000)).price)
    assert lsm == pytest.approx(crr, rel=1e-2)


def test_exercise_preempts_rebate():
    """Down-out put with a DEEP barrier: optimal exercise happens before the
    spot can reach it, so the rebate is worthless — LSM and the lattice must
    both price the rebate leg at ~0 (measured: identical to 4 decimals)."""
    mkt = _market()
    p0, p3 = (
        float(
            hh.solve(
                hh.PricingProblem(_amer_ko(barrier=80.0, rebate=r), mkt),
                hh.LSM(_mc(), 4),
            ).price
        )
        for r in (0.0, 3.0)
    )
    assert p3 == pytest.approx(p0, abs=5e-3)


def test_heston_conditional_grid():
    """American KO on the conditional Heston bridge grid: ordering bounds,
    the far-barrier limit equals the plain conditional LSM, and jax.grad
    delta flows through the whole estimator."""
    hm = hh.HestonInputs(REF, 0.05, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    cfg = hh.SimulationConfig(
        trajectories=1 << 13, steps=100,
        variance_reduction=hh.Antithetic(), seed=0, qmc=True,
    )
    mc = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg)
    am = _amer_ko(barrier=80.0)
    eu_prob = hh.PricingProblem(
        hh.BarrierOption(110.0, EXPIRY, 80.0, hh.European(), hh.Put(),
                         hh.Spot(), hh.Down(), hh.KnockOut()),
        hm,
    )
    van_prob = hh.PricingProblem(
        hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot()), hm
    )
    p_am = float(hh.solve(hh.PricingProblem(am, hm), hh.LSM(mc, 3)).price)
    p_eu = float(hh.solve(eu_prob, mc).price)
    p_van = float(hh.solve(van_prob, hh.LSM(mc, 3)).price)
    # the first-passage hit leg converges from above at O(Δt); measured
    # +0.057 over the vanilla at 100 steps (+0.25 at 50), hence the slack
    assert p_eu - 0.05 <= p_am <= p_van + 0.10

    far = hh.BarrierOption(110.0, EXPIRY, 1e-6, hh.American(), hh.Put(),
                           hh.Spot(), hh.Down(), hh.KnockOut())
    p_far = float(hh.solve(hh.PricingProblem(far, hm), hh.LSM(mc, 3)).price)
    assert p_far == pytest.approx(p_van, rel=2e-3)

    delta = float(
        jax.grad(
            lambda s: hh.solve(
                hh.SpotLens().set(hh.PricingProblem(am, hm), s), hh.LSM(mc, 3)
            ).price
        )(100.0)
    )
    assert -1.0 < delta < -0.3  # an ITM American put's delta


def test_rebate_dominant_policy():
    """Up-and-out call with rebate 30 > the boundary intrinsic (H − K = 20):
    the OPTIMAL policy near the barrier is to HOLD for the knock, not
    exercise — the regression target carries the rebate hold-value leg
    (lsm_backward_induction's rebate_spec), so LSM matches the lattice
    (measured −0.12%; without the leg the policy exercises at ~20 and the
    price collapses)."""
    prob = hh.PricingProblem(
        _amer_ko(strike=100.0, barrier=120.0, direction=hh.Up(),
                 call_put=hh.Call(), rebate=30.0, rebate_at_hit=True),
        _market(),
    )
    lsm = float(hh.solve(prob, hh.LSM(_mc(steps=200), 4)).price)
    crr = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(2000)).price)
    assert lsm == pytest.approx(crr, rel=1e-2)


def test_sharded_lsm_rejects_barriers():
    """The sharded LSM induction carries no survival state — a knock-out
    must raise, not silently price the plain American vanilla."""
    import jax
    from jax.sharding import Mesh

    from hedgehog_tpu.parallel.sharding import sharded_lsm_price_fn

    devs = jax.devices()
    mesh = Mesh(devs, ("paths",))
    method = hh.LSM(_mc(steps=10, paths=256 * len(devs)), 2)
    fn = sharded_lsm_price_fn(method, mesh)
    with pytest.raises(TypeError, match="survival state"):
        fn(hh.PricingProblem(_amer_ko(barrier=80.0), _market()))


def test_lsm_american_knock_in_prices():
    """American knock-ins now PRICE on LSM grids via the hit-time estimator
    (the deep agreement suite is test_american_knock_in_mc.py) — a coarse
    run must land between zero and the vanilla American."""
    ki = hh.BarrierOption(110.0, EXPIRY, 80.0, hh.American(), hh.Put(),
                          hh.Spot(), hh.Down(), hh.KnockIn())
    p = float(hh.solve(hh.PricingProblem(ki, _market()),
                       hh.LSM(_mc(steps=25, paths=2048), 3)).price)
    van = float(hh.solve(
        hh.PricingProblem(hh.VanillaOption(110.0, EXPIRY, hh.American(),
                                           hh.Put(), hh.Spot()), _market()),
        hh.CoxRossRubinsteinMethod(500)).price)
    assert 0.0 < p < van


def test_lsm_barrier_needs_bridge_grid():
    """Merton jump grids have no Brownian-bridge correction — rejected."""
    m = hh.MertonInputs(REF, 0.05, 100.0, 0.25,
                        jump_intensity=0.5, jump_mean=-0.1, jump_std=0.15)
    mc = hh.MonteCarlo(
        hh.MertonJumpDynamics(), hh.EulerMaruyama(),
        hh.SimulationConfig(trajectories=256, steps=10, seed=0),
    )
    with pytest.raises(TypeError, match="barrier grids need"):
        hh.solve(hh.PricingProblem(_amer_ko(barrier=80.0), m), hh.LSM(mc, 2))
