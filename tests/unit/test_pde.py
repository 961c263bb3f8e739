"""Finite-difference PDE engine (methods/pde.py) + the PCR tridiagonal solver.

The reference has no PDE method — this is a beyond-reference family, so the
oracles are the framework's own closed forms and lattices: BS analytic
(QuantLib-pinned in test_black_scholes.py), Reiner-Rubinstein barriers, CRR
for early exercise, Schroder's CEV closed form, and the term-structure
identity for Dupire local vol.
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.math.linalg import tridiag_solve_pcr
from hedgehog_tpu.models.dynamics import CEVDynamics, HestonDynamics, LocalVolDynamics

REF = dt.date(2025, 1, 1)
EXP = dt.date(2026, 1, 1)


def _bs_mkt(sigma=0.2, spot=100.0, rate=0.05, q=0.0):
    return hh.BlackScholesInputs(REF, rate, spot, sigma, dividend_yield=q)


# ---------------------------------------------------------------- PCR solver


def test_pcr_matches_dense_solve():
    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 17, 128, 511):
        dl, du = rng.normal(size=n), rng.normal(size=n)
        d = np.abs(dl) + np.abs(du) + 1.0 + rng.uniform(size=n)
        b = rng.normal(size=n)
        x = tridiag_solve_pcr(*map(jnp.asarray, (dl, d, du, b)))
        A = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-10, atol=1e-10)


def test_pcr_batched_and_differentiable():
    rng = np.random.default_rng(8)
    dl, du = rng.normal(size=(3, 64)), rng.normal(size=(3, 64))
    d = np.abs(dl) + np.abs(du) + 1.5
    b = rng.normal(size=(3, 64))
    x = tridiag_solve_pcr(*map(jnp.asarray, (dl, d, du, b)))
    for k in range(3):
        A = np.diag(d[k]) + np.diag(dl[k][1:], -1) + np.diag(du[k][:-1], 1)
        np.testing.assert_allclose(np.asarray(x[k]), np.linalg.solve(A, b[k]),
                                   atol=1e-10)
    # gradient w.r.t. the diagonal: compare against the Thomas-scan solver
    from hedgehog_tpu.math.linalg import tridiag_solve

    args = tuple(map(jnp.asarray, (dl[0], d[0], du[0], b[0])))
    g_pcr = jax.grad(lambda dd: tridiag_solve_pcr(args[0], dd, args[2], args[3]).sum())(args[1])
    g_tho = jax.grad(lambda dd: tridiag_solve(args[0], dd, args[2], args[3]).sum())(args[1])
    np.testing.assert_allclose(np.asarray(g_pcr), np.asarray(g_tho), rtol=1e-9)


# ------------------------------------------------------------- European / BS


def test_pde_european_matches_analytic():
    mkt = _bs_mkt()
    pde = hh.PDEMethod()
    for strike, cp in [(90.0, hh.Call()), (100.0, hh.Call()),
                       (100.0, hh.Put()), (110.0, hh.Put())]:
        o = hh.VanillaOption(strike, EXP, hh.European(), cp, hh.Spot())
        p_pde = hh.solve(hh.PricingProblem(o, mkt), pde).price
        p_bs = hh.solve(hh.PricingProblem(o, mkt), hh.BlackScholesAnalytic()).price
        np.testing.assert_allclose(float(p_pde), float(p_bs), atol=6e-4)


def test_pde_put_call_parity_and_dividends():
    mkt = _bs_mkt(q=0.03)
    pde = hh.PDEMethod()
    call = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    put = hh.VanillaOption(100.0, EXP, hh.European(), hh.Put(), hh.Spot())
    pc = float(hh.solve(hh.PricingProblem(call, mkt), pde).price)
    pp = float(hh.solve(hh.PricingProblem(put, mkt), pde).price)
    from hedgehog_tpu.market.rate_curve import df

    D = float(df(mkt.rate, call.expiry))
    fwd_leg = 100.0 * float(jnp.exp(-0.03)) - 100.0 * D
    np.testing.assert_allclose(pc - pp, fwd_leg, atol=1e-3)
    p_bs = float(hh.solve(hh.PricingProblem(call, mkt), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(pc, p_bs, atol=6e-4)


def test_pde_solution_grid_slice_is_exposed():
    mkt = _bs_mkt()
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    sol = hh.solve(hh.PricingProblem(o, mkt), hh.PDEMethod(space_steps=200, time_steps=64))
    assert sol.grid_spots.shape == sol.grid_values.shape == (201,)
    # the value slice should be monotone in spot for a call
    assert bool(jnp.all(jnp.diff(sol.grid_values) >= -1e-9))


# --------------------------------------------------------------- exercise


def test_pde_american_put_vs_crr():
    mkt = _bs_mkt()
    am = hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot())
    p_pde = float(hh.solve(hh.PricingProblem(am, mkt),
                           hh.PDEMethod(space_steps=400, time_steps=400)).price)
    p_crr = float(hh.solve(hh.PricingProblem(am, mkt),
                           hh.CoxRossRubinsteinMethod(2000)).price)
    np.testing.assert_allclose(p_pde, p_crr, rtol=1e-3)
    # early-exercise premium is positive and PDE American >= PDE European
    eu = hh.VanillaOption(110.0, EXP, hh.European(), hh.Put(), hh.Spot())
    p_eu = float(hh.solve(hh.PricingProblem(eu, mkt), hh.PDEMethod()).price)
    assert p_pde > p_eu


def test_pde_bermudan_brackets_and_degenerates():
    mkt = _bs_mkt()
    dates = tuple(dt.date(2025, m, 1) for m in (4, 7, 10))
    berm = hh.VanillaOption(110.0, EXP, hh.Bermudan(dates), hh.Put(), hh.Spot())
    eu = hh.VanillaOption(110.0, EXP, hh.European(), hh.Put(), hh.Spot())
    am = hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot())
    pde = hh.PDEMethod(space_steps=300, time_steps=120)
    p_b = float(hh.solve(hh.PricingProblem(berm, mkt), pde).price)
    p_e = float(hh.solve(hh.PricingProblem(eu, mkt), pde).price)
    p_a = float(hh.solve(hh.PricingProblem(am, mkt), pde).price)
    assert p_e - 1e-9 <= p_b <= p_a + 1e-9
    # empty exercise set degenerates to European exactly
    berm0 = hh.VanillaOption(110.0, EXP, hh.Bermudan(()), hh.Put(), hh.Spot())
    p_b0 = float(hh.solve(hh.PricingProblem(berm0, mkt), pde).price)
    np.testing.assert_allclose(p_b0, p_e, rtol=1e-12)
    # CRR agreement at quarterly rights
    p_crr = float(hh.solve(hh.PricingProblem(berm, mkt),
                           hh.CoxRossRubinsteinMethod(1200)).price)
    np.testing.assert_allclose(p_b, p_crr, rtol=2e-3)


# ------------------------------------------------------------------ digitals


def test_pde_digital_matches_analytic():
    mkt = _bs_mkt()
    dig = hh.DigitalOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot(), cash=1.0)
    p_pde = float(hh.solve(hh.PricingProblem(dig, mkt),
                           hh.PDEMethod(space_steps=600, time_steps=300)).price)
    p_bs = float(hh.solve(hh.PricingProblem(dig, mkt), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(p_pde, p_bs, atol=5e-4)


# ------------------------------------------------------------------ barriers


def test_pde_knock_out_barriers_vs_reiner_rubinstein():
    mkt = _bs_mkt()
    pde = hh.PDEMethod(space_steps=400, time_steps=200)
    cases = [
        hh.BarrierOption(100.0, EXP, 130.0, hh.European(), hh.Call(), hh.Spot(),
                         hh.Up(), hh.KnockOut()),
        hh.BarrierOption(100.0, EXP, 80.0, hh.European(), hh.Put(), hh.Spot(),
                         hh.Down(), hh.KnockOut(), rebate=2.0, rebate_at_hit=True),
        hh.BarrierOption(100.0, EXP, 85.0, hh.European(), hh.Call(), hh.Spot(),
                         hh.Down(), hh.KnockOut(), rebate=1.0),
    ]
    for bo in cases:
        p_pde = float(hh.solve(hh.PricingProblem(bo, mkt), pde).price)
        p_rr = float(hh.solve(hh.PricingProblem(bo, mkt), hh.BlackScholesAnalytic()).price)
        np.testing.assert_allclose(p_pde, p_rr, atol=8e-4)


def test_pde_knock_in_parity():
    mkt = _bs_mkt()
    pde = hh.PDEMethod(space_steps=400, time_steps=200)
    ki = hh.BarrierOption(100.0, EXP, 130.0, hh.European(), hh.Call(), hh.Spot(),
                          hh.Up(), hh.KnockIn())
    p_pde = float(hh.solve(hh.PricingProblem(ki, mkt), pde).price)
    p_rr = float(hh.solve(hh.PricingProblem(ki, mkt), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(p_pde, p_rr, atol=8e-4)


def test_pde_american_knock_out_vs_crr():
    mkt = _bs_mkt()
    bo = hh.BarrierOption(100.0, EXP, 80.0, hh.American(), hh.Put(), hh.Spot(),
                          hh.Down(), hh.KnockOut())
    p_pde = float(hh.solve(hh.PricingProblem(bo, mkt),
                           hh.PDEMethod(space_steps=400, time_steps=400)).price)
    p_crr = float(hh.solve(hh.PricingProblem(bo, mkt),
                           hh.CoxRossRubinsteinMethod(2000)).price)
    np.testing.assert_allclose(p_pde, p_crr, rtol=2e-3)


def test_pde_spot_beyond_barrier_is_knocked():
    mkt = _bs_mkt(spot=75.0)
    bo = hh.BarrierOption(100.0, EXP, 80.0, hh.European(), hh.Put(), hh.Spot(),
                          hh.Down(), hh.KnockOut(), rebate=3.0, rebate_at_hit=True)
    p = float(hh.solve(hh.PricingProblem(bo, mkt), hh.PDEMethod()).price)
    np.testing.assert_allclose(p, 3.0, rtol=1e-12)


# -------------------------------------------------------------------- greeks


def test_pde_ad_greeks_match_analytic():
    mkt = _bs_mkt()
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(o, mkt)
    pde = hh.PDEMethod()

    def price(method, lens, x):
        return hh.solve(lens.set(prob, x), method).price

    for lens, x0 in [(hh.SpotLens(), 100.0), (hh.VolLens(), 0.2)]:
        g_pde = float(jax.grad(lambda x: price(pde, lens, x))(x0))
        g_bs = float(jax.grad(lambda x: price(hh.BlackScholesAnalytic(), lens, x))(x0))
        np.testing.assert_allclose(g_pde, g_bs, rtol=2e-4)
    gamma_pde = float(jax.grad(jax.grad(lambda s: price(pde, hh.SpotLens(), s)))(100.0))
    gamma_bs = float(jax.grad(jax.grad(
        lambda s: price(hh.BlackScholesAnalytic(), hh.SpotLens(), s)))(100.0))
    np.testing.assert_allclose(gamma_pde, gamma_bs, rtol=1e-3)


def test_pde_jit_and_vmap_over_strikes():
    mkt = _bs_mkt()
    pde = hh.PDEMethod(space_steps=200, time_steps=64)

    @jax.jit
    def price_k(k):
        o = hh.VanillaOption(k, EXP, hh.European(), hh.Call(), hh.Spot())
        return hh.solve(hh.PricingProblem(o, mkt), pde).price

    ks = jnp.asarray([80.0, 90.0, 100.0, 110.0, 120.0])
    batched = jax.vmap(price_k)(ks)
    for i, k in enumerate(np.asarray(ks)):
        o = hh.VanillaOption(float(k), EXP, hh.European(), hh.Call(), hh.Spot())
        p_bs = hh.solve(hh.PricingProblem(o, mkt), hh.BlackScholesAnalytic()).price
        np.testing.assert_allclose(float(batched[i]), float(p_bs), atol=2e-3)


# ------------------------------------------------------------- other dynamics


def test_pde_cev_matches_schroder_closed_form():
    mkt = hh.CEVInputs(REF, 0.05, 100.0, sigma=2.0, beta=0.5)
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    p_pde = float(hh.solve(hh.PricingProblem(o, mkt),
                           hh.PDEMethod(dynamics=CEVDynamics())).price)
    p_cf = float(hh.solve(hh.PricingProblem(o, mkt), hh.CEVAnalytic()).price)
    np.testing.assert_allclose(p_pde, p_cf, rtol=2e-4)
    # American put on the CEV grid sits above European
    am = hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot())
    eu = hh.VanillaOption(110.0, EXP, hh.European(), hh.Put(), hh.Spot())
    p_am = float(hh.solve(hh.PricingProblem(am, mkt),
                          hh.PDEMethod(dynamics=CEVDynamics())).price)
    p_eu = float(hh.solve(hh.PricingProblem(eu, mkt),
                          hh.PDEMethod(dynamics=CEVDynamics())).price)
    assert p_am > p_eu


def test_pde_local_vol_flat_surface_reduces_to_bs():
    mkt = _bs_mkt(sigma=0.25)
    o = hh.VanillaOption(105.0, EXP, hh.European(), hh.Call(), hh.Spot())
    p_lv = float(hh.solve(hh.PricingProblem(o, mkt),
                          hh.PDEMethod(dynamics=LocalVolDynamics(),
                                       space_steps=200, time_steps=64)).price)
    p_bs = float(hh.solve(hh.PricingProblem(o, mkt), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(p_lv, p_bs, atol=2e-3)


def test_pde_local_vol_term_structure():
    # vols varying in tenor only: the LV PDE must integrate σ_loc²(t) to the
    # implied total variance, recovering BS at the expiry's implied vol
    surf = hh.RectVolSurface(REF, jnp.asarray([0.25, 0.5, 1.0]),
                             jnp.asarray([50.0, 200.0]),
                             jnp.asarray([[0.15, 0.15], [0.20, 0.20], [0.25, 0.25]]))
    mkt = hh.BlackScholesInputs(REF, 0.03, 100.0, surf)
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    p_lv = float(hh.solve(hh.PricingProblem(o, mkt),
                          hh.PDEMethod(dynamics=LocalVolDynamics(),
                                       space_steps=200, time_steps=100)).price)
    flat = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.25)
    p_bs = float(hh.solve(hh.PricingProblem(o, flat), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(p_lv, p_bs, atol=2e-3)


# ------------------------------------------------------------------ contract


def test_pde_rejects_unsupported():
    mkt = _bs_mkt()
    pde = hh.PDEMethod()
    asian = hh.AsianOption(100.0, EXP, 12)
    with pytest.raises(TypeError):
        hh.solve(hh.PricingProblem(asian, mkt), pde)
    o_grid = hh.VanillaOption(jnp.asarray([90.0, 100.0]), EXP, hh.European(),
                              hh.Call(), hh.Spot())
    with pytest.raises(TypeError):
        hh.solve(hh.PricingProblem(o_grid, mkt), pde)
    from hedgehog_tpu.models.dynamics import SABRDynamics

    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    with pytest.raises(TypeError):
        hh.solve(hh.PricingProblem(o, mkt), hh.PDEMethod(dynamics=SABRDynamics()))
    # Heston dynamics route to the 2-D ADI solver but demand HestonInputs
    with pytest.raises(TypeError):
        hh.solve(hh.PricingProblem(o, mkt), hh.PDEMethod(dynamics=HestonDynamics()))
    ki_am = hh.BarrierOption(100.0, EXP, 130.0, hh.American(), hh.Call(), hh.Spot(),
                             hh.Up(), hh.KnockIn())
    with pytest.raises(TypeError):
        hh.solve(hh.PricingProblem(ki_am, mkt), pde)
