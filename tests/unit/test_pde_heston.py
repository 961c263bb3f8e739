"""Heston ADI PDE (methods/pde2d.py) vs the framework's independent engines:
Carr-Madan on the Heston CF (auto bound), the conditional-MC estimator,
conditional LSM, Reiner-Rubinstein in the σ_v → 0 degeneration, and BS
analytic greeks through the CM Jacobian."""

import dataclasses
import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.models.dynamics import HestonDynamics

REF = dt.date(2025, 1, 1)
EXP = dt.date(2026, 1, 1)
MKT = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.05, 0.4, -0.7)
CM = hh.CarrMadan(dynamics=HestonDynamics())


def _pde(ns=128, nv=64, m=64):
    return hh.PDEMethod(dynamics=HestonDynamics(), space_steps=ns,
                        var_steps=nv, time_steps=m)


def test_heston_pde_european_vs_carr_madan():
    for cp in (hh.Call(), hh.Put()):
        o = hh.VanillaOption(100.0, EXP, hh.European(), cp, hh.Spot())
        p_pde = float(hh.solve(hh.PricingProblem(o, MKT), _pde()).price)
        p_cm = float(hh.solve(hh.PricingProblem(o, MKT), CM).price)
        np.testing.assert_allclose(p_pde, p_cm, atol=3e-3)


def test_heston_pde_grid_convergence():
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    p_cm = float(hh.solve(hh.PricingProblem(o, MKT), CM).price)
    e_coarse = abs(float(hh.solve(hh.PricingProblem(o, MKT), _pde()).price) - p_cm)
    e_fine = abs(float(hh.solve(
        hh.PricingProblem(o, MKT), _pde(192, 96, 96)).price) - p_cm)
    assert e_fine < e_coarse
    assert e_fine < 1.5e-3


def test_heston_pde_feller_violating_corner():
    # 2κθ = 0.08 < σ² = 1: the corner where a fixed CM bound loses 86bp and
    # variance-domain truncation bites — PDE, auto-bound CM and the
    # conditional-MC estimator must all agree here
    mkt = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 1.0, 0.04, 1.0, -0.9)
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    p_pde = float(hh.solve(hh.PricingProblem(o, mkt), _pde(192, 96, 96)).price)
    p_cm = float(hh.solve(hh.PricingProblem(o, mkt), CM).price)
    np.testing.assert_allclose(p_pde, p_cm, atol=2e-3)
    p_mc = float(hh.solve(hh.PricingProblem(o, mkt), hh.MonteCarlo(
        HestonDynamics(), hh.HestonQE(conditional=True),
        hh.SimulationConfig(trajectories=2**16, steps=32, seed=3))).price)
    np.testing.assert_allclose(p_pde, p_mc, rtol=5e-3)


def test_heston_pde_sigma_v_degeneration_is_black_scholes():
    # σ_v → 0 with V0 = θ: variance is frozen at θ, the model IS BS(√θ)
    mkt = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 1e-4, 0.0)
    o = hh.VanillaOption(105.0, EXP, hh.European(), hh.Call(), hh.Spot())
    p_pde = float(hh.solve(hh.PricingProblem(o, mkt), _pde()).price)
    bs = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    p_bs = float(hh.solve(hh.PricingProblem(o, bs), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(p_pde, p_bs, atol=4e-3)


def test_heston_pde_american_put():
    am = hh.VanillaOption(110.0, EXP, hh.American(), hh.Put(), hh.Spot())
    eu = hh.VanillaOption(110.0, EXP, hh.European(), hh.Put(), hh.Spot())
    p_am = float(hh.solve(hh.PricingProblem(am, MKT), _pde()).price)
    p_eu = float(hh.solve(hh.PricingProblem(eu, MKT), _pde()).price)
    assert p_am > p_eu
    # the deterministic price sits inside the conditional-LSM tolerance band
    lsm = hh.LSM(hh.MonteCarlo(HestonDynamics(), hh.HestonQE(conditional=True),
                               hh.SimulationConfig(trajectories=16384, steps=50,
                                                   seed=11)), degree=4)
    p_lsm = float(hh.solve(hh.PricingProblem(am, MKT), lsm).price)
    np.testing.assert_allclose(p_am, p_lsm, rtol=2e-2)


def test_heston_pde_digital_vs_carr_madan():
    dig = hh.DigitalOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    p_pde = float(hh.solve(hh.PricingProblem(dig, MKT), _pde()).price)
    p_cm = float(hh.solve(hh.PricingProblem(dig, MKT), CM).price)
    np.testing.assert_allclose(p_pde, p_cm, atol=1.5e-3)


def test_heston_pde_barrier_degenerates_to_reiner_rubinstein():
    # σ_v → 0, V0 = θ: the knock-out on the Heston ADI grid must recover
    # the BS closed form (continuous monitoring — no monitoring bias)
    mkt = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 1e-4, 0.0)
    bo = hh.BarrierOption(100.0, EXP, 130.0, hh.European(), hh.Call(), hh.Spot(),
                          hh.Up(), hh.KnockOut(), rebate=1.0)
    p_pde = float(hh.solve(hh.PricingProblem(bo, mkt), _pde()).price)
    bs = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    p_rr = float(hh.solve(hh.PricingProblem(bo, bs), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(p_pde, p_rr, atol=2.5e-3)


def test_heston_pde_knock_in_parity_identity():
    # KI(0) + KO(0) = vanilla on the SAME engine (in-out parity)
    ki = hh.BarrierOption(100.0, EXP, 130.0, hh.European(), hh.Call(), hh.Spot(),
                          hh.Up(), hh.KnockIn())
    ko = dataclasses.replace(ki, knock=hh.KnockOut())
    van = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    p_ki = float(hh.solve(hh.PricingProblem(ki, MKT), _pde()).price)
    p_ko = float(hh.solve(hh.PricingProblem(ko, MKT), _pde()).price)
    p_v = float(hh.solve(hh.PricingProblem(van, MKT), _pde()).price)
    np.testing.assert_allclose(p_ki + p_ko, p_v, atol=1e-9)
    assert 0.0 < p_ko < p_v


def test_heston_pde_ad_greeks_vs_carr_madan():
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(o, MKT)
    pde = _pde()
    d_pde = float(jax.grad(
        lambda s: hh.solve(hh.SpotLens().set(prob, s), pde).price)(100.0))
    d_cm = float(jax.grad(
        lambda s: hh.solve(hh.SpotLens().set(prob, s), CM).price)(100.0))
    np.testing.assert_allclose(d_pde, d_cm, rtol=3e-3)

    def p_v0(v0, method):
        return hh.solve(
            hh.PricingProblem(o, dataclasses.replace(MKT, V0=v0)), method
        ).price

    v_pde = float(jax.grad(p_v0)(0.04, pde))
    v_cm = float(jax.grad(p_v0)(0.04, CM))
    np.testing.assert_allclose(v_pde, v_cm, rtol=5e-3)


def test_heston_pde_solution_exposes_grid():
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    sol = hh.solve(hh.PricingProblem(o, MKT), _pde(96, 48, 32))
    s_grid, v_grid = sol.grid_spots
    assert sol.grid_values.shape == (v_grid.shape[0], s_grid.shape[0])
    # value increases with variance for a European call (vega > 0)
    mid = s_grid.shape[0] // 2
    col = sol.grid_values[:, mid]
    assert float(col[-1]) > float(col[0])


def test_heston_pde_requires_heston_inputs():
    bs = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    o = hh.VanillaOption(100.0, EXP, hh.European(), hh.Call(), hh.Spot())
    with pytest.raises(TypeError):
        hh.solve(hh.PricingProblem(o, bs), _pde())
