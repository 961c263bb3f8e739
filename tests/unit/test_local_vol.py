"""Dupire local volatility (beyond-reference model family: the reference
carries the implied-vol surface machinery, src/market_inputs/vol_surface.jl,
but no local-vol model).  The defining validation is the Dupire round-trip:
a local-vol Monte Carlo driven by σ_loc derived from an implied-vol surface
must reprice the vanillas the surface encodes."""

import datetime as dt

import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2024, 12, 31)  # T = 1 (ACT/365)


def test_flat_surface_reduces_exactly():
    """A flat surface gives σ_loc = σ identically, and the LV stepper then
    IS exact GBM stepping — the MC matches BS to QMC noise."""
    flat = hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    assert float(hh.dupire_local_vol(flat, 0.5, 110.0)) == 0.2
    opt = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    cfg = hh.SimulationConfig(trajectories=1 << 15, steps=16,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    p_lv = float(hh.solve(
        hh.PricingProblem(opt, flat),
        hh.MonteCarlo(hh.LocalVolDynamics(), hh.EulerMaruyama(), cfg)).price)
    p_bs = float(hh.solve(hh.PricingProblem(opt, flat), hh.BlackScholesAnalytic()).price)
    assert p_lv == pytest.approx(p_bs, rel=2e-3)


def _heston_surface():
    """A genuinely smiley surface: Heston Carr-Madan prices inverted to
    implied vols on a (tenor × strike) grid, cubic in strike so the Dupire
    second derivative is meaningful."""
    hmkt = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    tenors = [0.25, 0.5, 1.0, 1.5, 2.0]
    strikes = np.array([70.0, 80.0, 90.0, 100.0, 110.0, 120.0, 135.0])
    cm = hh.CarrMadan(1.0, "auto", hh.HestonDynamics())
    ivs = np.zeros((len(tenors), len(strikes)))
    for i, tt in enumerate(tenors):
        e = hh.add_yearfrac(REF, tt)
        po = hh.VanillaOption(jnp.asarray(strikes), e, hh.European(), hh.Call(), hh.Spot())
        px = hh.solve(hh.PricingProblem(po, hmkt), cm).price
        ivs[i] = np.asarray(hh.implied_vol(px, jnp.asarray(strikes), tt, 100.0, 0.03))
    surf = hh.RectVolSurface(REF, jnp.asarray(tenors), jnp.asarray(strikes),
                             jnp.asarray(ivs), interp_time="linear",
                             interp_strike="cubic")
    return hmkt, hh.BlackScholesInputs(REF, 0.03, 100.0, surf), cm


def test_dupire_roundtrip_reprices_the_surface():
    """LV Monte Carlo on a Heston-implied surface reprices the Heston
    vanillas (grid interpolation + Euler bias budget: 30bp ATM band)."""
    hmkt, lv_mkt, cm = _heston_surface()
    cfg = hh.SimulationConfig(trajectories=1 << 15, steps=50,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    for K, tol in ((90.0, 3e-3), (100.0, 3e-3), (110.0, 5e-3)):
        po = hh.VanillaOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot())
        want = float(hh.solve(hh.PricingProblem(po, hmkt), cm).price)
        got = float(hh.solve(
            hh.PricingProblem(po, lv_mkt),
            hh.MonteCarlo(hh.LocalVolDynamics(), hh.EulerMaruyama(), cfg)).price)
        assert got == pytest.approx(want, rel=tol), K


def test_local_vol_sees_the_skew():
    """Under a downside skew the local vol is higher below the forward than
    above it (σ_loc inherits ~2× the implied skew slope)."""
    _, lv_mkt, _ = _heston_surface()
    lo = float(hh.dupire_local_vol(lv_mkt, 1.0, 80.0))
    atm = float(hh.dupire_local_vol(lv_mkt, 1.0, 100.0))
    hi = float(hh.dupire_local_vol(lv_mkt, 1.0, 120.0))
    assert lo > atm > hi
    assert np.isfinite([lo, atm, hi]).all()
