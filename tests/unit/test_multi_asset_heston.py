"""Multi-asset HESTON Monte Carlo (r3 verdict item 9): correlated
conditional-QE marginals for baskets/rainbows/spreads.

Oracles: the σ_v → 0 degeneration collapses each marginal to a constant-vol
lognormal, so the Stulz/Margrabe/geometric closed forms on
MultiAssetBSInputs anchor prices; single-asset reduction (n = 1, weight 1)
must match the standard single-asset conditional-MC engine on the same
Heston market; AD correlation greeks have the no-arbitrage signs.
"""

import datetime as dt

import jax
import jax.numpy as jnp
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)
CORR = [[1.0, 0.5], [0.5, 1.0]]


def _heston2(sigma_vs=(0.3, 0.4), rhos=(-0.6, -0.5), corr=CORR):
    return hh.MultiAssetHestonInputs(
        REF, 0.03, [100.0, 95.0], [0.04, 0.09], [2.0, 1.5], [0.04, 0.09],
        list(sigma_vs), list(rhos), corr,
    )


def _mc(steps=24, paths=1 << 15, seed=0, qmc=False):
    cfg = hh.SimulationConfig(trajectories=paths, steps=steps,
                              variance_reduction=hh.Antithetic(), seed=seed,
                              qmc=qmc)
    return hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg)


def test_sigma_v_zero_degenerates_to_stulz():
    """σ_v → 0, V0 = θ: each variance is constant, so the rainbow collapses
    to the correlated-lognormal Stulz closed form."""
    rb = hh.RainbowOption(100.0, EXPIRY, best=True)
    mkt = _heston2(sigma_vs=(1e-4, 1e-4), rhos=(0.0, 0.0))
    p = float(hh.solve(hh.PricingProblem(rb, mkt), _mc()).price)
    bs = hh.MultiAssetBSInputs(REF, 0.03, [100.0, 95.0], [0.2, 0.3], CORR)
    ref = float(hh.solve(hh.PricingProblem(rb, bs), hh.BlackScholesAnalytic()).price)
    assert p == pytest.approx(ref, rel=5e-3)


def test_sigma_v_zero_spread_vs_margrabe():
    """Degenerate exchange option (K = 0) against the exact Margrabe form."""
    sp = hh.SpreadOption(0.0, EXPIRY)
    mkt = _heston2(sigma_vs=(1e-4, 1e-4), rhos=(0.0, 0.0))
    p = float(hh.solve(hh.PricingProblem(sp, mkt), _mc()).price)
    bs = hh.MultiAssetBSInputs(REF, 0.03, [100.0, 95.0], [0.2, 0.3], CORR)
    ref = float(hh.solve(hh.PricingProblem(sp, bs), hh.BlackScholesAnalytic()).price)
    assert p == pytest.approx(ref, rel=1e-2)


def test_single_asset_reduction_matches_conditional_mc():
    """n = 1 weight-1 basket call == the single-asset Heston vanilla on the
    SAME market priced by the standard conditional-MC engine (different RNG
    streams — agreement is at the MC level, QMC keeps both tight)."""
    mkt1 = hh.MultiAssetHestonInputs(
        REF, 0.03, [100.0], [0.04], [2.0], [0.04], [0.3], [-0.6], [[1.0]],
    )
    basket = hh.BasketOption(100.0, EXPIRY, weights=[1.0])
    p_multi = float(hh.solve(hh.PricingProblem(basket, mkt1),
                             _mc(steps=32, paths=1 << 15, qmc=True)).price)
    single = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.6)
    call = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    p_single = float(hh.solve(hh.PricingProblem(call, single),
                              _mc(steps=32, paths=1 << 15, qmc=True)).price)
    assert p_multi == pytest.approx(p_single, rel=1e-2)


def test_ad_correlation_and_delta_greeks():
    """AD flows through the whole correlated simulation: best-of rainbow
    value FALLS with correlation, spread value FALLS with correlation, and
    per-asset deltas of a basket call are positive."""
    rb = hh.RainbowOption(100.0, EXPIRY, best=True)
    m = _mc(paths=1 << 14)

    def rainbow_of_corr(c12):
        mkt = hh.MultiAssetHestonInputs(
            REF, 0.03, [100.0, 95.0], [0.04, 0.09], [2.0, 1.5], [0.04, 0.09],
            [0.3, 0.4], [-0.6, -0.5], jnp.array([[1.0, c12], [c12, 1.0]]),
        )
        return hh.solve(hh.PricingProblem(rb, mkt), m).price

    assert float(jax.grad(rainbow_of_corr)(0.5)) < 0.0

    sp = hh.SpreadOption(5.0, EXPIRY)

    def spread_of_corr(c12):
        mkt = hh.MultiAssetHestonInputs(
            REF, 0.03, [100.0, 95.0], [0.04, 0.09], [2.0, 1.5], [0.04, 0.09],
            [0.3, 0.4], [-0.6, -0.5], jnp.array([[1.0, c12], [c12, 1.0]]),
        )
        return hh.solve(hh.PricingProblem(sp, mkt), m).price

    assert float(jax.grad(spread_of_corr)(0.5)) < 0.0

    basket = hh.BasketOption(97.0, EXPIRY, weights=[0.5, 0.5])

    def basket_of_spots(s):
        mkt = hh.MultiAssetHestonInputs(
            REF, 0.03, s, [0.04, 0.09], [2.0, 1.5], [0.04, 0.09],
            [0.3, 0.4], [-0.6, -0.5], CORR,
        )
        return hh.solve(hh.PricingProblem(basket, mkt), m).price

    deltas = jax.grad(basket_of_spots)(jnp.array([100.0, 95.0]))
    assert bool(jnp.all(deltas > 0.0)) and bool(jnp.all(deltas < 1.0))


def test_refinement_and_qmc_consistency():
    """Doubling segments moves the price by less than the noise band, and
    QMC at the same budget agrees — the within-segment freeze is O(Δt)."""
    rb = hh.RainbowOption(100.0, EXPIRY, best=False)
    prob = hh.PricingProblem(rb, _heston2())
    p24 = float(hh.solve(prob, _mc(steps=24, qmc=True)).price)
    p48 = float(hh.solve(prob, _mc(steps=48, qmc=True)).price)
    assert p24 == pytest.approx(p48, rel=1.5e-2)


def test_correlation_too_strong_for_spot_vol_rejected():
    """R_ij beyond sqrt(1-rho_i^2)sqrt(1-rho_j^2) has no consistent
    orthogonal-driver decomposition — constructor must reject, not clip."""
    with pytest.raises(ValueError, match="too strong"):
        hh.MultiAssetHestonInputs(
            REF, 0.03, [100.0, 95.0], [0.04, 0.09], [2.0, 1.5], [0.04, 0.09],
            [0.3, 0.4], [-0.9, -0.9], [[1.0, 0.6], [0.6, 1.0]],
        )


def test_boundary_feasible_correlation_prices_finite():
    """ADVICE r4 regression: a correlation matrix the validating ctor accepts
    at its eigenvalue-slack boundary (min eig of C⊥ ≈ −1e-11 > the −1e-10
    tolerance) must still price finitely — the runtime Cholesky jitter has to
    cover the validation slack, or the eps-negative matrix NaNs at solve
    time.  3-asset equicorrelation ρ = −0.5 − 5e-12 sits exactly there."""
    eps = 5e-12
    off = -0.5 - eps
    corr = [[1.0, off, off], [off, 1.0, off], [off, off, 1.0]]
    m = hh.MultiAssetHestonInputs(
        REF, 0.03, [100.0, 95.0, 105.0], [0.04, 0.09, 0.04],
        [2.0, 1.5, 2.0], [0.04, 0.09, 0.04], [0.3, 0.4, 0.3],
        [0.0, 0.0, 0.0], corr,
    )  # ctor accepts: min eig ≈ -1e-11 within the -1e-10 slack
    basket = hh.BasketOption(97.0, EXPIRY, weights=[1 / 3, 1 / 3, 1 / 3])
    cfg = hh.SimulationConfig(trajectories=2_000, steps=4, seed=0,
                              variance_reduction=hh.Antithetic())
    p = float(hh.solve(hh.PricingProblem(basket, m),
                       hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg)).price)
    assert jnp.isfinite(p) and p > 0.0
