"""Two-scale Carr-Madan quadrature: panel rule, auto bound, diagnostics.

The CM integrand has an α-driven central peak (width ~1) AND a CF-decay
envelope (width ~1/(σ√T)); short-dated/low-vol options need bounds of
O(10³) where a single GL rule silently loses the price (measured +0.85 on a
0.16 price at T=2d, σ=5% with the old GL-256 @ bound=32).  The panel rule +
``bound="auto"`` holds machine precision across regimes
(methods/carr_madan.py).
"""

import datetime as dt

import pytest

from hedgehog_tpu import (
    BlackScholesAnalytic,
    BlackScholesInputs,
    Call,
    CarrMadan,
    European,
    HestonDynamics,
    HestonInputs,
    LognormalDynamics,
    PricingProblem,
    Put,
    Spot,
    VanillaOption,
    carr_madan_error_estimate,
    solve,
)

REF = dt.date(2023, 1, 1)


def _bs_prob(days, sigma, K, cp=Call()):
    mkt = BlackScholesInputs(REF, 0.03, 100.0, sigma)
    payoff = VanillaOption(K, REF + dt.timedelta(days=days), European(), cp, Spot())
    return PricingProblem(payoff, mkt)


@pytest.mark.parametrize(
    "days,sigma,K",
    [(2, 0.05, 100.0), (7, 0.02, 100.0), (7, 0.05, 103.0), (30, 0.1, 100.0),
     (365, 0.2, 100.0), (365, 0.8, 150.0), (3650, 0.2, 60.0)],
)
def test_auto_bound_matches_analytic_everywhere(days, sigma, K):
    prob = _bs_prob(days, sigma, K)
    bs = float(solve(prob, BlackScholesAnalytic()).price)
    cm = float(solve(prob, CarrMadan(1.0, "auto", LognormalDynamics())).price)
    assert cm == pytest.approx(bs, abs=1e-10)


def test_short_dated_put_via_parity():
    prob = _bs_prob(7, 0.05, 101.0, Put())
    bs = float(solve(prob, BlackScholesAnalytic()).price)
    cm = float(solve(prob, CarrMadan(1.0, "auto", LognormalDynamics())).price)
    assert cm == pytest.approx(bs, abs=1e-10)


def test_panel_accuracy_is_bound_independent():
    """The log-substituted tails make node count independent of the bound —
    the failure mode that motivated the rule (GL-256 at bound=314 was off
    by 0.24)."""
    prob = _bs_prob(30, 0.1, 100.0)
    bs = float(solve(prob, BlackScholesAnalytic()).price)
    # every bound here covers the CF mass (decay scale 1/(σ√T) ≈ 35); only
    # node-resolution could fail, and the panel rule must not care how far
    # the tail stretches
    for bound in (314.0, 2000.0, 20000.0):
        cm = float(solve(prob, CarrMadan(1.0, bound, LognormalDynamics())).price)
        assert cm == pytest.approx(bs, abs=1e-10), bound


def test_legacy_gl_rule_still_available():
    # GL-256 resolves the width-~1 central peak to ~1e-5·bound/16, so use the
    # reference-test configuration (bound=16) where it meets 1e-6
    prob = _bs_prob(365, 0.4, 100.0)
    bs = float(solve(prob, BlackScholesAnalytic()).price)
    cm = float(solve(prob, CarrMadan(1.0, 16.0, LognormalDynamics(), quadrature="gl")).price)
    assert cm == pytest.approx(bs, abs=1e-6)
    with pytest.raises(ValueError, match="quadrature"):
        solve(prob, CarrMadan(1.0, 32.0, LognormalDynamics(), quadrature="nope"))


def test_heston_auto_bound_consistent_with_default():
    mkt = HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    payoff = VanillaOption(100.0, REF + dt.timedelta(days=365), European(), Call(), Spot())
    prob = PricingProblem(payoff, mkt)
    p_auto = float(solve(prob, CarrMadan(1.0, "auto", HestonDynamics())).price)
    p_def = float(solve(prob, CarrMadan(1.0, 64.0, HestonDynamics(), nodes=1024)).price)
    assert p_auto == pytest.approx(p_def, abs=1e-8)


def test_heston_short_dated_low_vol_auto():
    """T=7d, σ_eff=5%: the regime where any fixed bound truncates real mass.
    Golden from a ±6000 × 4M-point trapezoid reference evaluation."""
    mkt = HestonInputs(REF, 0.03, 100.0, 0.0025, 2.0, 0.0025, 0.3, -0.7)
    payoff = VanillaOption(100.0, REF + dt.timedelta(days=7), European(), Call(), Spot())
    prob = PricingProblem(payoff, mkt)
    p = float(solve(prob, CarrMadan(1.0, "auto", HestonDynamics())).price)
    assert p == pytest.approx(0.30216707, abs=5e-6)


def test_error_estimate_flags_bad_config_and_passes_good():
    prob = _bs_prob(7, 0.05, 100.0)
    bad = carr_madan_error_estimate(prob, CarrMadan(1.0, 32.0, LognormalDynamics()))
    good = carr_madan_error_estimate(prob, CarrMadan(1.0, "auto", LognormalDynamics()))
    bs = float(solve(prob, BlackScholesAnalytic()).price)
    true_err = abs(float(solve(prob, CarrMadan(1.0, 32.0, LognormalDynamics())).price) - bs)
    assert bad["total"] > 0.1 * true_err > 0.0  # flags the broken config
    assert good["total"] < 1e-8  # approves the auto config


def test_auto_bound_array_strikes_on_surface():
    """bound='auto' with an array-strike payoff on a (tenor × strike) vol
    surface: per-strike σ varies, so the bound reduces to the WIDEST decay
    length (scalar) and each grid price must match its scalar solve."""
    import jax.numpy as jnp

    from hedgehog_tpu import RectVolSurface

    surf = RectVolSurface(
        REF, jnp.array([0.25, 1.0]), jnp.array([90.0, 100.0, 110.0]),
        jnp.array([[0.25, 0.20, 0.18], [0.27, 0.22, 0.21]]),
    )
    mkt = BlackScholesInputs(REF, 0.03, 100.0, surf)
    strikes = jnp.array([90.0, 100.0, 110.0])
    expiry = REF + dt.timedelta(days=365)
    grid_payoff = VanillaOption(strikes, expiry, European(), Call(), Spot())
    grid = solve(
        PricingProblem(grid_payoff, mkt), CarrMadan(1.0, "auto", LognormalDynamics())
    ).price
    assert grid.shape == (3,)
    for i, k in enumerate(strikes):
        p = VanillaOption(float(k), expiry, European(), Call(), Spot())
        ref = float(solve(PricingProblem(p, mkt), CarrMadan(1.0, "auto", LognormalDynamics())).price)
        assert float(grid[i]) == pytest.approx(ref, rel=1e-10)


def test_string_bound_typo_raises():
    prob = _bs_prob(365, 0.2, 100.0)
    with pytest.raises(ValueError, match="auto"):
        solve(prob, CarrMadan(1.0, "Auto", LognormalDynamics()))
    with pytest.raises(ValueError, match="auto"):
        solve(prob, CarrMadan(1.0, "32", LognormalDynamics()))


def test_error_estimate_array_strikes():
    import jax.numpy as jnp

    mkt = BlackScholesInputs(REF, 0.03, 100.0, 0.2)
    strikes = jnp.array([90.0, 100.0, 110.0])
    payoff = VanillaOption(strikes, REF + dt.timedelta(days=365), European(), Call(), Spot())
    est = carr_madan_error_estimate(
        PricingProblem(payoff, mkt), CarrMadan(1.0, "auto", LognormalDynamics())
    )
    assert est["price"].shape == (3,)
    assert est["total"] < 1e-8


def test_matched_gammas_small_kdt_limit():
    """γ weights must approach (½, ½) smoothly as κΔ → 0 (the exact ratio is
    0/0 there; expm1 + series fallback in models/heston_qe.matched_gammas)."""
    import jax.numpy as jnp

    from hedgehog_tpu.models.heston_qe import matched_gammas

    g1, g2 = matched_gammas(jnp.float64(2.0), jnp.float64(0.0))
    assert float(g1) == pytest.approx(0.5) and float(g2) == pytest.approx(0.5)
    # just past the series/exact switch (κΔ = 1.01e-4) the exact expm1 path
    # must agree with the Taylor value ½ + κΔ/12 to the O((κΔ)³) truncation
    kdt = 1.01e-4
    _, g2_exact = matched_gammas(jnp.float64(1.0), jnp.float64(kdt))
    assert float(g2_exact) == pytest.approx(0.5 + kdt / 12.0, abs=1e-9)
    # moderate κΔ sanity (κΔ = 0.25 → γ2 ≈ 0.5219, measured in ADR notes)
    g1m, g2m = matched_gammas(jnp.float64(2.0), jnp.float64(0.125))
    assert float(g2m) == pytest.approx(0.5219, abs=2e-3)
    assert float(g1m) + float(g2m) == pytest.approx(1.0, abs=1e-3)


def test_auto_bound_rejects_unknown_dynamics():
    prob = _bs_prob(30, 0.2, 100.0)

    class Mystery:
        pass

    with pytest.raises(TypeError, match="auto"):
        solve(prob, CarrMadan(1.0, "auto", Mystery()))


def test_fft_smile_matches_panel_engine():
    """carr_madan_fft_smile (round 3): one FFT prices the whole log-strike
    grid to ~1e-11 vs the per-strike panel engine (inside price_agreement.
    jl:53's 1e-6 by 5 orders)."""
    import numpy as np

    from hedgehog_tpu.methods.carr_madan import carr_madan_fft_smile

    expiry = REF + dt.timedelta(days=365)
    for market, dyn in [
        (BlackScholesInputs(REF, 0.03, 100.0, 0.2), LognormalDynamics()),
        (HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7), HestonDynamics()),
    ]:
        payoff = VanillaOption(100.0, expiry, European(), Call(), Spot())
        prob = PricingProblem(payoff, market)
        Ks, calls = carr_madan_fft_smile(prob, dyn)
        Ks, calls = np.asarray(Ks), np.asarray(calls)
        idx = np.where((Ks > 60) & (Ks < 170))[0][::37]
        assert len(idx) >= 3
        for i in idx:
            p_ref = float(solve(
                PricingProblem(
                    VanillaOption(float(Ks[i]), expiry, European(), Call(), Spot()),
                    market,
                ),
                CarrMadan(1.0, "auto", dyn),
            ).price)
            np.testing.assert_allclose(calls[i], p_ref, atol=1e-8)
