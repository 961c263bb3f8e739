"""Merton jump-diffusion model family (beyond-reference: the reference
covers Black-Scholes and Heston only — src/market_inputs/market_inputs.jl,
src/pricing_methods/*).  Agreement matrix in the reference's style
(test/agreement/): independent methods — Poisson-weighted BS series,
Carr-Madan on the Merton CF (both engines), exact-terminal MC — must agree,
plus unbiased greeks incl. the jump intensity (likelihood-ratio surrogate)
and a calibration round-trip."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2025, 1, 1)
PARAMS = dict(sigma=0.2, jump_intensity=0.5, jump_mean=-0.1, jump_std=0.15)


def _market(**over):
    p = {**PARAMS, **over}
    return hh.MertonInputs(REF, 0.03, 100.0, p["sigma"], p["jump_intensity"],
                           p["jump_mean"], p["jump_std"])


def _opt(strike=100.0, cp=None):
    return hh.VanillaOption(strike, EXPIRY, hh.European(),
                            cp or hh.Call(), hh.Spot())


def test_series_vs_carr_madan_both_engines():
    prob = hh.PricingProblem(_opt(), _market())
    pa = float(hh.solve(prob, hh.MertonAnalytic()).price)
    for engine in ("complex", "pair"):
        cm = float(hh.solve(
            prob, hh.CarrMadan(1.0, "auto", hh.MertonJumpDynamics(), engine=engine)
        ).price)
        assert cm == pytest.approx(pa, abs=1e-6)


def test_zero_intensity_reduces_to_black_scholes():
    prob = hh.PricingProblem(_opt(), _market(jump_intensity=0.0))
    pa = float(hh.solve(prob, hh.MertonAnalytic()).price)
    bs = float(hh.solve(
        hh.PricingProblem(_opt(), hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)),
        hh.BlackScholesAnalytic()).price)
    assert pa == pytest.approx(bs, abs=1e-6)


def test_put_call_parity():
    m = _market()
    call = float(hh.solve(hh.PricingProblem(_opt(), m), hh.MertonAnalytic()).price)
    put = float(hh.solve(hh.PricingProblem(_opt(cp=hh.Put()), m), hh.MertonAnalytic()).price)
    T = 366 / 365
    assert call - put == pytest.approx(100.0 - 100.0 * np.exp(-0.03 * T), abs=1e-10)


def test_strike_grid_matches_scalar_solves():
    m = _market()
    ks = jnp.asarray([80.0, 95.0, 100.0, 110.0, 130.0])
    grid = hh.solve(
        hh.PricingProblem(hh.VanillaOption(ks, EXPIRY, hh.European(), hh.Call(), hh.Spot()), m),
        hh.MertonAnalytic()).price
    for i, k in enumerate(ks):
        one = float(hh.solve(hh.PricingProblem(_opt(float(k)), m), hh.MertonAnalytic()).price)
        assert float(grid[i]) == pytest.approx(one, rel=1e-12)


def test_mc_exact_vs_series():
    cfg = hh.SimulationConfig(trajectories=1 << 16, steps=1,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    prob = hh.PricingProblem(_opt(), _market())
    pa = float(hh.solve(prob, hh.MertonAnalytic()).price)
    mc = float(hh.solve(
        prob, hh.MonteCarlo(hh.MertonJumpDynamics(), hh.MertonExact(), cfg)).price)
    assert mc == pytest.approx(pa, rel=2e-3)


def test_mc_greeks_incl_intensity():
    """jax.grad through the MC solve is unbiased in ALL jump parameters:
    λ needs the baked-in likelihood-ratio surrogate (the count is discrete),
    μ_J/σ_J are pathwise; all checked against the series' own AD."""
    cfg = hh.SimulationConfig(trajectories=1 << 16, steps=1,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    method = hh.MonteCarlo(hh.MertonJumpDynamics(), hh.MertonExact(), cfg)

    for field, x0, tol in [("jump_intensity", 0.5, 3e-2),
                           ("jump_mean", -0.1, 3e-2),
                           ("jump_std", 0.15, 3e-2),
                           ("sigma", 0.2, 3e-2)]:
        def price(x, m):
            mk = _market(**{field: x})
            return hh.solve(hh.PricingProblem(_opt(), mk), m).price

        g_mc = float(jax.grad(price)(x0, method))
        g_se = float(jax.grad(price)(x0, hh.MertonAnalytic()))
        assert g_mc == pytest.approx(g_se, rel=tol), field


def test_digital_series_vs_carr_madan_vs_mc():
    m = _market()
    dig = hh.DigitalOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot(), 1.0)
    prob = hh.PricingProblem(dig, m)
    pa = float(hh.solve(prob, hh.MertonAnalytic()).price)
    cm = float(hh.solve(prob, hh.CarrMadan(1.0, "auto", hh.MertonJumpDynamics())).price)
    assert cm == pytest.approx(pa, abs=2e-6)
    cfg = hh.SimulationConfig(trajectories=1 << 16, steps=1,
                              variance_reduction=hh.Antithetic(), seed=1, qmc=True)
    mc = float(hh.solve(
        prob, hh.MonteCarlo(hh.MertonJumpDynamics(), hh.MertonExact(), cfg)).price)
    assert mc == pytest.approx(pa, rel=5e-3)


def test_calibrate_jump_params():
    """Recover (λ, μ_J, σ_J) from series prices across a strike grid — the
    reference's calibration pattern (test/unit/calibration.jl:36-103) on the
    new model family."""
    true = _market()
    strikes = [80.0, 90.0, 100.0, 110.0, 125.0]
    payoffs = [_opt(k) for k in strikes]
    quotes = jnp.asarray([
        float(hh.solve(hh.PricingProblem(p, true), hh.MertonAnalytic()).price)
        for p in payoffs
    ])
    guess_mkt = _market(jump_intensity=0.3, jump_mean=-0.05, jump_std=0.2)
    basket = hh.BasketPricingProblem(payoffs, guess_mkt)
    lenses = (hh.FieldLens("market_inputs.jump_intensity"),
              hh.FieldLens("market_inputs.jump_mean"),
              hh.FieldLens("market_inputs.jump_std"))
    calib = hh.CalibrationProblem(
        basket, quotes, jnp.asarray([0.3, -0.05, 0.2]),
        pricing_method=hh.MertonAnalytic(), accessors=lenses,
    )
    sol = hh.solve(calib, hh.OptimizerAlgo(max_iters=300),
                   lb=jnp.asarray([0.01, -0.5, 0.01]),
                   ub=jnp.asarray([3.0, 0.3, 0.6]))
    assert bool(sol.converged)
    lam, mu, sd = (float(x) for x in sol.u)
    assert lam == pytest.approx(0.5, rel=5e-2)
    assert mu == pytest.approx(-0.1, rel=5e-2)
    assert sd == pytest.approx(0.15, rel=5e-2)


def test_american_and_unsupported_raise():
    am = hh.VanillaOption(100.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())
    with pytest.raises(TypeError, match="European-only"):
        hh.solve(hh.PricingProblem(am, _market()), hh.MertonAnalytic())
    cfg = hh.SimulationConfig(trajectories=128, steps=1)
    with pytest.raises(TypeError, match="unsupported"):
        hh.solve(hh.PricingProblem(_opt(), _market()),
                 hh.MonteCarlo(hh.MertonJumpDynamics(), hh.HestonQE(), cfg))


def test_mc_path_values_keeps_the_intensity_surrogate():
    """The sharded pricer's interface (mc_path_values) must carry the same
    likelihood-ratio surrogate as solve — a dropped surrogate biases the
    λ-gradient by >2× (review finding, reproduced then fixed)."""
    from hedgehog_tpu.methods.montecarlo import mc_path_values

    cfg = hh.SimulationConfig(trajectories=1 << 15, steps=1,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    method = hh.MonteCarlo(hh.MertonJumpDynamics(), hh.MertonExact(), cfg)

    def price_via_values(lam):
        prob = hh.PricingProblem(_opt(), _market(jump_intensity=lam))
        return jnp.mean(mc_path_values(prob, method))

    g_vals = float(jax.grad(price_via_values)(0.5))
    g_series = float(jax.grad(lambda lam: hh.solve(
        hh.PricingProblem(_opt(), _market(jump_intensity=lam)),
        hh.MertonAnalytic()).price * np.exp(0.03 * 366 / 365))(0.5))
    assert g_vals == pytest.approx(g_series, rel=5e-2)


def test_series_truncation_guard():
    """λT beyond the fixed series' reach must raise, not silently misprice
    (the analytic mirror of the MC trip-count guard)."""
    hot = _market(jump_intensity=25.0)
    with pytest.raises(ValueError, match="truncates"):
        hh.solve(hh.PricingProblem(_opt(), hot), hh.MertonAnalytic())
    # and a sized series prices it fine vs Carr-Madan
    pa = float(hh.solve(hh.PricingProblem(_opt(), hot), hh.MertonAnalytic(n_terms=120)).price)
    cm = float(hh.solve(hh.PricingProblem(_opt(), hot),
                        hh.CarrMadan(1.0, "auto", hh.MertonJumpDynamics())).price)
    assert pa == pytest.approx(cm, rel=1e-6)


def test_euler_grid_terminal_is_exact():
    """Merton per-step increments are iid and exact (diffusion exact +
    conditional-normal jump sum), so the GRID sampler's terminal price
    matches the one-shot exact sampler's price at ANY step count."""
    cfg1 = hh.SimulationConfig(trajectories=1 << 15, steps=1,
                               variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    cfg8 = hh.SimulationConfig(trajectories=1 << 15, steps=8,
                               variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    prob = hh.PricingProblem(_opt(), _market())
    pa = float(hh.solve(prob, hh.MertonAnalytic()).price)
    p8 = float(hh.solve(
        prob, hh.MonteCarlo(hh.MertonJumpDynamics(), hh.EulerMaruyama(), cfg8)).price)
    assert p8 == pytest.approx(pa, rel=3e-3)
    # and the payoff grid composes: arithmetic Asian under jumps prices
    asian = hh.AsianOption(100.0, EXPIRY, 8, hh.European(), hh.Call(),
                           hh.Spot(), hh.ArithmeticAverage())
    p_as = float(hh.solve(
        hh.PricingProblem(asian, _market()),
        hh.MonteCarlo(hh.MertonJumpDynamics(), hh.EulerMaruyama(), cfg8)).price)
    assert 0.0 < p_as < pa  # averaging reduces optionality


def test_american_lsm_under_jumps():
    """LSM on the Merton grid: the jump-free corner matches CRR, and jump
    risk is priced (American put worth MORE with downward jumps)."""
    cfg = hh.SimulationConfig(trajectories=1 << 14, steps=50,
                              variance_reduction=hh.Antithetic(), seed=0, qmc=True)
    am = hh.VanillaOption(105.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())

    def lsm_price(lam):
        mkt = _market(jump_intensity=lam)
        return float(hh.solve(
            hh.PricingProblem(am, mkt),
            hh.LSM(hh.MonteCarlo(hh.MertonJumpDynamics(), hh.EulerMaruyama(), cfg), 4)).price)

    crr = float(hh.solve(
        hh.PricingProblem(am, hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)),
        hh.CoxRossRubinsteinMethod(500)).price)
    assert lsm_price(0.0) == pytest.approx(crr, rel=2e-2)
    assert lsm_price(0.5) > lsm_price(0.0)  # downward jumps add put value
