"""Calibration tests mirroring reference test/unit/calibration.jl:
BS vol recovery (atol 1e-5) and 5-param Heston recovery (rtol 1e-1),
plus implied-vol round trips."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedgehog_tpu import (
    BasketPricingProblem,
    BlackScholesAnalytic,
    BlackScholesInputs,
    Call,
    CalibrationProblem,
    CarrMadan,
    European,
    FieldLens,
    HestonDynamics,
    HestonInputs,
    OptimizerAlgo,
    PricingProblem,
    Put,
    RootFinderAlgo,
    Spot,
    VanillaOption,
    VolLens,
    implied_vol_bs,
    iv_to_price_bs,
    rect_vol_surface_from_prices,
    get_vol_yf,
    solve,
)

REF = dt.date(2020, 1, 1)


def test_bs_vol_recovery_lbfgs():
    r, S0, sigma = 0.05, 100.0, 0.25
    market = BlackScholesInputs(REF, r, S0, sigma)
    strikes = np.arange(60.0, 141.0, 5.0)
    expiry = dt.date(2020, 12, 31)
    payoffs = [VanillaOption(K, expiry, European(), Call(), Spot()) for K in strikes]
    quotes = [
        float(solve(PricingProblem(p, market), BlackScholesAnalytic()).price) for p in payoffs
    ]
    guess_market = BlackScholesInputs(REF, r, S0, 0.15)
    basket = BasketPricingProblem(payoffs, guess_market)
    calib = CalibrationProblem(
        basket, jnp.asarray(quotes), jnp.asarray([0.15]), BlackScholesAnalytic(), (VolLens(1, 1),)
    )
    result = solve(calib, OptimizerAlgo(max_iters=100))
    assert float(result.u[0]) == pytest.approx(sigma, abs=1e-5)
    # honest optimizer diagnostics: early exit fired, real iteration count
    assert bool(result.converged)
    assert 0 < int(result.iterations) < 100


def test_bs_implied_vol_rootfind():
    r, S0, sigma = 0.05, 100.0, 0.3
    market_true = BlackScholesInputs(REF, r, S0, sigma)
    payoff = VanillaOption(110.0, dt.date(2020, 12, 31), European(), Put(), Spot())
    quote = float(solve(PricingProblem(payoff, market_true), BlackScholesAnalytic()).price)
    guess_market = BlackScholesInputs(REF, r, S0, 0.5)
    calib = CalibrationProblem(
        BasketPricingProblem([payoff], guess_market),
        jnp.asarray([quote]),
        jnp.asarray([0.5]),
        BlackScholesAnalytic(),
        (VolLens(1, 1),),
    )
    sol = solve(calib, RootFinderAlgo())
    assert float(sol.u) == pytest.approx(sigma, abs=1e-10)


@pytest.mark.slow
def test_heston_calibration_recovery():
    true_params = dict(v0=0.010201, kappa=6.21, theta=0.019, sigma=0.61, rho=-0.7)
    r, S0 = 0.0319, 100.0
    market = HestonInputs(
        REF, r, S0, true_params["v0"], true_params["kappa"], true_params["theta"],
        true_params["sigma"], true_params["rho"],
    )
    strikes = np.arange(60.0, 141.0, 5.0)
    expiries = [REF + dt.timedelta(days=d) for d in (90, 180, 365)]
    payoffs = [
        VanillaOption(K, e, European(), Call(), Spot()) for e in expiries for K in strikes
    ]
    method = CarrMadan(1.0, 32.0, HestonDynamics())
    quotes = [float(solve(PricingProblem(p, market), method).price) for p in payoffs]

    guess = [0.02, 3.0, 0.03, 0.4, -0.3]
    guess_market = HestonInputs(REF, r, S0, *guess)
    lenses = tuple(
        FieldLens(f"market_inputs.{name}") for name in ("V0", "kappa", "theta", "sigma", "rho")
    )
    calib = CalibrationProblem(
        BasketPricingProblem(payoffs, guess_market),
        jnp.asarray(quotes),
        jnp.asarray(guess),
        method,
        lenses,
    )
    lower = jnp.asarray([1e-5, 1e-3, 1e-5, 1e-3, -0.99])
    upper = jnp.asarray([1.0, 20.0, 1.0, 5.0, 0.99])
    result = solve(calib, OptimizerAlgo(max_iters=300), lb=lower, ub=upper)
    assert bool(result.converged)
    assert 0 < int(result.iterations) <= 300
    got = [float(v) for v in result.u]
    for g, (name, want) in zip(got, true_params.items()):
        assert g == pytest.approx(want, rel=1e-1), f"{name}: got {g}, want {want}"


def test_batched_implied_vol_roundtrip():
    T = jnp.asarray([[0.25, 0.25], [1.0, 1.0]])
    K = jnp.asarray([[90.0, 110.0], [90.0, 110.0]])
    sigma_true = jnp.asarray([[0.2, 0.3], [0.25, 0.35]])
    prices = iv_to_price_bs(sigma_true, K, T, 100.0, 0.02)
    ivs = implied_vol_bs(prices, K, T, 100.0, 0.02)
    np.testing.assert_allclose(np.asarray(ivs), np.asarray(sigma_true), atol=1e-10)


def test_implied_vol_gradient_ift():
    # d(sigma)/d(price) == 1/vega by the implicit function theorem
    price0 = float(iv_to_price_bs(0.25, 100.0, 1.0, 100.0, 0.02))
    g = jax.grad(lambda p: implied_vol_bs(p, 100.0, 1.0, 100.0, 0.02).sum())(
        jnp.asarray(price0)
    )
    vega = jax.grad(lambda s: iv_to_price_bs(s, 100.0, 1.0, 100.0, 0.02))(0.25)
    assert float(g) == pytest.approx(1.0 / float(vega), rel=1e-8)


def test_rect_vol_surface_from_prices_roundtrip():
    tenors = jnp.asarray([0.25, 0.5, 1.0])
    strikes = jnp.asarray([80.0, 100.0, 120.0])
    sigma_true = jnp.asarray([[0.30, 0.25, 0.28], [0.32, 0.26, 0.29], [0.34, 0.27, 0.30]])
    spot, r = 100.0, 0.03
    prices = iv_to_price_bs(sigma_true, strikes[None, :], tenors[:, None], spot, r)
    surf = rect_vol_surface_from_prices(REF, r, spot, tenors, strikes, prices)
    np.testing.assert_allclose(np.asarray(surf.vols), np.asarray(sigma_true), atol=1e-10)
    assert float(get_vol_yf(surf, 0.375, 90.0)) == pytest.approx(
        float(np.mean([0.30, 0.25, 0.32, 0.26])), abs=1e-10
    )


def test_argmin_ift_gradients():
    """argmin_ift reattaches gradients to a solved optimum via the implicit
    function theorem: for f(x, c) = |x - c|^2 + 0.1|x|^2, x*(c) = c/1.1 so
    dx*/dc = I/1.1 exactly; the while_loop optimizer itself is not
    reverse-differentiable (optax zoom linesearch)."""
    import jax
    import jax.numpy as jnp

    from hedgehog_tpu.math.optimize import argmin_ift, minimize_lbfgs

    def f(x, c):
        return jnp.sum((x - c) ** 2) + 0.1 * jnp.sum(x**2)

    c0 = jnp.array([0.5, 0.7])
    res = minimize_lbfgs(lambda x: f(x, c0), jnp.array([2.0, -1.0]), max_iters=60)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(c0) / 1.1, rtol=1e-6)

    def downstream(c):
        x_d = argmin_ift(f, res.x, c)
        return jnp.sum(x_d**2)

    g = jax.grad(downstream)(c0)
    # d/dc |x*(c)|^2 = 2 x* . dx*/dc = 2 (c/1.1) / 1.1
    expected = 2.0 * np.asarray(c0) / 1.1**2
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)
