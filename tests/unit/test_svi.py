"""SVI implied-vol surface: raw-SVI slices, Gatheral-Jacquier no-arb
diagnostics, batched slice calibration, and composition with the pricers
(market/svi.py — beyond the reference's flat/rect surfaces)."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
S0, RATE = 100.0, 0.03
TENORS = jnp.array([0.25, 0.5, 1.0])
FWDS = S0 * jnp.exp(RATE * TENORS)
# a benign skewed surface: total variance grows in t, wings well-behaved
PARAMS = jnp.array(
    [
        [0.010, 0.10, -0.30, 0.00, 0.20],
        [0.018, 0.12, -0.35, 0.02, 0.25],
        [0.032, 0.14, -0.40, 0.05, 0.30],
    ]
)


def _surface(params=PARAMS):
    return hh.SVIVolSurface(REF, TENORS, params, FWDS)


def test_slice_eval_matches_raw_formula():
    surf = _surface()
    k = jnp.linspace(-0.4, 0.4, 9)
    K = FWDS[2] * jnp.exp(k)
    iv = hh.get_vol_yf(surf, 1.0, K)
    w = hh.svi_total_variance(tuple(PARAMS[2]), k)
    np.testing.assert_allclose(np.asarray(iv**2 * 1.0), np.asarray(w), rtol=1e-12)


def test_time_interpolation_is_linear_in_total_variance():
    surf = _surface()
    # linearity holds at fixed MONEYNESS k = log(K/F(t)) — strikes ride the
    # interpolated forward
    k = 0.08
    w25 = float(hh.get_vol_yf(surf, 0.25, surf.forward_at(0.25) * jnp.exp(k)) ** 2 * 0.25)
    w50 = float(hh.get_vol_yf(surf, 0.50, surf.forward_at(0.50) * jnp.exp(k)) ** 2 * 0.50)
    w375 = float(hh.get_vol_yf(surf, 0.375, surf.forward_at(0.375) * jnp.exp(k)) ** 2 * 0.375)
    np.testing.assert_allclose(w375, 0.5 * (w25 + w50), rtol=1e-10)
    # proportional-in-t extrapolation keeps IV constant at fixed k beyond
    # the last tenor (k is pinned by the extrapolated forward)
    K_far = float(surf.forward_at(2.0)) * jnp.exp(0.1)
    K_end = float(surf.forward_at(1.0)) * jnp.exp(0.1)
    np.testing.assert_allclose(
        float(hh.get_vol_yf(surf, 2.0, K_far)),
        float(hh.get_vol_yf(surf, 1.0, K_end)),
        rtol=1e-10,
    )


def test_no_arbitrage_diagnostics_pass_and_flag():
    bf, cal = hh.check_svi_arbitrage(_surface())
    assert bool(jnp.all(bf > 0.0)) and float(cal) > 0.0
    # calendar violation: swap the slices so total variance DECREASES
    bf2, cal2 = hh.check_svi_arbitrage(_surface(PARAMS[::-1]))
    assert float(cal2) < 0.0
    # butterfly violation: Axel Vogt's classic arbitrageable raw-SVI slice
    vogt = jnp.array([[-0.0410, 0.1331, 0.3060, 0.3586, 0.4153]])
    bf3, _ = hh.check_svi_arbitrage(
        hh.SVIVolSurface(REF, TENORS[:1], vogt, FWDS[:1])
    )
    assert float(bf3[0]) < 0.0


def test_batched_calibration_recovers_slices():
    strikes = jnp.exp(jnp.linspace(-0.35, 0.35, 15))[None, :] * FWDS[:, None]
    k = jnp.log(strikes / FWDS[:, None])
    w = jax.vmap(lambda p, kr: hh.svi_total_variance(tuple(p), kr))(PARAMS, k)
    ivs = jnp.sqrt(w / TENORS[:, None])
    params, loss, conv = hh.calibrate_svi_slices(TENORS, FWDS, strikes, ivs)
    assert bool(jnp.all(conv))
    np.testing.assert_allclose(np.asarray(params), np.asarray(PARAMS), atol=2e-4)
    assert float(jnp.max(loss)) < 1e-10
    # per-strike (m,) weights broadcast like strikes do — to every slice
    p_w, _, conv_w = hh.calibrate_svi_slices(
        TENORS, FWDS, strikes, ivs, weights=jnp.linspace(0.5, 1.5, ivs.shape[1]))
    assert bool(jnp.all(conv_w))
    np.testing.assert_allclose(np.asarray(p_w), np.asarray(PARAMS), atol=2e-3)


def test_prices_through_solve_with_param_gradients():
    opt = hh.VanillaOption(
        105.0, dt.date(2024, 7, 1), hh.European(), hh.Call(), hh.Spot()
    )

    def price_of(p):
        mkt = hh.BlackScholesInputs(REF, RATE, S0, hh.SVIVolSurface(REF, TENORS, p, FWDS))
        return hh.solve(hh.PricingProblem(opt, mkt), hh.BlackScholesAnalytic()).price

    p0 = float(price_of(PARAMS))
    # against a flat surface at the SVI vol for this (t, K): same price
    t = hh.yearfrac(REF, dt.date(2024, 7, 1))
    iv = float(hh.get_vol_yf(_surface(), t, 105.0))
    mkt_flat = hh.BlackScholesInputs(REF, RATE, S0, iv)
    p_flat = float(hh.solve(hh.PricingProblem(opt, mkt_flat), hh.BlackScholesAnalytic()).price)
    np.testing.assert_allclose(p0, p_flat, rtol=1e-12)
    g = jax.grad(price_of)(PARAMS)
    assert bool(jnp.all(jnp.isfinite(g)))
    # t ≈ 0.499 interpolates slices 0 and 1; the t=1 slice is untouched
    assert float(jnp.max(jnp.abs(g[1]))) > 0.0
    assert float(jnp.max(jnp.abs(g[2]))) == 0.0


def test_svi_feeds_dupire_local_vol():
    mkt = hh.BlackScholesInputs(REF, RATE, S0, _surface())
    lv = hh.dupire_local_vol(mkt, 0.5, 100.0)
    assert bool(jnp.isfinite(lv)) and 0.05 < float(lv) < 1.0
