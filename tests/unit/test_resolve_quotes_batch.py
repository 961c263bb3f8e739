"""Batched quote-surface resolution vs the scalar VolQuote.build path
(vol_quotes.jl:420-493 semantics, resolved as ONE XLA program), plus the
RectVolSurface price-ctor parity items: curve rates and date tenors
(vol_surface.jl:188-242)."""

import datetime as dt
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.market.vol_quotes import resolve_quotes_batch

REF = dt.date(2024, 1, 1)
NAN = float("nan")


def _expiry(yf):
    return hh.add_yearfrac(hh.to_ticks(REF), yf)


def test_batch_matches_scalar_build():
    """A 3×4 grid with mixed missing bids/asks resolves identically to twelve
    scalar VolQuote.build calls."""
    strikes = np.array([90.0, 100.0, 110.0, 120.0])
    tenors = np.array([0.25, 1.0, 2.0])
    spot, r = 100.0, 0.03
    K, T = np.meshgrid(strikes, tenors)
    expiries = np.vectorize(_expiry)(T)

    true_iv = 0.2 + 0.05 * (K / spot - 1.0)  # a smile
    mid_price = np.asarray(
        hh.iv_to_price_bs(jnp.array(true_iv), jnp.array(K), jnp.array(T), spot, r)
    )
    bid_iv = true_iv - 0.01
    ask_price = mid_price * 1.02
    # knock out a few entries
    bid_iv[0, 0] = NAN
    ask_price[2, 3] = NAN

    res = resolve_quotes_batch(
        jnp.array(K),
        jnp.array(expiries),
        hh.SpotObs(spot),
        r,
        REF,
        mid_price=jnp.array(mid_price),
        bid_iv=jnp.array(bid_iv),
        ask_price=jnp.array(ask_price),
    )

    for i in range(3):
        for j in range(4):
            payoff = hh.VanillaOption(
                float(K[i, j]), float(expiries[i, j]), hh.European(), hh.Call(), hh.Spot()
            )
            q = hh.VolQuote.build(
                payoff,
                hh.SpotObs(spot),
                r,
                mid_price=float(mid_price[i, j]),
                bid_iv=float(bid_iv[i, j]),
                ask_price=float(ask_price[i, j]),
                reference_date=REF,
            )
            for got, want in (
                (res.mid_iv[i, j], q.mid_iv),
                (res.bid_price[i, j], q.bid_price),
                (res.ask_iv[i, j], q.ask_iv),
                (res.mid_price[i, j], q.mid_price),
            ):
                g, w = float(got), float(want)
                if np.isnan(w):
                    assert np.isnan(g), (i, j)
                else:
                    assert g == pytest.approx(w, rel=1e-6, abs=1e-8), (i, j)


def test_batch_normalized_input():
    """Forward-normalized prices (price/F) are denormalized per-lane."""
    strikes = jnp.array([95.0, 105.0])
    expiries = jnp.array([_expiry(1.0), _expiry(1.0)])
    spot, r = 100.0, 0.05
    T = jnp.array([1.0, 1.0])
    F = spot * float(jnp.exp(r * 1.0))
    abs_price = np.asarray(hh.iv_to_price_bs(0.2, strikes, T, spot, r))
    cfg = hh.VolQuoteConfig(normalized_input=True)
    res = resolve_quotes_batch(
        strikes, expiries, hh.SpotObs(spot), r, REF,
        mid_price=jnp.array(abs_price) / F, config=cfg,
    )
    np.testing.assert_allclose(np.asarray(res.mid_iv), 0.2, atol=1e-8)


def test_batch_inconsistency_policy():
    strikes = jnp.array([100.0])
    expiries = jnp.array([_expiry(1.0)])
    with pytest.raises(ValueError, match="Inconsistent"):
        resolve_quotes_batch(
            strikes, expiries, hh.SpotObs(100.0), 0.03, REF,
            mid_price=jnp.array([8.0]), mid_iv=jnp.array([0.5]),
            config=hh.VolQuoteConfig(vol_price_inconsistency_handling="throw"),
        )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        resolve_quotes_batch(
            strikes, expiries, hh.SpotObs(100.0), 0.03, REF,
            mid_price=jnp.array([8.0]), mid_iv=jnp.array([0.5]),
        )
    assert any("Inconsistent" in str(x.message) for x in w)


def test_batch_monotonicity_policy():
    strikes = jnp.array([100.0])
    expiries = jnp.array([_expiry(1.0)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        resolve_quotes_batch(
            strikes, expiries, hh.SpotObs(100.0), 0.03, REF,
            bid_price=jnp.array([9.0]), mid_price=jnp.array([8.5]),
            ask_price=jnp.array([9.5]),
        )
    assert any("monotonicity" in str(x.message) for x in w)


def test_batch_missing_mid_policy():
    strikes = jnp.array([100.0])
    expiries = jnp.array([_expiry(1.0)])
    with pytest.raises(ValueError, match="neither"):
        resolve_quotes_batch(
            strikes, expiries, hh.SpotObs(100.0), 0.03, REF,
            bid_price=jnp.array([8.0]),
        )


def test_batch_forward_obs():
    """ForwardObs quotes resolve against S = F·D."""
    strikes = jnp.array([100.0])
    expiries = jnp.array([_expiry(1.0)])
    r = 0.05
    F = 100.0 * float(jnp.exp(r * 1.0))
    p = np.asarray(hh.iv_to_price_bs(0.25, 100.0, 1.0, 100.0, r))
    res = resolve_quotes_batch(
        strikes, expiries, hh.ForwardObs(F), r, REF, mid_price=jnp.array([float(p)])
    )
    assert float(res.mid_iv[0]) == pytest.approx(0.25, abs=1e-8)


# ------------------- RectVolSurface price-ctor parity -------------------


def test_surface_ctor_curve_rates():
    """Building off a non-flat RateCurve must match per-point scalar
    inversion at each tenor's own zero rate."""
    tenors = [0.5, 1.0, 2.0]
    strikes = [90.0, 100.0, 110.0]
    spot = 100.0
    curve = hh.RateCurve(
        hh.to_ticks(REF), jnp.array(tenors), jnp.array([0.02, 0.03, 0.045])
    )
    true_vols = np.array([[0.25, 0.2, 0.22], [0.24, 0.21, 0.23], [0.26, 0.22, 0.24]])
    rates = np.array([0.02, 0.03, 0.045])
    prices = np.zeros((3, 3))
    for i, (T, r) in enumerate(zip(tenors, rates)):
        for j, K in enumerate(strikes):
            prices[i, j] = float(hh.iv_to_price_bs(true_vols[i, j], K, T, spot, r))

    surf = hh.rect_vol_surface_from_prices(REF, curve, spot, tenors, strikes, jnp.array(prices))
    for i, T in enumerate(tenors):
        for j, K in enumerate(strikes):
            got = float(hh.get_vol_yf(surf, T, K))
            assert got == pytest.approx(true_vols[i, j], abs=1e-7), (i, j)


def test_surface_ctor_date_tenors():
    """Date-typed tenors convert via ACT/365 yearfrac."""
    dates = [dt.date(2024, 7, 1), dt.date(2025, 1, 1)]
    yfs = [hh.yearfrac(REF, d) for d in dates]
    strikes = [95.0, 105.0]
    spot, r = 100.0, 0.03
    prices = np.array(
        [[float(hh.iv_to_price_bs(0.2, K, T, spot, r)) for K in strikes] for T in yfs]
    )
    surf_dates = hh.rect_vol_surface_from_prices(REF, r, spot, dates, strikes, jnp.array(prices))
    surf_yfs = hh.rect_vol_surface_from_prices(REF, r, spot, yfs, strikes, jnp.array(prices))
    for T in yfs:
        for K in strikes:
            assert float(hh.get_vol_yf(surf_dates, T, K)) == pytest.approx(
                float(hh.get_vol_yf(surf_yfs, T, K)), abs=1e-12
            )


def test_batch_validation_mirrors_scalar_build():
    """Expired rows / nonpositive underlying raise, matching VolQuote.build
    (previously the batch path silently produced garbage IVs)."""
    import datetime as dt

    import jax.numpy as jnp
    import pytest

    from hedgehog_tpu import SpotObs, resolve_quotes_batch, to_ticks

    ref = dt.date(2024, 6, 1)
    good = to_ticks(dt.date(2024, 12, 1))
    bad = to_ticks(dt.date(2024, 1, 1))  # before reference date
    with pytest.raises(ValueError, match="after reference_date"):
        resolve_quotes_batch(
            jnp.array([100.0, 100.0]), jnp.array([good, bad], dtype=jnp.float64),
            SpotObs(100.0), 0.03, ref, mid_price=jnp.array([5.0, 5.0]),
        )
    with pytest.raises(ValueError, match="positive"):
        resolve_quotes_batch(
            jnp.array([100.0]), jnp.array([good], dtype=jnp.float64),
            SpotObs(-1.0), 0.03, ref, mid_price=jnp.array([5.0]),
        )
