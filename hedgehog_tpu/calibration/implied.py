"""Implied volatility: scalar and batched (whole-surface) inversion.

Replaces the reference's per-point root-find loops:
- ``price_to_iv`` / ``iv_to_price`` (vol_quotes.jl:495-551) — scalar API with
  IFT-differentiable output;
- ``rect_vol_surface_from_prices`` (vol_surface.jl:188-242) — the calibrating
  RectVolSurface constructor, rebuilt as ONE vectorized bisection over the
  full (tenor × strike) grid instead of the reference's serial per-point
  ``CalibrationProblem`` solves (SURVEY §2c "instrument parallelism").

All functions work on the Black-Scholes closed form directly (the reference's
``iv_model`` default), with the bracket (1e-6, 5.0) of calibration.jl:143.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from ..core.dates import to_ticks, yearfrac
from ..core.payoffs import CallPut
from ..market.rate_curve import FlatRateCurve, RateCurve, zero_rate_yf
from ..market.vol_surface import RectVolSurface
from ..math.rootfind import implicit_root
from ..methods.black_scholes import bs_price

__all__ = ["implied_vol", "implied_vol_bs", "iv_to_price_bs", "rect_vol_surface_from_prices"]

IV_BRACKET = (1e-6, 5.0)


def iv_to_price_bs(iv, strike, T, spot, rate, cp=1.0):
    """Black-Scholes price from vol (flat rate ``rate``, ACT/365 ``T``).

    Vectorized over any broadcastable batch of arguments.
    """
    D = jnp.exp(-rate * T)
    F = spot / D
    return bs_price(F, strike, iv, T, D, cp)


def implied_vol_bs(price, strike, T, spot, rate, cp=1.0, *, iters: int = 80):
    """Batched Black-Scholes implied vol with IFT-correct gradients.

    ``price``/``strike``/``T``/``cp`` broadcast; one bisection inverts an
    entire quote grid in a single XLA program.
    """
    price, strike, T, cp = jnp.broadcast_arrays(
        jnp.asarray(price, jnp.float64),
        jnp.asarray(strike, jnp.float64),
        jnp.asarray(T, jnp.float64),
        jnp.asarray(cp, jnp.float64),
    )

    def f(sigma):
        return iv_to_price_bs(sigma, strike, T, spot, rate, cp) - price

    lo = jnp.full(price.shape, IV_BRACKET[0])
    hi = jnp.full(price.shape, IV_BRACKET[1])
    return implicit_root(f, lo, hi, iters=iters)


def rect_vol_surface_from_prices(
    reference_date,
    rate,
    spot,
    tenors,
    strikes,
    prices,
    *,
    call_put_matrix: Optional[Any] = None,
    interp_time: str = "linear",
    interp_strike: str = "linear",
) -> RectVolSurface:
    """Calibrate a RectVolSurface from an option price grid.

    ``tenors`` are ACT/365 year fractions from ``reference_date`` — or
    dates/datetimes, which are converted via ``yearfrac`` (the reference ctor
    accepts Periods/Dates the same way, vol_surface.jl:188-242).  ``rate`` may
    be a scalar, a FlatRateCurve, or a full RateCurve (the per-tenor zero rate
    enters the inversion).  ``prices`` has shape (len(tenors), len(strikes)).
    ``call_put_matrix`` holds ±1 indicators or Call()/Put() markers (defaults
    to all calls, matching vol_surface.jl:207-208).  The whole grid is
    inverted in one batched solve.
    """
    ref_ticks = to_ticks(reference_date)
    tenors = jnp.asarray(
        [
            yearfrac(ref_ticks, to_ticks(t)) if hasattr(t, "year") else t
            for t in tenors
        ],
        jnp.float64,
    )
    strikes = jnp.asarray(strikes, jnp.float64)
    prices = jnp.asarray(prices, jnp.float64)
    n_t, n_k = tenors.shape[0], strikes.shape[0]
    if prices.shape != (n_t, n_k):
        raise ValueError("Price matrix size must match (len(tenors), len(strikes))")

    if call_put_matrix is None:
        cp = jnp.ones((n_t, n_k))
    else:
        cp = jnp.asarray(
            [[x() if isinstance(x, CallPut) else x for x in row] for row in call_put_matrix],
            jnp.float64,
        )

    if isinstance(rate, FlatRateCurve):
        rate_val = rate.rate
    elif isinstance(rate, RateCurve) or hasattr(rate, "zero_rates"):
        # per-tenor zero rate from the curve enters each row's inversion
        rate_val = zero_rate_yf(rate, tenors)[:, None]
    else:
        rate_val = rate

    T_grid = jnp.broadcast_to(tenors[:, None], (n_t, n_k))
    K_grid = jnp.broadcast_to(strikes[None, :], (n_t, n_k))
    vols = implied_vol_bs(prices, K_grid, T_grid, spot, rate_val, cp)
    return RectVolSurface(
        ref_ticks,
        tenors,
        strikes,
        vols,
        interp_time=interp_time,
        interp_strike=interp_strike,
    )


# The reference exports `implied_vol` (src/Hedgehog.jl:79) but never defines
# it; here it is the batched Black-Scholes inversion.
implied_vol = implied_vol_bs
