"""Dupire local volatility — beyond-reference model family (the reference
carries the implied-vol surface machinery, src/market_inputs/vol_surface.jl,
but no local-vol model on top of it).

``dupire_local_vol`` evaluates σ_loc(K, t) from a market's implied-vol
surface in Gatheral's total-variance form: with w(t, y) = σ_imp(K, t)²·t on
log-moneyness y = ln(K/F_t),

    σ_loc² = ∂_t w / [1 − (y/w)·∂_y w
                      + ¼(−¼ − 1/w + y²/w²)(∂_y w)²
                      + ½·∂²_yy w]

All derivatives are exact JAX derivatives of the interpolated surface
(``get_vol_yf`` — use cubic strike interpolation so ∂²_yy is meaningful;
linear interpolation has zero second derivative between knots and kinks at
them).  The denominator and ∂_t w are clamped positive: real interpolated
surfaces can locally violate no-arbitrage, and a clamped (rather than NaN)
local vol keeps the MC defined — the Dupire round-trip test bounds the
damage.  A flat surface reduces EXACTLY to σ_loc = σ (w = σ²t: ∂_t w = σ²,
y-derivatives vanish).

The model composes through ``MonteCarlo(LocalVolDynamics(),
EulerMaruyama(), cfg)`` on ordinary :class:`BlackScholesInputs` markets
whose ``sigma`` is a :class:`RectVolSurface` — by construction the LV
Monte Carlo reprices the vanillas the surface was built from (the defining
Dupire property, tested in tests/unit/test_local_vol.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..market.inputs import carry_yield
from ..market.rate_curve import df_yf
from ..market.vol_surface import FlatVolSurface, get_vol_yf

__all__ = ["dupire_local_vol"]

#: clamps: w below this behaves as the t→0 short-expiry limit; the Dupire
#: denominator below this flags a (local) butterfly-arbitrage violation of
#: the interpolated surface and is floored rather than allowed to blow up
_W_FLOOR = 1e-8
_DENOM_FLOOR = 1e-3
_T_FLOOR = 1e-4


def dupire_local_vol(market, t, strike):
    """σ_loc(strike, t) from ``market``'s implied-vol surface (Dupire /
    Gatheral total-variance form; exact AD surface derivatives).  Scalar in
    (t, strike) — vmap for path vectors.  Flat surfaces return σ exactly."""
    if isinstance(market.sigma, FlatVolSurface):
        return market.sigma.sigma

    t = jnp.maximum(t, _T_FLOOR)

    def w_of(t_, y_):
        # K at fixed log-moneyness y: K = F(t)·e^y, F(t) = spot/D(t)
        f_t = market.spot * jnp.exp(-carry_yield(market) * t_) / df_yf(market.rate, t_)
        k_ = f_t * jnp.exp(y_)
        sig = get_vol_yf(market.sigma, t_, k_)
        return sig * sig * t_

    f_t = market.spot * jnp.exp(-carry_yield(market) * t) / df_yf(market.rate, t)
    y = jnp.log(strike / f_t)

    w = w_of(t, y)
    dw_dt = jax.grad(w_of, argnums=0)(t, y)
    dw_dy = jax.grad(w_of, argnums=1)(t, y)
    d2w_dy2 = jax.grad(jax.grad(w_of, argnums=1), argnums=1)(t, y)

    w_s = jnp.maximum(w, _W_FLOOR)
    denom = (1.0 - (y / w_s) * dw_dy
             + 0.25 * (-0.25 - 1.0 / w_s + (y / w_s) ** 2) * dw_dy**2
             + 0.5 * d2w_dy2)
    var = jnp.maximum(dw_dt, _W_FLOOR) / jnp.maximum(denom, _DENOM_FLOOR)
    return jnp.sqrt(var)
