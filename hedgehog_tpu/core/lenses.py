"""Lenses: functional read/write access to any parameter of a problem.

This is the cross-cutting mechanism of the whole framework (reference
src/greeks/greeks_problem.jl:9-130, src/pricing_methods/pricing_methods.jl:26-57,
Accessors.jl `@optic` usage in calibration.jl:79-83): Greeks and calibration
are both defined as "rewrite a parameter through a lens → re-solve →
differentiate/optimize".  In JAX, a lens is a pair (get, set) over frozen
pytree dataclasses; `set` rebuilds the object functionally so `jax.grad` of
``lambda x: solve(lens.set(prob, x), method).price`` differentiates the whole
pricing pipeline with respect to that parameter.

All lenses are hashable frozen dataclasses usable as dict keys
(BatchGreekProblem returns {lens: greek}).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..market.rate_curve import FlatRateCurve
from ..market.vol_surface import FlatVolSurface, RectVolSurface
from ..utils.pytree import pytree, static_field

__all__ = ["Lens", "FieldLens", "SpotLens", "VolLens", "ZeroRateSpineLens", "lens_get", "lens_set"]


class Lens:
    """Lens protocol: ``lens.get(obj)`` / ``lens.set(obj, value)``.

    Instances are also callable as getters, matching the reference's
    ``lens(prob)`` read syntax (greeks_problem.jl:31-33).
    """

    def get(self, obj: Any) -> Any:
        raise NotImplementedError

    def set(self, obj: Any, value: Any) -> Any:
        raise NotImplementedError

    def __call__(self, obj: Any) -> Any:
        return self.get(obj)


def _set_attr_path(obj: Any, parts: tuple[str, ...], value: Any) -> Any:
    if not parts:
        return value
    inner = _set_attr_path(getattr(obj, parts[0]), parts[1:], value)
    return dataclasses.replace(obj, **{parts[0]: inner})


@pytree
class FieldLens(Lens):
    """Generic dotted attribute-path lens — the `@optic _.a.b.c` replacement.

    Example: ``FieldLens("market_inputs.sigma.sigma")`` targets the flat vol
    (the reference's ``@optic _.market_inputs.sigma.σ``, vol_quotes.jl:545).
    """

    path: str = static_field(default="")

    def _parts(self) -> tuple[str, ...]:
        return tuple(self.path.split("."))

    def get(self, obj: Any) -> Any:
        for p in self._parts():
            obj = getattr(obj, p)
        return obj

    def set(self, obj: Any, value: Any) -> Any:
        return _set_attr_path(obj, self._parts(), value)


@pytree
class SpotLens(Lens):
    """Spot price of the market inputs (greeks_problem.jl:18-49)."""

    def get(self, prob: Any) -> Any:
        return prob.market_inputs.spot

    def set(self, prob: Any, value: Any) -> Any:
        return _set_attr_path(prob, ("market_inputs", "spot"), value)


@pytree
class VolLens(Lens):
    """Vol at (expiry-yearfrac, strike): flat surfaces ignore the coordinates;
    rect surfaces require an exact grid match (greeks_problem.jl:56-130)."""

    strike: Any = static_field(default=1)
    expiry: Any = static_field(default=1)

    def _indices(self, surf: RectVolSurface) -> tuple[int, int]:
        tenors = np.asarray(surf.tenors)
        strikes = np.asarray(surf.strikes)
        i = np.nonzero(tenors == self.expiry)[0]
        j = np.nonzero(strikes == self.strike)[0]
        if i.size == 0 or j.size == 0:
            raise KeyError(
                f"VolLens: no exact match for expiry={self.expiry} strike={self.strike} in RectVolSurface."
            )
        return int(i[0]), int(j[0])

    def get(self, prob: Any) -> Any:
        surf = prob.market_inputs.sigma
        if isinstance(surf, FlatVolSurface):
            return surf.sigma
        i, j = self._indices(surf)
        return surf.vols[i, j]

    def set(self, prob: Any, value: Any) -> Any:
        surf = prob.market_inputs.sigma
        if isinstance(surf, FlatVolSurface):
            new_surf = dataclasses.replace(surf, sigma=value)
        else:
            i, j = self._indices(surf)
            new_surf = surf.with_vols(jnp.asarray(surf.vols).at[i, j].set(value))
        return _set_attr_path(prob, ("market_inputs", "sigma"), new_surf)


@pytree
class ZeroRateSpineLens(Lens):
    """i-th zero-rate spine point of the rate curve; flat curves treat the
    constant rate as the single spine point (pricing_methods.jl:26-60)."""

    i: int = static_field(default=0)

    def get(self, prob: Any) -> Any:
        curve = prob.market_inputs.rate
        if isinstance(curve, FlatRateCurve):
            return curve.rate
        return curve.zero_rates[self.i]

    def set(self, prob: Any, value: Any) -> Any:
        curve = prob.market_inputs.rate
        if isinstance(curve, FlatRateCurve):
            new_curve = dataclasses.replace(curve, rate=value)
        else:
            new_curve = curve.with_zero_rates(jnp.asarray(curve.zero_rates).at[self.i].set(value))
        return _set_attr_path(prob, ("market_inputs", "rate"), new_curve)


def lens_get(prob: Any, lens: Lens) -> Any:
    return lens.get(prob)


def lens_set(prob: Any, lens: Lens, value: Any) -> Any:
    """Module-level ``set(prob, lens, value)`` mirroring the reference API."""
    return lens.set(prob, value)
