"""Market-input containers for pricing models.

Parity target: reference src/market_inputs/market_inputs.jl.
``BlackScholesInputs`` auto-wraps scalar rate/vol into FlatRateCurve /
FlatVolSurface exactly like the reference convenience constructors
(market_inputs.jl:28-36); ``HestonInputs`` carries the five Heston parameters
plus spot and curve (market_inputs.jl:55-88).  All numeric fields are pytree
leaves, so whole input objects can be vmapped/differentiated.
"""

from __future__ import annotations

from typing import Any

from ..core.dates import to_ticks
from ..utils.pytree import pytree
from .rate_curve import FlatRateCurve, RateCurve
from .vol_surface import FlatVolSurface, RectVolSurface

__all__ = ["AbstractMarketInputs", "BlackScholesInputs", "HestonInputs"]


class AbstractMarketInputs:
    """Base marker for market-input containers (market_inputs.jl:6)."""


def _wrap_rate(rate, reference_date):
    if isinstance(rate, (FlatRateCurve, RateCurve)):
        return rate
    return FlatRateCurve(reference_date, rate)


def _wrap_vol(sigma, reference_date):
    if isinstance(sigma, (FlatVolSurface, RectVolSurface)):
        return sigma
    return FlatVolSurface(sigma, reference_date)


@pytree
class BlackScholesInputs(AbstractMarketInputs):
    """Black-Scholes market data: reference date (ticks), rate curve, spot,
    vol surface. Scalars for ``rate``/``sigma`` are auto-wrapped
    (market_inputs.jl:28-36)."""

    reference_date: Any
    rate: Any
    spot: Any
    sigma: Any

    def __post_init__(self):
        ref = to_ticks(self.reference_date)
        object.__setattr__(self, "reference_date", ref)
        object.__setattr__(self, "rate", _wrap_rate(self.rate, ref))
        object.__setattr__(self, "sigma", _wrap_vol(self.sigma, ref))


@pytree
class HestonInputs(AbstractMarketInputs):
    """Heston market data: dS/S = r dt + √V dW₁; dV = κ(θ−V) dt + σ√V dW₂,
    corr(dW₁,dW₂)=ρ (market_inputs.jl:55-88)."""

    reference_date: Any
    rate: Any
    spot: Any
    V0: Any
    kappa: Any
    theta: Any
    sigma: Any
    rho: Any

    def __post_init__(self):
        ref = to_ticks(self.reference_date)
        object.__setattr__(self, "reference_date", ref)
        object.__setattr__(self, "rate", _wrap_rate(self.rate, ref))
