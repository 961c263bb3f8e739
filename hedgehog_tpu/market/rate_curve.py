"""Rate curves: flat & interpolated zero curves with DF/zero/forward accessors.

Parity target: reference src/market_inputs/rate_curve.jl.  An interpolated
curve stores its zero-rate spine directly (year-fraction tenors + zero rates);
interpolation coefficients are recomputed at evaluation time so that bumping a
spine point (ZeroRateSpineLens) stays differentiable — the JAX replacement for
the reference's stored "builder" closure (rate_curve.jl:20-24).

All accessors are vectorized over time points and safe under jit/vmap/grad.
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp
import numpy as np

from ..core.dates import ACT365F, to_ticks, yearfrac
from ..math.interpolation import interp1d
from ..utils.pytree import pytree, static_field

__all__ = [
    "RateCurve",
    "FlatRateCurve",
    "df",
    "df_yf",
    "zero_rate",
    "zero_rate_yf",
    "forward_rate",
    "spine_tenors",
    "spine_zeros",
    "is_flat",
]


@pytree
class FlatRateCurve:
    """Constant continuously-compounded zero rate (rate_curve.jl:35-38).
    ``daycount`` (beyond-reference) sets the date→year-fraction convention
    for the date-taking accessors; default ACT/365 Fixed."""

    reference_date: Any
    rate: Any
    daycount: Any = static_field(default=ACT365F)

    def __post_init__(self):
        object.__setattr__(self, "reference_date", to_ticks(self.reference_date))


@pytree
class RateCurve:
    """Interpolated zero curve over year-fraction tenors (rate_curve.jl:20-24).

    Construct from discount factors with :meth:`from_dfs` (the validated
    ``zr = -log(dfs)/tenors`` constructor, rate_curve.jl:72-97), or directly
    from a zero-rate spine (the rebuild path used by lenses/calibration).
    """

    reference_date: Any
    tenors: Any  # (n,) year fractions, sorted
    zero_rates: Any  # (n,)
    interp: str = static_field(default="linear")
    daycount: Any = static_field(default=ACT365F)

    def __post_init__(self):
        object.__setattr__(self, "reference_date", to_ticks(self.reference_date))

    @classmethod
    def from_dfs(cls, reference_date, tenors, dfs, *, interp: str = "linear") -> "RateCurve":
        tenors_np = np.asarray(tenors, dtype=np.float64)
        dfs_np = np.asarray(dfs, dtype=np.float64)
        if tenors_np.size == 0:
            raise ValueError("Input 'tenors' cannot be empty.")
        if tenors_np.shape != dfs_np.shape:
            raise ValueError("Mismatched lengths for 'tenors' and 'dfs'.")
        if not np.all(np.diff(tenors_np) > 0):
            raise ValueError("'tenors' must be sorted strictly increasing.")
        if tenors_np[0] <= 0:
            # zr = -log(df)/tenor: a zero tenor would silently produce a
            # NaN/Inf spine point that poisons every interpolated lookup
            raise ValueError("First tenor must be positive.")
        if not np.all(dfs_np > 0):
            raise ValueError("All discount factors must be positive.")
        zr = -jnp.log(jnp.asarray(dfs)) / jnp.asarray(tenors)
        return cls(to_ticks(reference_date), jnp.asarray(tenors), zr, interp=interp)

    def with_zero_rates(self, zero_rates) -> "RateCurve":
        """Functional rebuild with a new zero-rate spine (lens-set path)."""
        return RateCurve(self.reference_date, self.tenors, zero_rates, interp=self.interp)


AnyRateCurve = Union[RateCurve, FlatRateCurve]


def zero_rate_yf(curve: AnyRateCurve, yf):
    """Zero rate at a year fraction (rate_curve.jl:207-208)."""
    if isinstance(curve, FlatRateCurve):
        return curve.rate if jnp.ndim(yf) == 0 else jnp.broadcast_to(curve.rate, jnp.shape(yf))
    return interp1d(yf, curve.tenors, curve.zero_rates, kind=curve.interp)


def zero_rate(curve: AnyRateCurve, t):
    """Zero rate at a tick timestamp or date (rate_curve.jl:182-197)."""
    return zero_rate_yf(
        curve, yearfrac(curve.reference_date, to_ticks(t), curve.daycount)
    )


def df_yf(curve: AnyRateCurve, yf):
    """Discount factor from a year fraction (rate_curve.jl:171-172)."""
    return jnp.exp(-zero_rate_yf(curve, yf) * yf)


def df(curve: AnyRateCurve, t):
    """Discount factor at a tick timestamp or date (rate_curve.jl:149-161)."""
    return df_yf(curve, yearfrac(curve.reference_date, to_ticks(t), curve.daycount))


def forward_rate(curve: AnyRateCurve, t1, t2):
    """Continuously-compounded forward rate between two year fractions or dates
    (rate_curve.jl:220-241).  Dates convert independently, so mixed
    (yearfrac, date) arguments are well-defined."""
    import datetime as _dt

    if isinstance(t1, (_dt.date, _dt.datetime)):
        t1 = yearfrac(curve.reference_date, t1, curve.daycount)
    if isinstance(t2, (_dt.date, _dt.datetime)):
        t2 = yearfrac(curve.reference_date, t2, curve.daycount)
    if isinstance(t1, (int, float)) and isinstance(t2, (int, float)) and t1 >= t2:
        raise ValueError("Start time must be before end time.")
    df1 = df_yf(curve, t1)
    df2 = df_yf(curve, t2)
    return jnp.log(df1 / df2) / (t2 - t1)


def spine_tenors(curve: AnyRateCurve):
    """x-values of the interpolator (rate_curve.jl:253; flat fallback :60)."""
    if isinstance(curve, FlatRateCurve):
        return jnp.asarray([0.0])
    return curve.tenors


def is_flat(curve: AnyRateCurve) -> bool:
    """True for constant-rate curves (reference export, src/Hedgehog.jl:72)."""
    return isinstance(curve, FlatRateCurve)


def spine_zeros(curve: AnyRateCurve):
    """y-values of the interpolator (rate_curve.jl:263; flat fallback :59)."""
    if isinstance(curve, FlatRateCurve):
        return jnp.asarray([curve.rate])
    return curve.zero_rates
