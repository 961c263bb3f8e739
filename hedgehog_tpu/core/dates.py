"""Time & day-count substrate: int64 millisecond "ticks" + ACT/365 year fractions.

Parity target: reference src/date_functions.jl.  The reference measures all
maturities as milliseconds since the proleptic-Gregorian epoch 0000-01-01T00:00
(Julia Dates epoch) and converts to ACT/365 year fractions for all math
(src/date_functions.jl:1-3, :54-58, :87-89).  We keep the identical epoch and
constants so golden values and tick-based theta conventions carry over exactly.

TPU note: tick magnitudes (~6.4e13 for modern dates) overflow float32, so ticks
stay int64/float64 at the API boundary; kernels only ever see year fractions.
``yearfrac``/``add_yearfrac`` are jnp-traceable (AD-compatible — theta is
defined as a derivative against expiry *in ticks*, reference
src/greeks/greeks_problem.jl:472-475).
"""

from __future__ import annotations

import datetime as _dt
from typing import Union

__all__ = [
    "SECONDS_IN_YEAR_365",
    "MILLISECONDS_IN_YEAR_365",
    "MILLISECONDS_IN_DAY",
    "to_ticks",
    "yearfrac",
    "add_yearfrac",
    "ticks_to_datetime",
]

SECONDS_IN_YEAR_365 = 365 * 86400
MILLISECONDS_IN_YEAR_365 = SECONDS_IN_YEAR_365 * 1000
MILLISECONDS_IN_DAY = 86400_000

# Python's date.toordinal() counts days with 0001-01-01 == 1; the Julia Dates
# epoch is 0000-01-01 and year 0 is a leap year (366 days), so the offset
# between the two conventions is a constant 365 days.
_ORDINAL_OFFSET_DAYS = 365

DateLike = Union[int, float, _dt.date, _dt.datetime]


def to_ticks(x: DateLike):
    """Convert a date/datetime/numeric timestamp to ms-since-0000-01-01 ticks.

    Numbers pass through unchanged (already ticks) — mirrors the reference's
    normalization of mixed inputs (src/date_functions.jl:15-41).  Traced JAX
    values pass through as-is.
    """
    if isinstance(x, _dt.datetime):
        days = x.toordinal() + _ORDINAL_OFFSET_DAYS
        ms = (
            days * MILLISECONDS_IN_DAY
            + x.hour * 3_600_000
            + x.minute * 60_000
            + x.second * 1000
            + x.microsecond // 1000
        )
        return ms
    if isinstance(x, _dt.date):
        return (x.toordinal() + _ORDINAL_OFFSET_DAYS) * MILLISECONDS_IN_DAY
    return x  # numeric or traced: already ticks


def yearfrac(start: DateLike, stop: DateLike):
    """ACT/365 year fraction between two time points (dates or ticks)."""
    ms_start = to_ticks(start)
    ms_stop = to_ticks(stop)
    return (ms_stop - ms_start) / MILLISECONDS_IN_YEAR_365


def add_yearfrac(t: DateLike, yf):
    """Add an ACT/365 year fraction to a timestamp; returns float ticks.

    AD-compatible (pure arithmetic), matching src/date_functions.jl:87-89.
    """
    return to_ticks(t) + yf * MILLISECONDS_IN_YEAR_365


def ticks_to_datetime(ticks: Union[int, float]) -> _dt.datetime:
    """Inverse of :func:`to_ticks` for concrete (non-traced) values."""
    ticks = int(ticks)
    days, ms = divmod(ticks, MILLISECONDS_IN_DAY)
    base = _dt.datetime.fromordinal(days - _ORDINAL_OFFSET_DAYS)
    return base + _dt.timedelta(milliseconds=ms)
