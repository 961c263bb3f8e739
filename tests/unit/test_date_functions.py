"""Date/tick tests mirroring reference test/unit/date_functions.jl."""

import datetime as dt

import pytest

from hedgehog_tpu import (
    MILLISECONDS_IN_DAY,
    MILLISECONDS_IN_YEAR_365,
    SECONDS_IN_YEAR_365,
    add_yearfrac,
    ticks_to_datetime,
    to_ticks,
    yearfrac,
)


def test_constants():
    assert SECONDS_IN_YEAR_365 == 365 * 86400
    assert MILLISECONDS_IN_YEAR_365 == 365 * 86400 * 1000
    assert MILLISECONDS_IN_DAY == 86400000


def test_to_ticks_epoch_convention():
    # Julia Dates epoch: 0000-01-01. Dates.value(Date(2020,1,1)) == 737790 days.
    assert to_ticks(dt.date(2020, 1, 1)) == 737790 * MILLISECONDS_IN_DAY
    # 0001-01-01 is day 366 of the proleptic Gregorian calendar (year 0 is leap).
    assert to_ticks(dt.date(1, 1, 1)) == 366 * MILLISECONDS_IN_DAY


def test_to_ticks_datetime_and_real_passthrough():
    d = dt.datetime(2020, 1, 1, 12, 0, 0)
    assert to_ticks(d) == to_ticks(dt.date(2020, 1, 1)) + 12 * 3600 * 1000
    assert to_ticks(12345) == 12345
    assert to_ticks(1.5) == 1.5


def test_yearfrac_act365():
    d0 = dt.date(2020, 1, 1)
    d1 = dt.date(2021, 1, 1)  # 366 days (2020 is a leap year)
    assert yearfrac(d0, d1) == pytest.approx(366 / 365)
    d2 = dt.date(2022, 1, 1)
    assert yearfrac(d1, d2) == pytest.approx(1.0)
    # antisymmetric
    assert yearfrac(d1, d0) == pytest.approx(-366 / 365)


def test_add_yearfrac_roundtrip():
    t0 = to_ticks(dt.date(2020, 1, 1))
    t1 = add_yearfrac(t0, 0.5)
    assert yearfrac(t0, t1) == pytest.approx(0.5)
    # through datetime conversion
    assert ticks_to_datetime(t1) == dt.datetime(2020, 1, 1) + dt.timedelta(
        milliseconds=0.5 * MILLISECONDS_IN_YEAR_365
    )


def test_yearfrac_mixed_inputs():
    d0 = dt.date(2020, 1, 1)
    assert yearfrac(to_ticks(d0), d0) == 0.0
    assert yearfrac(d0, to_ticks(d0) + MILLISECONDS_IN_YEAR_365) == pytest.approx(1.0)
