"""Payoff tests mirroring reference test/unit/payoff.jl."""

import datetime as dt

import jax.numpy as jnp
import numpy as np
import pytest

from hedgehog_tpu import (
    BlackScholesInputs,
    Call,
    European,
    FlatRateCurve,
    Forward,
    Put,
    Spot,
    VanillaOption,
    df,
    parity_transform,
    to_ticks,
)


EXPIRY = dt.date(2021, 1, 1)


def test_call_put_indicator():
    assert Call()() == 1.0
    assert Put()() == -1.0


def test_intrinsic_values():
    call = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
    put = VanillaOption(100.0, EXPIRY, European(), Put(), Spot())
    assert float(call(110.0)) == 10.0
    assert float(call(90.0)) == 0.0
    assert float(put(90.0)) == 10.0
    assert float(put(110.0)) == 0.0


def test_intrinsic_vectorized():
    call = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
    spots = jnp.array([80.0, 100.0, 120.0])
    np.testing.assert_allclose(np.asarray(call(spots)), [0.0, 0.0, 20.0])


def test_expiry_converted_to_ticks():
    opt = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
    assert opt.expiry == to_ticks(EXPIRY)


def test_parity_transform():
    ref = dt.date(2020, 1, 1)
    curve = FlatRateCurve(ref, 0.05)
    call = VanillaOption(100.0, EXPIRY, European(), Call(), Spot())
    put = VanillaOption(100.0, EXPIRY, European(), Put(), Spot())
    call_price = 12.34
    spot = 105.0
    assert parity_transform(call_price, call, spot, curve) == call_price
    expected_put = call_price - spot + 100.0 * df(curve, to_ticks(EXPIRY))
    assert float(parity_transform(call_price, put, spot, curve)) == pytest.approx(
        float(expected_put)
    )


def test_forward_underlying_marker():
    opt = VanillaOption(100.0, EXPIRY, European(), Call(), Forward())
    assert isinstance(opt.underlying, Forward)
