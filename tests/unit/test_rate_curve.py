"""Rate-curve tests mirroring reference test/unit/rate_curve.jl."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedgehog_tpu import (
    FlatRateCurve,
    RateCurve,
    add_yearfrac,
    df,
    df_yf,
    forward_rate,
    spine_tenors,
    spine_zeros,
    to_ticks,
    zero_rate,
    zero_rate_yf,
)

REF = dt.date(2020, 1, 1)


def test_flat_curve_identities():
    curve = FlatRateCurve(REF, 0.03)
    t = add_yearfrac(to_ticks(REF), 2.0)
    assert float(zero_rate(curve, t)) == pytest.approx(0.03)
    assert float(df(curve, t)) == pytest.approx(np.exp(-0.03 * 2.0))
    assert float(df_yf(curve, 2.0)) == pytest.approx(np.exp(-0.06))
    assert float(zero_rate_yf(curve, 5.0)) == 0.03


def test_df_recovery_at_spine_points():
    tenors = np.array([0.5, 1.0, 2.0, 5.0, 10.0])
    dfs = np.exp(-0.02 * tenors**1.1)
    curve = RateCurve.from_dfs(REF, tenors, dfs)
    for tau, d in zip(tenors, dfs):
        assert float(df_yf(curve, tau)) == pytest.approx(float(d), abs=1e-12)
        assert float(zero_rate_yf(curve, tau)) == pytest.approx(
            float(-np.log(d) / tau), abs=1e-12
        )


def test_df_recovery_cubic():
    tenors = np.array([0.5, 1.0, 2.0, 5.0, 10.0])
    dfs = np.exp(-0.02 * tenors**1.1)
    curve = RateCurve.from_dfs(REF, tenors, dfs, interp="cubic")
    for tau, d in zip(tenors, dfs):
        assert float(df_yf(curve, tau)) == pytest.approx(float(d), abs=1e-12)


def test_constant_extrapolation():
    tenors = np.array([1.0, 2.0])
    dfs = np.array([np.exp(-0.02), np.exp(-0.06)])
    curve = RateCurve.from_dfs(REF, tenors, dfs)
    assert float(zero_rate_yf(curve, 0.25)) == pytest.approx(0.02)
    assert float(zero_rate_yf(curve, 30.0)) == pytest.approx(0.03)


def test_forward_rate():
    curve = FlatRateCurve(REF, 0.04)
    assert float(forward_rate(curve, 1.0, 2.0)) == pytest.approx(0.04)
    tenors = np.array([1.0, 2.0])
    zr = np.array([0.02, 0.03])
    curve2 = RateCurve(REF, jnp.asarray(tenors), jnp.asarray(zr))
    # fwd(1,2) = (z2*2 - z1*1) / (2-1) = 0.04
    assert float(forward_rate(curve2, 1.0, 2.0)) == pytest.approx(0.04)
    with pytest.raises(ValueError):
        forward_rate(curve2, 2.0, 1.0)


def test_ctor_validation():
    with pytest.raises(ValueError):
        RateCurve.from_dfs(REF, [], [])
    with pytest.raises(ValueError):
        RateCurve.from_dfs(REF, [1.0, 2.0], [0.9])
    with pytest.raises(ValueError):
        RateCurve.from_dfs(REF, [2.0, 1.0], [0.9, 0.8])
    with pytest.raises(ValueError):
        RateCurve.from_dfs(REF, [1.0, 2.0], [0.9, -0.1])


def test_spine_accessors():
    tenors = np.array([1.0, 2.0])
    dfs = np.array([0.98, 0.95])
    curve = RateCurve.from_dfs(REF, tenors, dfs)
    np.testing.assert_allclose(np.asarray(spine_tenors(curve)), tenors)
    np.testing.assert_allclose(np.asarray(spine_zeros(curve)), -np.log(dfs) / tenors)
    flat = FlatRateCurve(REF, 0.01)
    np.testing.assert_allclose(np.asarray(spine_zeros(flat)), [0.01])


def test_df_is_differentiable_wrt_spine():
    tenors = jnp.array([1.0, 2.0, 3.0])
    zr = jnp.array([0.02, 0.025, 0.03])

    def f(z):
        curve = RateCurve(REF, tenors, z)
        return df_yf(curve, 1.5)

    g = jax.grad(f)(zr)
    # bump middle pillar: df at 1.5y depends on z[0] and z[1] under linear interp
    assert float(g[0]) != 0.0 and float(g[1]) != 0.0
    assert float(g[2]) == 0.0
