"""Vol-surface tests mirroring reference test/unit/vol_surface.jl."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hedgehog_tpu import (
    FlatVolSurface,
    Interpolator2D,
    RectVolSurface,
    add_yearfrac,
    get_vol,
    get_vol_yf,
    to_ticks,
)

REF = dt.date(2020, 1, 1)


def test_flat_surface():
    surf = FlatVolSurface(0.25, REF)
    assert get_vol(surf, dt.date(2021, 1, 1), 100.0) == 0.25
    assert get_vol_yf(surf, 0.5, 1.0) == 0.25


def make_surface():
    tenors = jnp.array([0.25, 0.5, 1.0])
    strikes = jnp.array([80.0, 100.0, 120.0])
    vols = jnp.array(
        [
            [0.30, 0.25, 0.28],
            [0.32, 0.26, 0.29],
            [0.34, 0.27, 0.30],
        ]
    )
    return RectVolSurface(REF, tenors, strikes, vols)


def test_grid_point_recovery():
    surf = make_surface()
    for i, t in enumerate([0.25, 0.5, 1.0]):
        for j, k in enumerate([80.0, 100.0, 120.0]):
            assert float(get_vol_yf(surf, t, k)) == pytest.approx(
                float(surf.vols[i, j]), abs=1e-14
            )


def test_bilinear_interior():
    surf = make_surface()
    # midpoint between (0.25, 80) and (0.5, 100) grid cell
    v = get_vol_yf(surf, 0.375, 90.0)
    expected = np.mean([0.30, 0.25, 0.32, 0.26])
    assert float(v) == pytest.approx(expected)


def test_constant_extrapolation_both_axes():
    surf = make_surface()
    assert float(get_vol_yf(surf, 0.01, 80.0)) == pytest.approx(0.30)
    assert float(get_vol_yf(surf, 5.0, 120.0)) == pytest.approx(0.30)
    assert float(get_vol_yf(surf, 0.25, 10.0)) == pytest.approx(0.30)
    assert float(get_vol_yf(surf, 1.0, 500.0)) == pytest.approx(0.30)


def test_get_vol_with_dates():
    surf = make_surface()
    expiry = add_yearfrac(to_ticks(REF), 0.5)
    assert float(get_vol(surf, expiry, 100.0)) == pytest.approx(0.26)


def test_interpolator2d_api():
    x_vals = jnp.array([1.0, 2.0])
    y_vals = jnp.array([10.0, 20.0])
    values = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    itp = Interpolator2D(x_vals, y_vals, values)
    assert float(itp[1.0, 10.0]) == 1.0
    assert float(itp[1.5, 15.0]) == pytest.approx(2.5)
    assert float(itp[0.0, 0.0]) == 1.0  # clamped both axes


def test_vol_lookup_differentiable_wrt_grid():
    surf = make_surface()

    def f(vols):
        return get_vol_yf(surf.with_vols(vols), 0.375, 90.0)

    g = jax.grad(f)(surf.vols)
    assert float(jnp.sum(g)) == pytest.approx(1.0)  # interpolation weights sum to 1
    assert float(g[0, 0]) == pytest.approx(0.25)
