"""Generic CF-inversion sampler: recover known nonnegative laws from their
characteristic functions alone (reference sample_from_cf.jl:27-135)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import gammainc

from hedgehog_tpu.distributions.sample_from_cf import (
    cdf_from_cf,
    cdf_series_weights,
    invert_cdf_series,
    moments_from_cf,
    sample_from_cf,
    truncation_error_estimate,
)

K_SHAPE, THETA = 2.5, 1.3  # Gamma(k, θ): cf(a) = (1 − iθa)^{−k}


def gamma_cf(a):
    return (1.0 - 1j * THETA * a) ** (-K_SHAPE)


def gamma_cdf(x):
    return gammainc(K_SHAPE, x / THETA)


def test_moments_from_cf():
    mean, std = moments_from_cf(gamma_cf)
    # central differences at h0=1e-2 carry O(h0²·m3) bias (sample_from_cf.jl:50)
    assert float(mean) == pytest.approx(K_SHAPE * THETA, rel=2e-3)
    assert float(std) == pytest.approx(np.sqrt(K_SHAPE) * THETA, rel=1e-2)


def test_cdf_from_cf_matches_gammainc():
    series = cdf_series_weights(gamma_cf, n_terms=256)
    x = jnp.linspace(0.05, 12.0, 200)
    got = cdf_from_cf(x, series)
    np.testing.assert_allclose(np.asarray(got), np.asarray(gamma_cdf(x)), atol=2e-3)


def test_invert_cdf_roundtrip():
    series = cdf_series_weights(gamma_cf, n_terms=256)
    u = jnp.linspace(0.02, 0.98, 97)
    x = invert_cdf_series(u, series)
    np.testing.assert_allclose(np.asarray(gamma_cdf(x)), np.asarray(u), atol=2e-3)


def test_sample_from_cf_ks():
    """KS distance of 40k draws vs the analytic Gamma CDF."""
    xs = sample_from_cf(jax.random.PRNGKey(0), gamma_cf, 40_000, n_terms=256)
    xs = np.sort(np.asarray(xs))
    emp = (np.arange(1, xs.size + 1) - 0.5) / xs.size
    ks = np.max(np.abs(np.asarray(gamma_cdf(jnp.array(xs))) - emp))
    assert ks < 0.012  # ~1.63/√n + series tolerance


def test_exponential_law():
    """Exponential(λ=0.7): cf(a) = λ/(λ − ia)."""
    lam = 0.7

    def cf(a):
        return lam / (lam - 1j * a)

    series = cdf_series_weights(cf, n_terms=512)
    x = jnp.linspace(0.05, 8.0, 100)
    np.testing.assert_allclose(
        np.asarray(cdf_from_cf(x, series)), np.asarray(1.0 - jnp.exp(-lam * x)), atol=5e-3
    )


def test_truncation_error_estimate_orders():
    """The tail estimate must flag a too-short series and pass a long one."""
    short = cdf_series_weights(gamma_cf, n_terms=8)
    long = cdf_series_weights(gamma_cf, n_terms=512)
    e_short = float(truncation_error_estimate(short))
    e_long = float(truncation_error_estimate(long))
    assert e_long < 1e-3 < e_short * 50  # short series visibly worse
    assert e_long < e_short / 10


def test_stateful_cf_carry_threading():
    """A CF with a carry must see strictly increasing frequencies (the BK
    angle-unwrap contract): the carry counts evaluations."""

    def cf(a, count):
        return gamma_cf(a), count + 1.0

    series = cdf_series_weights(cf, n_terms=64, carry0=jnp.float64(0.0))
    x = jnp.linspace(0.1, 8.0, 50)
    np.testing.assert_allclose(
        np.asarray(cdf_from_cf(x, series)), np.asarray(gamma_cdf(x)), atol=5e-3
    )


def test_batched_cf():
    """A batched CF (one law per lane) builds per-lane series."""
    thetas = jnp.array([0.5, 1.0, 2.0])

    def cf(a):
        return (1.0 - 1j * thetas * a) ** (-K_SHAPE)

    series = cdf_series_weights(cf, n_terms=256)
    assert series.weights.shape == (256, 3)
    x = jnp.full((3,), 2.0)
    got = cdf_from_cf(x, series)
    want = gammainc(K_SHAPE, 2.0 / thetas)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)
