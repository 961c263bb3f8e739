"""Complex log I_ν(z) accuracy vs scipy.special.iv (the reference delegates to
SpecialFunctions.besseli, heston.jl:174,207 — scipy's AMOS backend is the
equivalent oracle)."""

import numpy as np
import pytest
import scipy.special as sp
import jax.numpy as jnp

from hedgehog_tpu.math.besseli import log_besseli_complex

# ν = 2κθ/σ² − 1 for Heston; 39 covers κ=5, θ=0.04, σ=0.1 and 89/200 stress
# far beyond any market calibration
NUS = [-0.9, -0.5, 0.0, 0.5, 3.0, 15.0, 39.0, 89.0, 200.0]


def _grid(n, seed):
    rng = np.random.default_rng(seed)
    absz = np.exp(rng.uniform(np.log(0.05), np.log(500), n))
    th = rng.uniform(-np.pi, np.pi, n)
    return absz, th


@pytest.mark.parametrize("nu", NUS)
def test_vs_scipy_principal_branch(nu):
    absz, th = _grid(1500, seed=int(10 * abs(nu)) + 3)
    z = absz * np.exp(1j * th)
    ref = sp.iv(nu, z)
    got = np.asarray(log_besseli_complex(nu, jnp.array(absz), jnp.array(th)))
    with np.errstate(all="ignore"):
        rel = np.abs(np.exp(got - np.log(ref)) - 1.0)
    ok = np.isfinite(ref) & (np.abs(ref) > 1e-280)
    # includes the Airy wedge near the turning point z = ±iν (covered by the
    # downward-recurrence branch)
    assert np.nanmax(rel[ok]) < 5e-8


def test_unwrapped_angle_continuation():
    """I_ν(z·e^{2πik}) = e^{2πikν}·I_ν(z): the unwrapped-angle input must
    reproduce the exact analytic continuation (heston.jl:220-238)."""
    absz = jnp.array([0.5, 5.0, 50.0, 200.0])
    th = jnp.array([0.7, -1.2, 2.9, 0.1])
    for nu in (-0.5, 0.5, 3.3, 39.0):
        a = np.asarray(log_besseli_complex(nu, absz, th))
        for k in (1, -2):
            b = np.asarray(log_besseli_complex(nu, absz, th + 2 * np.pi * k))
            np.testing.assert_allclose(b - a, 1j * nu * 2 * np.pi * k, atol=1e-10)


def test_real_axis_positive():
    """On the positive real axis log I_ν must be real and match scipy ive."""
    x = np.array([0.1, 1.0, 7.0, 40.0, 120.0, 400.0])
    for nu in (0.0, 2.5, 15.0):
        got = np.asarray(log_besseli_complex(nu, jnp.array(x), jnp.zeros_like(x)))
        ref = np.log(sp.ive(nu, x)) + x  # scaled to avoid overflow
        np.testing.assert_allclose(np.real(got), ref, rtol=1e-9)
        np.testing.assert_allclose(np.imag(got), 0.0, atol=1e-9)


def test_large_order_moderate_argument():
    """|z| ≪ ν regime (deep monotonic region): no cancellation, high accuracy
    even for large orders."""
    for nu in (39.0, 89.0, 200.0):
        absz = np.linspace(0.1, 0.6 * nu, 40)
        th = np.linspace(-np.pi, np.pi, 40, endpoint=False)
        ref = sp.iv(nu, absz * np.exp(1j * th))
        got = np.asarray(log_besseli_complex(nu, jnp.array(absz), jnp.array(th)))
        ok = np.abs(ref) > 1e-280
        with np.errstate(all="ignore"):
            rel = np.abs(np.exp(got - np.log(ref)) - 1.0)
        assert np.nanmax(rel[ok]) < 1e-8
