"""Sample any nonnegative random variable from its characteristic function.

Generic, fully-batched port of the reference's CF-inversion machinery
(src/distributions/sample_from_cf.jl:27-135): moment-matched frequency step,
trapezoid Fourier CDF series, and CDF inversion — redesigned for XLA:

- the reference truncates the CDF series adaptively (tolerance break at up to
  1e9 terms, sample_from_cf.jl:84-96); here the series has a *static* term
  count and `truncation_error_estimate` reports the tail magnitude so callers
  can check (and tests pin) the accuracy contract instead;
- the reference inverts with Newton→bisection→clamp fallbacks (:105-135);
  here a fixed-trip bisection on [0, mean + hi_mult·std] is branchless and
  batched over every draw at once.

The CF may be *stateful*: `cf(a, carry) -> (φ(a), carry)` with the carry
threaded through evaluations in increasing-frequency order — this is how the
Broadie-Kaya ∫V CF threads its Bessel angle-unwrapping state
(heston.jl:184-212).  Stateless CFs are wrapped automatically.

Everything assumes P(X ≥ 0) = 1 and φ(0) = 1, like the reference (the series
CDF(x) = hx/π + (2/π)Σ Re φ(hj)·sin(hjx)/j is the trapezoid rule for the
Gil-Pelaez inversion of a nonnegative r.v.).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "CFSeries",
    "cdf_series_weights",
    "cdf_from_cf",
    "invert_cdf_series",
    "moments_from_cf",
    "sample_from_cf",
    "truncation_error_estimate",
]


class CFSeries(NamedTuple):
    """Precomputed Fourier-CDF series of a (batch of) nonnegative r.v.(s)."""

    mean: jnp.ndarray
    std: jnp.ndarray
    h: jnp.ndarray  # frequency step, π/(mean + std_mult·std)
    weights: jnp.ndarray  # (n_terms, *batch): (2/π)·Re φ(h·j)/j


def _as_stateful(cf: Callable, carry0: Optional[Any]):
    if carry0 is not None:
        return cf, carry0

    def wrapped(a, carry):
        return cf(a), carry

    return wrapped, 0.0


def moments_from_cf(cf: Callable, carry0: Optional[Any] = None, h0: float = 1e-2):
    """(mean, std) via central differences of φ at ±h0
    (sample_from_cf.jl:50-64; uses φ(0) = 1)."""
    cf, carry = _as_stateful(cf, carry0)
    phi_p, carry = cf(h0, carry)
    phi_m, _ = cf(-h0, carry)
    first = (phi_p - phi_m) / (2.0 * h0)
    second = (phi_p - 2.0 + phi_m) / h0**2
    mean = jnp.real(-1j * first)
    var = jnp.maximum(jnp.real(-second - mean**2), 1e-12)
    return mean, jnp.sqrt(var)


def cdf_series_weights(
    cf: Callable,
    n_terms: int,
    carry0: Optional[Any] = None,
    std_mult: float = 5.0,
    h0: float = 1e-2,
    block_size: int = 1,
) -> CFSeries:
    """Build the trapezoid Fourier-CDF series of a nonnegative r.v.

    ``cf`` is either ``cf(a) -> φ(a)`` or, with ``carry0`` given,
    ``cf(a, carry) -> (φ(a), carry)`` (state threaded in series order).
    φ may be batched; mean/std/h/weights then carry the batch shape.
    h = π/(mean + std_mult·std) matches sample_from_cf.jl:37.

    ``block_size > 1`` hands the CF a *vector* of ``block_size`` increasing
    frequencies per call (shape (B,)) instead of scalars — stateful CFs then
    advance their carry a whole block at a time (the BK CF unwraps its Bessel
    angle with an in-block cumsum), which amortizes the sequential-scan
    dispatch cost by B×.  n_terms must be divisible by block_size.
    """
    cf_s, carry = _as_stateful(cf, carry0)
    mean, std = moments_from_cf(cf_s, carry)
    h = jnp.pi / (mean + std_mult * std)

    if n_terms % block_size != 0:
        raise ValueError(f"n_terms ({n_terms}) must divide by block_size ({block_size})")
    js = jnp.arange(1, n_terms + 1, dtype=jnp.float64)

    if block_size == 1:

        def step(c, j):
            phi_j, c = cf_s(h * j, c)
            return c, (2.0 / jnp.pi) * jnp.real(phi_j) / j

        _, weights = jax.lax.scan(step, carry, js)
        return CFSeries(mean, std, h, weights)

    j_blocks = js.reshape(n_terms // block_size, block_size)

    def step(c, j_blk):
        # a block of frequencies: h·j with h possibly batched → (B, *batch)
        a_blk = h * j_blk.reshape((block_size,) + (1,) * jnp.ndim(h))
        phi_blk, c = cf_s(a_blk, c)
        w_blk = (2.0 / jnp.pi) * jnp.real(phi_blk) / j_blk.reshape(
            (block_size,) + (1,) * (jnp.ndim(phi_blk) - 1)
        )
        return c, w_blk

    _, w_blocks = jax.lax.scan(step, carry, j_blocks)
    weights = w_blocks.reshape((n_terms,) + w_blocks.shape[2:])
    return CFSeries(mean, std, h, weights)


def cdf_from_cf(x, series: CFSeries):
    """CDF(x) = h·x/π + Σⱼ wⱼ·sin(h·j·x)  (sample_from_cf.jl:75-96).

    ``x`` may carry extra leading axes over the series' batch shape (e.g. a
    grid of abscissae per law); the weights broadcast accordingly."""
    x = jnp.asarray(x)
    n_terms = series.weights.shape[0]
    batch = series.weights.shape[1:]
    js = jnp.arange(1, n_terms + 1, dtype=jnp.float64).reshape(
        (n_terms,) + (1,) * x.ndim
    )
    w = series.weights.reshape((n_terms,) + (1,) * (x.ndim - len(batch)) + batch)
    sines = jnp.sin(series.h * x * js)
    return series.h * x / jnp.pi + jnp.sum(w * sines, axis=0)


def invert_cdf_series(u, series: CFSeries, iters: int = 64, hi_mult: float = 11.0):
    """Fixed-trip bisection solve of CDF(x) = u on [0, mean + hi_mult·std]
    (replaces the reference's Newton→bisection→clamp chain, :105-135)."""
    lo = jnp.zeros_like(u)
    hi = jnp.broadcast_to(series.mean + hi_mult * series.std, lo.shape).astype(lo.dtype)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        below = cdf_from_cf(mid, series) < u
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def truncation_error_estimate(series: CFSeries, tail: int = 4):
    """Per-batch estimate of the absolute CDF error from the static series
    truncation: the mean magnitude of the last ``tail`` weights (each dropped
    term changes the CDF by at most |wⱼ|; the reference instead breaks when
    |φ(hj)|/j < π·eps/2, sample_from_cf.jl:84-96)."""
    return jnp.mean(jnp.abs(series.weights[-tail:]), axis=0)


def sample_from_cf(
    key,
    cf: Callable,
    n: int,
    carry0: Optional[Any] = None,
    n_terms: int = 128,
    iters: int = 64,
    std_mult: float = 5.0,
    hi_mult: float = 11.0,
):
    """Draw ``n`` iid samples of the nonnegative r.v. with CF ``cf``.

    Replaces reference `sample_from_cf` (sample_from_cf.jl:27-41): build the
    CDF series once, then invert n uniforms in one batched bisection.
    If the CF is itself batched (returns shape (*batch,) values), pass n equal
    to the batch size and each lane draws from its own law.
    """
    series = cdf_series_weights(cf, n_terms, carry0=carry0, std_mult=std_mult)
    u = jax.random.uniform(key, (n,), dtype=jnp.float64, minval=1e-12, maxval=1.0 - 1e-12)
    return invert_cdf_series(u, series, iters=iters, hi_mult=hi_mult)
