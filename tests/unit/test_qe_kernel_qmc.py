"""Kernel-side QMC: the in-kernel Sobol' stream of the QE Pallas kernel.

Unlike the PRNG kernels (whose prng primitives are stubbed off-TPU), the
Sobol' generator is pure bit arithmetic, so the WHOLE kernel is validated on
CPU in interpret mode: bit-exactness vs math/sobol.py, price agreement vs
Carr-Madan, and the QMC variance reduction itself."""

import datetime as dt
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import hedgehog_tpu as hh
from hedgehog_tpu.math.sobol import sobol_uniforms
from hedgehog_tpu.ops.heston_qe_kernel import (
    _sobol_masks,
    _LANES,
    _ROWS,
    _SOBOL_BITS,
    _sobol_table,
    _sobol_uniforms_tile,
    heston_qe_terminal,
)

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2025, 1, 1)
HESTON = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)
R, SPOT, STRIKE = 0.03, 100.0, 100.0


def test_kernel_sobol_bit_exact_vs_reference_impl():
    """The in-kernel generator must reproduce math/sobol.py bit-for-bit
    (same directions, same digital shift, same indices)."""
    seed, dims, offset = 7, 6, 1234

    def dump_kernel(sob_ref, off_ref, out_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
        idx = off_ref[0] + row * jnp.int32(_LANES) + lane
        us = _sobol_uniforms_tile(_sobol_masks(idx), sob_ref, tuple(range(dims)))
        for d in range(dims):
            out_ref[d] = us[d]

    table = _sobol_table(seed, dims)
    out = pl.pallas_call(
        dump_kernel,
        in_specs=[
            pl.BlockSpec((dims, _SOBOL_BITS + 1), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (dims, _ROWS, _LANES), lambda: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((dims, _ROWS, _LANES), jnp.float32),
        interpret=True,
    )(table, jnp.asarray([offset], jnp.int32))

    n = _ROWS * _LANES
    want = sobol_uniforms(jax.random.PRNGKey(seed), n, dims, skip=offset)  # (n, dims)
    got = np.asarray(out).reshape(dims, n).T
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-8)  # f32 vs f64 rounding


@jax.jit  # seed stays traced: one compile serves every digital shift
def _qmc_price(seed):
    T = hh.yearfrac(REF, EXPIRY)
    steps = 10
    prices = heston_qe_terminal(
        jnp.log(SPOT), HESTON["V0"], R, HESTON["kappa"], HESTON["theta"],
        HESTON["sigma"], HESTON["rho"], T / steps,
        n_paths=_ROWS * _LANES, steps=steps, seed=seed, antithetic=True,
        qmc=True, interpret=True,
    )
    disc = jnp.exp(-R * T)
    return disc * jnp.mean(jnp.maximum(prices - STRIKE, 0.0))


def test_qmc_kernel_price_vs_carr_madan():
    market = hh.HestonInputs(REF, R, SPOT, *HESTON.values())
    payoff = hh.VanillaOption(STRIKE, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    cm = float(hh.solve(hh.PricingProblem(payoff, market), hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())).price)
    p = float(_qmc_price(0))
    # 32768 antithetic QMC pairs: QE-10 bias (~3bp) + tiny QMC noise
    assert p == pytest.approx(cm, rel=3e-3)


def test_qmc_kernel_variance_reduction():
    """Across digital shifts, the kernel-QMC price must fluctuate far less
    than the pure-JAX PRNG price across seeds at the same path count."""
    qmc_prices = np.array([float(_qmc_price(s)) for s in range(6)])

    market = hh.HestonInputs(REF, R, SPOT, *HESTON.values())
    payoff = hh.VanillaOption(STRIKE, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(payoff, market)
    prng_prices = []
    for s in range(6):
        cfg = hh.SimulationConfig(
            trajectories=_ROWS * _LANES, steps=10,
            variance_reduction=hh.Antithetic(), seed=s,
        )
        m = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(), cfg)
        prng_prices.append(float(hh.solve(prob, m).price))
    prng_prices = np.array(prng_prices)

    # pure-JAX ndtri QMC measures 4.9x at this config; the kernel (same
    # ndtri map, fp32) must land in the same regime
    ratio = prng_prices.std() / max(qmc_prices.std(), 1e-12)
    assert ratio > 3.0, f"QMC variance reduction only {ratio:.1f}x"


def test_qmc_kernel_sharded_offsets_disjoint():
    """Two half-sequences (offset 0 and N) must average to the full-sequence
    price structure: their union equals one 2N-point run."""
    T = hh.yearfrac(REF, EXPIRY)
    steps = 6
    n = _ROWS * _LANES

    def run(n_paths, offset):
        return heston_qe_terminal(
            jnp.log(SPOT), HESTON["V0"], R, HESTON["kappa"], HESTON["theta"],
            HESTON["sigma"], HESTON["rho"], T / steps,
            n_paths=n_paths, steps=steps, seed=3, antithetic=False,
            qmc=True, point_offset=offset, interpret=True,
        )

    full = np.asarray(run(2 * n, 0))
    lo = np.asarray(run(n, 0))
    hi = np.asarray(run(n, n))
    np.testing.assert_allclose(np.concatenate([lo, hi], axis=1), full, rtol=1e-6)


def test_qmc_flag_via_solve_facade():
    """SimulationConfig(qmc=True) + HestonQE(use_kernel=True) routes through
    the CPU fallback off-TPU (pure-JAX QMC) without the old ValueError."""
    market = hh.HestonInputs(REF, R, SPOT, *HESTON.values())
    payoff = hh.VanillaOption(STRIKE, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    cfg = hh.SimulationConfig(trajectories=4096, steps=8, seed=0, qmc=True)
    m = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(use_kernel=True), cfg)
    p = float(hh.solve(hh.PricingProblem(payoff, market), m).price)
    assert 8.0 < p < 11.0


def test_qmc_offset_period_guard():
    """A host-concrete point_offset participates in the period check (a
    wrapped offset would silently reuse points)."""
    import jax.numpy as jnp
    import pytest

    from hedgehog_tpu.ops.heston_qe_kernel import heston_qe_terminal

    with pytest.raises(ValueError, match="offset"):
        heston_qe_terminal(
            jnp.log(100.0), 0.04, 0.03, 2.0, 0.04, 0.3, -0.7, 0.1,
            n_paths=32768, steps=2, seed=0, qmc=True,
            point_offset=2**30 - 1000, interpret=True,
        )
