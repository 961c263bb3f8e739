"""Exact-mixing Pallas kernel (ops/heston_exact_kernel.py), validated on CPU
in interpret mode through the in-kernel Sobol' stream (pure bit arithmetic —
the PRNG path is TPU-only, same split as the QE kernels)."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.ops.heston_exact_kernel import (
    heston_exact_mixing_values,
    heston_exact_mixing_vanilla_price,
)

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2025, 1, 1)
HESTON = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)
R, SPOT, STRIKE = 0.03, 100.0, 100.0
SEGMENTS = 2


def _cm():
    market = hh.HestonInputs(REF, R, SPOT, *HESTON.values())
    payoff = hh.VanillaOption(STRIKE, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    return float(
        hh.solve(
            hh.PricingProblem(payoff, market), hh.CarrMadan(1.0, "auto", hh.HestonDynamics())
        ).price
    )


def _T():
    return float(hh.yearfrac(REF, EXPIRY))


def test_exact_kernel_qmc_price_vs_carr_madan():
    T = _T()
    vals = heston_exact_mixing_values(
        jnp.log(SPOT), HESTON["V0"], R, HESTON["kappa"], HESTON["theta"],
        HESTON["sigma"], HESTON["rho"], T / SEGMENTS, STRIKE, 1.0,
        n_paths=32768, segments=SEGMENTS, seed=3, antithetic=True,
        qmc=True, interpret=True,
    )
    price = float(jnp.exp(-R * T) * jnp.mean(vals.astype(jnp.float64)))
    # sub-bp scheme bias + QMC noise at 32768 mirrored pairs
    assert price == pytest.approx(_cm(), rel=2e-3)


def test_exact_price_kernel_matches_values_kernel():
    """The accumulating serving kernel must reproduce the values kernel's
    mean over the identical Sobol' point range (consecutive batch blocks)."""
    T = _T()
    disc = float(np.exp(-R * T))
    args = (jnp.log(SPOT), HESTON["V0"], R, HESTON["kappa"], HESTON["theta"],
            HESTON["sigma"], HESTON["rho"], T / SEGMENTS, STRIKE)
    vals = heston_exact_mixing_values(
        *args, 1.0,
        n_paths=2 * 32768, segments=SEGMENTS, seed=11, antithetic=True,
        qmc=True, interpret=True,
    )
    want = disc * float(jnp.mean(vals.astype(jnp.float64)))
    got = float(heston_exact_mixing_vanilla_price(
        *args, disc,
        n_blocks=1, n_batches=2, segments=SEGMENTS, seed=11,
        qmc=True, interpret=True,
    ))
    assert got == pytest.approx(want, rel=1e-6)


def test_exact_kernel_adapter_cpu_fallback_matches_pure_jax():
    """Off-TPU the use_kernel=True adapter must fall back to the pure-JAX
    estimator with identical draws (same seed → same Sobol' points)."""
    market = hh.HestonInputs(REF, R, SPOT, *HESTON.values())
    payoff = hh.VanillaOption(STRIKE, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(payoff, market)
    cfg = hh.SimulationConfig(
        trajectories=4096, steps=SEGMENTS, variance_reduction=hh.Antithetic(),
        seed=5, qmc=True,
    )
    a = hh.solve(prob, hh.MonteCarlo(hh.HestonDynamics(), hh.HestonExactMixing(use_kernel=True), cfg))
    b = hh.solve(prob, hh.MonteCarlo(hh.HestonDynamics(), hh.HestonExactMixing(), cfg))
    assert float(a.price) == pytest.approx(float(b.price), rel=1e-12)


def test_exact_kernel_sobol_period_guard():
    with pytest.raises(ValueError, match="period"):
        heston_exact_mixing_values(
            jnp.log(SPOT), HESTON["V0"], R, HESTON["kappa"], HESTON["theta"],
            HESTON["sigma"], HESTON["rho"], _T() / SEGMENTS, STRIKE, 1.0,
            n_paths=256 * 128, segments=SEGMENTS, seed=0, antithetic=True,
            qmc=True, point_offset=2**30 - 1,
        )


def test_exact_surface_kernel_single_expiry_matches_values_kernel():
    """One-expiry exact surface kernel over the same Sobol' point range must
    reproduce the values kernel's mean (identical draw layout: 4 dims per
    segment, step-major)."""
    from hedgehog_tpu.ops.heston_exact_kernel import (
        heston_exact_mixing_surface_price,
    )

    T = _T()
    disc = float(np.exp(-R * T))
    args = (jnp.log(SPOT), HESTON["V0"], R, HESTON["kappa"], HESTON["theta"],
            HESTON["sigma"], HESTON["rho"])
    vals = heston_exact_mixing_values(
        *args, T / SEGMENTS, STRIKE, 1.0,
        n_paths=32768, segments=SEGMENTS, seed=4, antithetic=True,
        qmc=True, interpret=True,
    )
    want = disc * float(jnp.mean(vals.astype(jnp.float64)))
    surf = heston_exact_mixing_surface_price(
        *args, (T,), jnp.asarray([STRIKE]), jnp.asarray([disc]),
        seg_steps=(SEGMENTS,), n_strikes=1, n_blocks=1, n_batches=1, seed=4,
        qmc=True, interpret=True,
    )
    assert float(surf[0, 0]) == pytest.approx(want, rel=1e-6)


def test_exact_surface_kernel_vs_carr_madan_per_point():
    """2×2 exact surface kernel (QMC, interpret mode): every point agrees
    with an independent Carr-Madan solve — fp32 + sub-bp scheme bias at a
    3-segment budget."""
    from hedgehog_tpu.methods.montecarlo import surface_seg_steps
    from hedgehog_tpu.ops.heston_exact_kernel import (
        heston_exact_mixing_surface_price,
    )

    market = hh.HestonInputs(REF, R, SPOT, *HESTON.values())
    expiries = [dt.date(2024, 7, 1), dt.date(2025, 1, 1)]
    strikes = jnp.asarray([95.0, 105.0])
    T_host = [float(hh.yearfrac(REF, e)) for e in expiries]
    _, seg_steps = surface_seg_steps(T_host, 3)
    discounts = jnp.asarray([np.exp(-R * t) for t in T_host])
    surf = heston_exact_mixing_surface_price(
        jnp.log(SPOT), HESTON["V0"], R, HESTON["kappa"], HESTON["theta"],
        HESTON["sigma"], HESTON["rho"], tuple(T_host), strikes, discounts,
        seg_steps=tuple(seg_steps), n_strikes=2, n_blocks=1, n_batches=2,
        seed=2, qmc=True, interpret=True,
    )
    for i, e in enumerate(expiries):
        for k in range(2):
            payoff = hh.VanillaOption(
                float(strikes[k]), e, hh.European(), hh.Call(), hh.Spot()
            )
            cm = float(hh.solve(
                hh.PricingProblem(payoff, market),
                hh.CarrMadan(1.0, "auto", hh.HestonDynamics()),
            ).price)
            assert float(surf[i, k]) == pytest.approx(cm, rel=5e-3)
