"""Gauss-Newton Heston surface calibration at kernel speed.

`heston_qe_mixing_surface_price_and_jacobian` returns the whole
(expiry × strike) surface AND its 7-parameter Jacobian from ONE fused
kernel dispatch — the natural engine for damped Gauss-Newton on a
least-squares surface objective: each iteration costs one kernel pass
(~2× the price-only surface kernel), with no reverse sweep and no
per-parameter bumping.

This demo recovers (V0, κ, θ, σ, ρ) from a synthetic Carr-Madan quote
surface.  On TPU it runs the PRNG kernels at full size; elsewhere it runs
the QMC kernels under interpret mode at a small size (slow but exact the
same code path).

Run: PYTHONPATH=. python examples/kernel_surface_calibration.py
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh
from hedgehog_tpu.methods.montecarlo import surface_seg_steps, validate_surface_expiries
from hedgehog_tpu.ops.heston_qe_greeks_kernel import (
    heston_qe_mixing_surface_price_and_jacobian,
)

REF = dt.date(2024, 1, 1)
R, SPOT = 0.03, 100.0
TRUE = dict(V0=0.04, kappa=2.0, theta=0.045, sigma=0.35, rho=-0.65)
EXPIRIES = [dt.date(2024, 7, 1), dt.date(2025, 1, 1)]
STRIKES = jnp.array([85.0, 95.0, 100.0, 105.0, 115.0])


def main():
    on_tpu = jax.default_backend() == "tpu"
    steps = 16 if on_tpu else 6
    blocks, batches = (64, 4) if on_tpu else (1, 1)
    kernel_kw = dict(
        seg_steps=None, n_strikes=len(STRIKES), n_blocks=blocks,
        n_batches=batches, seed=0, qmc=not on_tpu, interpret=not on_tpu,
    )

    market_true = hh.HestonInputs(REF, R, SPOT, *TRUE.values())
    T_host = validate_surface_expiries(market_true, EXPIRIES)
    _, seg_steps = surface_seg_steps(T_host, steps)
    kernel_kw["seg_steps"] = tuple(seg_steps)
    discounts = jnp.exp(-R * jnp.asarray(T_host))

    # synthetic quotes from the Fourier pricer
    quotes = np.zeros((len(EXPIRIES), len(STRIKES)))
    cm = hh.CarrMadan(1.0, "auto", hh.HestonDynamics())
    for i, e in enumerate(EXPIRIES):
        for k, K in enumerate(STRIKES):
            p = hh.PricingProblem(
                hh.VanillaOption(float(K), e, hh.European(), hh.Call(), hh.Spot()),
                market_true,
            )
            quotes[i, k] = float(hh.solve(p, cm).price)
    quotes = jnp.asarray(quotes)

    # damped Gauss-Newton over (V0, kappa, theta, sigma, rho); spot/rate known
    x = np.array([0.06, 1.0, 0.03, 0.5, -0.4])  # deliberately wrong start
    free = [1, 2, 3, 4, 5]  # jac columns for (V0, kappa, theta, sigma, rho)
    lam = 1e-4
    for it in range(12):
        surf, jac = heston_qe_mixing_surface_price_and_jacobian(
            np.log(SPOT), x[0], R, x[1], x[2], x[3], x[4],
            tuple(T_host), STRIKES, discounts, **kernel_kw,
        )
        r_vec = np.asarray(surf - quotes).ravel()
        J = np.asarray(jac)[:, :, free].reshape(-1, len(free))
        JtJ = J.T @ J + lam * np.eye(len(free))
        step = np.linalg.solve(JtJ, J.T @ r_vec)
        x = x - step
        x[0] = max(x[0], 1e-4); x[2] = max(x[2], 1e-4)
        x[3] = min(max(x[3], 0.05), 1.5); x[4] = min(max(x[4], -0.95), 0.0)
        rmse = float(np.sqrt(np.mean(r_vec**2)))
        print(f"iter {it:2d}: rmse={rmse:.5f}  x={np.round(x, 4)}")
        if rmse < 5e-3 and np.linalg.norm(step) < 1e-4:
            break

    names = ("V0", "kappa", "theta", "sigma", "rho")
    print("\nrecovered vs true (MC bias/noise bounds the residual):")
    for n, xv in zip(names, x):
        print(f"  {n:6s} {xv:+.4f}  (true {TRUE[n]:+.4f})")
    err = max(abs(xv - TRUE[n]) / abs(TRUE[n]) for n, xv in zip(names, x))
    print(f"max rel param error: {err:.3f}")


if __name__ == "__main__":
    main()
