"""Andersen Quadratic-Exponential (QE) scheme for Heston — beyond-reference.

Full-truncation Euler (the reference's only discretization, heston.jl:7-31)
needs ~100 steps for single-digit-bp bias; Andersen's QE-M scheme (Andersen
2008, "Simple and efficient simulation of the Heston stochastic volatility
model") matches the conditional mean/variance of the CIR transition with a
moment-matched quadratic (ψ ≤ 1.5) or exponential (ψ > 1.5) draw and adds a
martingale correction so E[S_{t+Δ}] = S_t·e^{rΔ} holds *exactly* per step.
The result: vanilla-price bias well under 1bp at 8-16 steps, i.e. ~6-12×
fewer steps than Euler at the same accuracy — the main lever for the
paths/sec-at-5bp throughput target.

Everything is branchless (`jnp.where` over both branches) so it vectorizes on
the VPU and ports directly into the Pallas kernel (ops/heston_qe_kernel).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["qe_step", "qe_constants"]

PSI_CRIT = 1.5


def qe_constants(kappa, theta, sigma, rho, r, dt, gamma1=0.5, gamma2=0.5):
    """Per-step scalar constants of the QE scheme (precomputed once)."""
    e = jnp.exp(-kappa * dt)  # m = theta + (V - theta)·e
    c_s2_v = sigma**2 * e * (1.0 - e) / kappa
    c_s2_c = theta * sigma**2 * (1.0 - e) ** 2 / (2.0 * kappa)
    k_over = kappa * rho / sigma - 0.5
    K0 = -rho * kappa * theta * dt / sigma
    K1 = gamma1 * dt * k_over - rho / sigma
    K2 = gamma2 * dt * k_over + rho / sigma
    K3 = gamma1 * dt * (1.0 - rho**2)
    K4 = gamma2 * dt * (1.0 - rho**2)
    A = K2 + 0.5 * K4
    return dict(
        e=e, c_s2_v=c_s2_v, c_s2_c=c_s2_c,
        K0=K0, K1=K1, K2=K2, K3=K3, K4=K4, A=A,
        r_dt=r * dt, theta=theta,
    )


def qe_step(x, v, z_v, z_x, u, c, *, martingale_correction: bool = True):
    """One QE(-M) step: (logS, V) → (logS', V') given normals z_v, z_x and a
    uniform u. ``c`` is the dict from :func:`qe_constants`.

    Branchless over the ψ ≤ 1.5 (quadratic) / ψ > 1.5 (exponential) split.
    """
    theta = c["theta"]
    m = theta + (v - theta) * c["e"]
    s2 = v * c["c_s2_v"] + c["c_s2_c"]
    m_safe = jnp.maximum(m, 1e-30)
    psi = jnp.maximum(s2 / (m_safe * m_safe), 1e-12)

    # --- quadratic branch (psi <= 1.5) ---
    two_over_psi = 2.0 / psi
    b2 = jnp.maximum(two_over_psi - 1.0, 0.0) + jnp.sqrt(
        two_over_psi * jnp.maximum(two_over_psi - 1.0, 0.0)
    )
    a = m / (1.0 + b2)
    b = jnp.sqrt(b2)
    v_quad = a * (b + z_v) ** 2

    # --- exponential branch (psi > 1.5) ---
    p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-12)
    beta = (1.0 - p) / m_safe
    u_safe = jnp.clip(u, 1e-12, 1.0 - 1e-12)
    v_exp = jnp.where(
        u_safe <= p, 0.0, jnp.log((1.0 - p) / jnp.maximum(1.0 - u_safe, 1e-300)) / beta
    )

    use_quad = psi <= PSI_CRIT
    v_new = jnp.where(use_quad, v_quad, v_exp)

    # --- log-price update ---
    K1, K2, K3, K4, A = c["K1"], c["K2"], c["K3"], c["K4"], c["A"]
    if martingale_correction:
        # QE-M: K0* = −log M − (K1 + K3/2)·V, with M the exact exponential
        # moment of the V' draw (Andersen 2008 §4.3); E[S'] = S·e^{rΔ} exactly.
        two_aa = 2.0 * A * a
        safe_quad = jnp.minimum(two_aa, 1.0 - 1e-9)
        log_m_quad = A * b2 * a / (1.0 - safe_quad) - 0.5 * jnp.log1p(-safe_quad)
        denom = jnp.maximum(beta - A, 1e-30)
        log_m_exp = jnp.log(jnp.maximum(p + beta * (1.0 - p) / denom, 1e-300))
        k0_star = -jnp.where(use_quad, log_m_quad, log_m_exp) - (K1 + 0.5 * K3) * v
    else:
        k0_star = c["K0"]

    var_x = jnp.maximum(K3 * v + K4 * v_new, 0.0)
    x_new = x + c["r_dt"] + k0_star + K1 * v + K2 * v_new + jnp.sqrt(var_x) * z_x
    return x_new, v_new
