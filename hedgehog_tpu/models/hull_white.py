"""Hull-White / G1++ one-factor Gaussian short-rate model — curve-fitted.

Beyond-reference asset class (the reference prices equity derivatives on a
DETERMINISTIC curve only — src/market_inputs/rate_curve.jl); this module
adds stochastic interest rates with the market-standard short-rate model:

    dr = (θ(t) − a·r) dt + σ dW,     θ(t) fitted so model ZCBs match the
                                      input curve P(0, ·) EXACTLY.

Everything uses the x-factor (G1++) decomposition r_t = x_t + α(t),
dx = −a·x dt + σ dW, x_0 = 0, which removes θ(t) from every formula: the
initial curve enters only through P(0, t) ratios — so a spine `RateCurve`
works as-is, and curve-spine greeks (key-rate durations) flow through the
same AD path as every other lens.

Core quantities (Brigo-Mercurio ch. 3 conventions):

    B(τ)      = (1 − e^{−aτ})/a
    V(t, T)   = σ²/a²·[T−t + (2/a)e^{−a(T−t)} − (1/2a)e^{−2a(T−t)} − 3/(2a)]
    P(t, T)   = P(0,T)/P(0,t) · exp(½[V(t,T) − V(0,T) + V(0,t)] − B(T−t)·x_t)
    σ_p(T, S) = σ·√((1 − e^{−2aT})/(2a))·B(S − T)      (ZCB-option vol)
    Γ(t)      = ∫₀ᵗ B(u)² du = [t − 2B(t) + (1−e^{−2at})/(2a)]/a²

Exact simulation over a step Δ (OU transition + its time integral, jointly
Gaussian — NO discretization error at any step count):

    x'  | x ~ N(x·e^{−aΔ},  σ²(1−e^{−2aΔ})/(2a))
    ∫x  | x ~ N(x·B(Δ),     σ²·Γ(Δ)),   Cov(x', ∫x) = σ²(1−e^{−aΔ})²/(2a²)

and the pathwise stochastic discount factor needs no θ either:

    exp(−∫₀ᵗ r du) = P(0,t)·exp(−∫₀ᵗ x du − ½σ²Γ(t)),

whose expectation is P(0, t) EXACTLY (Var ∫x = σ²Γ) — the martingale test
every MC estimator here is pinned against.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "hw_b",
    "hw_v",
    "hw_gamma",
    "hw_bond",
    "hw_sigma_p",
    "hw_step_moments",
]


def hw_b(a, tau):
    """B(τ) = (1 − e^{−aτ})/a.  Requires a > 0 (validated at the inputs)."""
    return (1.0 - jnp.exp(-a * tau)) / a


def hw_v(a, sigma, tau):
    """V(t, t+τ): the G1++ integrated bond-variance block."""
    e1 = jnp.exp(-a * tau)
    return (sigma / a) ** 2 * (
        tau + (2.0 / a) * e1 - (0.5 / a) * e1 * e1 - 1.5 / a
    )


def hw_gamma(a, t):
    """Γ(t) = ∫₀ᵗ B(u)² du — the variance kernel of ∫x (and of the
    pathwise discount's exponent)."""
    return (t - 2.0 * hw_b(a, t) + (1.0 - jnp.exp(-2.0 * a * t)) / (2.0 * a)) / a**2


def hw_bond(p0_t, p0_T, a, sigma, t, T, x_t):
    """Model ZCB P(t, T) as a function of the x state, fitted to the curve:
    P(0,T)/P(0,t)·exp(½[V(t,T) − V(0,T) + V(0,t)] − B(T−t)x).  At x = 0,
    t = 0 this is P(0, T) exactly (the fit's identity)."""
    half = 0.5 * (hw_v(a, sigma, T - t) - hw_v(a, sigma, T) + hw_v(a, sigma, t))
    return (p0_T / p0_t) * jnp.exp(half - hw_b(a, T - t) * x_t)


def hw_sigma_p(a, sigma, T, S):
    """Lognormal volatility of P(T, S) seen from 0 — the ZCB-option vol."""
    return sigma * jnp.sqrt((1.0 - jnp.exp(-2.0 * a * T)) / (2.0 * a)) * hw_b(a, S - T)


def hw_step_moments(a, sigma, dt):
    """Exact joint (x', ∫x over the step) transition structure given x:
    returns (decay e^{−aΔ}, B(Δ), std_x, coeff c = Cov/std_x, resid std of
    ∫x after projecting on x') — the 2×2 Cholesky of the conditional
    Gaussian, precomputed once per step size."""
    e1 = jnp.exp(-a * dt)
    v_x = sigma**2 * (1.0 - e1 * e1) / (2.0 * a)
    v_i = sigma**2 * hw_gamma(a, dt)
    c_xi = sigma**2 * (1.0 - e1) ** 2 / (2.0 * a**2)
    s_x = jnp.sqrt(v_x)
    coef = c_xi / s_x
    s_res = jnp.sqrt(jnp.maximum(v_i - coef**2, 0.0))
    return e1, hw_b(a, dt), s_x, coef, s_res
