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

__all__ = ["qe_step", "qe_v_step", "qe_constants", "matched_gammas"]

PSI_CRIT = 1.5


def matched_gammas(kappa, dt):
    """Moment-matched ∫V weights (γ1, γ2) for one QE step.

    The log-price update approximates the time-averaged variance as
    γ1·V_t + γ2·V_{t+Δ}.  The central choice γ1 = γ2 = ½ carries an O(Δ²)
    conditional-mean error; solving

        γ1·V_t + γ2·E[V_{t+Δ} | V_t]  ≡  E[Δ⁻¹ ∫ V ds | V_t]   for all V_t

    under the exact CIR law (both sides are affine in V_t) gives

        γ2 = (1 − ā)/(1 − e),   γ1 = ā − γ2·e,
        e = exp(−κΔ),  ā = (1 − e)/(κΔ),

    which makes the conditional mean of the integrated-variance proxy exact
    at every step size (→ (½, ½) as κΔ → 0).  Zero runtime cost: the γs only
    enter the precomputed K1..K4.

    Empirical caveat (measured on TPU, benchmarks/qe_bias_sweep.py, κ=2,
    σ=0.3, ρ=−0.7, T≈1 ATM call): exact-mean weights do NOT reduce vanilla
    price bias — they flip it positive and enlarge it (QE-8: −5.4bp central
    → +13.0bp matched), because the price bias is dominated by the joint
    (∫V, ∫√V dW) covariance error, not the ∫V mean.  The central default
    stays γ1 = γ2 = ½ (Andersen 2008 §4.2); this rule is provided for study
    and for TG-style schemes that need the exact-mean weights.
    """
    kdt = kappa * dt
    # expm1 keeps 1−e accurate for small κΔ; below ~1e-4 the (1−ā)/(1−e)
    # ratio still cancels catastrophically, so switch to the Taylor series
    # γ2 = ½ + κΔ/12 + O((κΔ)²) there (double-where keeps gradients clean)
    small = jnp.abs(kdt) < 1e-4
    kdt_safe = jnp.where(small, 1.0, kdt)
    e = jnp.exp(-kdt)
    one_m_e = -jnp.expm1(-kdt_safe)
    abar = one_m_e / kdt_safe
    gamma2_exact = (1.0 - abar) / one_m_e
    gamma1_exact = abar - gamma2_exact * e
    gamma1 = jnp.where(small, 0.5 - kdt / 12.0, gamma1_exact)
    gamma2 = jnp.where(small, 0.5 + kdt / 12.0, gamma2_exact)
    return gamma1, gamma2


def qe_constants(kappa, theta, sigma, rho, r, dt, gamma1=0.5, gamma2=0.5,
                 *, match_gammas: bool = False):
    """Per-step scalar constants of the QE scheme (precomputed once).

    ``match_gammas=True`` overrides (γ1, γ2) with :func:`matched_gammas`."""
    if match_gammas:
        gamma1, gamma2 = matched_gammas(kappa, dt)
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


def _qe_v_draw(v, z, u, c):
    """Variance-only QE transition V → V' plus the intermediates the
    martingale correction needs: returns (v_new, use_quad, a, b2, p, beta).

    Branchless over the ψ ≤ 1.5 (quadratic) / ψ > 1.5 (exponential) split.
    """
    theta = c["theta"]
    m = theta + (v - theta) * c["e"]
    s2 = v * c["c_s2_v"] + c["c_s2_c"]
    m_safe = jnp.maximum(m, 1e-30)
    psi = jnp.maximum(s2 / (m_safe * m_safe), 1e-12)

    # --- quadratic branch (psi <= 1.5) ---
    two_over_psi = 2.0 / psi
    t1 = jnp.maximum(two_over_psi - 1.0, 0.0)
    # double-where: lanes with psi ≥ 2 have t1 == 0 (the exponential branch
    # is selected there), but sqrt'(0) = ∞ would still poison reverse-mode
    # gradients THROUGH the unselected branch — guard the sqrt argument
    quad_live = t1 > 0.0
    t1_safe = jnp.where(quad_live, t1, 1.0)
    b2 = jnp.where(quad_live, t1 + jnp.sqrt(two_over_psi * t1_safe), 0.0)
    a = m / (1.0 + b2)
    b = jnp.where(quad_live, jnp.sqrt(jnp.where(quad_live, b2, 1.0)), 0.0)
    v_quad = a * (b + z) ** 2

    # --- exponential branch (psi > 1.5) ---
    p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-12)
    beta = (1.0 - p) / m_safe
    u_safe = jnp.clip(u, 1e-12, 1.0 - 1e-12)
    v_exp = jnp.where(
        u_safe <= p, 0.0, jnp.log((1.0 - p) / jnp.maximum(1.0 - u_safe, 1e-300)) / beta
    )

    use_quad = psi <= PSI_CRIT
    return jnp.where(use_quad, v_quad, v_exp), use_quad, a, b2, p, beta


def qe_v_step(v, z, u, c):
    """One variance-only QE step V → V' (normal z, uniform u, constants c).

    The building block of the conditional (Romano-Touzi mixing) Monte Carlo
    estimator, which never simulates logS: given the V path, logS_T is
    exactly conditionally normal (methods/montecarlo.py)."""
    return _qe_v_draw(v, z, u, c)[0]


def qe_v_step_with_coeffs(v, z, u, c):
    """Variance QE step + hand-derived tangent coefficients (f64 twin of the
    kernel's _qe_v_coeffs, mirroring :func:`_qe_v_draw`'s guards exactly).

    Returns ``(vn, cm, cs)`` with ∂vn/∂x = cm·(∂m/∂x) + cs·(∂s2/∂x) for any
    input x, where m = θc+(v−θc)e and s2 = v·c1+c2 are the two moment
    channels.  The coefficients are computed ONCE per step and shared by all
    tangent directions — forward-mode greeks then cost a few broadcast FMAs
    per direction instead of a re-walk of the sqrt/log/div chain (which on
    TPU under f64 emulation was measured ~25× the primal when generated by
    generic per-direction linearization).
    """
    theta = c["theta"]
    e = c["e"]
    m = theta + (v - theta) * e
    s2 = v * c["c_s2_v"] + c["c_s2_c"]
    m_safe = jnp.maximum(m, 1e-30)
    psi_raw = s2 / (m_safe * m_safe)  # same division form as _qe_v_draw
    psi = jnp.maximum(psi_raw, 1e-12)
    inv_m = 1.0 / m_safe  # coefficient-only

    # quadratic branch — primal EXACTLY as _qe_v_draw (same division forms:
    # the greeks must be consistent with the price qe_v_step produced)
    two_over_psi = 2.0 / psi
    t1r = two_over_psi - 1.0
    t1 = jnp.maximum(t1r, 0.0)
    quad_live = t1r > 0.0
    t1_safe = jnp.where(quad_live, t1, 1.0)
    sqw = jnp.sqrt(two_over_psi * t1_safe)
    b2 = jnp.where(quad_live, t1 + sqw, 0.0)
    a = m / (1.0 + b2)
    b = jnp.where(quad_live, jnp.sqrt(jnp.where(quad_live, b2, 1.0)), 0.0)
    q = b + z
    v_quad = a * q**2

    # coefficient chain (may use cheap reciprocal forms — 1-ulp coefficient
    # noise is irrelevant, primal parity is what matters)
    rb = a * inv_m  # = 1/(1+b2) to 1 ulp
    t_psi = -two_over_psi / psi
    rcp_prod = 1.0 / jnp.maximum(sqw * jnp.maximum(b, 1e-150), 1e-300)
    rcp_sqw = jnp.maximum(b, 1e-150) * rcp_prod
    rcp_sqb = sqw * rcp_prod
    db2_dpsi = t_psi * (1.0 + 0.5 * rcp_sqw * (t1 + two_over_psi))
    q_m = q * q * rb
    q_psi = jnp.where(quad_live, a * (q * rcp_sqb - q_m) * db2_dpsi, 0.0)

    # exponential branch — primal EXACTLY as _qe_v_draw
    p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-12)
    one_m_p = 1.0 - p
    beta = one_m_p / m_safe
    u_safe = jnp.clip(u, 1e-12, 1.0 - 1e-12)
    lterm = jnp.log(one_m_p / jnp.maximum(1.0 - u_safe, 1e-300))
    e_live = jnp.where(u_safe > p, 1.0, 0.0)
    v_exp = jnp.where(u_safe <= p, 0.0, lterm / beta)

    r1mp = 1.0 / one_m_p
    inv_beta = m_safe * r1mp
    p_live = jnp.where(p < 1.0 - 1e-12, 1.0, 0.0)
    rp1 = 1.0 / (psi + 1.0)
    e_m = e_live * lterm * r1mp  # ∂(L/β)/∂m = L/(1−p)
    # dv_exp/dψ = (2/(ψ+1)²)·invβ·(L−1)/(1−p) on live lanes
    e_psi = e_live * p_live * (2.0 * rp1 * rp1) * inv_beta * (lterm - 1.0) * r1mp

    use_quad = psi <= PSI_CRIT
    vn = jnp.where(use_quad, v_quad, v_exp)
    coef_m = jnp.where(use_quad, q_m, e_m)
    coef_psi = jnp.where(use_quad, q_psi, e_psi)
    coef_psi = jnp.where(psi_raw > 1e-12, coef_psi, 0.0)  # ψ-floor plateau
    coef_m = jnp.where(m > 1e-30, coef_m, 0.0)  # m-floor plateau

    cm = coef_m - 2.0 * psi * inv_m * coef_psi
    cs = coef_psi * inv_m * inv_m
    return vn, cm, cs


def qe_step(x, v, z_v, z_x, u, c, *, martingale_correction: bool = True):
    """One QE(-M) step: (logS, V) → (logS', V') given normals z_v, z_x and a
    uniform u. ``c`` is the dict from :func:`qe_constants`.

    Branchless over the ψ ≤ 1.5 (quadratic) / ψ > 1.5 (exponential) split.
    """
    v_new, use_quad, a, b2, p, beta = _qe_v_draw(v, z_v, u, c)

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
