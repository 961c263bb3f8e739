"""Forward-mode greeks for the conditional (Romano-Touzi mixing) estimator.

The mixing estimator's per-path value is a closed-form Black-Scholes function
of the two variance-path functionals (IV = ∫V dt, J = ∫√V dW_v); only the
QE variance scan carries parameter dependence that needs AD.  Reverse mode
re-walks that scan backwards (rematerializing every QE step);  forward mode
pushes a handful of tangents through the SAME forward scan:

- 5 tangent directions ride the scan: (V0, κ, θ, σ, T) — the parameters the
  V path actually depends on.  Each step linearizes the QE transition once
  (``jax.linearize``) and applies the linear map to all directions (vmap).
- (S0, ρ, r) never touch the scan: the conditional BS value's partials in
  them are closed-form in (IV, J) (``cond_bs_value_and_partials``), as are
  ∂Y/∂IV and ∂Y/∂J which chain the scan tangents into value tangents.

This makes the full 7-parameter greek vector a single forward pass at a
small multiple of the price cost — the "<2× price" contract of BASELINE.md
north star #2 (reference: ForwardDiff Duals through a re-solve,
greeks_problem.jl:249-262), on the serving estimator.

The constants vector layout matches the TPU kernel's SMEM params
(ops/heston_qe_kernel._mix_c) so the kernel-side greek pass
(ops/heston_qe_greeks_kernel.py) shares this exact math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dates import yearfrac
from ..core.payoffs import require_european
from ..market.rate_curve import df_yf, zero_rate_yf
from ..models.heston_qe import qe_constants, qe_v_step

__all__ = [
    "heston_mixing_price_and_greeks",
    "mixing_cvec",
    "mixing_cvec_and_tangents",
    "cond_bs_value_and_partials",
    "GREEK_ORDER",
]

# the flagship 7-parameter order (bench.py, BASELINE.md north star #2)
GREEK_ORDER = ("spot", "V0", "kappa", "theta", "sigma", "rho", "rate")

# scan-carried tangent directions (the V path depends on exactly these)
_SCAN_DIRS = ("V0", "kappa", "theta", "sigma", "T")


def mixing_cvec(kappa, theta, sigma, T, steps: int):
    """Per-step mixing constants as a flat vector (dt = T/steps):

    [theta, e, c_s2_v, c_s2_c, half_dt, inv_sigma, k_over_sigma,
     ktd_over_sigma]

    — the same entries (and order) as the TPU kernel's per-step SMEM
    constants (ops/heston_qe_kernel._mix_c, minus the value-stage scalars).
    """
    dt = T / steps
    c = qe_constants(kappa, theta, sigma, 0.0, 0.0, dt)
    return jnp.stack(
        [
            c["theta"], c["e"], c["c_s2_v"], c["c_s2_c"],
            0.5 * dt, 1.0 / sigma, kappa / sigma, kappa * theta * dt / sigma,
        ]
    )


def mixing_cvec_and_tangents(kappa, theta, sigma, T, steps: int):
    """cvec plus its Jacobian rows for the 5 scan directions: (5, 8) with a
    zero row for V0 (which enters only the initial state)."""
    cvec = mixing_cvec(kappa, theta, sigma, T, steps)
    jac = jax.jacfwd(lambda p: mixing_cvec(p[0], p[1], p[2], p[3], steps))(
        jnp.stack([kappa, theta, sigma, T])
    )  # (8, 4) in (kappa, theta, sigma, T) order
    zeros = jnp.zeros((1, cvec.shape[0]), cvec.dtype)
    dcvecs = jnp.concatenate([zeros, jac.T], axis=0)  # (5, 8): V0 row first
    return cvec, dcvecs


def _c_dict(cvec):
    return dict(
        theta=cvec[0], e=cvec[1], c_s2_v=cvec[2], c_s2_c=cvec[3],
    )


def _mix_step(v, iv, j, z, u, cvec):
    """One mixing step (QE V-draw + trapezoid IV + exact-identity J) as a
    pure function of (state, draws, constants-vector) — the linearization
    target.  Mirrors ops/heston_qe_kernel._mix_advance."""
    vn = qe_v_step(v, z, u, _c_dict(cvec))
    half_dt, inv_sigma, k_over_sigma, ktd_over_sigma = cvec[4], cvec[5], cvec[6], cvec[7]
    iv_step = half_dt * (v + vn)
    jn = j + (vn - v) * inv_sigma + iv_step * k_over_sigma - ktd_over_sigma
    return vn, iv + iv_step, jn


def cond_bs_value_and_partials(iv, j, *, f0, log_f0_over_k, strike, rho, cp):
    """Undiscounted conditional BS vanilla value Y(IV, J) and its partials.

        e_arg = ρJ − ρ²IV/2,  F = F0·e^{e_arg},  var = (1−ρ²)·IV
        Y = cp·(F·Φ(cp·d1) − K·Φ(cp·d2))

    Returns (Y, Y_iv, Y_j, Y_rho, Y_f0) where Y_f0 = ∂Y/∂F0·F0/F0… kept as
    ∂Y/∂F0 (chainable into spot, rate and explicit-T greeks: F0 = S0·e^{rT}).
    All formulas are the standard identities ∂Y/∂F = cp·Φ(cp·d1) and
    ∂Y/∂sd = F·φ(d1) chained through (IV, J, ρ, F0).
    """
    e_arg = rho * j - 0.5 * rho**2 * iv
    f_eff = f0 * jnp.exp(e_arg)
    rho_bar2 = 1.0 - rho**2
    var = jnp.maximum(rho_bar2 * iv, 1e-18)
    sd = jnp.sqrt(var)
    d1 = (log_f0_over_k + e_arg + 0.5 * var) / sd
    d2 = d1 - sd
    ncdf = jax.scipy.stats.norm.cdf
    npdf = jax.scipy.stats.norm.pdf
    y = cp * (f_eff * ncdf(cp * d1) - strike * ncdf(cp * d2))

    y_f = cp * ncdf(cp * d1)  # ∂Y/∂F (forward delta)
    vega_sd = f_eff * npdf(d1)  # ∂Y/∂sd at fixed F (total-dev vega)
    y_iv = y_f * f_eff * (-0.5 * rho**2) + vega_sd * rho_bar2 / (2.0 * sd)
    y_j = y_f * f_eff * rho
    y_rho = y_f * f_eff * (j - rho * iv) + vega_sd * (-rho * iv / sd)
    y_f0 = y_f * f_eff / f0
    return y, y_iv, y_j, y_rho, y_f0


def _scan_with_tangents(v0_val, zs, us, cvec, dcvecs):
    """Run the mixing scan carrying 5 tangent directions.

    ``zs``/``us``: (steps, ...) draw arrays; state shapes follow their
    trailing dims.  Returns (iv, j, div (5, ...), dj (5, ...))."""
    shape = zs.shape[1:]
    dtype = zs.dtype
    v = jnp.full(shape, v0_val, dtype)
    zero = jnp.zeros(shape, dtype)
    n_dirs = dcvecs.shape[0]
    dv0 = jnp.zeros((n_dirs,) + shape, dtype).at[0].set(1.0)  # ∂V/∂V0 = 1
    dz0 = jnp.zeros((n_dirs,) + shape, dtype)

    def step(carry, inp):
        v, iv, j, dv, div, dj = carry
        z, u = inp
        f = lambda v_, iv_, j_, c_: _mix_step(v_, iv_, j_, z, u, c_)
        (vn, ivn, jn), lin = jax.linearize(f, v, iv, j, cvec)
        dvn, divn, djn = jax.vmap(lin)(dv, div, dj, dcvecs)
        return (vn, ivn, jn, dvn, divn, djn), None

    (v, iv, j, dv, div, dj), _ = jax.lax.scan(
        step, (v, zero, zero, dv0, dz0, dz0), (zs, us)
    )
    return iv, j, div, dj


def heston_mixing_price_and_greeks(prob, method, key=None):
    """Price + full 7-param greek dict for a European vanilla under
    MonteCarlo(HestonDynamics, HestonQE(conditional=True)) in ONE forward
    pass (no reverse sweep over the scan).

    Returns ``(price, greeks)`` with ``greeks`` keyed by :data:`GREEK_ORDER`
    — sensitivities to (spot, V0, kappa, theta, sigma, rho, flat rate), the
    flat-rate greek including the discount-factor term.  Gradients equal
    ``jax.grad`` of the seeded ``solve`` (same draws, same estimator) to
    numerical-roundoff accuracy; cost is a small multiple of the price
    (target <2×, BASELINE.md north star #2).

    The rate greek assumes a flat short rate (HestonInputs' scalar-rate
    auto-wrap); per-pillar curve risk goes through ``jax.grad`` +
    ``ZeroRateSpineLens`` instead.
    """
    from .montecarlo import (
        Antithetic,
        HestonQE,
        MonteCarlo,
        _base_key,
        _normals,
        _qmc_normals_and_uniforms,
    )
    from ..models.dynamics import HestonDynamics

    if not (
        isinstance(method, MonteCarlo)
        and isinstance(method.dynamics, HestonDynamics)
        and isinstance(method.strategy, HestonQE)
        and method.strategy.conditional
    ):
        raise TypeError(
            "heston_mixing_price_and_greeks requires MonteCarlo(HestonDynamics, "
            "HestonQE(conditional=True))"
        )
    require_european(prob.payoff, "heston_mixing_price_and_greeks", spot_only=True)
    if jnp.ndim(prob.payoff.strike) > 0:
        raise TypeError("scalar strike only (vmap externally for grids)")

    market = prob.market_inputs
    config = method.config
    T = yearfrac(market.reference_date, prob.payoff.expiry)
    r0 = zero_rate_yf(market.rate, 0.0)
    steps = config.steps

    # draws: identical streams to _heston_qe_mixing_values (same seed ⇒ same
    # paths ⇒ greeks consistent with the seeded price)
    anti = isinstance(config.variance_reduction, Antithetic)
    base = _base_key(config, key)
    if config.qmc:
        zb, ub = _qmc_normals_and_uniforms(base, steps, 1, config.trajectories)
        zb = zb[:, 0, :]
        z = jnp.stack([zb, -zb]) if anti else zb[None]
        us = jnp.stack([ub, 1.0 - ub]) if anti else ub[None]
    else:
        k_z, k_u = jax.random.split(base)
        z = _normals(k_z, (steps, config.trajectories), anti)
        u = jax.random.uniform(k_u, (steps, config.trajectories), dtype=jnp.float64)
        us = jnp.stack([u, 1.0 - u]) if anti else u[None]

    cvec, dcvecs = mixing_cvec_and_tangents(market.kappa, market.theta, market.sigma, T, steps)
    zs = jnp.moveaxis(z, 1, 0)  # (steps, g, paths)
    us_s = jnp.moveaxis(us, 1, 0)
    iv, j, div, dj = _scan_with_tangents(market.V0, zs, us_s, cvec, dcvecs)

    spot, rho = market.spot, market.rho
    cp = prob.payoff.call_put()
    strike = prob.payoff.strike
    f0 = spot * jnp.exp(r0 * T)
    y, y_iv, y_j, y_rho, y_f0 = cond_bs_value_and_partials(
        iv, j, f0=f0, log_f0_over_k=jnp.log(f0 / strike), strike=strike, rho=rho, cp=cp
    )

    D = df_yf(market.rate, T)
    n = y.size
    price = D * jnp.sum(y) / n

    # scan-direction chain: dY_k = Y_iv·dIV_k + Y_j·dJ_k  (k: V0, κ, θ, σ, T)
    chain = (jnp.sum(y_iv * div, axis=tuple(range(1, div.ndim)))
             + jnp.sum(y_j * dj, axis=tuple(range(1, dj.ndim)))) / n
    m_y_f0 = jnp.sum(y_f0) / n
    m_y_rho = jnp.sum(y_rho) / n

    greeks = {
        "spot": D * m_y_f0 * f0 / spot,
        "V0": D * chain[0],
        "kappa": D * chain[1],
        "theta": D * chain[2],
        "sigma": D * chain[3],
        "rho": D * m_y_rho,
        # flat rate: F0 = S0·e^{rT} inside, e^{-rT} discount outside
        "rate": D * m_y_f0 * f0 * T - T * price,
    }
    return price, greeks
