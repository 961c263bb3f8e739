"""Hull-White pricing: curve-fitted closed forms + exact short-rate MC.

Beyond-reference asset class (see models/hull_white.py for the math; the
reference — src/market_inputs/rate_curve.jl — treats rates as a
deterministic discounting input only).  The same ``solve(problem, method)``
facade covers:

    ZeroCouponBond  — the curve df (the fit identity; MC: E[pathwise
                      discount], pinned to the curve by the Γ-correction)
    BondOption      — lognormal ZCB-option closed form (σ_p), branchless
                      σ_p → 0 intrinsic
    Caplet/floorlet — scaled bond put/call (the textbook equivalence)
    Swaption        — Jamshidian decomposition: the critical state x* from
                      the IFT-differentiable bracketed root, then a sum of
                      bond options — AD flows through x* correctly
    HullWhiteMonteCarlo — EXACT (x, ∫x) joint transitions at ANY step
                      count with the pathwise stochastic discount; the MC
                      is the agreement oracle for every closed form above

Greeks/calibration: ``a``/``sigma`` are leaves of :class:`HullWhiteInputs`
and the curve enters through P(0, ·) only, so key-rate durations
(ZeroRateSpineLens), dP/dσ (rate vega) and (a, σ) calibration to
caplet/swaption quotes all run through the standard lens machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from ..core.payoffs import BondOption, Call, Caplet, Swaption, ZeroCouponBond
from ..core.problems import AnalyticSolution, MonteCarloSolution, PricingProblem
from ..core.solve import AbstractPricingMethod, register_solver
from ..market.rate_curve import df_yf
from ..math.rootfind import implicit_root
from ..models.hull_white import hw_b, hw_bond, hw_gamma, hw_sigma_p, hw_step_moments
from ..utils.pytree import pytree, static_field
from .montecarlo import Antithetic, SimulationConfig, _base_key, _qmc_normals

__all__ = ["HullWhiteAnalytic", "HullWhiteMonteCarlo", "hw_zbo_price"]

_IR_PAYOFFS = (ZeroCouponBond, BondOption, Caplet, Swaption)


@pytree
class HullWhiteAnalytic(AbstractPricingMethod):
    """Closed forms for the interest-rate payoff family on
    :class:`HullWhiteInputs` markets (see module docstring)."""


@pytree
class HullWhiteMonteCarlo(AbstractPricingMethod):
    """Exact-transition short-rate Monte Carlo: (x, ∫x) drawn jointly from
    the OU transition law per segment (no discretization error at any
    ``config.steps``), stochastic discount exp(−∫r) carried per path.
    ``config.qmc`` draws the (2 × steps)-dimensional Sobol' stream."""

    config: SimulationConfig = static_field(default=SimulationConfig())


def _yf(market, ticks):
    return market.daycount.yearfrac(market.reference_date, ticks)


def hw_zbo_price(market, t_exp, t_bond, strike, cp):
    """ZCB-option closed form: cp = +1 call / −1 put on P(T, S) struck at
    ``strike``, exercising at T = t_exp (year fractions).  σ_p → 0 (or
    T → 0) degenerates branchlessly to the discounted intrinsic."""
    p_t = df_yf(market.rate, t_exp)
    p_s = df_yf(market.rate, t_bond)
    sp = hw_sigma_p(market.a, market.sigma, t_exp, t_bond)
    ok = sp > 1e-14
    sp_safe = jnp.where(ok, sp, 1.0)
    h = jnp.log(p_s / (strike * p_t)) / sp_safe + 0.5 * sp_safe
    live = cp * (p_s * norm.cdf(cp * h) - strike * p_t * norm.cdf(cp * (h - sp_safe)))
    intrinsic = jnp.maximum(cp * (p_s - strike * p_t), 0.0)
    return jnp.where(ok, live, intrinsic)


def _caplet_as_zbo(market, payoff: Caplet):
    """(t_exp, t_end, bond strike K', scale): caplet = scale·ZBP(T, S, K'),
    floorlet = scale·ZBC — the simple-rate/bond-put equivalence."""
    tau = market.daycount.yearfrac(payoff.start, payoff.end)
    k_bond = 1.0 / (1.0 + payoff.strike_rate * tau)
    scale = payoff.notional * (1.0 + payoff.strike_rate * tau)
    return _yf(market, payoff.start), _yf(market, payoff.end), k_bond, scale


def _swap_legs(market, payoff: Swaption):
    """(t_exp, payment yfs (n,), coupons c_i (n,)): the fixed+principal leg
    Σ c_i·P(T, t_i) the payer swaption puts against par."""
    t_exp = _yf(market, payoff.expiry)
    times = jnp.asarray([_yf(market, d) for d in payoff.payment_dates])
    prev = jnp.concatenate([jnp.asarray([t_exp]), times[:-1]])
    taus = times - prev
    c = payoff.strike_rate * taus
    c = c.at[-1].add(1.0)
    return t_exp, times, c


def _jamshidian_strikes(market, t_exp, times, c):
    """Critical x* with Σ c_i·P̂(T, t_i; x*) = 1 (monotone in x — P̂ is a
    decreasing exponential of x) via the IFT-differentiable bracketed root,
    and the per-payment strikes K_i = P̂(T, t_i; x*)."""
    p_t = df_yf(market.rate, t_exp)

    def bond_at(x):
        return hw_bond(
            p_t, df_yf(market.rate, times), market.a, market.sigma,
            t_exp, times, x,
        )

    x_star = implicit_root(lambda x: jnp.sum(c * bond_at(x)) - 1.0, -3.0, 3.0)
    return bond_at(x_star)


@register_solver(HullWhiteAnalytic)
def _solve_hw_analytic(prob: PricingProblem, method: HullWhiteAnalytic):
    payoff, market = prob.payoff, prob.market_inputs
    _require_hw(market, payoff, "HullWhiteAnalytic")
    if isinstance(payoff, ZeroCouponBond):
        price = df_yf(market.rate, _yf(market, payoff.maturity))
    elif isinstance(payoff, BondOption):
        cp = payoff.call_put()
        price = hw_zbo_price(
            market, _yf(market, payoff.expiry), _yf(market, payoff.bond_maturity),
            payoff.strike, cp,
        )
    elif isinstance(payoff, Caplet):
        t_exp, t_end, k_bond, scale = _caplet_as_zbo(market, payoff)
        cp_bond = -payoff.call_put()  # caplet = bond PUT, floorlet = bond CALL
        price = scale * hw_zbo_price(market, t_exp, t_end, k_bond, cp_bond)
    elif isinstance(payoff, Swaption):
        t_exp, times, c = _swap_legs(market, payoff)
        strikes = _jamshidian_strikes(market, t_exp, times, c)
        cp_bond = -1.0 if payoff.payer else 1.0  # payer = basket of bond puts
        per_leg = hw_zbo_price(market, t_exp, times, strikes, cp_bond)
        price = payoff.notional * jnp.sum(c * per_leg)
    return AnalyticSolution(prob, method, price)


def _require_hw(market, payoff, name):
    from ..market.inputs import HullWhiteInputs

    if not isinstance(market, HullWhiteInputs):
        raise TypeError(f"{name} prices on HullWhiteInputs markets; got "
                        f"{type(market).__name__}")
    if not isinstance(payoff, _IR_PAYOFFS):
        raise TypeError(
            f"{name} prices the interest-rate payoff family "
            f"(ZeroCouponBond/BondOption/Caplet/Swaption); got "
            f"{type(payoff).__name__}"
        )


def _hw_paths(market, t_exp, config: SimulationConfig, key):
    """Exact (x_T, ∫₀ᵀ x) per path: (g, paths) each, g = 2 under antithetic.
    One scan over ``config.steps`` exact joint OU transitions."""
    steps, paths = config.steps, config.trajectories
    dt = t_exp / steps
    e1, b_dt, s_x, coef, s_res = hw_step_moments(market.a, market.sigma, dt)
    anti = isinstance(config.variance_reduction, Antithetic)
    base = _base_key(config, key)
    if config.qmc:
        z = _qmc_normals(base, steps, 2, paths)  # (steps, 2, paths)
        z1, z2 = z[:, 0], z[:, 1]
        if anti:
            z1 = jnp.stack([z1, -z1], axis=1)  # (steps, g, paths)
            z2 = jnp.stack([z2, -z2], axis=1)
        else:
            z1, z2 = z1[:, None], z2[:, None]
    else:
        z = jax.random.normal(base, (steps, 2, paths), dtype=jnp.float64)
        z1, z2 = z[:, 0], z[:, 1]
        if anti:
            z1 = jnp.stack([z1, -z1], axis=1)
            z2 = jnp.stack([z2, -z2], axis=1)
        else:
            z1, z2 = z1[:, None], z2[:, None]

    def step(carry, zs):
        x, integ = carry
        zk1, zk2 = zs
        x_new = x * e1 + s_x * zk1
        d_i = x * b_dt + coef * zk1 + s_res * zk2
        return (x_new, integ + d_i), None

    g = z1.shape[1]
    x0 = jnp.zeros((g, paths))
    (x_T, x_int), _ = jax.lax.scan(step, (x0, jnp.zeros_like(x0)), (z1, z2))
    return x_T, x_int


@register_solver(HullWhiteMonteCarlo)
def _solve_hw_mc(prob: PricingProblem, method: HullWhiteMonteCarlo):
    payoff, market = prob.payoff, prob.market_inputs
    _require_hw(market, payoff, "HullWhiteMonteCarlo")
    config = method.config
    if isinstance(payoff, ZeroCouponBond):
        t_exp = _yf(market, payoff.maturity)
        terminal = lambda x: jnp.ones_like(x)  # noqa: E731
    elif isinstance(payoff, BondOption):
        t_exp = _yf(market, payoff.expiry)
        t_bond = _yf(market, payoff.bond_maturity)
        cp = payoff.call_put()
        p_t = df_yf(market.rate, t_exp)

        def terminal(x):
            p = hw_bond(p_t, df_yf(market.rate, t_bond), market.a,
                        market.sigma, t_exp, t_bond, x)
            return jnp.maximum(cp * (p - payoff.strike), 0.0)
    elif isinstance(payoff, Caplet):
        t_exp, t_end, k_bond, scale = _caplet_as_zbo(market, payoff)
        cp_bond = -payoff.call_put()
        p_t = df_yf(market.rate, t_exp)

        def terminal(x):
            p = hw_bond(p_t, df_yf(market.rate, t_end), market.a,
                        market.sigma, t_exp, t_end, x)
            return scale * jnp.maximum(cp_bond * (p - k_bond), 0.0)
    else:  # Swaption
        t_exp, times, c = _swap_legs(market, payoff)
        p_t = df_yf(market.rate, t_exp)
        sign = 1.0 if payoff.payer else -1.0

        def terminal(x):
            p = hw_bond(p_t, df_yf(market.rate, times)[:, None, None],
                        market.a, market.sigma, t_exp, times[:, None, None], x)
            leg = jnp.sum(c[:, None, None] * p, axis=0)
            return payoff.notional * jnp.maximum(sign * (1.0 - leg), 0.0)

    x_T, x_int = _hw_paths(market, t_exp, config, None)
    # pathwise stochastic discount — E[it] is the curve df EXACTLY
    disc = df_yf(market.rate, t_exp) * jnp.exp(
        -x_int - 0.5 * market.sigma**2 * hw_gamma(market.a, t_exp)
    )
    vals = disc * terminal(x_T)
    price = jnp.mean(vals, axis=(0, -1))
    return MonteCarloSolution(prob, method, price, vals)
