"""Black-Scholes analytic pricing (forward-measure closed form).

Parity target: reference src/pricing_methods/black_scholes.jl.  The pricer is
fully vectorized: strike/expiry/spot/vol may be arrays, so one call prices a
whole strike×expiry grid on the VPU (the reference's scalar closed form is the
degenerate case).  Zero volatility falls back to discounted intrinsic via a
branchless select (black_scholes.jl:53-54).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.stats import norm

from ..core.dates import yearfrac
from ..core.problems import AnalyticSolution, PricingProblem
from ..core.solve import AbstractPricingMethod, register_solver
from ..market.rate_curve import df
from ..market.vol_surface import get_vol
from ..utils.pytree import pytree

__all__ = ["BlackScholesAnalytic", "bs_price", "bs_digital_price", "bs_geometry"]


@pytree
class BlackScholesAnalytic(AbstractPricingMethod):
    """Closed-form Black-Scholes for European vanilla options."""


def bs_geometry(prob: PricingProblem):
    """Shared Black-Scholes geometry (T, K, σ, D, F, √T, d1, d2).

    Single source of truth for the pricer AND the analytic greeks — the vol
    is looked up exactly as the pricer does (surface's own reference date),
    so greeks are derivatives of the price actually produced.
    """
    payoff = prob.payoff
    market = prob.market_inputs
    K = payoff.strike
    sigma = get_vol(market.sigma, payoff.expiry, K)
    T = yearfrac(market.reference_date, payoff.expiry)
    D = df(market.rate, payoff.expiry)
    F = market.spot / D
    sqrtT = jnp.sqrt(T)
    sigma_safe = jnp.where(sigma > 0, sigma, 1.0)
    d1 = (jnp.log(F / K) + 0.5 * sigma_safe**2 * T) / (sigma_safe * sqrtT)
    d2 = d1 - sigma_safe * sqrtT
    return T, K, sigma, D, F, sqrtT, d1, d2


def bs_price(forward, strike, vol, T, discount, cp):
    """Undiscounted-forward Black formula, vectorized & branchless.

    price = D·cp·(F·N(cp·d1) − K·N(cp·d2)); σ==0 → discounted intrinsic.
    """
    sqrtT = jnp.sqrt(T)
    sigma_safe = jnp.where(vol > 0, vol, 1.0)
    d1 = (jnp.log(forward / strike) + 0.5 * sigma_safe**2 * T) / (sigma_safe * sqrtT)
    d2 = d1 - sigma_safe * sqrtT
    bs = discount * cp * (forward * norm.cdf(cp * d1) - strike * norm.cdf(cp * d2))
    intrinsic = discount * jnp.maximum(cp * (forward - strike), 0.0)
    return jnp.where((vol > 0) & (T > 0), bs, intrinsic)


def bs_digital_price(forward, strike, vol, T, discount, cp, cash=1.0):
    """Cash-or-nothing digital closed form, vectorized & branchless:
    price = D·cash·N(cp·d2); σ==0 or T==0 → discounted indicator."""
    sqrtT = jnp.sqrt(T)
    sigma_safe = jnp.where(vol > 0, vol, 1.0)
    d2 = (jnp.log(forward / strike) - 0.5 * sigma_safe**2 * T) / (sigma_safe * sqrtT)
    bs = discount * cash * norm.cdf(cp * d2)
    intrinsic = discount * cash * jnp.where(cp * (forward - strike) > 0.0, 1.0, 0.0)
    return jnp.where((vol > 0) & (T > 0), bs, intrinsic)


@register_solver(BlackScholesAnalytic)
def _solve_bs_analytic(prob: PricingProblem, method: BlackScholesAnalytic) -> AnalyticSolution:
    payoff = prob.payoff
    market = prob.market_inputs
    from ..core.payoffs import DigitalOption, require_european

    require_european(payoff, "BlackScholesAnalytic")

    K = payoff.strike
    sigma = get_vol(market.sigma, payoff.expiry, K)
    cp = payoff.call_put()
    T = yearfrac(market.reference_date, payoff.expiry)
    D = df(market.rate, payoff.expiry)
    F = market.spot / D

    if isinstance(payoff, DigitalOption):
        price = bs_digital_price(F, K, sigma, T, D, cp, payoff.cash)
    else:
        price = bs_price(F, K, sigma, T, D, cp)
    return AnalyticSolution(prob, method, price)
