"""Bachelier (normal-model) analytic pricer — beyond-reference model family
(the reference covers Black-Scholes and Heston; this adds the rates and
commodities desks' normal-vol convention to the same ``solve(problem,
method)`` facade, cf. src/pricing_methods/black_scholes.jl for the facade
pattern).

Closed forms on the T-forward F = S₀/D(T) with normal vol σ_N (price units):

    d      = (F − K)/(σ_N √T)
    call   = D·[(F − K)·Φ(d) + σ_N √T·φ(d)]
    put    = D·[(K − F)·Φ(−d) + σ_N √T·φ(d)]
    digital call (cash c) = D·c·Φ(d)

σ_N = 0 degenerates branchlessly to the discounted intrinsic (the same
double-where guard as the Black-Scholes pricer).  Everything is smooth in
(spot, σ_N, K, rate spine) so AD greeks and calibration flow; strike grids
broadcast.  ``implied_normal_vol`` inverts the vanilla form with the
batched IFT bracketed root (math/rootfind.py) — gradients of the implied
vol w.r.t. the price/forward are implicit-function-theorem exact.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.stats import norm

from ..core.payoffs import DigitalOption, European, VanillaOption
from ..core.problems import AnalyticSolution, PricingProblem
from ..core.solve import AbstractPricingMethod, register_solver
from ..market.inputs import market_yearfrac
from ..market.rate_curve import df
from ..models.dynamics import NormalDynamics
from ..utils.pytree import pytree

__all__ = ["BachelierAnalytic", "bachelier_price", "implied_normal_vol"]


@pytree
class BachelierAnalytic(AbstractPricingMethod):
    """Bachelier closed forms for European vanillas and cash-or-nothing
    digitals on :class:`BachelierInputs` markets."""

    @property
    def dynamics(self):  # log_dynamics protocol (models/dynamics.py)
        return NormalDynamics()


def bachelier_price(forward, strike, vol, T, discount, cp):
    """Undamped Bachelier vanilla price, vectorized and branchless; ``vol``
    is the NORMAL volatility in price units per √year.  σ√T = 0 returns the
    discounted intrinsic (double-where keeps its gradient clean)."""
    sd = vol * jnp.sqrt(T)
    ok = sd > 0.0
    sd_safe = jnp.where(ok, sd, 1.0)
    d = cp * (forward - strike) / sd_safe
    live = sd * norm.pdf(d) + cp * (forward - strike) * norm.cdf(d)
    intrinsic = jnp.maximum(cp * (forward - strike), 0.0)
    return discount * jnp.where(ok, live, intrinsic)


def bachelier_digital_price(forward, strike, vol, T, discount, cp, cash=1.0):
    """Cash-or-nothing digital under the normal model: D·cash·Φ(cp·d)."""
    sd = vol * jnp.sqrt(T)
    ok = sd > 0.0
    sd_safe = jnp.where(ok, sd, 1.0)
    d = cp * (forward - strike) / sd_safe
    live = norm.cdf(d)
    intrinsic = jnp.where(cp * (forward - strike) > 0.0, 1.0, 0.0)
    return discount * cash * jnp.where(ok, live, intrinsic)


def implied_normal_vol(price, forward, strike, T, discount, cp, iters: int = 80):
    """Normal (Bachelier) implied vol from a DISCOUNTED premium (the same
    convention ``bachelier_price`` returns and ``solve(...).price`` quotes).

    Bracketed bisection + IFT Newton polish (math/rootfind.implicit_root):
    the vanilla Bachelier price is strictly increasing in σ_N, and the ATM
    time value σ√T·φ(0) bounds σ below ~2.51·TV/√T, so the bracket
    [0, 8·(TV + |F−K|)/√T] always contains the root for attainable prices.
    Differentiable in (price, forward, strike, discount)."""
    from ..math.rootfind import implicit_root

    tv = price / discount - jnp.maximum(cp * (forward - strike), 0.0)
    hi = 8.0 * (tv + jnp.abs(forward - strike) + 1e-12) / jnp.sqrt(T)

    def f(sigma_n):
        return (
            bachelier_price(forward, strike, sigma_n, T, discount, cp) - price
        )

    return implicit_root(f, jnp.zeros_like(hi), hi, iters=iters)


@register_solver(BachelierAnalytic)
def _solve_bachelier(prob: PricingProblem, method: BachelierAnalytic) -> AnalyticSolution:
    payoff = prob.payoff
    if not isinstance(payoff, (VanillaOption, DigitalOption)):
        raise TypeError(
            f"BachelierAnalytic prices European vanillas and digitals; "
            f"{type(payoff).__name__} has no normal-model closed form here"
        )
    if not isinstance(payoff.exercise_style, European):
        raise TypeError(
            "BachelierAnalytic is European-only (use LSM on the Bachelier "
            "grid for early exercise)"
        )
    from ..market.inputs import forward_spot

    market = prob.market_inputs
    T = market_yearfrac(market, payoff.expiry)
    D = df(market.rate, payoff.expiry)
    F = forward_spot(market, T) / D  # carry-adjusted T-forward
    cp = payoff.call_put()
    if isinstance(payoff, DigitalOption):
        price = bachelier_digital_price(
            F, payoff.strike, market.sigma, T, D, cp, payoff.cash
        )
    else:
        price = bachelier_price(F, payoff.strike, market.sigma, T, D, cp)
    return AnalyticSolution(prob, method, price)
