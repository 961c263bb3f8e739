"""SABR analytic pricer (Hagan et al. 2002) — beyond-reference model family
(the reference covers Black-Scholes and Heston; this adds the rates/FX-desk
standard smile model to the same ``solve(problem, method)`` facade, cf.
src/pricing_methods/black_scholes.jl for the facade pattern).

``hagan_vol`` is the classic lognormal implied-vol expansion:

    σ(F, K) = A · (z/x(z)) · B(T)
    A   = α / [(FK)^{(1−β)/2} · (1 + (1−β)²/24·L² + (1−β)⁴/1920·L⁴)]
    z   = (ν/α) (FK)^{(1−β)/2} L,   L = ln(F/K)
    x(z)= ln[(√(1−2ρz+z²) + z − ρ)/(1−ρ)]
    B   = 1 + [(1−β)²α²/(24 (FK)^{1−β}) + ρβνα/(4 (FK)^{(1−β)/2})
               + (2−3ρ²)ν²/24]·T

with the z → 0 limit z/x(z) → 1 taken branchlessly (series
1 − ρz/2 + (2−3ρ²)z²/12 below |z| = 1e-5 — the exact second-order
expansion of z/x, checked numerically to 1e-12 against the log form).  The price is the Black formula at that vol, so the
whole pricer is one smooth XLA program: jit/vmap/grad in every leaf
(α, ρ, ν, spot, strike) — smile greeks and calibration flow.  β is static
(conventionally fixed, and it shapes non-smooth powers).

Accuracy contract: Hagan's expansion is itself O(T)-approximate — the MC
agreement test uses moderate (ν²T, smile width) where the expansion is
good to ~1e-3 relative, and the β = 1, ν = 0 corner is EXACTLY lognormal
(σ = α), pinned to the BS closed form at 1e-12.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.payoffs import European, VanillaOption
from ..core.problems import AnalyticSolution, PricingProblem
from ..core.solve import AbstractPricingMethod, register_solver
from ..market.inputs import market_yearfrac
from ..market.rate_curve import df
from ..models.dynamics import SABRDynamics
from ..utils.pytree import pytree
from .black_scholes import bs_price

__all__ = ["SABRAnalytic", "hagan_vol"]


@pytree
class SABRAnalytic(AbstractPricingMethod):
    """Black price at Hagan's SABR lognormal implied vol, for European
    vanillas on :class:`SABRInputs` markets."""

    @property
    def dynamics(self):  # log_dynamics protocol (models/dynamics.py)
        return SABRDynamics()


def hagan_vol(forward, strike, T, alpha, beta, rho, nu):
    """Hagan et al. (2002) lognormal SABR implied volatility (vectorized,
    branchless, smooth in every input; ``beta`` should be a static float)."""
    L = jnp.log(forward / strike)
    omb = 1.0 - beta
    fk_pow = (forward * strike) ** (0.5 * omb)
    denom = fk_pow * (1.0 + omb**2 / 24.0 * L**2 + omb**4 / 1920.0 * L**4)
    a_term = alpha / denom

    z = (nu / jnp.maximum(alpha, 1e-30)) * fk_pow * L
    # x(z) = ln((sqrt(1−2ρz+z²) + z − ρ)/(1−ρ)); z/x → 1 as z → 0 with the
    # exact series 1 − ρz/2 + (2−3ρ²)z²/12 (double-where: the ratio is 0/0
    # at z = 0 and would poison gradients)
    small = jnp.abs(z) < 1e-5
    z_safe = jnp.where(small, 1.0, z)
    x = jnp.log(
        (jnp.sqrt(1.0 - 2.0 * rho * z_safe + z_safe**2) + z_safe - rho)
        / (1.0 - rho)
    )
    zx = jnp.where(
        small,
        1.0 - 0.5 * rho * z + (2.0 - 3.0 * rho**2) / 12.0 * z**2,
        z_safe / x,
    )

    b_term = 1.0 + (
        omb**2 / 24.0 * alpha**2 / fk_pow**2
        + 0.25 * rho * beta * nu * alpha / fk_pow
        + (2.0 - 3.0 * rho**2) / 24.0 * nu**2
    ) * T
    return a_term * zx * b_term


@register_solver(SABRAnalytic)
def _solve_sabr_analytic(prob: PricingProblem, method: SABRAnalytic) -> AnalyticSolution:
    payoff = prob.payoff
    if not isinstance(payoff, VanillaOption):
        raise TypeError(
            f"SABRAnalytic prices European VanillaOption (Hagan's expansion "
            f"is an implied-vol formula); got {type(payoff).__name__}"
        )
    if not isinstance(payoff.exercise_style, European):
        raise TypeError("SABRAnalytic is European-only")
    from ..market.inputs import forward_spot

    market = prob.market_inputs
    T = market_yearfrac(market, payoff.expiry)
    D = df(market.rate, payoff.expiry)
    F = forward_spot(market, T) / D  # carry-adjusted T-forward
    vol = hagan_vol(F, payoff.strike, T, market.alpha, market.beta,
                    market.rho, market.nu)
    price = bs_price(F, payoff.strike, vol, T, D, payoff.call_put())
    return AnalyticSolution(prob, method, price)
