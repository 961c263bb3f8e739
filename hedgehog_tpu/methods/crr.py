"""Cox-Ross-Rubinstein binomial tree as a `lax.scan` backward induction.

Parity target: reference src/pricing_methods/cox_ross_rubinstein.jl.
Forward-measure tree: up factor ``u = exp(σ√ΔT)``, down ``1/u``, up
probability ``p = 1/(1+u)`` (so the forward is a martingale), per-step
discount ``exp(-z(T)·ΔT)`` (crr.jl:113-130).  European + American exercise;
Spot or Forward underlying semantics (Spot discounts the forward node values
back with the curve, crr.jl:77-97).

TPU design: the shrinking tree is a fixed-width ``(steps+1,)`` vector.  Each
backward contraction reads ``v[j]`` and ``v[j+1]``; after ``k`` steps slot
``j`` depends only on initial slots ``j..j+k``, all of which are valid payoff
nodes, so no masking is needed and slot 0 holds the root price after ``steps``
contractions.  The whole induction is one ``lax.scan`` — XLA compiles it to a
tight on-chip loop, and the pricer can be vmapped over strike/expiry batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dates import yearfrac
from ..core.payoffs import American, Spot
from ..core.problems import CRRSolution, PricingProblem
from ..core.solve import AbstractPricingMethod, register_solver
from ..market.rate_curve import df, zero_rate, zero_rate_yf
from ..market.inputs import market_yearfrac
from ..market.vol_surface import get_vol
from ..utils.pytree import pytree, static_field

__all__ = ["CoxRossRubinsteinMethod"]


@pytree
class CoxRossRubinsteinMethod(AbstractPricingMethod):
    steps: int = static_field(default=100)


@register_solver(CoxRossRubinsteinMethod)
def _solve_crr(prob: PricingProblem, method: CoxRossRubinsteinMethod) -> CRRSolution:
    payoff = prob.payoff
    market = prob.market_inputs
    steps = method.steps

    from ..core.payoffs import AsianOption, BarrierOption

    if isinstance(payoff, (BarrierOption, AsianOption)):
        raise TypeError(
            f"CRR's backward induction carries no path state (knock flag / "
            f"running average); {type(payoff).__name__} prices analytically "
            f"under Black-Scholes (where a closed form exists) or via grid "
            f"Monte Carlo"
        )

    if jnp.ndim(payoff.strike) > 0:
        # Strike grid: one tree per strike, batched along a LEADING strike
        # axis with the node axis last — the same in-method grid contract as
        # BS/Carr-Madan/conditional-MC.  The tree value vector becomes
        # (m, steps+1); per-strike vols (RectVolSurface smiles) make u/p
        # (m, 1) and broadcast cleanly through the backward contraction.
        import dataclasses

        payoff = dataclasses.replace(payoff, strike=jnp.asarray(payoff.strike)[:, None])
        prob = PricingProblem(payoff, market)

    sigma = get_vol(market.sigma, payoff.expiry, payoff.strike)
    T = market_yearfrac(market, payoff.expiry)
    D_T = df(market.rate, payoff.expiry)
    forward = market.spot / D_T
    dT = T / steps
    u = jnp.exp(sigma * jnp.sqrt(dT))
    p = 1.0 / (1.0 + u)
    step_discount = jnp.exp(-zero_rate(market.rate, payoff.expiry) * dT)

    j = jnp.arange(steps + 1)
    is_american = isinstance(payoff.exercise_style, American)
    on_spot = isinstance(payoff.underlying, Spot)

    # Terminal payoff over all steps+1 leaves (exponents -steps, -steps+2, …, steps).
    value0 = payoff(forward * u ** (2 * j - steps))

    rate_curve = market.rate

    def step_fn(value, i):
        # i runs steps-1 … 0. Contraction: v'[j] = disc·(p·v[j+1] + (1-p)·v[j]).
        v_up = jnp.roll(value, -1, axis=-1)  # v[j+1]; last slot garbage, never consumed
        continuation = step_discount * (p * v_up + (1.0 - p) * value)
        if is_american:
            fwd_nodes = forward * u ** (2 * j - i)
            if on_spot:
                # Discount forward nodes to spot at time i·ΔT (crr.jl:77-83);
                # the zero-rate lookup stays in year fractions (a tick
                # round-trip would shift the tenor by the curve's day-count
                # ratio on non-ACT/365 markets)
                underlying = jnp.exp(-zero_rate_yf(rate_curve, i * dT) * (steps - i) * dT) * fwd_nodes
            else:
                underlying = fwd_nodes
            new_value = jnp.maximum(continuation, payoff(underlying))
        else:
            new_value = continuation
        return new_value, None

    steps_rev = jnp.arange(steps - 1, -1, -1)
    value_final, _ = jax.lax.scan(step_fn, value0, steps_rev)
    return CRRSolution(prob, method, value_final[..., 0])
