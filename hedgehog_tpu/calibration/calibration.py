"""Calibration: fit lens-selected parameters to quoted prices.

Parity target: reference src/calibration/calibration.jl.
``CalibrationProblem`` wraps a basket + lenses + quotes; it is solved either by

- ``OptimizerAlgo`` — least-squares via box-bounded L-BFGS driven by
  ``jax.value_and_grad`` through the pricers (the AutoForwardDiff+LBFGS path,
  calibration.jl:74-98), or
- ``RootFinderAlgo`` — scalar bracketed root-find on (1e-6, 5.0) for
  single-instrument implied-parameter problems (calibration.jl:126-145), with
  implicit-function-theorem gradients so calibrated values are themselves
  differentiable market objects.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from ..core.problems import BasketPricingProblem, PricingProblem
from ..core.solve import register_solver, solve
from ..math.optimize import minimize_lbfgs
from ..math.rootfind import implicit_root_full
from ..utils.pytree import pytree, static_field

__all__ = ["CalibrationProblem", "OptimizerAlgo", "RootFinderAlgo", "CalibrationSolution"]


@pytree
class CalibrationProblem:
    """Basket + pricing method + lens-per-parameter + quotes + initial guess
    (calibration.jl:16-29)."""

    pricing_problem: BasketPricingProblem
    quotes: Any
    initial_guess: Any
    pricing_method: Any = static_field(default=None)
    accessors: Tuple[Any, ...] = static_field(default=())

    def __post_init__(self):
        object.__setattr__(self, "accessors", tuple(self.accessors))


class CalibrationAlgo:
    pass


@pytree
class OptimizerAlgo(CalibrationAlgo):
    """Least-squares calibration via box-bounded L-BFGS (calibration.jl:46-58)."""

    max_iters: int = static_field(default=200)


@pytree
class RootFinderAlgo(CalibrationAlgo):
    """Scalar bracketed root-finding calibration (calibration.jl:106-117).

    Default bracket matches the reference's IntervalNonlinearProblem
    (1e-6, 5.0) (calibration.jl:143)."""

    lo: float = static_field(default=1e-6)
    hi: float = static_field(default=5.0)
    iters: int = static_field(default=80)


@pytree
class CalibrationSolution:
    """Calibrated parameter vector ``u`` + fit diagnostics."""

    problem: Any
    u: Any
    loss: Any = 0.0
    converged: Any = True
    iterations: Any = 0

    @property
    def price(self):  # convenience for symmetric APIs
        return self.u


def _apply_lenses(basket: BasketPricingProblem, lenses, x):
    prob = basket
    for i, lens in enumerate(lenses):
        prob = lens.set(prob, x[i])
    return prob


def _homogeneous_payoffs(payoffs) -> bool:
    """True when all payoffs share markers (stackable into one vmapped solve)."""
    from ..core.payoffs import VanillaOption

    if not all(isinstance(p, VanillaOption) for p in payoffs):
        return False
    first = payoffs[0]
    return all(
        (type(p.exercise_style), type(p.call_put), type(p.underlying))
        == (type(first.exercise_style), type(first.call_put), type(first.underlying))
        for p in payoffs
    )


def _basket_prices(basket: BasketPricingProblem, method):
    """Price a basket; homogeneous vanilla baskets are stacked and vmapped —
    one XLA program instead of len(payoffs) subgraphs (SURVEY §2c instrument
    parallelism), which matters inside calibration loops."""
    import dataclasses

    import jax

    from ..core.solve import _conditional_basket_fast_path

    # conditional-MC Heston vanillas: the WHOLE basket prices from one
    # variance-path simulation (expiry-grouped mixing surface) — the
    # cheapest differentiable objective for MC-direct calibration
    fast = _conditional_basket_fast_path(basket, method)
    if fast is not None:
        return jnp.stack([s.price for s in fast.solutions])

    payoffs = basket.payoffs
    if len(payoffs) > 1 and _homogeneous_payoffs(payoffs):
        strikes = jnp.stack([jnp.asarray(p.strike, jnp.float64) for p in payoffs])
        expiries = jnp.stack([jnp.asarray(p.expiry, jnp.float64) for p in payoffs])

        def price_one(k, e):
            payoff = dataclasses.replace(payoffs[0], strike=k, expiry=e)
            return solve(PricingProblem(payoff, basket.market_inputs), method).price

        return jax.vmap(price_one)(strikes, expiries)
    return jnp.stack(
        [
            solve(PricingProblem(p, basket.market_inputs), method).price
            for p in payoffs
        ]
    )


@register_solver(OptimizerAlgo)
def _solve_calibration_opt(calib: CalibrationProblem, algo: OptimizerAlgo, *, lb=None, ub=None):
    quotes = jnp.asarray(calib.quotes, jnp.float64)

    def objective(x):
        updated = _apply_lenses(calib.pricing_problem, calib.accessors, x)
        prices = _basket_prices(updated, calib.pricing_method)
        return jnp.sum((prices - quotes) ** 2)

    x0 = jnp.asarray(calib.initial_guess, jnp.float64)
    res = minimize_lbfgs(objective, x0, lb=lb, ub=ub, max_iters=algo.max_iters)
    return CalibrationSolution(
        calib, res.x, loss=res.loss, converged=res.converged, iterations=res.iterations
    )


@register_solver(RootFinderAlgo)
def _solve_calibration_root(calib: CalibrationProblem, algo: RootFinderAlgo):
    if len(calib.accessors) != 1:
        raise ValueError("Root-finding only supports calibration of a single parameter")
    lens = calib.accessors[0]
    quotes = jnp.asarray(calib.quotes, jnp.float64)
    if quotes.ndim == 0:
        quotes = quotes[None]
    if len(calib.pricing_problem.payoffs) != 1 or quotes.shape[0] != 1:
        raise ValueError("Root-finding expects a single instrument and quote")
    prob = PricingProblem(calib.pricing_problem.payoffs[0], calib.pricing_problem.market_inputs)

    def f(x):
        return solve(lens.set(prob, x), calib.pricing_method).price - quotes[0]

    res = implicit_root_full(f, algo.lo, algo.hi, iters=algo.iters)
    # diagnostics come free from the solve (calibration.jl:126-145 parity
    # with OptimizerAlgo's loss/converged fields): the residual is f at the
    # bisection root — already evaluated by the IFT Newton polish — and
    # converged records whether the bracket actually contained a sign change
    return CalibrationSolution(
        calib,
        jnp.asarray([res.root])[0],
        loss=res.residual**2,
        converged=res.converged,
        iterations=algo.iters,
    )
