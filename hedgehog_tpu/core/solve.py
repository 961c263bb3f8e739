"""The `solve(problem, method)` facade — the single entry point of the
framework, mirroring the reference's SciML-style interface (README.md:11-26,
docs/adr/adr-004-sciml-integration.yaml).

Dispatch is a registry keyed by method class (with MRO walk), replacing Julia
multiple dispatch.  Baskets are handled generically: pricing a
``BasketPricingProblem`` maps the method over payoffs (basket.jl:35-38).

Every registered solver is a pure jax-traceable function, so users can wrap
``solve`` in jit/vmap/grad directly:

    price = jax.jit(lambda p: solve(p, BlackScholesAnalytic()).price)(prob)
"""

from __future__ import annotations

from typing import Any, Callable

from .problems import BasketPricingProblem, BasketPricingSolution, PricingProblem

__all__ = ["solve", "register_solver", "AbstractPricingMethod"]


class AbstractPricingMethod:
    """Base marker for pricing methods (pricing_methods.jl:6)."""


_SOLVERS: dict[type, Callable] = {}


def register_solver(method_cls: type):
    """Register fn(problem, method, *args, **kwargs) for a method class."""

    def deco(fn: Callable) -> Callable:
        _SOLVERS[method_cls] = fn
        return fn

    return deco


def _lookup(method: Any) -> Callable:
    for cls in type(method).__mro__:
        if cls in _SOLVERS:
            return _SOLVERS[cls]
    raise TypeError(f"no solver registered for method {type(method).__name__}")


def solve(problem: Any, method: Any, *args: Any, **kwargs: Any):
    """Solve a pricing / greek / calibration problem with the given method."""
    if isinstance(problem, BasketPricingProblem) and isinstance(method, AbstractPricingMethod):
        sols = tuple(
            solve(PricingProblem(payoff, problem.market_inputs), method, *args, **kwargs)
            for payoff in problem.payoffs
        )
        return BasketPricingSolution(problem, sols)
    return _lookup(method)(problem, method, *args, **kwargs)
