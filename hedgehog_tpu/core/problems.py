"""Problem containers and the solution types every method returns.

Parity targets: reference src/pricing_methods/pricing_methods.jl:19-22
(PricingProblem), src/calibration/basket.jl (BasketPricingProblem), and
src/solutions/pricing_solutions.jl (per-method solution types, all carrying
problem/method/price plus method-specific payloads).
"""

from __future__ import annotations

from typing import Any, Tuple

from ..utils.pytree import pytree

__all__ = [
    "PricingProblem",
    "BasketPricingProblem",
    "AnalyticSolution",
    "CRRSolution",
    "MonteCarloSolution",
    "CarrMadanSolution",
    "LSMSolution",
    "BasketPricingSolution",
]


@pytree
class PricingProblem:
    """Payoff + market inputs: the unit of work for every pricing method."""

    payoff: Any
    market_inputs: Any


@pytree
class BasketPricingProblem:
    """Many payoffs priced under one market scenario (basket.jl:10-13).

    ``payoffs`` is a tuple of payoff pytrees (static length).
    """

    payoffs: Tuple[Any, ...]
    market_inputs: Any

    def __post_init__(self):
        object.__setattr__(self, "payoffs", tuple(self.payoffs))


# ------------------ Solutions ------------------


@pytree
class AnalyticSolution:
    problem: Any
    method: Any
    price: Any


@pytree
class CRRSolution:
    problem: Any
    method: Any
    price: Any


@pytree
class MonteCarloSolution:
    """Price plus the terminal-sample ensemble (pricing_solutions.jl:22-27).

    ``ensemble`` is the array of terminal asset prices (or an
    (original, antithetic) tuple under antithetic variates).
    """

    problem: Any
    method: Any
    price: Any
    ensemble: Any


@pytree
class CarrMadanSolution:
    problem: Any
    method: Any
    price: Any
    integral_solution: Any


@pytree
class PDESolution:
    """Finite-difference solution: price plus the t=0 value slice on the
    spot grid (beyond-reference — the reference has no PDE engine).
    ``grid_spots``/``grid_values`` expose the whole V(S, 0) profile (None
    for composite solves like knock-in parity)."""

    problem: Any
    method: Any
    price: Any
    grid_spots: Any
    grid_values: Any


@pytree
class LSMSolution:
    """LSM price + stopping rule + simulated spot grid
    (pricing_solutions.jl:78-84).  ``stopping_info`` is a pair of arrays
    (stop_step[int per path], stop_value[per path])."""

    problem: Any
    method: Any
    price: Any
    stopping_info: Any
    spot_paths: Any


@pytree
class BasketPricingSolution:
    problem: Any
    solutions: Tuple[Any, ...]

    def __post_init__(self):
        object.__setattr__(self, "solutions", tuple(self.solutions))
