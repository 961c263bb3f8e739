"""Sensitivities: lens-parameterized 1st/2nd-order Greeks by AD, FD, or
closed form, plus single-pass batched Greek vectors.

Parity target: reference src/greeks/greeks_problem.jl.  The core pattern is
identical — "rewrite parameter through a lens, re-solve, differentiate"
(greeks_problem.jl:249-262) — but the differentiation engine is JAX:

- ``ForwardAD``  → ``jax.jvp`` through the full pricing pipeline (the
  replacement for ForwardDiff Dual numbers; works through MC simulators with
  fixed RNG = pathwise derivatives).
- ``ReverseAD``  → ``jax.grad``; used automatically by ``BatchGreekProblem``
  so a full Greek vector costs one backward pass (<2× price cost) instead of
  the reference's N re-solves (greeks_problem.jl:559-568).
- ``FiniteDifference`` → forward/backward/central with *relative* bumps
  ``x₀(1±ε)`` for first order (:279-303) and *absolute* stencils for second
  order (:395-422), matching the reference's conventions exactly.
- ``AnalyticGreek`` → Black-Scholes closed forms incl. the tick-denominated
  theta convention (:437-530).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from ..core.dates import MILLISECONDS_IN_YEAR_365
from ..core.lenses import FieldLens, Lens, SpotLens, VolLens
from ..core.solve import register_solver, solve
from ..market.rate_curve import zero_rate_yf
from ..utils.pytree import pytree, static_field

__all__ = [
    "GreekProblem",
    "SecondOrderGreekProblem",
    "BatchGreekProblem",
    "GreekMethod",
    "GreekResult",
    "ForwardAD",
    "ReverseAD",
    "FiniteDifference",
    "AnalyticGreek",
    "FDForward",
    "FDBackward",
    "FDCentral",
]


class GreekMethod:
    """Marker base for Greek calculation methods."""


class FDScheme:
    pass


@pytree
class FDForward(FDScheme):
    pass


@pytree
class FDBackward(FDScheme):
    pass


@pytree
class FDCentral(FDScheme):
    pass


@pytree
class ForwardAD(GreekMethod):
    """Forward-mode AD (jax.jvp) — one dual pass per lens."""


@pytree
class ReverseAD(GreekMethod):
    """Reverse-mode AD (jax.grad) — whole Greek vector in one backward pass."""


@pytree
class FiniteDifference(GreekMethod):
    bump: Any = 1e-4
    scheme: FDScheme = static_field(default=FDCentral())


@pytree
class AnalyticGreek(GreekMethod):
    """Closed-form Black-Scholes Greeks."""


@pytree
class GreekResult:
    greek: Any


@pytree
class GreekProblem:
    pricing_problem: Any
    wrt: Lens = static_field(default=SpotLens())


@pytree
class SecondOrderGreekProblem:
    pricing_problem: Any
    wrt1: Lens = static_field(default=SpotLens())
    wrt2: Lens = static_field(default=SpotLens())


@pytree
class BatchGreekProblem:
    pricing_problem: Any
    lenses: Tuple[Lens, ...] = static_field(default=())

    def __post_init__(self):
        object.__setattr__(self, "lenses", tuple(self.lenses))


def _price_fn(prob, lens, pricing_method):
    return lambda x: solve(lens.set(prob, x), pricing_method).price


def _price_fn2(prob, lens1, lens2, pricing_method):
    return lambda x, y: solve(lens2.set(lens1.set(prob, x), y), pricing_method).price


# ------------------ AD ------------------


@register_solver(ForwardAD)
def _solve_forward_ad(gprob, method: ForwardAD, pricing_method):
    if isinstance(gprob, BatchGreekProblem):
        return _batch_greeks(gprob, method, pricing_method)
    prob = gprob.pricing_problem
    if isinstance(gprob, SecondOrderGreekProblem):
        lens1, lens2 = gprob.wrt1, gprob.wrt2
        x0, y0 = lens1.get(prob), lens2.get(prob)
        f = _price_fn2(prob, lens1, lens2, pricing_method)
        if lens1 == lens2:
            # d²/dx² via nested jvp on the diagonal (greeks_problem.jl:372-373)
            def df_dx(x):
                return jax.jvp(lambda z: f(x, z), (x,), (jnp.ones_like(x),))[1]

            deriv = jax.jvp(df_dx, (jnp.asarray(x0, jnp.float64),), (1.0,))[1]
        else:
            def df_dy(x):
                return jax.jvp(lambda y: f(x, y), (jnp.asarray(y0, jnp.float64),), (1.0,))[1]

            deriv = jax.jvp(df_dy, (jnp.asarray(x0, jnp.float64),), (1.0,))[1]
        return GreekResult(deriv)
    lens = gprob.wrt
    x0 = jnp.asarray(lens.get(prob), jnp.float64)
    f = _price_fn(prob, lens, pricing_method)
    _, deriv = jax.jvp(f, (x0,), (jnp.ones_like(x0),))
    return GreekResult(deriv)


@register_solver(ReverseAD)
def _solve_reverse_ad(gprob, method: ReverseAD, pricing_method):
    if isinstance(gprob, BatchGreekProblem):
        return _batch_greeks(gprob, method, pricing_method)
    prob = gprob.pricing_problem
    if isinstance(gprob, SecondOrderGreekProblem):
        lens1, lens2 = gprob.wrt1, gprob.wrt2
        x0 = lens1.get(prob)
        if lens1 == lens2:
            # single underlying parameter: plain second derivative of
            # g(x)=price(set x) — no mixed-derivative pass needed
            g = _price_fn(prob, lens1, pricing_method)
            deriv = jax.grad(jax.grad(g))(jnp.asarray(x0, jnp.float64))
        else:
            y0 = lens2.get(prob)
            f = _price_fn2(prob, lens1, lens2, pricing_method)
            deriv = jax.grad(jax.grad(f, argnums=0), argnums=1)(
                jnp.asarray(x0, jnp.float64), jnp.asarray(y0, jnp.float64)
            )
        return GreekResult(deriv)
    lens = gprob.wrt
    x0 = jnp.asarray(lens.get(prob), jnp.float64)
    f = _price_fn(prob, lens, pricing_method)
    return GreekResult(jax.grad(f)(x0))


def _batch_greeks(gprob: BatchGreekProblem, method, pricing_method):
    """Full Greek vector in one pass.

    ReverseAD: single jax.grad over the stacked parameter vector — all N
    sensitivities for ~1 backward pass (<2× price).  ForwardAD: jacfwd (N
    dual passes), matching the reference's semantics when forward mode is
    explicitly requested.
    """
    prob = gprob.pricing_problem
    lenses = gprob.lenses
    x0 = jnp.stack([jnp.asarray(lens.get(prob), jnp.float64) for lens in lenses])

    def f(x):
        p = prob
        for i, lens in enumerate(lenses):
            p = lens.set(p, x[i])
        return solve(p, pricing_method).price

    if isinstance(method, ForwardAD):
        g = jax.jacfwd(f)(x0)
    else:
        g = jax.grad(f)(x0)
    return dict(zip(lenses, [g[i] for i in range(len(lenses))]))


# ------------------ Finite differences ------------------


@register_solver(FiniteDifference)
def _solve_fd(gprob, method: FiniteDifference, pricing_method):
    if isinstance(gprob, BatchGreekProblem):
        return {
            lens: solve(
                GreekProblem(gprob.pricing_problem, lens), method, pricing_method
            ).greek
            for lens in gprob.lenses
        }
    prob = gprob.pricing_problem
    eps = method.bump
    if isinstance(gprob, SecondOrderGreekProblem):
        lens1, lens2 = gprob.wrt1, gprob.wrt2
        x0, y0 = lens1.get(prob), lens2.get(prob)
        f = _price_fn2(prob, lens1, lens2, pricing_method)
        if lens1 == lens2:
            deriv = (f(x0 + eps, y0 + eps) - 2.0 * f(x0, y0) + f(x0 - eps, y0 - eps)) / eps**2
        else:
            deriv = (
                f(x0 + eps, y0 + eps)
                - f(x0 + eps, y0 - eps)
                - f(x0 - eps, y0 + eps)
                + f(x0 - eps, y0 - eps)
            ) / (4.0 * eps**2)
        return GreekResult(deriv)
    lens = gprob.wrt
    x0 = lens.get(prob)
    f = _price_fn(prob, lens, pricing_method)
    scheme = method.scheme
    # relative bump x0·(1±ε) as in the reference (greeks_problem.jl:279-303),
    # degrading to an absolute ε bump when x0 == 0 (the reference NaNs there)
    scale = jnp.where(jnp.abs(jnp.asarray(x0, jnp.float64)) > 1e-12, x0, 1.0)
    if isinstance(scheme, FDForward):
        deriv = (f(x0 + scale * eps) - f(x0)) / (scale * eps)
    elif isinstance(scheme, FDBackward):
        deriv = (f(x0) - f(x0 - scale * eps)) / (scale * eps)
    else:
        deriv = (f(x0 + scale * eps) - f(x0 - scale * eps)) / (2 * eps * scale)
    return GreekResult(deriv)


# ------------------ Analytic Black-Scholes Greeks ------------------


def _bs_geometry(prob):
    # shared with the pricer (methods/black_scholes.bs_geometry) so analytic
    # greeks differentiate the price actually produced — in particular the
    # surface vol is looked up from the SURFACE's reference date, exactly as
    # the pricer does (the reference itself diverges here,
    # greeks_problem.jl:453 vs black_scholes.jl:47)
    from ..methods.black_scholes import bs_geometry

    T, K, sigma, D, F, sqrtT, d1, d2 = bs_geometry(prob)
    return prob.market_inputs, prob.payoff, T, K, sigma, D, F, sqrtT, d1, d2


def _is_spot_lens(lens) -> bool:
    return isinstance(lens, SpotLens) or (
        isinstance(lens, FieldLens) and lens.path == "market_inputs.spot"
    )


def _is_expiry_lens(lens) -> bool:
    return isinstance(lens, FieldLens) and lens.path == "payoff.expiry"


def _is_vol_lens(lens) -> bool:
    return isinstance(lens, VolLens) or (
        isinstance(lens, FieldLens) and lens.path == "market_inputs.sigma.sigma"
    )


@register_solver(AnalyticGreek)
def _solve_analytic_greek(gprob, method: AnalyticGreek, pricing_method=None):
    if isinstance(gprob, BatchGreekProblem):
        return {
            lens: _solve_analytic_greek(
                GreekProblem(gprob.pricing_problem, lens), method, pricing_method
            ).greek
            for lens in gprob.lenses
        }
    prob = gprob.pricing_problem
    from ..core.payoffs import VanillaOption

    if not isinstance(prob.payoff, VanillaOption):
        raise TypeError(
            "AnalyticGreek implements the Black-Scholes VANILLA closed forms "
            f"(greeks_problem.jl:437-530); {type(prob.payoff).__name__} greeks "
            "are available via ForwardAD/ReverseAD/FiniteDifference"
        )
    inputs, payoff, T, K, sigma, D, F, sqrtT, d1, d2 = _bs_geometry(prob)
    cp = payoff.call_put()
    from ..market.inputs import carry_yield

    q = carry_yield(inputs)
    qf = jnp.exp(-q * T)  # carry factor e^{−qT} (1.0 without dividends)

    if isinstance(gprob, SecondOrderGreekProblem):
        lens1, lens2 = gprob.wrt1, gprob.wrt2
        if _is_spot_lens(lens1) and _is_spot_lens(lens2):
            # Gamma = e^{−qT}·φ(d1) / (S σ √T)
            greek = qf * norm.pdf(d1) / (inputs.spot * sigma * sqrtT)
        elif _is_vol_lens(lens1) and _is_vol_lens(lens2):
            vega = D * F * norm.pdf(d1) * sqrtT
            greek = vega * d1 * d2 / sigma
        else:
            raise ValueError("Unsupported second-order analytic Greek")
        return GreekResult(greek)

    lens = gprob.wrt
    if _is_spot_lens(lens):
        greek = qf * cp * norm.cdf(cp * d1)
    elif _is_vol_lens(lens):
        greek = D * F * norm.pdf(d1) * sqrtT  # F is carry-adjusted already
    elif _is_expiry_lens(lens):
        # dPrice/d(expiry ticks): flat-rate assumption, per-tick convention
        # (greeks_problem.jl:472-475). Sign is positive because it is the
        # derivative against expiry, not against time-to-maturity.  With
        # carry q the S leg decays at q: −q·S·e^{−qT}·N(cp·d1)·cp joins.
        r = zero_rate_yf(inputs.rate, T)
        greek = (
            r * K * D * norm.cdf(cp * d2) * cp
            - q * F * D * norm.cdf(cp * d1) * cp
            + F * D * sigma * norm.pdf(d1) / (2.0 * sqrtT)
        ) / MILLISECONDS_IN_YEAR_365
    else:
        raise ValueError("Unsupported lens for analytic Greek")
    return GreekResult(greek)
