"""Carr-Madan Fourier pricing: damped-call transform over the CF of log S_T.

Parity target: reference src/pricing_methods/carr_madan.jl.  The damped
integrand (carr_madan.jl:61-62, :88-92) is

    integrand(v) = e^{-α·logK}/(2π) · ψ(v) · e^{-i·v·logK}
    ψ(v)         = D(T)·φ(v − (α+1)i) / (α² + α − v² + i·v·(2α+1))

with the call price the real part of ∫_{-bound}^{bound} and puts recovered by
parity (:67-68).

TPU-native quadrature: the reference's adaptive quadgk is not XLA-expressible
(data-dependent subdivision), so we use fixed-node Gauss-Legendre on
(−bound, bound) — with the default 256 nodes the BS-agreement error is ≈1e-12,
far inside the reference's 1e-6 tolerance (price_agreement.jl:53), and the
whole pricer is one fused complex dot product that jit/vmaps over strikes and
differentiates cleanly (Heston calibration gradients flow through here).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.payoffs import require_european
from ..core.problems import CarrMadanSolution, PricingProblem
from ..core.payoffs import parity_transform
from ..core.solve import AbstractPricingMethod, register_solver
from ..market.rate_curve import df
from ..models.dynamics import LognormalDynamics, terminal_log_cf
from ..utils.pytree import pytree, static_field

__all__ = ["CarrMadan"]


@pytree
class CarrMadan(AbstractPricingMethod):
    """Carr-Madan method: damping ``alpha``, integration ``bound``, model
    ``dynamics``, fixed Gauss-Legendre ``nodes`` (replaces QuadGKJL).

    ``engine``: "complex" evaluates the CF in native complex128 (CPU/GPU);
    "pair" evaluates in split real/imag arithmetic, which is what runs
    natively on TPU (no c128 there); "auto" picks by backend.
    """

    alpha: float = static_field(default=1.0)
    bound: float = static_field(default=32.0)
    dynamics: Any = static_field(default=LognormalDynamics())
    nodes: int = static_field(default=256)
    engine: str = static_field(default="auto")


def _gl_nodes(bound: float, n: int):
    x, w = np.polynomial.legendre.leggauss(n)
    return jnp.asarray(x * bound), jnp.asarray(w * bound)


@register_solver(CarrMadan)
def _solve_carr_madan(prob: PricingProblem, method: CarrMadan) -> CarrMadanSolution:
    payoff = prob.payoff
    # European×Spot-only (carr_madan.jl:48)
    require_european(payoff, "CarrMadan", spot_only=True)
    market = prob.market_inputs

    K = payoff.strike
    logK = jnp.log(K)
    alpha = method.alpha
    D = df(market.rate, payoff.expiry)

    engine = method.engine
    if engine == "auto":
        import jax

        engine = "pair" if jax.default_backend() == "tpu" else "complex"

    v, w = _gl_nodes(method.bound, method.nodes)
    damp = jnp.exp(-alpha * logK) / (2.0 * jnp.pi)

    # Array strikes: broadcast K against the quadrature axis and reduce over
    # the trailing (nodes) axis only, so strike grids vectorize like the
    # BS/CRR pricers instead of collapsing into one scalar.
    logK_b = jnp.asarray(logK)[..., None]  # (..., 1) vs v: (nodes,)

    if engine == "pair":
        # split-complex evaluation (TPU-native; math/complexops.py)
        from ..math.complexops import cdiv, cmul
        from ..models.dynamics import terminal_log_cf_pair

        phi_pair = terminal_log_cf_pair(prob, method.dynamics)
        # u = v − (α+1)i
        phi = phi_pair(v, jnp.full_like(v, -(alpha + 1.0)))
        denom = (alpha**2 + alpha - v**2, v * (2.0 * alpha + 1.0))
        psi = cdiv((D * phi[0], D * phi[1]), denom)
        osc = (jnp.cos(v * logK_b), -jnp.sin(v * logK_b))  # e^{-i v logK}
        integrand_re = damp[..., None] * cmul(psi, osc)[0]
        call_price = jnp.sum(w * integrand_re, axis=-1)
        integral = call_price
    else:
        # native complex128 (carr_madan.jl:88-92)
        phi = terminal_log_cf(prob, method.dynamics)
        numerator = D * phi(v - (alpha + 1.0) * 1j)
        denominator = alpha**2 + alpha - v**2 + 1j * v * (2.0 * alpha + 1.0)
        integrand = damp[..., None] * (numerator / denominator) * jnp.exp(-1j * v * logK_b)
        integral = jnp.sum(w * integrand, axis=-1)
        call_price = jnp.real(integral)
    if jnp.ndim(K) == 0:
        call_price = jnp.reshape(call_price, ())
        integral = jnp.reshape(integral, ())
    price = parity_transform(call_price, payoff, market.spot, market.rate)
    return CarrMadanSolution(prob, method, price, integral)
