"""Merton (1976) jump-diffusion analytic pricer — beyond-reference model
family (the reference covers Black-Scholes and Heston only; this slots the
classic third textbook model into the same ``solve(problem, method)``
facade, cf. src/pricing_methods/black_scholes.jl for the facade pattern).

The closed form is the Poisson-weighted Black-Scholes series (the tower law
over the jump count — conditional on N = n jumps, log S_T is normal):

    price = Σ_{n≥0} e^{−λT} (λT)^n / n! · Black(F_n, K, σ_n, T)

with the n-conditional forward F_n = S0·e^{(r − λκ̄)T + n(μ_J + σ_J²/2)},
total variance σ_n²T = σ²T + n σ_J², the market discount e^{−rT}, and
κ̄ = e^{μ_J+σ_J²/2} − 1 (the martingale compensator: Σ w_n F_n = S0·e^{rT}).
The series is truncated at a fixed ``n_terms`` (static), so the whole pricer
is one fixed-shape XLA program: jit/vmap/grad-compatible, strike grids
supported, digital options via the same conditional decomposition with the
digital closed form.

Truncation: the tail mass beyond n_terms is e^{−λT}(λT)^{n+1}/(n+1)!·…;
at the default 30 terms it is < 1e-22 for λT ≤ 5 — far below f64 noise for
any realistic market.  Agreement with Carr-Madan on the Merton CF is tested
to 1e-8 (tests/unit/test_merton.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..core.payoffs import DigitalOption, European, VanillaOption
from ..core.problems import AnalyticSolution, PricingProblem
from ..core.solve import AbstractPricingMethod, register_solver
from ..market.rate_curve import df
from ..models.dynamics import MertonJumpDynamics, merton_terminal_params
from ..utils.pytree import pytree, static_field
from .black_scholes import bs_digital_price, bs_price

__all__ = ["MertonAnalytic"]


@pytree
class MertonAnalytic(AbstractPricingMethod):
    """Poisson-weighted Black-Scholes series for European vanillas and
    cash-or-nothing digitals under :class:`MertonInputs` markets."""

    n_terms: int = static_field(default=30)

    @property
    def dynamics(self):  # log_dynamics protocol (models/dynamics.py)
        return MertonJumpDynamics()


def _check_series_terms(rate, n_terms: int) -> None:
    """Hard truncation guard (the analytic mirror of the MC path's
    _merton_poisson_trips raise): when λT is concrete, the Poisson tail
    mass beyond ``n_terms`` must be < 1e-8 — a fixed 30-term series at
    λT ≳ 15 silently misprices by percent-level otherwise.  Traced rates
    skip the check (jit/grad cannot branch); size ``n_terms`` for the
    largest intensity the traced program will see."""
    import math

    try:
        r = float(rate)
    except Exception:
        return
    p = math.exp(-r)
    cdf = p
    for k in range(1, n_terms):
        p *= r / k
        cdf += p
    if cdf < 1.0 - 1e-8:
        raise ValueError(
            f"MertonAnalytic(n_terms={n_terms}) truncates {1.0 - cdf:.2e} of "
            f"the Poisson mass at λT ≈ {r:.1f}; raise n_terms (≈ λT + 10√(λT)"
            f" + 15) or price via CarrMadan(MertonJumpDynamics())"
        )


def _series_weights(lam_prime_T, n_terms: int):
    n = jnp.arange(n_terms, dtype=jnp.result_type(lam_prime_T))
    log_w = -lam_prime_T + n * jnp.log(jnp.maximum(lam_prime_T, 1e-300)) - gammaln(n + 1.0)
    # λ'T == 0 (no jumps): all mass on n=0
    w = jnp.where(lam_prime_T > 0, jnp.exp(log_w), jnp.where(n == 0, 1.0, 0.0))
    return n, w


@register_solver(MertonAnalytic)
def _solve_merton_analytic(prob: PricingProblem, method: MertonAnalytic) -> AnalyticSolution:
    payoff = prob.payoff
    if not isinstance(payoff, (VanillaOption, DigitalOption)):
        raise TypeError(
            f"MertonAnalytic prices European VanillaOption/DigitalOption; "
            f"got {type(payoff).__name__}"
        )
    if not isinstance(payoff.exercise_style, European):
        raise TypeError("MertonAnalytic is European-only (use LSM/CRR for early exercise)")
    market = prob.market_inputs
    log_s0, r, T, sigma, lam, mu_j, s_j, kbar = merton_terminal_params(
        market, payoff.expiry
    )
    discount = df(market.rate, payoff.expiry)
    cp = payoff.call_put()

    _check_series_terms(lam * T, method.n_terms)
    n, w = _series_weights(lam * T, method.n_terms)
    # conditional-on-n lognormal parameters (tower law over the jump count)
    sigma_n = jnp.sqrt(sigma**2 + n * s_j**2 / T)
    fwd_n = jnp.exp(log_s0 + (r - lam * kbar) * T + n * (mu_j + 0.5 * s_j**2))
    # discount at the MARKET rate; the n-conditional forward shift carries
    # the jump compensation (bs_price takes the forward + external discount)
    strike = jnp.asarray(payoff.strike)
    k = strike[..., None]  # broadcast a strike grid over the series axis
    if isinstance(payoff, DigitalOption):
        vals = bs_digital_price(fwd_n, k, sigma_n, T, 1.0, cp, payoff.cash)
    else:
        vals = bs_price(fwd_n, k, sigma_n, T, 1.0, cp)
    price = discount * jnp.sum(w * vals, axis=-1)
    return AnalyticSolution(prob, method, price)
