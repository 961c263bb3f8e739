"""Discrete cash dividends — beyond-reference market feature.

The reference carries rates only (src/market_inputs/market_inputs.jl); this
build already added a continuous ``dividend_yield`` to every single-asset
family.  Equity desks, however, quote SCHEDULED CASH dividends: the spot
drops by the cash amount at each ex-date.  ``DividendSchedule`` attaches a
(ex-dates, cash amounts) table to :class:`BlackScholesInputs`; two standard
model conventions are implemented, each exact for the engines that use it:

- **Escrowed model** (terminal-law engines: BlackScholesAnalytic,
  CarrMadan under LognormalDynamics, exact-terminal Monte Carlo, the CRR
  lattice): the stochastic part of the spot is S* = S − PV(divs ≤ T), a
  plain GBM, so every closed form applies with the spot replaced by the
  escrowed spot.  The T-forward (S₀ − Σ Dᵢ·df(tᵢ))·e^{−qT}/D(T) is the
  no-arbitrage forward, so vanilla/digital prices are arbitrage-consistent
  across all these engines (they agree to machine precision by sharing
  :func:`~hedgehog_tpu.market.inputs.forward_spot`).  On the CRR lattice the
  tree evolves S* and EXERCISE decisions see the full spot
  S*ₜ + PVₜ(remaining divs) — Hull's textbook method, which prices the
  classic American-call-before-ex-div exercise.

- **Spot (piecewise-lognormal) model** (grid engines: PDEMethod via
  jump conditions V(t⁻, S) = V(t⁺, S − D); grid Monte Carlo under
  ``LognormalDynamics`` via ex-date drops S → max(S − D, floor)): the spot
  itself follows GBM between ex-dates and drops by the cash amount at each
  one.  PDE and grid MC discretize the SAME model (ex-dates snapped to the
  nearest grid time), so they agree at MC tolerance, and every grid
  consumer (LSM American, Asians, autocallables, bridge barriers)
  composes.  The two conventions differ by a well-known small vol-basis
  spread (the escrowed model lognormalizes a shifted spot); tests pin both
  the intra-convention agreements and the cross-convention gap.

Scope: cash amounts only (proportional dividends are exactly a carry
re-quote under lognormal dynamics — fold them into ``dividend_yield``);
``BlackScholesInputs`` only (stochastic-vol/jump families keep continuous
carry — a cash drop breaks their affine structure).  Engines that cannot
honor a schedule (closed-form barriers/lookbacks, non-lognormal dynamics)
raise instead of silently ignoring it.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.dates import to_ticks, yearfrac
from ..utils.pytree import pytree
from .rate_curve import df_yf

__all__ = [
    "DividendSchedule",
    "dividend_yearfracs",
    "dividend_pv",
    "escrowed_spot",
    "dividend_step_amounts",
]


@pytree
class DividendSchedule:
    """Scheduled cash dividends: ``times`` are ex-dates (dates/ticks; any
    iterable), ``amounts`` the cash drops (a pytree leaf — dividend deltas
    flow by AD).  Entries at or before the reference date, or after a
    pricing expiry, are ignored by every consumer (masked, not an error:
    one schedule serves every expiry on the book)."""

    times: Any  # (n,) int64 ticks
    amounts: Any  # (n,) cash amounts

    def __post_init__(self):
        times = self.times
        if not hasattr(times, "dtype"):  # list/tuple of dates or scalars
            times = np.asarray([to_ticks(t) for t in times], dtype=np.int64)
        else:
            times = np.asarray(times, dtype=np.int64)
        if times.ndim != 1:
            raise ValueError("DividendSchedule.times must be 1-D")
        object.__setattr__(self, "times", times)
        amounts = jnp.asarray(self.amounts, dtype=jnp.float64)
        if amounts.ndim != 1 or amounts.shape[0] != times.shape[0]:
            raise ValueError(
                f"DividendSchedule needs matching 1-D times/amounts; got "
                f"{times.shape[0]} times, {amounts.shape} amounts"
            )
        object.__setattr__(self, "amounts", amounts)


def get_dividends(market):
    """The market's :class:`DividendSchedule`, or None (duck-typed like
    :func:`~hedgehog_tpu.market.inputs.carry_yield`)."""
    return getattr(market, "dividends", None)


def dividend_yearfracs(market):
    """Ex-date year fractions (n,) from the market's reference date under
    its day-count convention.  Linear conventions vectorize over the tick
    array; calendar ones (30E/360, ACT/ACT) evaluate per ex-date at the
    concrete-date boundary — ``DividendSchedule.times`` is always a
    concrete numpy array, so this works under tracing too."""
    from ..core.dates import _LinearDayCount

    divs = get_dividends(market)
    dc = getattr(market, "daycount", None)
    if dc is None or isinstance(dc, _LinearDayCount):
        return yearfrac(market.reference_date, divs.times, dc)
    ref = market.reference_date
    return jnp.asarray(
        [yearfrac(ref, int(t), dc) for t in np.asarray(divs.times)]
    )


def dividend_pv(market, T):
    """PV at t=0 of the cash dividends with ex-date in (0, T]:
    Σᵢ Dᵢ·df(tᵢ)·1{0 < tᵢ ≤ T}.  ``T`` may be traced; entries outside the
    window contribute exactly zero."""
    divs = get_dividends(market)
    if divs is None:
        return jnp.zeros(())
    t = dividend_yearfracs(market)
    mask = (t > 0.0) & (t <= T + 1e-12)
    return jnp.sum(jnp.where(mask, divs.amounts * df_yf(market.rate, t), 0.0))


def escrowed_spot(market, T):
    """The escrowed-model stochastic spot S₀ − PV(divs ≤ T) (what every
    terminal-law engine prices GBM on).  A non-positive escrowed spot has
    no lognormal model behind it — eager (concrete) inputs raise a clear
    error instead of letting log(S*) turn every price into silent NaN;
    traced inputs cannot raise and propagate NaN as all JAX guards do."""
    esc = market.spot - dividend_pv(market, T)
    try:
        val = float(esc)
    except Exception:  # traced — leave the check to the caller's values
        return esc
    if val <= 0.0:
        raise ValueError(
            f"escrowed spot {val:.6g} <= 0: the PV of the dividend schedule "
            f"exceeds the spot, so the escrowed lognormal model is undefined "
            f"for this expiry — trim the schedule or price on the spot-model "
            f"grid engines (PDEMethod / grid Monte Carlo)"
        )
    return esc


def remaining_dividend_pv(market, t_eval, T):
    """PV at time ``t_eval`` of the dividends with ex-date in (t_eval, T]:
    Σᵢ Dᵢ·df(tᵢ)/df(t_eval)·1{t_eval < tᵢ ≤ T}.  ``t_eval`` may be an array
    (one add-back per lattice/grid time); a trailing axis broadcasts over
    the schedule."""
    divs = get_dividends(market)
    t = dividend_yearfracs(market)
    t_eval = jnp.asarray(t_eval)
    te = t_eval[..., None]
    mask = (t > te + 1e-12) & (t <= T + 1e-12)
    pv_each = jnp.where(mask, divs.amounts * df_yf(market.rate, t), 0.0)
    return jnp.sum(pv_each, axis=-1) / df_yf(market.rate, t_eval)


def dividend_step_amounts(market, T, steps: int):
    """Per-step cash drops (steps,) for a uniform grid over [0, T]: each
    ex-date tᵢ ∈ (0, T] is snapped to the NEAREST grid time k·ΔT (k ≥ 1),
    and slot k−1 carries its cash — the grid value at k·ΔT is post-drop.
    PDE jump conditions and Monte Carlo ex-date drops share this snapping,
    so both engines discretize the same piecewise-lognormal model.
    Entries sharing a slot sum."""
    divs = get_dividends(market)
    if divs is None:
        return jnp.zeros((steps,))
    t = dividend_yearfracs(market)
    dt = T / steps
    k = jnp.clip(jnp.round(t / dt).astype(jnp.int32), 1, steps)
    mask = (t > 0.0) & (t <= T + 1e-12)
    amt = jnp.where(mask, divs.amounts, 0.0)
    return jnp.zeros((steps,)).at[k - 1].add(amt)
