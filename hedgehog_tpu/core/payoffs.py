"""Payoffs: contract terms + intrinsic value, exercise/underlying taxonomy.

Parity target: reference src/payoffs/payoffs.jl.  The option taxonomy
(European/American, Call/Put with ±1 indicator, Spot/Forward underlying) is
kept as zero-size static marker dataclasses; the contract economics (strike,
expiry) are traced pytree leaves so AD flows through them (strike greeks,
theta against expiry-in-ticks).

Intrinsic value is vectorized: ``payoff(spots)`` broadcasts over arrays of
terminal prices — this is the per-path payoff kernel in all MC methods.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..utils.pytree import pytree, static_field
from .dates import to_ticks

__all__ = [
    "ExerciseStyle",
    "European",
    "American",
    "Bermudan",
    "CallPut",
    "Call",
    "Put",
    "Underlying",
    "Spot",
    "Forward",
    "VanillaOption",
    "DigitalOption",
    "BarrierOption",
    "BarrierDirection",
    "Up",
    "Down",
    "BarrierKnock",
    "KnockIn",
    "KnockOut",
    "DoubleBarrierOption",
    "AsianOption",
    "LookbackOption",
    "StrikeStyle",
    "FloatingStrike",
    "FixedStrike",
    "VarianceSwap",
    "ForwardStartOption",
    "Cliquet",
    "Autocallable",
    "SpreadOption",
    "BasketOption",
    "RainbowOption",
    "CompoundOption",
    "ChooserOption",
    "Averaging",
    "ArithmeticAverage",
    "GeometricAverage",
    "ZeroCouponBond",
    "BondOption",
    "Caplet",
    "CapFloor",
    "Swaption",
    "parity_transform",
    "require_european",
]


class ExerciseStyle:
    """Marker base: exercise style (European/American)."""


@pytree
class European(ExerciseStyle):
    pass


@pytree
class American(ExerciseStyle):
    pass


@pytree
class Bermudan(ExerciseStyle):
    """Exercise allowed only on ``exercise_dates`` (plus expiry) — beyond
    the reference's European/American taxonomy.  Dates are stored as a
    STATIC tuple of int ticks (they shape the lattice/LSM exercise masks,
    which must be concrete under jit).  CRR and LSM snap each date to the
    nearest lattice/grid time; Bermudan(()) degenerates to European and
    Bermudan(every grid date) to American."""

    exercise_dates: Any = static_field(default=())

    def __post_init__(self):
        object.__setattr__(
            self,
            "exercise_dates",
            tuple(int(to_ticks(d)) for d in self.exercise_dates),
        )


class CallPut:
    """Marker base: call/put. Instances are callable and return the ±1 indicator."""


@pytree
class Call(CallPut):
    def __call__(self) -> float:
        return 1.0


@pytree
class Put(CallPut):
    def __call__(self) -> float:
        return -1.0


class Underlying:
    """Marker base: whether the contract quotes against spot or forward."""


@pytree
class Spot(Underlying):
    pass


@pytree
class Forward(Underlying):
    pass


@pytree
class VanillaOption:
    """A vanilla option: ``max(cp * (S - K), 0)`` at exercise.

    Fields mirror reference src/payoffs/payoffs.jl:101-113.  ``expiry`` is
    stored in float ticks (ms since 0000-01-01) so it is differentiable; the
    date-accepting constructor of the reference (:131-140) is covered by
    passing a ``datetime.date``/``datetime.datetime`` which is converted via
    ``to_ticks``.
    """

    strike: Any
    expiry: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    def __call__(self, spot):
        """Intrinsic value, broadcasting over arrays of spot prices."""
        cp = self.call_put()
        return jnp.maximum(cp * (jnp.asarray(spot) - self.strike), 0.0)


@pytree
class DigitalOption:
    """A cash-or-nothing digital: pays ``cash`` at exercise iff
    ``cp·(S − K) > 0`` — beyond the reference's vanilla-only payoff taxonomy
    (src/payoffs/payoffs.jl), added because the conditional mixing estimator
    prices digitals with a SMOOTH per-path closed form Φ(d2) (pathwise AD
    greeks survive, where raw terminal-sample MC differentiates an indicator
    to zero).  Same field layout/taxonomy as :class:`VanillaOption`, so every
    pricer's strike/expiry/cp plumbing applies unchanged; ``cash`` is a
    traced leaf (cash-amount greeks flow)."""

    strike: Any
    expiry: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())
    cash: Any = 1.0

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    def __call__(self, spot):
        """Exercise value, broadcasting over arrays of spot prices."""
        cp = self.call_put()
        return jnp.where(
            cp * (jnp.asarray(spot) - self.strike) > 0.0, self.cash, 0.0
        )


class BarrierDirection:
    """Marker base: which side the barrier sits on (Up/Down)."""


@pytree
class Up(BarrierDirection):
    pass


@pytree
class Down(BarrierDirection):
    pass


class BarrierKnock:
    """Marker base: knock-in vs knock-out."""


@pytree
class KnockIn(BarrierKnock):
    pass


@pytree
class KnockOut(BarrierKnock):
    pass


@pytree
class BarrierOption:
    """A continuously-monitored single-barrier option on a vanilla payoff —
    beyond the reference's vanilla-only taxonomy (src/payoffs/payoffs.jl).

    ``KnockOut`` pays the vanilla intrinsic at expiry iff the path never
    touches ``barrier`` (``Up``: max < H, ``Down``: min > H); ``KnockIn``
    pays iff it does (in + out = vanilla at zero rebate).  ``__call__`` is
    the UNCONDITIONAL terminal intrinsic — the knock probability is applied
    by the pricers (closed form for Black-Scholes; per-segment
    Brownian-bridge no-crossing products on MC grids, which are smooth in
    every input so pathwise AD greeks survive).

    ``rebate`` (cash R ≥ 0): a knock-OUT pays R when the barrier IS touched
    — at the hit time if ``rebate_at_hit`` (the one-touch convention,
    Reiner-Rubinstein F block) else at expiry; a knock-IN pays R at expiry
    iff the barrier is NEVER touched (the standard convention — the E
    block; ``rebate_at_hit`` is rejected for knock-ins, there is no hit).
    Rebate in-out parity: KI(R) + KO(R, at expiry) = vanilla + R·D(T)."""

    strike: Any
    expiry: Any
    barrier: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())
    direction: BarrierDirection = static_field(default=Down())
    knock: BarrierKnock = static_field(default=KnockOut())
    rebate: Any = 0.0
    rebate_at_hit: bool = static_field(default=False)

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))
        if self.rebate_at_hit and isinstance(self.knock, KnockIn):
            raise ValueError(
                "rebate_at_hit applies to knock-outs only (a knock-in's "
                "rebate pays at expiry iff the barrier is never touched)"
            )

    def __call__(self, spot):
        """Unconditional terminal intrinsic (see class docstring)."""
        cp = self.call_put()
        return jnp.maximum(cp * (jnp.asarray(spot) - self.strike), 0.0)


@pytree
class DoubleBarrierOption:
    """A continuously-monitored DOUBLE-barrier option on a vanilla payoff —
    beyond the reference's vanilla-only taxonomy.

    ``KnockOut`` pays the vanilla intrinsic at expiry iff the path never
    leaves the corridor (``lower``, ``upper``); ``KnockIn`` pays iff it
    does (in + out = vanilla at zero rebate — European only).  ``__call__``
    is the UNCONDITIONAL terminal intrinsic; the exit probability is
    applied by the pricers (the reflection image series under
    Black-Scholes; per-segment two-sided Brownian-bridge no-exit products
    on MC grids — both smooth, so AD greeks survive).

    ``rebate`` (cash R ≥ 0): a knock-OUT pays R when the corridor IS left —
    at the hit time if ``rebate_at_hit`` (double one-touch; MC only, the
    closed form rejects it) else at expiry; a knock-IN pays R at expiry iff
    the corridor is never left.  Rebate in-out parity:
    KI(R) + KO(R, at expiry) = vanilla + R·D(T)."""

    strike: Any
    expiry: Any
    lower: Any
    upper: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())
    knock: BarrierKnock = static_field(default=KnockOut())
    rebate: Any = 0.0
    rebate_at_hit: bool = static_field(default=False)

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))
        if self.rebate_at_hit and isinstance(self.knock, KnockIn):
            raise ValueError(
                "rebate_at_hit applies to knock-outs only (a knock-in's "
                "rebate pays at expiry iff the corridor is never left)"
            )

    def __call__(self, spot):
        """Unconditional terminal intrinsic (see class docstring)."""
        cp = self.call_put()
        return jnp.maximum(cp * (jnp.asarray(spot) - self.strike), 0.0)


class Averaging:
    """Marker base: Asian averaging type."""


@pytree
class ArithmeticAverage(Averaging):
    pass


@pytree
class GeometricAverage(Averaging):
    pass


@pytree
class AsianOption:
    """A fixed-strike Asian option on the discrete average of ``observations``
    equally-spaced fixings t_i = i·T/n, i = 1…n (t=0 excluded) — beyond the
    reference's vanilla-only taxonomy.

    ``GeometricAverage`` under Black-Scholes has an exact closed form (the
    average is lognormal — BlackScholesAnalytic carries it, and it is the
    agreement oracle for the MC estimator); ``ArithmeticAverage`` prices by
    grid Monte Carlo under any grid strategy (the MC ``config.steps`` must
    equal ``observations`` so grid times are the fixing dates).  ``__call__``
    maps the realized average to the vanilla intrinsic."""

    strike: Any
    expiry: Any
    observations: int = static_field(default=12)
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())
    averaging: Averaging = static_field(default=ArithmeticAverage())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    def __call__(self, average):
        """Intrinsic value of the realized average, broadcasting."""
        cp = self.call_put()
        return jnp.maximum(cp * (jnp.asarray(average) - self.strike), 0.0)


class StrikeStyle:
    """Marker base: lookback strike convention (floating vs fixed)."""


@pytree
class FloatingStrike(StrikeStyle):
    pass


@pytree
class FixedStrike(StrikeStyle):
    pass


@pytree
class LookbackOption:
    """A continuously-monitored lookback option — beyond the reference's
    vanilla-only taxonomy (src/payoffs/payoffs.jl).

    ``FloatingStrike``: a call pays S_T − m_T (m = running minimum), a put
    pays M_T − S_T (M = running maximum) — ``strike`` is ignored.
    ``FixedStrike``: a call pays max(M_T − K, 0), a put pays max(K − m_T, 0).
    The extremum each contract monitors is :attr:`uses_maximum`.

    ``running_extremum`` seeds an already-running monitoring window (the
    max/min observed before the valuation date); ``None`` starts fresh at
    the spot.  Pricers clamp it against the spot (a max below spot or a min
    above it is inconsistent), so the fresh and ``running_extremum=spot``
    contracts price identically.

    BlackScholesAnalytic carries the continuous closed forms
    (Goldman-Sosin-Gatto floating / Conze-Viswanathan fixed, derived with a
    general cost of carry and the b→0 limit); MC draws the per-segment
    Brownian-bridge extremum by inverse CDF — EXACT for GBM grids at any
    step count (``BlackScholesExact`` needs just ONE bridge over [0, T]),
    and on the conditional Heston grid the segment variance is the
    integrated variance.  ``__call__`` maps (S_T, realized extremum) to the
    payout."""

    expiry: Any
    strike: Any = 0.0
    strike_style: StrikeStyle = static_field(default=FloatingStrike())
    call_put: CallPut = static_field(default=Call())
    exercise_style: ExerciseStyle = static_field(default=European())
    underlying: Underlying = static_field(default=Spot())
    running_extremum: Any = None

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    @property
    def uses_maximum(self) -> bool:
        """True when the contract monitors the running MAXIMUM (fixed-strike
        call, floating-strike put); False for the running minimum."""
        if isinstance(self.strike_style, FixedStrike):
            return isinstance(self.call_put, Call)
        return isinstance(self.call_put, Put)

    def __call__(self, spot, extremum):
        """Payout from the terminal spot and the realized extremum (the one
        :attr:`uses_maximum` names), broadcasting."""
        cp = self.call_put()
        if isinstance(self.strike_style, FixedStrike):
            return jnp.maximum(cp * (jnp.asarray(extremum) - self.strike), 0.0)
        # floating: cp·(S_T − extremum) ≥ 0 by construction (min ≤ S_T ≤ max)
        return cp * (jnp.asarray(spot) - extremum)


@pytree
class ForwardStartOption:
    """A forward-start option — beyond the reference's vanilla taxonomy: at
    ``expiry`` it pays max(cp·(S_T − k·S_{t_start}), 0) with the strike set
    at ``start`` as fraction ``strike_fraction`` (k) of the then-spot — the
    cliquet building block.  Under Black-Scholes the S_{t_start}-homogeneity
    gives the Rubinstein closed form; under any grid dynamics it prices by
    MC with a fixing at ``start`` (``config.steps`` must put ``start`` on
    the grid).  ``__call__`` maps (S_fix, S_T) to the payout."""

    strike_fraction: Any
    expiry: Any
    start: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))
        object.__setattr__(self, "start", to_ticks(self.start))

    def __call__(self, s_fix, s_terminal):
        cp = self.call_put()
        return jnp.maximum(
            cp * (jnp.asarray(s_terminal) - self.strike_fraction * jnp.asarray(s_fix)),
            0.0,
        )


@pytree
class SpreadOption:
    """A two-asset spread option — beyond the reference's single-asset
    taxonomy: pays max(cp·(S¹_T − S²_T − K), 0) at ``expiry`` on a
    :class:`MultiAssetBSInputs` market's first two assets.  K = 0 is the
    exchange option with Margrabe's exact closed form; K ≠ 0 prices by
    Kirk's approximation (analytic) or correlated terminal MC."""

    strike: Any
    expiry: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    def __call__(self, s1, s2):
        cp = self.call_put()
        return jnp.maximum(
            cp * (jnp.asarray(s1) - jnp.asarray(s2) - self.strike), 0.0
        )


@pytree
class BasketOption:
    """A weighted basket option — beyond the reference's single-asset
    taxonomy: pays max(cp·(B_T − K), 0) with B the ``weights``-weighted
    ARITHMETIC average (``geometric=False``, MC-only) or GEOMETRIC average
    Π S_i^{w_i} (``geometric=True`` — exactly lognormal under correlated
    GBM, so BlackScholesAnalytic carries the closed form, the MC agreement
    oracle).  ``__call__`` maps the asset matrix (..., n_assets) to the
    intrinsic."""

    strike: Any
    expiry: Any
    weights: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())
    geometric: bool = static_field(default=False)

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    def __call__(self, spots):
        cp = self.call_put()
        w = jnp.asarray(self.weights)
        s = jnp.asarray(spots)
        if self.geometric:
            basket = jnp.exp(jnp.sum(w * jnp.log(s), axis=-1))
        else:
            basket = jnp.sum(w * s, axis=-1)
        return jnp.maximum(cp * (basket - self.strike), 0.0)


@pytree
class RainbowOption:
    """A two-or-more-asset best-of/worst-of option — beyond the reference's
    single-asset taxonomy: pays max(cp·(ext_i S^i_T − K), 0) at ``expiry``
    with ext = max (``best=True``) or min over the assets of a
    :class:`MultiAssetBSInputs` market.  Two assets price in closed form
    (Stulz 1982 via the bivariate normal, max by the min-identity
    max = S₁ + S₂ − min); any asset count prices by correlated exact
    terminal MC.  ``__call__`` maps the asset matrix (..., n_assets) to
    the intrinsic."""

    strike: Any
    expiry: Any
    best: bool = static_field(default=True)
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    def __call__(self, spots):
        cp = self.call_put()
        s = jnp.asarray(spots)
        ext = jnp.max(s, axis=-1) if self.best else jnp.min(s, axis=-1)
        return jnp.maximum(cp * (ext - self.strike), 0.0)


@pytree
class CompoundOption:
    """An option on an option (Geske 1979) — beyond the reference's vanilla
    taxonomy: at ``decision_date`` the holder may pay ``strike`` for the
    INNER European vanilla (``inner_call_put``, ``inner_strike``,
    ``expiry``).  All four variants (call/put on call/put) price in closed
    form under Black-Scholes via the bivariate normal with correlation
    √(t₁/T₂) and the Geske critical spot (an implicit-root solve, IFT
    differentiable); the MC oracle draws S_{t₁} exactly and closes with the
    inner Black-Scholes value.  ``__call__`` maps the DECISION-date spot to
    the undiscounted decision value given the inner value function is
    closed over it by the pricer — pricers use ``decision_value``."""

    strike: Any
    decision_date: Any
    inner_strike: Any
    expiry: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    call_put: CallPut = static_field(default=Call())
    inner_call_put: CallPut = static_field(default=Call())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))
        object.__setattr__(self, "decision_date", to_ticks(self.decision_date))
        if self.decision_date >= self.expiry:
            raise ValueError(
                "compound decision_date must precede the inner expiry"
            )

    def decision_value(self, inner_value):
        """max(w₁·(inner − K₁), 0) at the decision date."""
        cp = self.call_put()
        return jnp.maximum(cp * (jnp.asarray(inner_value) - self.strike), 0.0)


@pytree
class ChooserOption:
    """A simple chooser — beyond the reference's vanilla taxonomy: at
    ``choose_date`` the holder picks EITHER the call OR the put with the
    same ``strike``/``expiry``.  Closed form under Black-Scholes: the
    chooser decomposes as call(K, T) + put(K·e^{−(r−q)(T−t₁)} adjusted,
    t₁)-style via max(C, P) = C + max(P − C, 0) and put-call parity —
    the second leg is a put on the t₁-forward (Rubinstein 1991)."""

    strike: Any
    expiry: Any
    choose_date: Any
    exercise_style: ExerciseStyle = static_field(default=European())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))
        object.__setattr__(self, "choose_date", to_ticks(self.choose_date))
        if self.choose_date >= self.expiry:
            raise ValueError("chooser choose_date must precede expiry")


@pytree
class Cliquet:
    """A locally-capped/floored cliquet — beyond the reference's vanilla
    taxonomy, the classic equity structured coupon: at ``expiry`` it pays

        notional · Σ_{i=1..n} clip(S_{t_i}/S_{t_{i-1}} − 1, local_floor,
                                    local_cap)

    over ``observations`` equally-spaced reset periods.  Each period's
    clipped return is a bull call spread on the forward return, so under
    flat-vol Black-Scholes the value has a closed form (sum of per-period
    Black spreads, paid at expiry); any grid dynamics prices it by MC with
    ``config.steps == observations``.  ``__call__`` maps the realized
    period-return matrix to the payout."""

    expiry: Any
    observations: int = static_field(default=12)
    local_floor: Any = 0.0
    local_cap: Any = 0.08
    notional: Any = 1.0
    exercise_style: ExerciseStyle = static_field(default=European())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    def __call__(self, period_returns):
        """Payout of per-period simple returns (…, n_periods last axis)."""
        clipped = jnp.clip(jnp.asarray(period_returns), self.local_floor,
                           self.local_cap)
        return self.notional * jnp.sum(clipped, axis=-1)


@pytree
class Autocallable:
    """An autocallable note on a single underlying — beyond the reference's
    vanilla taxonomy, THE flagship retail structured product.

    Schedule: ``periods`` equally-spaced observation dates t_i = i·T/n,
    i = 1…n (t_n = expiry), levels quoted as fractions of the initial spot
    S₀.  At the FIRST t_i with S_{t_i} ≥ ``autocall_barrier``·S₀ the note
    redeems early.  Two coupon conventions:

    - **Snowball** (``coupon_barrier=None``, default): redemption pays
      notional·(1 + i·coupon) at t_i (coupons accrue with memory and pay
      only at redemption).  If never called: notional·(1 + n·coupon) at
      expiry when the knock-in never triggered, else the airbag leg
      notional·min(S_T/S₀, 1) (the investor is short a put struck at S₀,
      alive only on knock-in).
    - **Phoenix** (``coupon_barrier`` set): a coupon of notional·coupon is
      paid at every observation where S_{t_i} ≥ ``coupon_barrier``·S₀ while
      the note is alive, WITH MEMORY (missed coupons are caught up at the
      next barrier hit); early redemption and the maturity legs pay
      principal only (notional, or the airbag leg on knock-in).

    ``ki_monitoring`` (static): ``"observations"`` checks the knock-in at
    the n observation dates only; ``"continuous"`` applies per-segment
    Brownian-bridge crossing probabilities on the MC grid (exact for GBM
    grids; the Heston conditional grid uses its integrated variance) — the
    knock-in leg is then smooth, so it contributes pathwise AD greeks.
    The default ``"auto"`` resolves per grid: continuous where the
    (dynamics, strategy) combo carries bridge factors (GBM Euler, Heston
    conditional QE, rough Bergomi), observation dates on every other grid
    (local vol, SLV, Merton, …).  The autocall indicators themselves are
    genuinely discrete events.

    MC pricing needs ``config.steps`` to be a multiple of ``periods`` so
    every observation date is a grid point.  No closed form exists in
    general; the n = 2 discrete-KI case has an exact bivariate-normal
    value used as the agreement oracle (tests/unit/test_autocallable.py)."""

    expiry: Any
    periods: int = static_field(default=4)
    autocall_barrier: Any = 1.0
    coupon: Any = 0.05
    knock_in_barrier: Any = 0.7
    coupon_barrier: Any = None
    notional: Any = 1.0
    ki_monitoring: str = static_field(default="auto")
    exercise_style: ExerciseStyle = static_field(default=European())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))
        if self.ki_monitoring not in ("auto", "continuous", "observations"):
            raise ValueError(
                f"ki_monitoring must be 'auto', 'continuous' or "
                f"'observations', got {self.ki_monitoring!r}"
            )


@pytree
class VarianceSwap:
    """A (discretely-sampled) variance swap — beyond the reference's
    vanilla-only taxonomy: at ``expiry`` it pays

        notional · (RV − strike_var),
        RV = (1/T) · Σ_{i=1..n} ln(S_{t_i}/S_{t_{i-1}})²

    over ``observations`` equally-spaced fixings t_i = i·T/n (annualized by
    the observation window T, the continuously-compounded convention; quote
    ``strike_var`` in VARIANCE units, e.g. 0.04 for a 20-vol strike).
    ``__call__`` maps the realized variance to the payout.  European-only,
    linear in RV — closed forms exist wherever E[RV] does
    (BS: σ² + (r − σ²/2)²T/n exactly for the discrete sum; Heston
    continuous limit: θ + (V0 − θ)(1 − e^{−κT})/(κT))."""

    strike_var: Any
    expiry: Any
    observations: int = static_field(default=252)
    notional: Any = 1.0
    exercise_style: ExerciseStyle = static_field(default=European())
    underlying: Underlying = static_field(default=Spot())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))

    def __call__(self, realized_var):
        """Payout of the realized variance, broadcasting."""
        return self.notional * (jnp.asarray(realized_var) - self.strike_var)


@pytree
class ZeroCouponBond:
    """A unit zero-coupon bond paying 1 at ``maturity`` — the atom of the
    interest-rate payoff family (beyond the reference's equity-only
    taxonomy).  Under deterministic curves its price is the discount
    factor; under a short-rate model (HullWhiteAnalytic /
    HullWhiteMonteCarlo) it is the model bond — identical by construction
    when the model is fitted to the curve, which is the fit's unit test."""

    maturity: Any = static_field()

    def __post_init__(self):
        object.__setattr__(self, "maturity", to_ticks(self.maturity))

    @property
    def expiry(self):  # uniform problem plumbing (market_yearfrac etc.)
        return self.maturity


@pytree
class BondOption:
    """European option, exercising at ``expiry``, on a unit zero-coupon bond
    maturing at ``bond_maturity`` (> expiry): pays
    max(cp·(P(T_E, T_B) − K), 0) at T_E.  The building block of the
    cap/floor and swaption closed forms (caplet = scaled bond put)."""

    strike: Any
    expiry: Any = static_field()
    bond_maturity: Any = static_field()
    call_put: CallPut = static_field(default=Call())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))
        object.__setattr__(self, "bond_maturity", to_ticks(self.bond_maturity))
        if self.bond_maturity <= self.expiry:
            raise ValueError("bond_maturity must exceed the option expiry")


@pytree
class Caplet:
    """A caplet (``call_put=Call()``) or floorlet (``Put()``) on the simple
    forward rate L(start, end): pays notional·τ·max(cp·(L − strike_rate), 0)
    at ``end`` with accrual τ = yearfrac(start, end).  Equivalent to
    notional·(1 + X·τ) bond puts/calls struck at 1/(1 + X·τ) exercising at
    ``start`` — how both the closed form and the MC estimator price it."""

    strike_rate: Any
    start: Any = static_field()
    end: Any = static_field()
    notional: Any = 1.0
    call_put: CallPut = static_field(default=Call())

    def __post_init__(self):
        object.__setattr__(self, "start", to_ticks(self.start))
        object.__setattr__(self, "end", to_ticks(self.end))
        if self.end <= self.start:
            raise ValueError("caplet end must exceed start")

    @property
    def expiry(self):  # the rate fixes at start (the option's exercise)
        return self.start


@pytree
class CapFloor:
    """An interest-rate cap (``call_put=Call()``) or floor (``Put()``): the
    strip of caplets/floorlets on consecutive ``dates`` pairs — payment i
    covers [dates[i], dates[i+1]] and pays
    notional·τ_i·max(cp·(L_i − strike_rate), 0) at dates[i+1].  Priced as
    the sum of the per-period Caplet prices (closed form and MC alike);
    the first period's rate fixes at dates[0] (spot-start caps include
    today's known fixing by convention — pass dates[0] > reference date
    to exclude it)."""

    strike_rate: Any
    dates: Any = static_field()
    notional: Any = 1.0
    call_put: CallPut = static_field(default=Call())

    def __post_init__(self):
        d = tuple(to_ticks(x) for x in self.dates)
        if len(d) < 2:
            raise ValueError("CapFloor needs at least two dates (one period)")
        if any(b <= a for a, b in zip(d, d[1:])):
            raise ValueError("CapFloor dates must be strictly increasing")
        object.__setattr__(self, "dates", d)

    @property
    def expiry(self):  # last payment (uniform problem plumbing)
        return self.dates[-1]

    def caplets(self):
        """The equivalent Caplet strip."""
        return tuple(
            Caplet(self.strike_rate, a, b, self.notional, self.call_put)
            for a, b in zip(self.dates, self.dates[1:])
        )


@pytree
class Swaption:
    """European ``payer=True`` (pay fixed X, receive float) or receiver
    swaption on a unit-notional vanilla swap: exercising at ``expiry`` into
    a swap with fixed payments at ``payment_dates`` (strictly increasing,
    first > expiry; accruals from consecutive gaps against ``expiry``).
    At T_E the swap's fixed+principal leg is Σ c_i·P(T_E, t_i) with
    c_i = X·τ_i (+1 at t_n); the payer payoff is max(1 − Σ c_i P, 0) —
    priced in closed form by Jamshidian decomposition under one-factor
    short-rate models and by the same formula pathwise in MC.

    ``exercise_style=Bermudan(dates)`` (beyond-European): extra exercise
    rights on RESET dates after ``expiry`` (each must be one of the
    payment dates except the last — the standard co-terminal convention;
    exercising at a reset enters the remaining swap).  ``expiry`` is
    always the FIRST exercise date.  Bermudans price on the
    HullWhiteGrid backward induction."""

    strike_rate: Any
    expiry: Any = static_field()
    payment_dates: Any = static_field()
    payer: bool = static_field(default=True)
    notional: Any = 1.0
    exercise_style: ExerciseStyle = static_field(default=European())

    def __post_init__(self):
        object.__setattr__(self, "expiry", to_ticks(self.expiry))
        dates = tuple(to_ticks(d) for d in self.payment_dates)
        if len(dates) == 0:
            raise ValueError("swaption needs at least one payment date")
        if any(b <= a for a, b in zip(dates, dates[1:])) or dates[0] <= self.expiry:
            raise ValueError(
                "payment_dates must be strictly increasing and after expiry"
            )
        object.__setattr__(self, "payment_dates", dates)
        if isinstance(self.exercise_style, Bermudan):
            extra = tuple(to_ticks(d) for d in self.exercise_style.exercise_dates)
            if any(d not in dates[:-1] for d in extra):
                raise ValueError(
                    "Bermudan swaption exercise dates must be reset dates: "
                    "payment dates except the last (co-terminal convention)"
                )
        elif not isinstance(self.exercise_style, European):
            raise TypeError(
                "Swaption exercise_style must be European or Bermudan(dates)"
            )

    def exercise_ticks(self):
        """Sorted exercise dates in ticks — expiry first, then any Bermudan
        reset dates."""
        extra = (
            tuple(to_ticks(d) for d in self.exercise_style.exercise_dates)
            if isinstance(self.exercise_style, Bermudan)
            else ()
        )
        return tuple(sorted({self.expiry, *extra}))


def bermudan_step_mask(style: ExerciseStyle, market, expiry, nsteps: int):
    """Per-step exercise mask for the backward inductions (CRR nodes / LSM
    grid): a concrete (nsteps,) bool array whose slot t gates exercise at
    time t·T/nsteps for t = 1..nsteps−1 (slot 0 is never used — exercise at
    inception is excluded like the reference's t=0-excluded LSM loop, and
    expiry is always exercisable via the terminal payoff).

    ``American`` → all True; ``Bermudan`` → True at the nearest grid step of
    each exercise date (dates at/after expiry or before the first step are
    rejected — a silently dropped exercise right would misprice)."""
    import numpy as np

    from ..market.inputs import market_yearfrac

    if isinstance(style, American):
        return jnp.ones((nsteps,), dtype=bool)
    if not isinstance(style, Bermudan):
        raise TypeError(f"no exercise mask for {type(style).__name__}")
    try:
        T = float(market_yearfrac(market, expiry))
    except Exception as exc:  # jax ConcretizationTypeError under tracing
        raise TypeError(
            "Bermudan exercise masks are concrete lattice/grid structure "
            "and cannot be built from traced dates — price Bermudans with "
            "concrete reference/expiry dates outside jit/vmap over the "
            "market (the same boundary as the calendar day-counts)"
        ) from exc
    mask = np.zeros((nsteps,), dtype=bool)
    for d in style.exercise_dates:
        t = float(market_yearfrac(market, d))
        idx = int(round(t / T * nsteps))
        if not (1 <= idx <= nsteps - 1):
            raise ValueError(
                f"Bermudan exercise date at t={t:.6f}y maps to grid step "
                f"{idx} outside 1..{nsteps - 1} (T={T:.6f}y, {nsteps} "
                f"steps); dates at expiry are implicit, dates before the "
                f"first step need more steps"
            )
        mask[idx] = True
    return jnp.asarray(mask)


def require_european(payoff: "VanillaOption", method_name: str, spot_only: bool = False):
    """Dispatch guard shared by the European-only pricers (mirrors the
    reference's restricted solve signatures, e.g. black_scholes.jl:38-41,
    montecarlo.jl:479)."""
    if not isinstance(payoff.exercise_style, European):
        raise TypeError(f"{method_name} prices European options only.")
    if spot_only and not isinstance(payoff.underlying, Spot):
        raise TypeError(f"{method_name} prices options on Spot only.")


def parity_transform(call_price, opt: VanillaOption, spot, rate_curve):
    """Put-call parity: recover this option's price from the call price.

    Vanilla puts use ``put = call - S + K·df(T)`` (reference
    src/payoffs/payoffs.jl:172-193); digital puts use the cash parity
    ``put = cash·df(T) − call``.  Calls pass through.
    """
    if isinstance(opt.call_put, Call):
        return call_price
    from ..market.rate_curve import df

    if isinstance(opt, DigitalOption):
        return opt.cash * df(rate_curve, opt.expiry) - call_price
    return call_price - spot + opt.strike * df(rate_curve, opt.expiry)
