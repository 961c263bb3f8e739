"""Bridge-corrected CRR barrier pricing.

The lattice analog of the MC estimator's per-segment bridge products:
every parent→child edge carries the Brownian-bridge no-cross factor, so the
tree prices CONTINUOUS monitoring directly (methods/crr.py).  European
knock-outs/ins validate against the Reiner-Rubinstein closed form
(methods/black_scholes.py::bs_barrier_price); American knock-outs are pinned
by ordering bounds and the LSM agreement tier
(tests/agreement/test_american_barrier.py).
"""

import datetime as dt

import jax.numpy as jnp
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # exactly 365 days -> T = 1 under ACT/365


def _market(sigma=0.25, rate=0.05):
    return hh.BlackScholesInputs(REF, rate, 100.0, sigma)


def _barrier(style=None, **kw):
    kw.setdefault("strike", 100.0)
    kw.setdefault("expiry", EXPIRY)
    return hh.BarrierOption(
        exercise_style=style if style is not None else hh.European(), **kw
    )


EURO_CASES = [
    dict(barrier=120.0, direction=hh.Up(), knock=hh.KnockOut(), call_put=hh.Call()),
    dict(barrier=80.0, direction=hh.Down(), knock=hh.KnockOut(), call_put=hh.Call()),
    dict(barrier=80.0, direction=hh.Down(), knock=hh.KnockOut(), call_put=hh.Put()),
    dict(barrier=120.0, direction=hh.Up(), knock=hh.KnockIn(), call_put=hh.Call()),
    dict(barrier=80.0, direction=hh.Down(), knock=hh.KnockIn(), call_put=hh.Put()),
    dict(barrier=120.0, direction=hh.Up(), knock=hh.KnockOut(), call_put=hh.Call(),
         rebate=3.0),
    dict(barrier=120.0, direction=hh.Up(), knock=hh.KnockOut(), call_put=hh.Call(),
         rebate=3.0, rebate_at_hit=True),
    dict(barrier=80.0, direction=hh.Down(), knock=hh.KnockIn(), call_put=hh.Put(),
         rebate=2.0),
]


@pytest.mark.parametrize("case", EURO_CASES)
def test_european_vs_reiner_rubinstein(case):
    """CRR(1000) vs the closed form: the bridged edges leave only the plain
    O(ΔT) lattice error (worst measured case ~70bp at 1000 steps for the
    near-barrier knock-outs, whose absolute prices are ~1)."""
    prob = hh.PricingProblem(_barrier(**case), _market())
    ana = float(hh.solve(prob, hh.BlackScholesAnalytic()).price)
    crr = float(hh.solve(prob, hh.CoxRossRubinsteinMethod(1000)).price)
    assert crr == pytest.approx(ana, rel=2e-2)


def test_in_out_parity_on_the_lattice():
    """KI(R) + KO(R, at expiry) = vanilla + R·D(T) holds EXACTLY on the
    lattice (the KI solver is built from the same three inductions)."""
    mkt = _market()
    method = hh.CoxRossRubinsteinMethod(300)
    common = dict(barrier=120.0, direction=hh.Up(), call_put=hh.Call(), rebate=2.5)
    ki = hh.solve(hh.PricingProblem(_barrier(knock=hh.KnockIn(), **common), mkt), method)
    ko = hh.solve(hh.PricingProblem(_barrier(knock=hh.KnockOut(), **common), mkt), method)
    van = hh.solve(
        hh.PricingProblem(
            hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()), mkt
        ),
        method,
    )
    d_t = float(hh.df(mkt.rate, hh.to_ticks(EXPIRY)))
    assert float(ki.price) + float(ko.price) == pytest.approx(
        float(van.price) + 2.5 * d_t, abs=1e-10
    )


def test_american_knock_out_ordering():
    """American KO within [European KO, American vanilla] on the lattice."""
    mkt = _market()
    method = hh.CoxRossRubinsteinMethod(1000)
    kw = dict(strike=110.0, barrier=80.0, direction=hh.Down(),
              knock=hh.KnockOut(), call_put=hh.Put())
    am = float(hh.solve(hh.PricingProblem(_barrier(hh.American(), **kw), mkt), method).price)
    eu = float(hh.solve(hh.PricingProblem(_barrier(**kw), mkt), method).price)
    van = float(
        hh.solve(
            hh.PricingProblem(
                hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot()), mkt
            ),
            method,
        ).price
    )
    # with first-passage exercise (crossing mass absorbs at intrinsic(H))
    # the deep-barrier KO put equals the vanilla American put up to the
    # lattice's within-edge payment-timing resolution — allow a hair above
    assert eu <= am <= van * (1.0 + 1e-4)
    assert am > eu + 1.0  # early exercise is genuinely valuable here


def test_american_up_out_call_has_early_exercise_premium():
    """An up-and-out CALL gains a LARGE early-exercise premium (exercise just
    below the barrier captures the intrinsic before the knockout) — the
    classic case where American ≫ European for a non-dividend call."""
    mkt = _market()
    method = hh.CoxRossRubinsteinMethod(1000)
    kw = dict(barrier=120.0, direction=hh.Up(), knock=hh.KnockOut(),
              call_put=hh.Call())
    am = float(hh.solve(hh.PricingProblem(_barrier(hh.American(), **kw), mkt), method).price)
    eu = float(hh.solve(hh.PricingProblem(_barrier(**kw), mkt), method).price)
    assert am > 5 * eu


def test_knocked_root():
    """S0 beyond the barrier: the option is already knocked — price is the
    rebate (at the hit = now) or the discounted rebate (at expiry)."""
    mkt = _market()
    method = hh.CoxRossRubinsteinMethod(50)
    kw = dict(barrier=90.0, direction=hh.Down(), knock=hh.KnockOut(),
              call_put=hh.Put(), strike=110.0)
    mkt_low = hh.BlackScholesInputs(REF, 0.05, 80.0, 0.25)
    d_t = float(hh.df(mkt_low.rate, hh.to_ticks(EXPIRY)))
    at_hit = hh.solve(
        hh.PricingProblem(_barrier(rebate=4.0, rebate_at_hit=True, **kw), mkt_low), method
    )
    at_exp = hh.solve(
        hh.PricingProblem(_barrier(rebate=4.0, **kw), mkt_low), method
    )
    assert float(at_hit.price) == pytest.approx(4.0, abs=1e-12)
    assert float(at_exp.price) == pytest.approx(4.0 * d_t, abs=1e-12)


def test_guards():
    mkt = _market()
    method = hh.CoxRossRubinsteinMethod(50)
    # American knock-ins now PRICE via the hit-time quadrature engine
    # (test_american_knock_in.py); the remaining guards are structural
    with pytest.raises(TypeError, match="monitors the spot"):
        hh.solve(
            hh.PricingProblem(
                _barrier(barrier=80.0, underlying=hh.Forward()), mkt
            ),
            method,
        )
    with pytest.raises(TypeError, match="one \\(strike, barrier\\) pair"):
        hh.solve(
            hh.PricingProblem(
                _barrier(barrier=80.0, strike=jnp.asarray([95.0, 105.0])), mkt
            ),
            method,
        )
