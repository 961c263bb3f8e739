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
