"""Black-Scholes analytic tests mirroring reference test/unit/black_scholes.jl,
including the QuantLib golden values (atol 1e-4)."""

import datetime as dt

import numpy as np
import pytest

from hedgehog_tpu import (
    BlackScholesAnalytic,
    BlackScholesInputs,
    Call,
    European,
    PricingProblem,
    Put,
    Spot,
    VanillaOption,
    add_yearfrac,
    solve,
)

REF = dt.date(2024, 1, 1)
METHOD = BlackScholesAnalytic()


def price(strike, expiry, cp, market):
    payoff = VanillaOption(strike, expiry, European(), cp, Spot())
    return float(solve(PricingProblem(payoff, market), METHOD).price)


def test_zero_volatility_discounted_intrinsic():
    spot, r, T = 100.0, 0.05, 0.5
    expiry = add_yearfrac(REF, T)
    market = BlackScholesInputs(REF, r, spot, 0.0)
    D = np.exp(-r * T)
    F = spot / D
    assert price(110.0, expiry, Call(), market) == pytest.approx(D * max(F - 110.0, 0.0), abs=1e-9)
    assert price(90.0, expiry, Call(), market) == pytest.approx(D * max(F - 90.0, 0.0), abs=1e-9)
    assert price(90.0, expiry, Put(), market) == pytest.approx(D * max(90.0 - F, 0.0), abs=1e-9)
    assert price(110.0, expiry, Put(), market) == pytest.approx(D * max(110.0 - F, 0.0), abs=1e-9)


def test_quantlib_goldens():
    spot, r, sigma, T = 100.0, 0.05, 0.20, 1.0
    expiry = add_yearfrac(REF, T)
    market = BlackScholesInputs(REF, r, spot, sigma)
    D = np.exp(-r * T)
    F = spot / D
    # ATM-forward call
    assert price(F, expiry, Call(), market) == pytest.approx(7.9655, abs=1e-4)
    # ITM call / OTM put (QuantLib goldens, reference test/unit/black_scholes.jl:101-114)
    assert price(90.0, expiry, Call(), market) == pytest.approx(16.6994, abs=1e-4)
    assert price(90.0, expiry, Put(), market) == pytest.approx(2.3101, abs=1e-4)
    # 91-day ITM put (reference :116-127)
    expiry_short = dt.date(2024, 4, 1)  # REF + 91 days
    assert (expiry_short - REF).days == 91
    assert price(110.0, expiry_short, Put(), market) == pytest.approx(9.8237, abs=1e-4)


def test_put_call_parity():
    spot, K, r, sigma, T = 105.0, 100.0, 0.03, 0.25, 0.75
    expiry = add_yearfrac(REF, T)
    market = BlackScholesInputs(REF, r, spot, sigma)
    D = np.exp(-r * T)
    F = spot / D
    c = price(K, expiry, Call(), market)
    p = price(K, expiry, Put(), market)
    assert c - p == pytest.approx(D * (F - K), abs=1e-6)
    assert c - p == pytest.approx(spot - K * D, abs=1e-6)


def test_short_expiry_limit():
    spot, K, r, sigma = 100.0, 105.0, 0.05, 0.2
    expiry = dt.date(2024, 1, 2)
    T = 1 / 365
    market = BlackScholesInputs(REF, r, spot, sigma)
    D = np.exp(-r * T)
    F = spot / D
    assert price(K, expiry, Call(), market) == pytest.approx(D * max(F - K, 0.0), abs=0.1)
    assert price(K, expiry, Put(), market) == pytest.approx(D * max(K - F, 0.0), abs=0.1)
