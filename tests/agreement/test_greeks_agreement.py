"""Greeks agreement tests mirroring reference test/agreement/greeks_agreement.jl:
AD vs FD vs analytic, incl. theta-in-ticks and per-pillar zero-rate deltas.
(MC-greeks tier is added with the MC engine tests.)"""

import datetime as dt

import numpy as np
import pytest

from hedgehog_tpu import (
    AnalyticGreek,
    BatchGreekProblem,
    BlackScholesAnalytic,
    BlackScholesInputs,
    Call,
    European,
    FieldLens,
    FiniteDifference,
    ForwardAD,
    Forward,
    GreekProblem,
    PricingProblem,
    Put,
    RateCurve,
    ReverseAD,
    SecondOrderGreekProblem,
    SpotLens,
    VanillaOption,
    VolLens,
    ZeroRateSpineLens,
    solve,
    spine_zeros,
)

REF = dt.date(2020, 1, 1)
EXPIRY = dt.date(2021, 1, 1)
BS = BlackScholesAnalytic()


def make_prob(strike=1.2, cp=Put(), rate=0.2, sigma=0.4, spot=1.0, und=Forward()):
    payoff = VanillaOption(strike, EXPIRY, European(), cp, und)
    market = BlackScholesInputs(REF, rate, spot, sigma)
    return PricingProblem(payoff, market)


def test_first_order_ad_vs_fd():
    prob = make_prob()
    eps = 1e-4
    for lens in (VolLens(1, 1), FieldLens("market_inputs.spot"), SpotLens()):
        gp = GreekProblem(prob, lens)
        ad = float(solve(gp, ForwardAD(), BS).greek)
        rv = float(solve(gp, ReverseAD(), BS).greek)
        fd = float(solve(gp, FiniteDifference(eps), BS).greek)
        assert ad == pytest.approx(fd, rel=1e-5)
        assert ad == pytest.approx(rv, rel=1e-12)


def test_second_order_ad_vs_fd():
    prob = make_prob()
    eps = 1e-4
    for lens in (FieldLens("market_inputs.spot"), VolLens(1, 1)):
        gp = SecondOrderGreekProblem(prob, lens, lens)
        ad = float(solve(gp, ForwardAD(), BS).greek)
        fd = float(solve(gp, FiniteDifference(eps), BS).greek)
        assert ad == pytest.approx(fd, rel=1e-5)


def test_ad_fd_analytic_triple():
    prob = make_prob(strike=1.0, cp=Call(), rate=0.03, sigma=1.0, und=Forward())
    vol_lens = VolLens(1, 1)
    spot_lens = FieldLens("market_inputs.spot")

    vega_ad = float(solve(GreekProblem(prob, vol_lens), ForwardAD(), BS).greek)
    vega_fd = float(solve(GreekProblem(prob, vol_lens), FiniteDifference(1e-4), BS).greek)
    vega_an = float(solve(GreekProblem(prob, vol_lens), AnalyticGreek(), BS).greek)
    assert vega_ad == pytest.approx(vega_fd, rel=1e-5)
    assert vega_ad == pytest.approx(vega_an, rel=1e-5)

    gp2 = SecondOrderGreekProblem(prob, spot_lens, spot_lens)
    gamma_ad = float(solve(gp2, ForwardAD(), BS).greek)
    gamma_fd = float(solve(gp2, FiniteDifference(1e-4), BS).greek)
    gamma_an = float(solve(gp2, AnalyticGreek(), BS).greek)
    assert gamma_ad == pytest.approx(gamma_fd, rel=1e-5)
    assert gamma_ad == pytest.approx(gamma_an, rel=1e-5)

    gpv = SecondOrderGreekProblem(prob, vol_lens, vol_lens)
    volga_ad = float(solve(gpv, ForwardAD(), BS).greek)
    volga_fd = float(solve(gpv, FiniteDifference(1e-4), BS).greek)
    volga_an = float(solve(gpv, AnalyticGreek(), BS).greek)
    assert volga_ad == pytest.approx(volga_fd, rel=1e-3)
    assert volga_ad == pytest.approx(volga_an, rel=1e-5)


def test_theta_in_ticks():
    prob = make_prob(strike=1.0, cp=Call(), rate=0.03, sigma=1.0, und=Forward())
    theta_lens = FieldLens("payoff.expiry")
    gp = GreekProblem(prob, theta_lens)
    theta_ad = float(solve(gp, ForwardAD(), BS).greek)
    theta_fd = float(solve(gp, FiniteDifference(1e-12), BS).greek)
    theta_an = float(solve(gp, AnalyticGreek(), BS).greek)
    assert theta_ad == pytest.approx(theta_fd, rel=5e-3)
    assert theta_ad == pytest.approx(theta_an, rel=1e-8)


def test_zero_rate_pillar_deltas():
    payoff = VanillaOption(1.0, dt.date(2020, 4, 2), European(), Put(), Forward())
    rates = np.array([0.03, 0.032, 0.07, 0.042, 0.03])
    tenors = np.array([0.25, 0.5, 1.0, 2.0, 5.0])
    dfs = np.exp(-rates * tenors)
    curve = RateCurve.from_dfs(REF, tenors, dfs, interp="cubic")
    market = BlackScholesInputs(REF, curve, 1.0, 1.0)
    prob = PricingProblem(payoff, market)

    for i in range(len(spine_zeros(curve))):
        lens = ZeroRateSpineLens(i)
        g_ad = float(solve(GreekProblem(prob, lens), ForwardAD(), BS).greek)
        g_fd = float(solve(GreekProblem(prob, lens), FiniteDifference(1e-5), BS).greek)
        # reference uses rtol 1e-6 with a warn-only fallback (greeks_agreement.jl:165-166);
        # abs floor 1e-9 absorbs FD truncation noise on the ~4e-7 far-pillar sensitivities
        assert g_ad == pytest.approx(g_fd, rel=1e-6, abs=1e-9), f"pillar {i}"


def test_batch_greeks_single_pass():
    prob = make_prob(strike=1.0, cp=Call(), rate=0.03, sigma=0.5, und=Forward())
    lenses = (SpotLens(), VolLens(1, 1), ZeroRateSpineLens(0))
    batch = solve(BatchGreekProblem(prob, lenses), ReverseAD(), BS)
    assert set(batch.keys()) == set(lenses)
    for lens in lenses:
        single = float(solve(GreekProblem(prob, lens), ForwardAD(), BS).greek)
        assert float(batch[lens]) == pytest.approx(single, rel=1e-10)
