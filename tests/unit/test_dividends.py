"""Continuous dividend/carry yield ``dividend_yield`` (q) across every
method — beyond-reference capability (the reference carries rates only).

The master identity for TERMINAL-law methods: the q-model's terminal law
equals the q = 0 law started at spot·e^{−qT}, so
price(S0, q) == price(S0·e^{−qT}, 0) exactly.  Grid methods carry q in the
per-step drift instead (intermediate fixings sit at e^{−q·t_k}), pinned by
closed-form cross-checks (geometric Asian, Reiner-Rubinstein barriers with
cost-of-carry) and by the classic qualitative fact that q > 0 makes EARLY
EXERCISE of calls optimal.
"""

import datetime as dt
import math

import jax
import pytest

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # T = 1
Q = 0.03


def _vo(style=None, cp=None, strike=100.0):
    return hh.VanillaOption(strike, EXPIRY, style or hh.European(),
                            cp or hh.Call(), hh.Spot())


def _cfg(paths=1 << 15, steps=8):
    return hh.SimulationConfig(trajectories=paths, steps=steps,
                               variance_reduction=hh.Antithetic(), seed=0,
                               qmc=True)


def test_bs_effective_spot_identity():
    bs_q = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=Q)
    bs_0 = hh.BlackScholesInputs(REF, 0.05, 100.0 * math.exp(-Q), 0.25)
    p_q = float(hh.solve(hh.PricingProblem(_vo(), bs_q), hh.BlackScholesAnalytic()).price)
    p_0 = float(hh.solve(hh.PricingProblem(_vo(), bs_0), hh.BlackScholesAnalytic()).price)
    assert p_q == pytest.approx(p_0, abs=1e-12)
    # Carr-Madan, exact MC and the Euler grid all agree
    cm = float(hh.solve(hh.PricingProblem(_vo(), bs_q),
                        hh.CarrMadan(1.0, "auto", hh.LognormalDynamics())).price)
    assert cm == pytest.approx(p_q, rel=1e-8)
    for strat in (hh.BlackScholesExact(), hh.EulerMaruyama()):
        p_mc = float(hh.solve(hh.PricingProblem(_vo(), bs_q),
                              hh.MonteCarlo(hh.LognormalDynamics(), strat, _cfg())).price)
        assert p_mc == pytest.approx(p_q, rel=3e-3)
    crr = float(hh.solve(hh.PricingProblem(_vo(), bs_q),
                         hh.CoxRossRubinsteinMethod(1000)).price)
    assert crr == pytest.approx(p_q, rel=2e-3)


def test_heston_merton_bachelier_identities():
    h_q = hh.HestonInputs(REF, 0.05, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7,
                          dividend_yield=Q)
    h_0 = hh.HestonInputs(REF, 0.05, 100.0 * math.exp(-Q), 0.04, 2.0, 0.04,
                          0.3, -0.7)
    cm = hh.CarrMadan(1.0, "auto", hh.HestonDynamics())
    pq = float(hh.solve(hh.PricingProblem(_vo(), h_q), cm).price)
    p0 = float(hh.solve(hh.PricingProblem(_vo(), h_0), cm).price)
    assert pq == pytest.approx(p0, abs=1e-10)
    qe = float(hh.solve(hh.PricingProblem(_vo(), h_q),
                        hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True),
                                      _cfg(steps=12))).price)
    assert qe == pytest.approx(pq, rel=5e-3)
    ex = float(hh.solve(hh.PricingProblem(_vo(), h_q),
                        hh.MonteCarlo(hh.HestonDynamics(), hh.HestonExactMixing(),
                                      _cfg(steps=2))).price)
    assert ex == pytest.approx(pq, rel=5e-3)

    m_q = hh.MertonInputs(REF, 0.05, 100.0, 0.2, 0.5, -0.1, 0.15, dividend_yield=Q)
    m_0 = hh.MertonInputs(REF, 0.05, 100.0 * math.exp(-Q), 0.2, 0.5, -0.1, 0.15)
    aq = float(hh.solve(hh.PricingProblem(_vo(), m_q), hh.MertonAnalytic()).price)
    a0 = float(hh.solve(hh.PricingProblem(_vo(), m_0), hh.MertonAnalytic()).price)
    assert aq == pytest.approx(a0, abs=1e-12)
    for strat in (hh.MertonExact(), hh.EulerMaruyama()):
        p_mc = float(hh.solve(hh.PricingProblem(_vo(), m_q),
                              hh.MonteCarlo(hh.MertonJumpDynamics(), strat, _cfg())).price)
        assert p_mc == pytest.approx(aq, rel=3e-3)

    nb_q = hh.BachelierInputs(REF, 0.05, 100.0, 20.0, dividend_yield=Q)
    na = float(hh.solve(hh.PricingProblem(_vo(), nb_q), hh.BachelierAnalytic()).price)
    nm = float(hh.solve(hh.PricingProblem(_vo(), nb_q),
                        hh.MonteCarlo(hh.NormalDynamics(), hh.BachelierExact(), _cfg())).price)
    assert nm == pytest.approx(na, rel=3e-3)


def test_american_call_early_exercise_with_dividends():
    """q > r makes early exercise of an American CALL optimal — the
    textbook qualitative signature of dividend support; CRR and LSM agree
    on the premium."""
    mkt = hh.BlackScholesInputs(REF, 0.02, 100.0, 0.25, dividend_yield=0.08)
    eu = float(hh.solve(hh.PricingProblem(_vo(), mkt), hh.BlackScholesAnalytic()).price)
    am = float(hh.solve(hh.PricingProblem(_vo(hh.American()), mkt),
                        hh.CoxRossRubinsteinMethod(1000)).price)
    assert am > eu + 0.05
    mc = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                       _cfg(paths=1 << 14, steps=50))
    lsm = float(hh.solve(hh.PricingProblem(_vo(hh.American()), mkt),
                         hh.LSM(mc, 4)).price)
    assert lsm == pytest.approx(am, rel=2e-2)


def test_barrier_carry_closed_form_vs_bridge_mc():
    """Reiner-Rubinstein with cost-of-carry b = r − q vs the bridged MC
    grid (independent implementations; drift enters each differently)."""
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=Q)
    doc = hh.BarrierOption(100.0, EXPIRY, 80.0, hh.European(), hh.Put(),
                           hh.Spot(), hh.Down(), hh.KnockOut(),
                           rebate=2.0, rebate_at_hit=True)
    ana = float(hh.solve(hh.PricingProblem(doc, mkt), hh.BlackScholesAnalytic()).price)
    mc = float(hh.solve(hh.PricingProblem(doc, mkt),
                        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                                      _cfg(paths=1 << 16, steps=32))).price)
    assert mc == pytest.approx(ana, rel=1e-2)
    crr = float(hh.solve(hh.PricingProblem(doc, mkt),
                         hh.CoxRossRubinsteinMethod(1000)).price)
    assert crr == pytest.approx(ana, rel=2e-2)


def test_geometric_asian_and_local_vol_carry():
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=Q)
    asian = hh.AsianOption(100.0, EXPIRY, 8, hh.European(), hh.Call(),
                           hh.Spot(), hh.GeometricAverage())
    cf = float(hh.solve(hh.PricingProblem(asian, mkt), hh.BlackScholesAnalytic()).price)
    mc = float(hh.solve(hh.PricingProblem(asian, mkt),
                        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                                      _cfg(paths=1 << 16, steps=8))).price)
    assert mc == pytest.approx(cf, rel=5e-3)
    # flat-surface local vol reduces to BS with the same carry
    p_bs = float(hh.solve(hh.PricingProblem(_vo(), mkt), hh.BlackScholesAnalytic()).price)
    p_lv = float(hh.solve(hh.PricingProblem(_vo(), mkt),
                          hh.MonteCarlo(hh.LocalVolDynamics(), hh.EulerMaruyama(),
                                        _cfg(paths=1 << 14, steps=16))).price)
    assert p_lv == pytest.approx(p_bs, rel=5e-3)


def test_analytic_greeks_with_carry_match_ad():
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=Q)
    prob = hh.PricingProblem(_vo(), mkt)
    bs = hh.BlackScholesAnalytic()
    d_ad = float(jax.grad(lambda s: hh.solve(hh.SpotLens().set(prob, s), bs).price)(100.0))
    d_an = float(hh.solve(hh.GreekProblem(prob, hh.SpotLens()), hh.AnalyticGreek(), bs).greek)
    assert d_an == pytest.approx(d_ad, rel=1e-10)
    g_ad = float(jax.grad(jax.grad(
        lambda s: hh.solve(hh.SpotLens().set(prob, s), bs).price))(100.0))
    g_an = float(hh.solve(hh.SecondOrderGreekProblem(prob, hh.SpotLens(), hh.SpotLens()),
                          hh.AnalyticGreek(), bs).greek)
    assert g_an == pytest.approx(g_ad, rel=1e-9)
    # theta-in-ticks: analytic vs ForwardAD on the expiry lens
    theta_lens = hh.FieldLens("payoff.expiry")
    t_ad = float(hh.solve(hh.GreekProblem(prob, theta_lens), hh.ForwardAD(), bs).greek)
    t_an = float(hh.solve(hh.GreekProblem(prob, theta_lens), hh.AnalyticGreek(), bs).greek)
    assert t_an == pytest.approx(t_ad, rel=1e-8)


def test_forward_start_cliquet_varswap_carry():
    mkt = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=Q)
    fs = hh.ForwardStartOption(1.0, EXPIRY, hh.add_yearfrac(hh.to_ticks(REF), 0.5),
                               hh.European(), hh.Call(), hh.Spot())
    cf = float(hh.solve(hh.PricingProblem(fs, mkt), hh.BlackScholesAnalytic()).price)
    mc = float(hh.solve(hh.PricingProblem(fs, mkt),
                        hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                                      _cfg(paths=1 << 16, steps=10))).price)
    assert mc == pytest.approx(cf, rel=5e-3)
    vs = hh.VarianceSwap(0.0625, EXPIRY, observations=64, notional=100.0)
    cf_vs = float(hh.solve(hh.PricingProblem(vs, mkt), hh.BlackScholesAnalytic()).price)
    mc_vs = float(hh.solve(hh.PricingProblem(vs, mkt),
                           hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                                         _cfg(paths=1 << 15, steps=64))).price)
    assert mc_vs == pytest.approx(cf_vs, abs=2e-2)


def test_multi_asset_per_asset_yields():
    """Per-asset carry vector: price(S, q) == price(S·e^{−qT}, 0) for
    Margrabe/Kirk/geometric-basket (terminal-joint-law functions) and the
    correlated exact MC agrees."""
    import jax.numpy as jnp

    qv = jnp.asarray([0.02, 0.05])
    m_q = hh.MultiAssetBSInputs(REF, 0.05, jnp.asarray([100.0, 95.0]),
                                jnp.asarray([0.25, 0.2]),
                                jnp.asarray([[1.0, 0.5], [0.5, 1.0]]),
                                dividend_yields=qv)
    m_0 = hh.MultiAssetBSInputs(
        REF, 0.05,
        jnp.asarray([100.0 * math.exp(-0.02), 95.0 * math.exp(-0.05)]),
        jnp.asarray([0.25, 0.2]), jnp.asarray([[1.0, 0.5], [0.5, 1.0]]))
    cfg = hh.SimulationConfig(trajectories=1 << 16, steps=1,
                              variance_reduction=hh.Antithetic(), seed=0,
                              qmc=True)
    for po in (hh.SpreadOption(0.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()),
               hh.BasketOption(95.0, EXPIRY, jnp.asarray([0.6, 0.4]),
                               hh.European(), hh.Call(), hh.Spot(),
                               geometric=True)):
        pq = float(hh.solve(hh.PricingProblem(po, m_q), hh.BlackScholesAnalytic()).price)
        p0 = float(hh.solve(hh.PricingProblem(po, m_0), hh.BlackScholesAnalytic()).price)
        assert pq == pytest.approx(p0, abs=1e-10)
        pm = float(hh.solve(hh.PricingProblem(po, m_q),
                            hh.MonteCarlo(hh.LognormalDynamics(),
                                          hh.BlackScholesExact(), cfg)).price)
        assert pm == pytest.approx(pq, rel=5e-3)


def test_q_zero_is_default_and_identical():
    """Markets without dividend_yield behave exactly as before (q = 0)."""
    a = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25)
    b = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=0.0)
    pa = float(hh.solve(hh.PricingProblem(_vo(), a), hh.BlackScholesAnalytic()).price)
    pb = float(hh.solve(hh.PricingProblem(_vo(), b), hh.BlackScholesAnalytic()).price)
    assert pa == pb
    assert float(hh.carry_yield(a)) == 0.0
