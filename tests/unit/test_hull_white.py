"""Hull-White / G1++ stochastic short-rate family (beyond-reference ASSET
CLASS — the reference's rates are deterministic discounting only,
src/market_inputs/rate_curve.jl).  Closed forms pinned against the exact
(x, ∫x) Monte Carlo (agreement-matrix pattern), the curve-fit identity, the
martingale discount test, Jamshidian vs MC, AD greeks and calibration."""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hedgehog_tpu as hh
from hedgehog_tpu.market.rate_curve import df_yf

REF = dt.date(2024, 1, 1)


def _curve():
    tenors = np.array([0.5, 1.0, 2.0, 3.0, 5.0])
    zeros = np.array([0.02, 0.025, 0.03, 0.032, 0.035])
    return hh.RateCurve.from_dfs(REF, tenors, np.exp(-zeros * tenors))


def _market(a=0.1, sigma=0.012, curve=None):
    return hh.HullWhiteInputs(REF, _curve() if curve is None else curve, a, sigma)


def _mc(trajectories=120_000, steps=4, seed=0, **kw):
    return hh.HullWhiteMonteCarlo(
        hh.SimulationConfig(trajectories=trajectories, steps=steps, seed=seed,
                            variance_reduction=hh.Antithetic(), **kw))


_SWAP_DATES = [dt.date(2026, 1, 1), dt.date(2027, 1, 1), dt.date(2028, 1, 1)]


def test_zcb_is_the_curve_df_exactly():
    """The fit identity: model bonds at x=0, t=0 ARE the curve — the
    analytic ZCB equals df to machine precision on a spine curve."""
    m = _market()
    zcb = hh.ZeroCouponBond(dt.date(2027, 1, 1))
    p = float(hh.solve(hh.PricingProblem(zcb, m), hh.HullWhiteAnalytic()).price)
    t = m.daycount.yearfrac(m.reference_date, zcb.maturity)
    assert p == pytest.approx(float(df_yf(m.rate, t)), rel=1e-14)


def test_mc_discount_is_martingale():
    """E[exp(−∫r)] must reproduce the curve df exactly in expectation (the
    Γ-correction); antithetic exact-transition MC pins it to ~1e-6."""
    m = _market()
    zcb = hh.ZeroCouponBond(dt.date(2027, 1, 1))
    pa = float(hh.solve(hh.PricingProblem(zcb, m), hh.HullWhiteAnalytic()).price)
    pm = float(hh.solve(hh.PricingProblem(zcb, m), _mc()).price)
    assert pm == pytest.approx(pa, rel=1e-4)


def test_bond_option_closed_form_vs_mc():
    m = _market()
    bo = hh.BondOption(0.92, dt.date(2025, 1, 1), dt.date(2028, 1, 1),
                       call_put=hh.Call())
    pa = float(hh.solve(hh.PricingProblem(bo, m), hh.HullWhiteAnalytic()).price)
    pm = float(hh.solve(hh.PricingProblem(bo, m), _mc()).price)
    assert pm == pytest.approx(pa, rel=1e-2)
    # puts via the same form; put-call parity on bonds:
    # call − put = P(0,S) − K·P(0,T)
    bp = hh.BondOption(0.92, dt.date(2025, 1, 1), dt.date(2028, 1, 1),
                       call_put=hh.Put())
    pp = float(hh.solve(hh.PricingProblem(bp, m), hh.HullWhiteAnalytic()).price)
    t_e = m.daycount.yearfrac(m.reference_date, bo.expiry)
    t_b = m.daycount.yearfrac(m.reference_date, bo.bond_maturity)
    parity = float(df_yf(m.rate, t_b) - 0.92 * df_yf(m.rate, t_e))
    assert pa - pp == pytest.approx(parity, abs=1e-12)


def test_sigma_zero_is_discounted_intrinsic():
    m = _market(sigma=0.0)
    bo = hh.BondOption(0.90, dt.date(2025, 1, 1), dt.date(2028, 1, 1))
    pa = float(hh.solve(hh.PricingProblem(bo, m), hh.HullWhiteAnalytic()).price)
    t_e = m.daycount.yearfrac(m.reference_date, bo.expiry)
    t_b = m.daycount.yearfrac(m.reference_date, bo.bond_maturity)
    intrinsic = max(float(df_yf(m.rate, t_b)) - 0.90 * float(df_yf(m.rate, t_e)), 0.0)
    assert pa == pytest.approx(intrinsic, abs=1e-14)


def test_caplet_floorlet_vs_mc_and_parity():
    """Caplet = scaled bond put (closed form) vs exact MC; caplet − floorlet
    = discounted forward-rate difference (the FRA parity)."""
    m = _market()
    cap = hh.Caplet(0.03, dt.date(2025, 1, 1), dt.date(2025, 7, 1), notional=100.0)
    flo = hh.Caplet(0.03, dt.date(2025, 1, 1), dt.date(2025, 7, 1), notional=100.0,
                    call_put=hh.Put())
    pa = float(hh.solve(hh.PricingProblem(cap, m), hh.HullWhiteAnalytic()).price)
    pm = float(hh.solve(hh.PricingProblem(cap, m), _mc()).price)
    assert pm == pytest.approx(pa, rel=2e-2)
    pf = float(hh.solve(hh.PricingProblem(flo, m), hh.HullWhiteAnalytic()).price)
    t1 = m.daycount.yearfrac(m.reference_date, cap.start)
    t2 = m.daycount.yearfrac(m.reference_date, cap.end)
    tau = t2 - t1
    # FRA parity: cap − floor = N·τ·(L_fwd − X)·P(0, end)
    l_fwd = (float(df_yf(m.rate, t1)) / float(df_yf(m.rate, t2)) - 1.0) / tau
    parity = 100.0 * tau * (l_fwd - 0.03) * float(df_yf(m.rate, t2))
    assert pa - pf == pytest.approx(parity, abs=1e-10)


def test_swaption_jamshidian_vs_mc():
    """Jamshidian decomposition (IFT root + bond-option basket) against the
    exact-transition MC, payer and receiver."""
    m = _market()
    mc = _mc()
    for payer in (True, False):
        sw = hh.Swaption(0.032, dt.date(2025, 1, 1), _SWAP_DATES,
                         payer=payer, notional=100.0)
        pa = float(hh.solve(hh.PricingProblem(sw, m), hh.HullWhiteAnalytic()).price)
        pm = float(hh.solve(hh.PricingProblem(sw, m), mc).price)
        assert pm == pytest.approx(pa, rel=1.5e-2), payer


def test_swaption_parity():
    """Payer − receiver = forward-swap value = P(0,T) − Σ c_i P(0,t_i)."""
    m = _market()
    kw = dict(payer=True, notional=1.0)
    sw_p = hh.Swaption(0.032, dt.date(2025, 1, 1), _SWAP_DATES, **kw)
    sw_r = hh.Swaption(0.032, dt.date(2025, 1, 1), _SWAP_DATES, payer=False)
    pp = float(hh.solve(hh.PricingProblem(sw_p, m), hh.HullWhiteAnalytic()).price)
    pr = float(hh.solve(hh.PricingProblem(sw_r, m), hh.HullWhiteAnalytic()).price)
    t_e = m.daycount.yearfrac(m.reference_date, sw_p.expiry)
    times = [m.daycount.yearfrac(m.reference_date, d) for d in sw_p.payment_dates]
    taus = np.diff([t_e] + times)
    c = 0.032 * taus
    c[-1] += 1.0
    fwd = float(df_yf(m.rate, t_e)) - float(
        sum(ci * df_yf(m.rate, ti) for ci, ti in zip(c, times))
    )
    assert pp - pr == pytest.approx(fwd, abs=1e-10)


def test_qmc_matches_prng():
    m = _market()
    bo = hh.BondOption(0.92, dt.date(2025, 1, 1), dt.date(2028, 1, 1))
    pa = float(hh.solve(hh.PricingProblem(bo, m), hh.HullWhiteAnalytic()).price)
    pq = float(hh.solve(hh.PricingProblem(bo, m), _mc(16_000, qmc=True)).price)
    assert pq == pytest.approx(pa, rel=1e-2)


def test_ad_greeks_and_key_rate_durations():
    """dV/dσ matches FD; key-rate durations flow through ZeroRateSpineLens
    (the whole point of fitting the model to a SPINE curve)."""
    m = _market()
    sw = hh.Swaption(0.032, dt.date(2025, 1, 1), _SWAP_DATES, notional=100.0)
    prob = hh.PricingProblem(sw, m)

    def px(sig):
        mm = hh.HullWhiteInputs(REF, _curve(), 0.1, sig)
        return hh.solve(hh.PricingProblem(sw, mm), hh.HullWhiteAnalytic()).price

    vega_ad = float(jax.grad(px)(0.012))
    eps = 1e-5
    vega_fd = float((px(0.012 + eps) - px(0.012 - eps)) / (2 * eps))
    assert vega_ad == pytest.approx(vega_fd, rel=1e-6)

    lenses = tuple(hh.ZeroRateSpineLens(i) for i in range(5))
    g = hh.solve(hh.BatchGreekProblem(prob, lenses), hh.ReverseAD(),
                 hh.HullWhiteAnalytic())
    vals = [float(v) for v in g.values()]
    assert all(np.isfinite(vals))
    assert max(abs(v) for v in vals) > 1.0  # real rate risk somewhere


def test_calibrate_sigma_and_a_to_caplets():
    """Recover (a, σ) from a strip of caplet prices through the standard
    lens + LBFGS machinery — the rates analog of the equity smile fits."""
    true = _market(a=0.08, sigma=0.014)
    starts = [dt.date(2024, 7, 1), dt.date(2025, 1, 1), dt.date(2026, 1, 1),
              dt.date(2027, 1, 1)]
    caplets = [hh.Caplet(0.03, s, dt.date(s.year + (s.month + 6 > 12),
                                          (s.month + 6 - 1) % 12 + 1, 1),
                         notional=100.0) for s in starts]
    quotes = [float(hh.solve(hh.PricingProblem(c, true),
                             hh.HullWhiteAnalytic()).price) for c in caplets]

    basket = hh.BasketPricingProblem(tuple(caplets), _market(a=0.05, sigma=0.01))
    calib = hh.CalibrationProblem(
        basket, jnp.asarray(quotes), jnp.asarray([0.05, 0.01]),
        hh.HullWhiteAnalytic(),
        (hh.FieldLens("market_inputs.a"), hh.FieldLens("market_inputs.sigma")))
    sol = hh.solve(calib, hh.OptimizerAlgo(max_iters=200),
                   lb=jnp.asarray([1e-3, 1e-4]), ub=jnp.asarray([1.0, 0.1]))
    a_fit, sig_fit = [float(x) for x in sol.u]
    assert sig_fit == pytest.approx(0.014, rel=2e-2)
    assert a_fit == pytest.approx(0.08, rel=2e-1)  # a is weakly identified


def test_payoff_validation_and_guards():
    m = _market()
    with pytest.raises(ValueError, match="bond_maturity"):
        hh.BondOption(0.9, dt.date(2026, 1, 1), dt.date(2025, 1, 1))
    with pytest.raises(ValueError, match="increasing"):
        hh.Swaption(0.03, dt.date(2025, 1, 1),
                    [dt.date(2027, 1, 1), dt.date(2026, 1, 1)])
    with pytest.raises(TypeError, match="interest-rate payoff"):
        hh.solve(hh.PricingProblem(
            hh.VanillaOption(100.0, dt.date(2025, 1, 1), hh.European(),
                             hh.Call(), hh.Spot()), m), hh.HullWhiteAnalytic())
    with pytest.raises(TypeError, match="HullWhiteInputs"):
        hh.solve(hh.PricingProblem(
            hh.ZeroCouponBond(dt.date(2025, 1, 1)),
            hh.BlackScholesInputs(REF, 0.03, 100.0, 0.2)), hh.HullWhiteAnalytic())


def test_grid_european_corner_matches_jamshidian():
    """The x-grid backward induction with ONE exercise date must reproduce
    the Jamshidian closed form — two very different derivations (Gaussian
    kernel quadrature vs critical-state bond-option basket)."""
    m = _market()
    for payer in (True, False):
        sw = hh.Swaption(0.032, dt.date(2025, 1, 1), _SWAP_DATES,
                         payer=payer, notional=100.0)
        pj = float(hh.solve(hh.PricingProblem(sw, m), hh.HullWhiteAnalytic()).price)
        pg = float(hh.solve(hh.PricingProblem(sw, m), hh.HullWhiteGrid()).price)
        assert pg == pytest.approx(pj, rel=2e-4), payer


def test_bermudan_swaption_dominates_europeans():
    """Bermudan ≥ every European entered at a single exercise date (rights
    superset), converges in the node count, and collapses to the European
    price when the style is European."""
    m = _market()
    berm = hh.Swaption(
        0.032, dt.date(2025, 1, 1), _SWAP_DATES, payer=True, notional=100.0,
        exercise_style=hh.Bermudan([dt.date(2026, 1, 1), dt.date(2027, 1, 1)]))
    pb = float(hh.solve(hh.PricingProblem(berm, m), hh.HullWhiteGrid()).price)
    singles = []
    for d0, rem in [(dt.date(2025, 1, 1), _SWAP_DATES),
                    (dt.date(2026, 1, 1), _SWAP_DATES[1:]),
                    (dt.date(2027, 1, 1), _SWAP_DATES[2:])]:
        sw1 = hh.Swaption(0.032, d0, rem, payer=True, notional=100.0)
        singles.append(float(hh.solve(hh.PricingProblem(sw1, m),
                                      hh.HullWhiteAnalytic()).price))
    assert pb >= max(singles) - 1e-8
    assert pb <= sum(singles) + 1e-8  # crude upper bound: sum of rights
    pb_fine = float(hh.solve(hh.PricingProblem(berm, m),
                             hh.HullWhiteGrid(nodes=513)).price)
    assert pb == pytest.approx(pb_fine, rel=3e-4)  # O(h²) kink error


def test_bermudan_swaption_validation():
    with pytest.raises(ValueError, match="reset dates"):
        hh.Swaption(0.03, dt.date(2025, 1, 1), _SWAP_DATES,
                    exercise_style=hh.Bermudan([dt.date(2026, 6, 1)]))
    m = _market()
    berm = hh.Swaption(0.032, dt.date(2025, 1, 1), _SWAP_DATES,
                       exercise_style=hh.Bermudan([dt.date(2026, 1, 1)]))
    with pytest.raises(TypeError, match="HullWhiteGrid"):
        hh.solve(hh.PricingProblem(berm, m), hh.HullWhiteAnalytic())
    # Bermudan + MC is no longer an error: it prices through the
    # stochastic-discount LSM engine (test_bermudan_swaption_lsm_cross_engine)
    with pytest.raises(TypeError, match="Swaption"):
        hh.solve(hh.PricingProblem(hh.ZeroCouponBond(dt.date(2025, 1, 1)), m),
                 hh.HullWhiteGrid())


def test_capfloor_strip():
    """Cap = Σ caplets (exact identity in the analytic pricer), cap − floor
    = the swap of the periods (FRA parity telescoped), MC agrees."""
    m = _market()
    dates = [dt.date(2024, 7, 1), dt.date(2025, 1, 1), dt.date(2025, 7, 1),
             dt.date(2026, 1, 1)]
    cap = hh.CapFloor(0.03, dates, notional=100.0)
    floor = hh.CapFloor(0.03, dates, notional=100.0, call_put=hh.Put())
    pa = float(hh.solve(hh.PricingProblem(cap, m), hh.HullWhiteAnalytic()).price)
    manual = sum(
        float(hh.solve(hh.PricingProblem(c, m), hh.HullWhiteAnalytic()).price)
        for c in cap.caplets())
    assert pa == pytest.approx(manual, rel=1e-14)
    pf = float(hh.solve(hh.PricingProblem(floor, m), hh.HullWhiteAnalytic()).price)
    # parity leg: Σ N·τ_i·(L_i − X)·P(0, end_i)
    parity = 0.0
    for c in cap.caplets():
        t1 = m.daycount.yearfrac(m.reference_date, c.start)
        t2 = m.daycount.yearfrac(m.reference_date, c.end)
        tau = t2 - t1
        l_fwd = (float(df_yf(m.rate, t1)) / float(df_yf(m.rate, t2)) - 1.0) / tau
        parity += 100.0 * tau * (l_fwd - 0.03) * float(df_yf(m.rate, t2))
    assert pa - pf == pytest.approx(parity, abs=1e-10)
    pm = float(hh.solve(hh.PricingProblem(cap, m), _mc(60_000, 2)).price)
    assert pm == pytest.approx(pa, rel=2e-2)
    with pytest.raises(ValueError, match="increasing"):
        hh.CapFloor(0.03, [dates[1], dates[0]])


def test_spot_start_capfloor_mc_no_nan():
    """A spot-start cap's first period fixes at the reference date: the
    first leg is deterministic — the MC solver must return the known value,
    not a 0/0 NaN from a zero-length transition (regression test)."""
    m = _market()
    dates = [REF, dt.date(2024, 7, 1), dt.date(2025, 1, 1)]
    cap = hh.CapFloor(0.03, dates, notional=100.0)
    pa = float(hh.solve(hh.PricingProblem(cap, m), hh.HullWhiteAnalytic()).price)
    pm = float(hh.solve(hh.PricingProblem(cap, m), _mc(60_000, 2)).price)
    assert np.isfinite(pm)
    assert pm == pytest.approx(pa, rel=2e-2)


def test_bermudan_swaption_lsm_cross_engine():
    """The stochastic-discount LSM (exact OU transitions at the exercise
    dates, forward-value regression) independently reproduces the x-grid
    engine's Bermudan price — two engines, two discretizations, one
    number.  The LSM policy is suboptimal ⇒ at most a whisker below."""
    m = _market()
    berm = hh.Swaption(
        0.032, dt.date(2025, 1, 1), _SWAP_DATES, payer=True, notional=100.0,
        exercise_style=hh.Bermudan([dt.date(2026, 1, 1), dt.date(2027, 1, 1)]))
    pg = float(hh.solve(hh.PricingProblem(berm, m), hh.HullWhiteGrid()).price)
    pl = float(hh.solve(hh.PricingProblem(berm, m), hh.HullWhiteMonteCarlo(
        hh.SimulationConfig(trajectories=150_000, seed=0,
                            variance_reduction=hh.Antithetic()))).price)
    assert pl == pytest.approx(pg, rel=1e-2)
    assert pl < pg * 1.005  # frozen policy: lower bound up to MC noise


def test_bermudan_grid_ad_vega():
    """jax.grad flows through the whole x-grid backward induction (kernel
    matrices + exercise maxima): Bermudan dV/dσ matches central FD."""
    m = _market()
    berm = hh.Swaption(
        0.032, dt.date(2025, 1, 1), _SWAP_DATES, payer=True, notional=100.0,
        exercise_style=hh.Bermudan([dt.date(2026, 1, 1), dt.date(2027, 1, 1)]))

    def px(sig):
        mm = hh.HullWhiteInputs(REF, _curve(), 0.1, sig)
        return hh.solve(hh.PricingProblem(berm, mm), hh.HullWhiteGrid()).price

    ad = float(jax.grad(px)(0.012))
    eps = 1e-5
    fd = float((px(0.012 + eps) - px(0.012 - eps)) / (2 * eps))
    assert ad == pytest.approx(fd, rel=1e-6)
