"""Exotic payoff families (beyond the reference's vanilla taxonomy).

Demonstrates the three round-3 payoff families through the same
`solve(problem, method)` facade as vanillas:

1. DigitalOption — analytic / Carr-Madan Gil-Pelaez / conditional MC agree,
   and the conditional estimator's smooth Φ(d2) close gives a REAL pathwise
   AD delta where the raw indicator payoff differentiates to zero.
2. BarrierOption — Reiner-Rubinstein closed form vs the Brownian-bridge
   corrected MC (exact for GBM: ONE bridge over [0,T]), plus a Heston
   knock-out on the conditional grid.
3. AsianOption — geometric closed form vs grid MC, arithmetic by MC.

Run: python examples/exotic_payoffs.py
"""

import datetime as dt

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)  # T = 1 (ACT/365)
BS = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.2)
HESTON = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)

# ---- 1. digitals ----------------------------------------------------------
dig = hh.DigitalOption(105.0, EXPIRY, hh.European(), hh.Call(), hh.Spot(), cash=10.0)
p_an = float(hh.solve(hh.PricingProblem(dig, BS), hh.BlackScholesAnalytic()).price)
p_cm = float(hh.solve(hh.PricingProblem(dig, BS),
                      hh.CarrMadan(1.0, "auto", hh.LognormalDynamics())).price)
print(f"digital call (cash 10): analytic {p_an:.6f}   Gil-Pelaez {p_cm:.6f}")

cfg = hh.SimulationConfig(trajectories=1 << 15, steps=12,
                          variance_reduction=hh.Antithetic(), seed=0)
cond = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg)
p_hcm = float(hh.solve(hh.PricingProblem(dig, HESTON),
                       hh.CarrMadan(1.0, "auto", hh.HestonDynamics())).price)
p_mix = float(hh.solve(hh.PricingProblem(dig, HESTON), cond).price)
print(f"Heston digital:         Fourier  {p_hcm:.6f}   conditional MC {p_mix:.6f}")


def digital_delta(strat):
    def price(s):
        m = hh.HestonInputs(REF, 0.03, s, 0.04, 2.0, 0.04, 0.3, -0.7)
        return hh.solve(hh.PricingProblem(dig, m),
                        hh.MonteCarlo(hh.HestonDynamics(), strat, cfg)).price
    return float(jax.grad(price)(jnp.float64(100.0)))


print(f"pathwise AD delta: raw terminal sampler {digital_delta(hh.HestonQE()):.4f} "
      f"(indicator kills the gradient), conditional "
      f"{digital_delta(hh.HestonQE(conditional=True)):.4f} (smooth close)\n")

# ---- 2. barriers -----------------------------------------------------------
ko = hh.BarrierOption(100.0, EXPIRY, 90.0, hh.European(), hh.Call(), hh.Spot(),
                      hh.Down(), hh.KnockOut())
p_rr = float(hh.solve(hh.PricingProblem(ko, BS), hh.BlackScholesAnalytic()).price)
one_bridge = hh.SimulationConfig(trajectories=1 << 16, steps=1,
                                 variance_reduction=hh.Antithetic(), seed=0)
p_bmc = float(hh.solve(hh.PricingProblem(ko, BS),
                       hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(),
                                     one_bridge)).price)
print(f"down-and-out call: Reiner-Rubinstein {p_rr:.6f}   "
      f"one-bridge exact MC {p_bmc:.6f}")
ko_h = hh.BarrierOption(100.0, EXPIRY, 85.0, hh.European(), hh.Call(), hh.Spot(),
                        hh.Down(), hh.KnockOut())
p_hko = float(hh.solve(hh.PricingProblem(ko_h, HESTON), cond).price)
print(f"Heston down-and-out (conditional grid, bridge-corrected): {p_hko:.6f}")

# rebates: knock-out pays R when touched — at expiry or AT THE HIT TIME
# (the one-touch convention; Reiner-Rubinstein E/F blocks)
for at_hit in (False, True):
    kor = hh.BarrierOption(100.0, EXPIRY, 90.0, hh.European(), hh.Call(),
                           hh.Spot(), hh.Down(), hh.KnockOut(),
                           rebate=3.0, rebate_at_hit=at_hit)
    p = float(hh.solve(hh.PricingProblem(kor, BS), hh.BlackScholesAnalytic()).price)
    print(f"  + rebate 3.0 paid {'at hit ' if at_hit else 'at expiry'}: {p:.6f}")
print()

# ---- 2b. double barriers and lookbacks --------------------------------------
dko = hh.DoubleBarrierOption(100.0, EXPIRY, 80.0, 125.0)
p_img = float(hh.solve(hh.PricingProblem(dko, BS), hh.BlackScholesAnalytic()).price)
p_dmc = float(hh.solve(hh.PricingProblem(dko, BS),
                       hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(),
                                     one_bridge)).price)
print(f"double knock-out call (80,125): image series {p_img:.6f}   "
      f"two-sided bridge MC {p_dmc:.6f}")

fl_call = hh.LookbackOption(EXPIRY)  # floating strike: pays S_T − min
fx_call = hh.LookbackOption(EXPIRY, 100.0, hh.FixedStrike())  # pays (max − K)+
for po, label in ((fl_call, "floating-strike lookback call"),
                  (fx_call, "fixed-strike lookback call  ")):
    p_an = float(hh.solve(hh.PricingProblem(po, BS), hh.BlackScholesAnalytic()).price)
    p_mc = float(hh.solve(hh.PricingProblem(po, BS),
                          hh.MonteCarlo(hh.LognormalDynamics(),
                                        hh.BlackScholesExact(), one_bridge)).price)
    print(f"{label}: closed form {p_an:.6f}   bridge-extremum MC {p_mc:.6f}")
print()

# ---- 3. asians -------------------------------------------------------------
geo = hh.AsianOption(100.0, EXPIRY, 12, hh.European(), hh.Call(), hh.Spot(),
                     hh.GeometricAverage())
arith = hh.AsianOption(100.0, EXPIRY, 12, hh.European(), hh.Call(), hh.Spot(),
                       hh.ArithmeticAverage())
pg_an = float(hh.solve(hh.PricingProblem(geo, BS), hh.BlackScholesAnalytic()).price)
acfg = hh.SimulationConfig(trajectories=1 << 15, steps=12,
                           variance_reduction=hh.Antithetic(), seed=0)
gbm = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), acfg)
pg_mc = float(hh.solve(hh.PricingProblem(geo, BS), gbm).price)
pa_mc = float(hh.solve(hh.PricingProblem(arith, BS), gbm).price)
print(f"geometric asian: closed form {pg_an:.6f}   grid MC {pg_mc:.6f}")
print(f"arithmetic asian (MC, ≥ geometric by AM-GM): {pa_mc:.6f}")

# ---- 4. variance swaps, forward starts, cliquets ----------------------------
vs = hh.VarianceSwap(0.04, EXPIRY, observations=252, notional=100.0)
p_vs = float(hh.solve(hh.PricingProblem(vs, BS), hh.BlackScholesAnalytic()).price)
print(f"variance swap (K=20vol on a 20-vol market): {p_vs:.6f} "
      f"(the residual is the exact discrete-sampling drift term)")
fair_h = float(hh.heston_variance_swap_strike(HESTON, 1.0))
print(f"Heston continuous fair variance strike: {fair_h:.6f} "
      f"(θ + (V0−θ)(1−e^-κT)/(κT))")

fs = hh.ForwardStartOption(1.0, EXPIRY, hh.add_yearfrac(REF, 0.5),
                           hh.European(), hh.Call(), hh.Spot())
p_fs = float(hh.solve(hh.PricingProblem(fs, BS), hh.BlackScholesAnalytic()).price)
print(f"ATM forward-start call (strike set at t=0.5): {p_fs:.6f} (Rubinstein)")

cl = hh.Cliquet(EXPIRY, observations=12, local_floor=0.0, local_cap=0.05,
                notional=100.0)
p_cl = float(hh.solve(hh.PricingProblem(cl, BS), hh.BlackScholesAnalytic()).price)
print(f"12-reset cliquet (floor 0, cap 5%): {p_cl:.6f} "
      f"(per-period Black spreads)\n")

# ---- 5. multi-asset: spreads and baskets ------------------------------------
mkt2 = hh.MultiAssetBSInputs(REF, 0.05, jnp.asarray([100.0, 95.0]),
                             jnp.asarray([0.25, 0.2]),
                             jnp.asarray([[1.0, 0.5], [0.5, 1.0]]))
ex = hh.SpreadOption(0.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
sp = hh.SpreadOption(5.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
gb = hh.BasketOption(95.0, EXPIRY, jnp.asarray([0.6, 0.4]),
                     hh.European(), hh.Call(), hh.Spot(), geometric=True)
print(f"exchange option (Margrabe, exact): "
      f"{float(hh.solve(hh.PricingProblem(ex, mkt2), hh.BlackScholesAnalytic()).price):.6f}")
print(f"spread option K=5 (Kirk):          "
      f"{float(hh.solve(hh.PricingProblem(sp, mkt2), hh.BlackScholesAnalytic()).price):.6f}")
print(f"geometric basket (exact):          "
      f"{float(hh.solve(hh.PricingProblem(gb, mkt2), hh.BlackScholesAnalytic()).price):.6f}")
corr_vega = jax.grad(lambda r_: hh.solve(hh.PricingProblem(ex, hh.MultiAssetBSInputs(
    REF, 0.05, jnp.asarray([100.0, 95.0]), jnp.asarray([0.25, 0.2]),
    jnp.asarray([[1.0, r_], [r_, 1.0]]))), hh.BlackScholesAnalytic()).price)(0.5)
print(f"correlation vega of the exchange (AD): {float(corr_vega):.4f}")

# ---- 6. American knock-outs: bridged lattice vs barrier LSM ------------------
am_ko = hh.BarrierOption(110.0, EXPIRY, 80.0, hh.American(), hh.Put(),
                         hh.Spot(), hh.Down(), hh.KnockOut())
p_crr = float(hh.solve(hh.PricingProblem(am_ko, BS),
                       hh.CoxRossRubinsteinMethod(2000)).price)
cfg_ko = hh.SimulationConfig(trajectories=1 << 14, steps=100,
                             variance_reduction=hh.Antithetic(), seed=0, qmc=True)
p_lsm = float(hh.solve(
    hh.PricingProblem(am_ko, BS),
    hh.LSM(hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg_ko), 4)).price)
print(f"\nAmerican down-and-out put: bridged CRR {p_crr:.4f} vs barrier LSM "
      f"{p_lsm:.4f} (no-cross factors on lattice edges / stopping state)")
cfg_h = hh.SimulationConfig(trajectories=1 << 13, steps=50,
                            variance_reduction=hh.Antithetic(), seed=0, qmc=True)
p_hes = float(hh.solve(
    hh.PricingProblem(am_ko, HESTON),
    hh.LSM(hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg_h), 3)).price)
print(f"same contract under Heston (conditional bridge grid): {p_hes:.4f}")

# ---- 7. Bachelier: the normal model ------------------------------------------
NB = hh.BachelierInputs(REF, 0.05, 100.0, 20.0)  # sigma_N = 20 price units/yr^.5
atm_f = 100.0 / float(hh.df(NB.rate, hh.to_ticks(EXPIRY)))
n_call = hh.VanillaOption(atm_f, EXPIRY, hh.European(), hh.Call(), hh.Spot())
p_n = float(hh.solve(hh.PricingProblem(n_call, NB), hh.BachelierAnalytic()).price)
print(f"\nBachelier ATM-forward call (sigma_N=20): {p_n:.6f} = D*sigma*sqrt(T)*phi(0)")
iv_n = float(hh.implied_normal_vol(p_n, atm_f, atm_f, 1.0,
                                   float(hh.df(NB.rate, hh.to_ticks(EXPIRY))), 1.0))
print(f"implied normal vol round-trip: {iv_n:.6f}")
neg = hh.BachelierInputs(REF, 0.0, -5.0, 10.0)  # negative spot (WTI Apr 2020)
p_neg = float(hh.solve(hh.PricingProblem(
    hh.VanillaOption(0.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()), neg),
    hh.BachelierAnalytic()).price)
print(f"call struck at 0 on a NEGATIVE underlying (F=-5): {p_neg:.6f}")

# ---- 8. dividends and Bermudan exercise --------------------------------------
DIV = hh.BlackScholesInputs(REF, 0.02, 100.0, 0.25, dividend_yield=0.08)
am_call = hh.VanillaOption(100.0, EXPIRY, hh.American(), hh.Call(), hh.Spot())
eu_div = float(hh.solve(hh.PricingProblem(
    hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()), DIV),
    hh.BlackScholesAnalytic()).price)
am_div = float(hh.solve(hh.PricingProblem(am_call, DIV),
                        hh.CoxRossRubinsteinMethod(1000)).price)
print(f"\nq=8% > r=2%: American call {am_div:.4f} > European {eu_div:.4f} "
      f"(dividends make early exercise optimal)")

import datetime as _dt
quarters = (_dt.date(2024, 4, 1), _dt.date(2024, 7, 1), _dt.date(2024, 10, 1))
berm = hh.VanillaOption(110.0, EXPIRY, hh.Bermudan(quarters), hh.Put(), hh.Spot())
p_eu2 = float(hh.solve(hh.PricingProblem(
    hh.VanillaOption(110.0, EXPIRY, hh.European(), hh.Put(), hh.Spot()), BS),
    hh.BlackScholesAnalytic()).price)
p_bq = float(hh.solve(hh.PricingProblem(berm, BS), hh.CoxRossRubinsteinMethod(1000)).price)
p_am2 = float(hh.solve(hh.PricingProblem(
    hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot()), BS),
    hh.CoxRossRubinsteinMethod(1000)).price)
print(f"put 110: European {p_eu2:.4f} < Bermudan(quarterly) {p_bq:.4f} < American {p_am2:.4f}")

# ---- 9. autocallables (snowball & phoenix) ------------------------------------
# THE retail structured product: quarterly observations, autocall at 100%,
# knock-in airbag at 70%, bridge-monitored (continuous) KI so the downside
# leg is smooth — its pathwise AD vega is real.
cfg_ac = hh.SimulationConfig(trajectories=2**15, steps=48,
                             variance_reduction=hh.Antithetic(), seed=3)
mc_ac = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg_ac)
snowball = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1.0,
                           coupon=0.02, knock_in_barrier=0.7)
p_snow = float(hh.solve(hh.PricingProblem(snowball, BS), mc_ac).price)
phoenix = hh.Autocallable(EXPIRY, periods=4, autocall_barrier=1.0,
                          coupon=0.02, knock_in_barrier=0.7, coupon_barrier=0.8)
p_phx = float(hh.solve(hh.PricingProblem(phoenix, BS), mc_ac).price)
print(f"\nsnowball (4 x 2% memory coupons): {p_snow:.4f}; "
      f"phoenix (coupon barrier 80%): {p_phx:.4f}")
HEST_AC = hh.HestonInputs(REF, 0.05, 100.0, 0.04, 2.0, 0.05, 0.6, -0.7)
mc_hc = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg_ac)
p_hest = float(hh.solve(hh.PricingProblem(snowball, HEST_AC), mc_hc).price)
print(f"same snowball under Heston (conditional bridge grid): {p_hest:.4f}")
import jax as _jax
vega_ac = float(_jax.grad(lambda s: hh.solve(hh.PricingProblem(
    snowball, hh.BlackScholesInputs(REF, 0.05, 100.0, s)), mc_ac).price)(0.2))
print(f"pathwise AD vega of the note (smooth KI leg): {vega_ac:.4f} (short vol)")
