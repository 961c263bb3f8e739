"""Round-3 families: rough Bergomi, Hull-White rates, LSM dual bounds.

Three beyond-reference capabilities through the one `solve` facade:

1. ROUGH BERGOMI — non-Markovian rough volatility (no closed form exists):
   the exact-Volterra mixing estimator prices a smile, the power-law ATM
   skew signature T^{H−1/2} shows up, and `jax.grad` returns the roughness
   greek ∂price/∂H through the covariance panel + Cholesky.
2. HULL-WHITE — stochastic interest rates fitted exactly to a spine curve:
   Jamshidian swaptions, caplets, key-rate durations via ZeroRateSpineLens,
   all pinned against the exact (x, ∫x) short-rate Monte Carlo.
3. PRIMAL-DUAL LSM — the Andersen-Broadie bound certifies the American
   price from inside the framework: lower ≤ price ≤ upper.

Run: python examples/rough_bergomi_and_rates.py
"""

import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2024, 12, 31)

# ---- 1. rough Bergomi smile + roughness greek ------------------------------
rb = hh.RoughBergomiInputs(REF, 0.03, 100.0, xi0=0.04, eta=1.9, hurst=0.08,
                           rho=-0.9)
mix = hh.MonteCarlo(
    hh.RoughBergomiDynamics(), hh.RoughBergomiMixing(),
    hh.SimulationConfig(trajectories=1 << 16, steps=64, seed=0,
                        variance_reduction=hh.Antithetic()))

strikes = jnp.asarray([80.0, 90.0, 100.0, 110.0, 120.0])
opt = hh.VanillaOption(strikes, EXPIRY, hh.European(), hh.Call(), hh.Spot())
prices = hh.solve(hh.PricingProblem(opt, rb), mix).price  # one path set, 5 strikes
ivs = hh.implied_vol_bs(prices, strikes, 364 / 365, 100.0, 0.03)
print("rough Bergomi smile (K, price, IV):")
for k, p, v in zip(strikes, prices, ivs):
    print(f"  {float(k):6.1f}  {float(p):8.4f}  {float(v):.4f}")

atm = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
dv_dh = jax.grad(lambda h: hh.solve(
    hh.PricingProblem(atm, hh.RoughBergomiInputs(REF, 0.03, 100.0, 0.04, 1.9,
                                                 h, -0.9)), mix).price)(0.08)
print(f"roughness greek dV/dH = {float(dv_dh):.3f}  (AD through the "
      "Volterra covariance + Cholesky)")

# ---- 2. Hull-White: swaption + key-rate durations --------------------------
tenors = np.array([0.5, 1.0, 2.0, 3.0, 5.0])
zeros = np.array([0.02, 0.025, 0.03, 0.032, 0.035])
curve = hh.RateCurve.from_dfs(REF, tenors, np.exp(-zeros * tenors))
hw = hh.HullWhiteInputs(REF, curve, a=0.1, sigma=0.012)

sw = hh.Swaption(0.032, dt.date(2025, 1, 1),
                 [dt.date(2026, 1, 1), dt.date(2027, 1, 1), dt.date(2028, 1, 1)],
                 payer=True, notional=100.0)
pa = hh.solve(hh.PricingProblem(sw, hw), hh.HullWhiteAnalytic()).price
pm = hh.solve(hh.PricingProblem(sw, hw), hh.HullWhiteMonteCarlo(
    hh.SimulationConfig(trajectories=1 << 17, steps=2, seed=0,
                        variance_reduction=hh.Antithetic()))).price
print(f"\npayer swaption: Jamshidian {float(pa):.4f}  vs exact-MC {float(pm):.4f}")

krd = hh.solve(
    hh.BatchGreekProblem(hh.PricingProblem(sw, hw),
                         tuple(hh.ZeroRateSpineLens(i) for i in range(5))),
    hh.ReverseAD(), hh.HullWhiteAnalytic())
print("key-rate durations (per spine pillar, one reverse pass):")
for lens, v in krd.items():
    print(f"  pillar {lens.i} ({tenors[lens.i]:.1f}y): {float(v):+9.3f}")

cap = hh.CapFloor(0.03, [dt.date(2024, 7, 1), dt.date(2025, 1, 1),
                         dt.date(2025, 7, 1), dt.date(2026, 1, 1)],
                  notional=100.0)
print(f"2y cap (3 periods): "
      f"{float(hh.solve(hh.PricingProblem(cap, hw), hh.HullWhiteAnalytic()).price):.4f}")

berm = hh.Swaption(0.032, dt.date(2025, 1, 1),
                   [dt.date(2026, 1, 1), dt.date(2027, 1, 1), dt.date(2028, 1, 1)],
                   payer=True, notional=100.0,
                   exercise_style=hh.Bermudan([dt.date(2026, 1, 1),
                                               dt.date(2027, 1, 1)]))
pb = hh.solve(hh.PricingProblem(berm, hw), hh.HullWhiteGrid()).price
print(f"BERMUDAN payer swaption (3 exercise dates, x-grid engine — one "
      f"Gaussian-kernel matmul per gap): {float(pb):.4f} "
      f"(European corner above: {float(pa):.4f})")

# ---- 2b. the hybrid: Heston smile UNDER the Hull-White curve ----------------
hhw = hh.HestonHullWhiteInputs(REF, curve, 100.0, V0=0.04, kappa=2.0,
                               theta=0.04, sigma=0.3, rho_sv=-0.6,
                               a=0.1, sigma_r=0.012, rho_sr=-0.3)
p_hyb = hh.solve(
    hh.PricingProblem(hh.VanillaOption(100.0, EXPIRY, hh.European(),
                                       hh.Call(), hh.Spot()), hhw),
    hh.MonteCarlo(hh.HestonHullWhiteDynamics(), hh.HestonQE(conditional=True),
                  hh.SimulationConfig(trajectories=1 << 16, steps=32, seed=0,
                                      variance_reduction=hh.Antithetic()))).price
print(f"\nHeston-Hull-White hybrid ATM call (3-factor mixing, stochastic "
      f"discount): {float(p_hyb):.4f}")

# ---- 3. certify an American price with Andersen-Broadie bounds -------------
bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.3)
amer = hh.PricingProblem(
    hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot()), bs)
lsm = hh.LSM(hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(),
                           hh.SimulationConfig(trajectories=20_000, steps=24,
                                               seed=0)), degree=5)
db = hh.lsm_dual_bound(amer, lsm, n_outer=4096, n_inner=128)
crr = hh.solve(amer, hh.CoxRossRubinsteinMethod(2000)).price
print(f"\nAmerican put: LSM primal {float(db.primal):.4f}, certified "
      f"[{float(db.lower):.4f}, {float(db.upper):.4f}] "
      f"(±{float(db.se_lower):.4f}/±{float(db.se_upper):.4f}); "
      f"CRR(2000) = {float(crr):.4f}")
