"""Merton jump-diffusion — a third model family beyond the reference's
BS + Heston, through the same ``solve(problem, method)`` facade.

1. Agreement: Poisson-weighted BS series vs Carr-Madan on the Merton CF vs
   exact-terminal Monte Carlo.
2. The jump smile: implied-vol skew the diffusion-only model cannot make.
3. Full AD greeks including the jump intensity (the MC payoffs carry a
   likelihood-ratio surrogate for the discrete Poisson count).
4. Calibration: recover (λ, μ_J, σ_J) from a strike grid of prices.

Run: python examples/merton_jumps.py
"""

import datetime as dt

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2024, 12, 31)  # T = 1 (ACT/365)
market = hh.MertonInputs(
    REF, 0.03, 100.0,
    sigma=0.2, jump_intensity=0.5, jump_mean=-0.10, jump_std=0.15,
)
opt = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
prob = hh.PricingProblem(opt, market)

# ---- 1. three independent pricers agree ------------------------------------
p_series = float(hh.solve(prob, hh.MertonAnalytic()).price)
p_cm = float(hh.solve(prob, hh.CarrMadan(1.0, "auto", hh.MertonJumpDynamics())).price)
cfg = hh.SimulationConfig(trajectories=1 << 17, steps=1,
                          variance_reduction=hh.Antithetic(), seed=0, qmc=True)
p_mc = float(hh.solve(prob, hh.MonteCarlo(hh.MertonJumpDynamics(), hh.MertonExact(), cfg)).price)
print(f"series {p_series:.6f} | Carr-Madan {p_cm:.6f} | MC {p_mc:.6f}")

# ---- 2. the jump smile ------------------------------------------------------
strikes = jnp.asarray([70.0, 85.0, 100.0, 115.0, 130.0])
grid = hh.solve(
    hh.PricingProblem(hh.VanillaOption(strikes, EXPIRY, hh.European(), hh.Call(), hh.Spot()), market),
    hh.MertonAnalytic()).price
T = float(hh.yearfrac(REF, EXPIRY))
ivs = hh.implied_vol(grid, strikes, T, 100.0, 0.03)
print("strikes:", [float(k) for k in strikes])
print("implied vols (the negative-mean jumps put a skew in):",
      [round(float(v), 4) for v in ivs])

# ---- 3. greeks incl. the jump intensity ------------------------------------
def price(lam, mu_j, s_j):
    m = hh.MertonInputs(REF, 0.03, 100.0, 0.2, lam, mu_j, s_j)
    return hh.solve(hh.PricingProblem(opt, m), hh.MertonAnalytic()).price

g = jax.grad(price, argnums=(0, 1, 2))(0.5, -0.10, 0.15)
print("series AD (dλ, dμ_J, dσ_J):", [round(float(x), 4) for x in g])

def mc_price(lam):
    m = hh.MertonInputs(REF, 0.03, 100.0, 0.2, lam, -0.10, 0.15)
    return hh.solve(hh.PricingProblem(opt, m),
                    hh.MonteCarlo(hh.MertonJumpDynamics(), hh.MertonExact(), cfg)).price

print("MC intensity greek (likelihood-ratio, unbiased):",
      round(float(jax.grad(mc_price)(0.5)), 4))

# ---- 4. calibrate the jump parameters back ----------------------------------
payoffs = [hh.VanillaOption(float(k), EXPIRY, hh.European(), hh.Call(), hh.Spot())
           for k in strikes]
quotes = jnp.asarray([
    float(hh.solve(hh.PricingProblem(p, market), hh.MertonAnalytic()).price)
    for p in payoffs
])
guess = hh.MertonInputs(REF, 0.03, 100.0, 0.2, 0.3, -0.05, 0.25)
calib = hh.CalibrationProblem(
    hh.BasketPricingProblem(payoffs, guess), quotes,
    jnp.asarray([0.3, -0.05, 0.25]),
    pricing_method=hh.MertonAnalytic(),
    accessors=(hh.FieldLens("market_inputs.jump_intensity"),
               hh.FieldLens("market_inputs.jump_mean"),
               hh.FieldLens("market_inputs.jump_std")),
)
sol = hh.solve(calib, hh.OptimizerAlgo(max_iters=300),
               lb=jnp.asarray([0.01, -0.5, 0.01]), ub=jnp.asarray([3.0, 0.3, 0.6]))
print("calibrated (λ, μ_J, σ_J):", [round(float(x), 4) for x in sol.u],
      "| true (0.5, -0.1, 0.15) | converged:", bool(sol.converged))

# ---- 5. the other jump families: Kou and Variance Gamma ---------------------
kou = hh.KouInputs(REF, 0.03, 100.0, 0.16,
                   jump_intensity=1.0, p_up=0.4, eta_up=10.0, eta_down=5.0)
p_kou_cm = float(hh.solve(hh.PricingProblem(opt, kou),
                          hh.CarrMadan(1.0, "auto", hh.KouJumpDynamics())).price)
cfg_x = hh.SimulationConfig(trajectories=1 << 16, steps=1,
                            variance_reduction=hh.Antithetic(), seed=0, qmc=True)
p_kou_mc = float(hh.solve(hh.PricingProblem(opt, kou),
                          hh.MonteCarlo(hh.KouJumpDynamics(), hh.KouExact(), cfg_x)).price)
print(f"\nKou double-exponential: CM {p_kou_cm:.5f}  exact MC {p_kou_mc:.5f}")

vg = hh.VarianceGammaInputs(REF, 0.03, 100.0, 0.18, nu=0.25, theta=-0.14)
p_vg_cm = float(hh.solve(hh.PricingProblem(opt, vg),
                         hh.CarrMadan(1.0, "auto", hh.VarianceGammaDynamics())).price)
p_vg_mc = float(hh.solve(hh.PricingProblem(opt, vg),
                         hh.MonteCarlo(hh.VarianceGammaDynamics(),
                                       hh.VarianceGammaExact(), cfg_x)).price)
print(f"Variance Gamma (pure jump): CM {p_vg_cm:.5f}  exact MC {p_vg_mc:.5f}")

# the three jump families' smiles at a glance (10-delta-ish wings)
for name, mkt_j, dyn in (("Merton", market, hh.MertonJumpDynamics()),
                         ("Kou", kou, hh.KouJumpDynamics()),
                         ("VG", vg, hh.VarianceGammaDynamics())):
    ivs = []
    for k in (80.0, 100.0, 120.0):
        po = hh.VanillaOption(k, EXPIRY, hh.European(), hh.Call(), hh.Spot())
        pr = float(hh.solve(hh.PricingProblem(po, mkt_j),
                            hh.CarrMadan(1.0, "auto", dyn)).price)
        ivs.append(float(hh.implied_vol_bs(pr, k, 1.0, 100.0, 0.03)))
    print(f"  {name:6s} smile (K=80/100/120): "
          + "  ".join(f"{v:.4f}" for v in ivs))

# ---- 6. Bates: Heston variance + Merton jumps (the production smile model) --
bates = hh.BatesInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7,
                       jump_intensity=0.5, jump_mean=-0.10, jump_std=0.15)
p_bates_cm = float(hh.solve(hh.PricingProblem(opt, bates),
                            hh.CarrMadan(1.0, "auto", hh.BatesDynamics())).price)
cfg_b = hh.SimulationConfig(trajectories=1 << 16, steps=12,
                            variance_reduction=hh.Antithetic(), seed=0, qmc=True)
p_bates_mx = float(hh.solve(
    hh.PricingProblem(opt, bates),
    hh.MonteCarlo(hh.BatesDynamics(), hh.HestonQE(conditional=True), cfg_b)).price)
print(f"\nBates (Heston+jumps): CM {p_bates_cm:.5f}  jump-extended mixing MC "
      f"{p_bates_mx:.5f} ({(p_bates_mx/p_bates_cm-1)*1e4:+.1f}bp)")
heston_only = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
p_h = float(hh.solve(hh.PricingProblem(opt, heston_only),
                     hh.CarrMadan(1.0, "auto", hh.HestonDynamics())).price)
print(f"jump premium over pure Heston: {p_bates_cm - p_h:+.5f}")
