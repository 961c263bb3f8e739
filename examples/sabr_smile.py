"""SABR smile: Hagan vol, MC agreement, smile calibration — a fourth model
family beyond the reference's BS + Heston, same solve() facade.

Run: PYTHONPATH=. python examples/sabr_smile.py
"""

import datetime as dt

import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2024, 12, 31)
market = hh.SABRInputs(REF, 0.03, 100.0, alpha=0.2, beta=0.7, rho=-0.4, nu=0.5)

strikes = jnp.asarray([80.0, 90.0, 100.0, 110.0, 125.0])
T = float(hh.yearfrac(REF, EXPIRY))
F = 100.0 / float(np.exp(-0.03 * T))
vols = hh.hagan_vol(F, strikes, T, 0.2, 0.7, -0.4, 0.5)
print("Hagan smile (ρ<0 skews the downside up):")
for k, v in zip(strikes, vols):
    print(f"  K={float(k):6.1f}  σ={float(v):.4f}")

opt = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
ph = float(hh.solve(hh.PricingProblem(opt, market), hh.SABRAnalytic()).price)
cfg = hh.SimulationConfig(trajectories=1 << 16, steps=64,
                          variance_reduction=hh.Antithetic(), seed=0, qmc=True)
pm = float(hh.solve(hh.PricingProblem(opt, market),
                    hh.MonteCarlo(hh.SABRDynamics(), hh.EulerMaruyama(), cfg)).price)
print(f"\nATM call: Hagan {ph:.5f}   Euler MC {pm:.5f}")

# calibrate (alpha, rho, nu) back from the smile prices
payoffs = [hh.VanillaOption(float(k), EXPIRY, hh.European(), hh.Call(), hh.Spot())
           for k in strikes]
quotes = jnp.asarray([float(hh.solve(hh.PricingProblem(p, market), hh.SABRAnalytic()).price)
                      for p in payoffs])
guess = hh.SABRInputs(REF, 0.03, 100.0, 0.12, 0.7, -0.1, 0.3)
calib = hh.CalibrationProblem(
    hh.BasketPricingProblem(payoffs, guess), quotes, jnp.asarray([0.12, -0.1, 0.3]),
    pricing_method=hh.SABRAnalytic(),
    accessors=(hh.FieldLens("market_inputs.alpha"),
               hh.FieldLens("market_inputs.rho"),
               hh.FieldLens("market_inputs.nu")),
)
sol = hh.solve(calib, hh.OptimizerAlgo(max_iters=300),
               lb=jnp.asarray([0.01, -0.95, 0.01]), ub=jnp.asarray([2.0, 0.95, 3.0]))
print("calibrated (α, ρ, ν):", [round(float(x), 4) for x in sol.u],
      "| true (0.2, -0.4, 0.5) | converged:", bool(sol.converged))
