"""Conditional (Romano-Touzi mixing) Monte Carlo for Heston.

Demonstrates `HestonQE(conditional=True)`: only the variance path is
simulated; logS_T given the V path is exactly normal (CIR integral identity),
so each path is finished with the conditional Black-Scholes closed form.
Shows the three measured payoffs of the estimator on one market:

1. variance reduction vs terminal-sample QE at equal paths/steps,
2. QMC composability (Sobol' variance path → near-O(1/N) convergence),
3. smooth pathwise AD greeks (delta/vega without payoff-kink noise).

Run: python examples/conditional_mc.py
"""

import datetime as dt
import time

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
MARKET = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
PAYOFF = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
PROB = hh.PricingProblem(PAYOFF, MARKET)

CM = float(hh.solve(PROB, hh.CarrMadan(1.0, 64.0, hh.HestonDynamics(), nodes=1024)).price)
print(f"Carr-Madan reference price: {CM:.6f}\n")

# ---- 1. variance reduction at equal paths/steps --------------------------
cfg = hh.SimulationConfig(trajectories=50_000, steps=16,
                          variance_reduction=hh.Antithetic(), seed=0)
for name, strat in (("terminal QE-M", hh.HestonQE()),
                    ("conditional mixing", hh.HestonQE(conditional=True))):
    vals = hh.mc_path_values(PROB, hh.MonteCarlo(hh.HestonDynamics(), strat, cfg))
    se = float(jnp.std(vals) / jnp.sqrt(vals.shape[0]))
    print(f"{name:20s} per-path std = {float(jnp.std(vals)):7.4f}   "
          f"price s.e. = {se:.5f}")

# ---- 2. QMC convergence ---------------------------------------------------
print("\nSobol'-driven conditional MC (rel error vs Carr-Madan):")
for n in (1 << 12, 1 << 14, 1 << 16):
    cfgq = hh.SimulationConfig(trajectories=n, steps=16,
                               variance_reduction=hh.Antithetic(), seed=1, qmc=True)
    p = float(hh.solve(PROB, hh.MonteCarlo(hh.HestonDynamics(),
                                           hh.HestonQE(conditional=True), cfgq)).price)
    print(f"  N = {n:6d}: price = {p:.6f}   rel = {abs(p - CM) / CM:.2e}")

# ---- 3. smooth pathwise greeks --------------------------------------------
cfg_g = hh.SimulationConfig(trajectories=40_000, steps=16,
                            variance_reduction=hh.Antithetic(), seed=2, qmc=True)
method = hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg_g)


def price(params):
    spot, v0, kappa, theta, sigma, rho = params
    market = hh.HestonInputs(REF, 0.03, spot, v0, kappa, theta, sigma, rho)
    return hh.solve(hh.PricingProblem(PAYOFF, market), method).price


params = tuple(jnp.float64(x) for x in (100.0, 0.04, 2.0, 0.04, 0.3, -0.7))
t0 = time.perf_counter()
p, grads = jax.value_and_grad(price)(params)
names = ("delta", "dV0", "dkappa", "dtheta", "dsigma", "drho")
print(f"\nfull pathwise gradient in {time.perf_counter() - t0:.2f}s "
      f"(price {float(p):.6f}):")
for n_, g in zip(names, grads):
    print(f"  {n_:7s} = {float(g):+.6f}")
