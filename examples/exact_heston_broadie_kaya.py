"""Exact Heston sampling (Broadie-Kaya) vs Euler vs QE vs Carr-Madan.

Mirrors reference examples/mc_heston_euler.jl + the exact-simulation tests:
shows the bias/step trade-off of each scheme against the Fourier oracle.
"""

import datetime as dt
import time

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2025, 1, 1), dt.date(2025, 12, 31)
MARKET = hh.HestonInputs(REF, 0.05, 100.0, 0.04, 1.5, 0.04, 0.3, -0.6)
OPT = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
PROB = hh.PricingProblem(OPT, MARKET)


def run(name, method):
    t0 = time.time()
    p = float(hh.solve(PROB, method).price)
    print(f"  {name:<28} {p:9.4f}  ({time.time()-t0:5.1f}s)")
    return p


def main():
    cm = float(hh.solve(PROB, hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())).price)
    print(f"Carr-Madan oracle: {cm:.4f}\n")
    n = 20_000
    run("Broadie-Kaya exact (1 step)", hh.MonteCarlo(
        hh.HestonDynamics(), hh.HestonBroadieKaya(), hh.SimulationConfig(n, steps=1, seed=1)))
    run("Andersen QE-M, 8 steps", hh.MonteCarlo(
        hh.HestonDynamics(), hh.HestonQE(),
        hh.SimulationConfig(n, steps=8, seed=1, variance_reduction=hh.Antithetic())))
    run("Euler full-truncation, 200", hh.MonteCarlo(
        hh.HestonDynamics(), hh.EulerMaruyama(),
        hh.SimulationConfig(n, steps=200, seed=1, variance_reduction=hh.Antithetic())))


if __name__ == "__main__":
    main()
