"""Per-pillar rate sensitivities on an interpolated zero curve.

Mirrors the reference's bumped_rate_curve example (examples/
bumped_rate_curve.jl): build a spine curve, then get the option's
sensitivity to EVERY pillar. Here that is one reverse-mode pass over the
spine vector (ZeroRateSpineLens + BatchGreekProblem), not N re-solves —
and a finite-difference cross-check per pillar.

Run: PYTHONPATH=. python examples/bumped_rate_curve.py
"""

import datetime as dt

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
TENORS = jnp.array([0.25, 0.5, 1.0, 2.0, 5.0])
ZEROS = jnp.array([0.030, 0.032, 0.035, 0.037, 0.040])

curve = hh.RateCurve(REF, TENORS, ZEROS)
market = hh.BlackScholesInputs(REF, curve, 100.0, 0.2)
option = hh.VanillaOption(100.0, dt.date(2025, 7, 1), hh.European(), hh.Call(), hh.Spot())
prob = hh.PricingProblem(option, market)
method = hh.BlackScholesAnalytic()

base = float(hh.solve(prob, method).price)
print(f"price on the spine curve: {base:.6f}\n")

# one reverse pass over all pillars
lenses = tuple(hh.ZeroRateSpineLens(i) for i in range(len(TENORS)))
greeks = hh.solve(hh.BatchGreekProblem(prob, lenses), hh.ReverseAD(), method)

print("pillar  tenor   dPrice/dzero (AD)   FD check")
bump = 1e-6
for i, lens in enumerate(lenses):
    up = float(hh.solve(lens.set(prob, ZEROS[i] + bump), method).price)
    dn = float(hh.solve(lens.set(prob, ZEROS[i] - bump), method).price)
    fd = (up - dn) / (2 * bump)
    ad = float(greeks[lens])
    print(f"  {i}     {float(TENORS[i]):4.2f}   {ad:+12.6f}      {fd:+12.6f}")

total = sum(float(greeks[l]) for l in lenses)
print(f"\nsum of pillar sensitivities (parallel-shift rho): {total:+.6f}")
