"""Bivariate-normal closed-form family: rainbows, compounds, choosers.

Every price below comes out of the same `solve(problem, method)` facade;
each closed form (Stulz / Geske / Rubinstein) is cross-checked against its
exact Monte Carlo oracle in one run, and compound vega/delta flow by AD
through the IFT critical spot.

Run: python examples/rainbow_compound_chooser.py
"""

import datetime as dt

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)
T1 = dt.date(2024, 7, 1)

AN = hh.BlackScholesAnalytic()
MC = hh.MonteCarlo(
    hh.LognormalDynamics(), hh.BlackScholesExact(),
    hh.SimulationConfig(trajectories=1 << 16, steps=1,
                        variance_reduction=hh.Antithetic(), seed=0, qmc=True),
)

# ---- two-asset rainbows (Stulz) --------------------------------------------
mkt2 = hh.MultiAssetBSInputs(
    REF, 0.05, jnp.array([100.0, 95.0]), jnp.array([0.25, 0.30]),
    jnp.array([[1.0, 0.4], [0.4, 1.0]]),
    dividend_yields=jnp.array([0.01, 0.02]),
)
print("two-asset rainbows (analytic | MC):")
for best in (True, False):
    for cp in (hh.Call(), hh.Put()):
        rb = hh.RainbowOption(100.0, EXPIRY, best=best, call_put=cp)
        pa = float(hh.solve(hh.PricingProblem(rb, mkt2), AN).price)
        pm = float(hh.solve(hh.PricingProblem(rb, mkt2), MC).price)
        kind = "best " if best else "worst"
        print(f"  {kind}-of {type(cp).__name__:4s}: {pa:8.4f} | {pm:8.4f}")

# correlation risk of the worst-of put by AD
def worst_put(rho):
    m = hh.MultiAssetBSInputs(
        REF, 0.05, jnp.array([100.0, 95.0]), jnp.array([0.25, 0.30]),
        jnp.array([[1.0, rho], [rho, 1.0]]),
        dividend_yields=jnp.array([0.01, 0.02]))
    return hh.solve(hh.PricingProblem(
        hh.RainbowOption(100.0, EXPIRY, best=False, call_put=hh.Put()), m), AN).price

print("worst-of put correlation vega dV/drho:",
      round(float(jax.grad(worst_put)(jnp.float64(0.4))), 4))

# ---- Geske compound options -------------------------------------------------
bs = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.25, dividend_yield=0.01)
print("\ncompound options, K1=4 at t1 on (K2=100, T2) vanilla (analytic | MC):")
for w1 in (hh.Call(), hh.Put()):
    for w2 in (hh.Call(), hh.Put()):
        co = hh.CompoundOption(4.0, T1, 100.0, EXPIRY, call_put=w1, inner_call_put=w2)
        pa = float(hh.solve(hh.PricingProblem(co, bs), AN).price)
        pm = float(hh.solve(hh.PricingProblem(co, bs), MC).price)
        print(f"  {type(w1).__name__:4s} on {type(w2).__name__:4s}: {pa:7.4f} | {pm:7.4f}")

d = jax.grad(lambda s: hh.solve(
    hh.SpotLens().set(hh.PricingProblem(
        hh.CompoundOption(4.0, T1, 100.0, EXPIRY), bs), s), AN).price)(jnp.float64(100.0))
print("call-on-call delta (AD through the Geske critical spot):", round(float(d), 4))

# ---- simple chooser ----------------------------------------------------------
ch = hh.ChooserOption(100.0, EXPIRY, T1)
pa = float(hh.solve(hh.PricingProblem(ch, bs), AN).price)
pm = float(hh.solve(hh.PricingProblem(ch, bs), MC).price)
c = float(hh.solve(hh.PricingProblem(
    hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()), bs), AN).price)
p = float(hh.solve(hh.PricingProblem(
    hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Put(), hh.Spot()), bs), AN).price)
print(f"\nchooser (choose at t1): {pa:.4f} | MC {pm:.4f}  "
      f"(bounds: max(C,P)={max(c, p):.4f}, straddle={c + p:.4f})")
