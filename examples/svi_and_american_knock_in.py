"""SVI smile surface + American knock-in barriers (round-3 additions).

1. SVIVolSurface — fit raw-SVI slices to a synthetic skewed market in ONE
   vmapped bounded L-BFGS, check Gatheral-Jacquier no-arbitrage margins,
   price through the standard solve facade, and push AD risk to the slice
   parameters.
2. American knock-in — the hit-time quadrature engine on the CRR lattice
   (no in-out parity exists under early exercise), sandwiched by its
   theoretical bounds.

Run: python examples/svi_and_american_knock_in.py
"""

import datetime as dt

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
S0, RATE = 100.0, 0.03

# ---- 1. SVI surface ---------------------------------------------------------
tenors = jnp.array([0.25, 0.5, 1.0])
fwds = S0 * jnp.exp(RATE * tenors)
truth = jnp.array(
    [
        [0.010, 0.10, -0.30, 0.00, 0.20],
        [0.018, 0.12, -0.35, 0.02, 0.25],
        [0.032, 0.14, -0.40, 0.05, 0.30],
    ]
)
strikes = jnp.exp(jnp.linspace(-0.35, 0.35, 15))[None, :] * fwds[:, None]
k = jnp.log(strikes / fwds[:, None])
ivs = jnp.sqrt(
    jax.vmap(lambda p, kr: hh.svi_total_variance(tuple(p), kr))(truth, k)
    / tenors[:, None]
)

params, loss, conv = hh.calibrate_svi_slices(tenors, fwds, strikes, ivs)
print("SVI slice fits converged:", [bool(c) for c in conv],
      " max|param err|:", float(jnp.max(jnp.abs(params - truth))))

surf = hh.SVIVolSurface(REF, tenors, params, fwds)
bf, cal = hh.check_svi_arbitrage(surf)
print("no-arb margins — butterfly per slice:", [round(float(b), 4) for b in bf],
      " calendar:", round(float(cal), 4))

mkt = hh.BlackScholesInputs(REF, RATE, S0, surf)
opt = hh.VanillaOption(105.0, dt.date(2024, 7, 1), hh.European(), hh.Call(), hh.Spot())
price = hh.solve(hh.PricingProblem(opt, mkt), hh.BlackScholesAnalytic()).price
print("105-call on the SVI smile:", round(float(price), 4))


def price_of(p):
    m = hh.BlackScholesInputs(REF, RATE, S0, hh.SVIVolSurface(REF, tenors, p, fwds))
    return hh.solve(hh.PricingProblem(opt, m), hh.BlackScholesAnalytic()).price


g = jax.grad(price_of)(params)
print("d price / d (a,b,rho,m,sigma) of the straddling slices:")
print("  t=0.25:", [round(float(x), 4) for x in g[0]])
print("  t=0.50:", [round(float(x), 4) for x in g[1]])

# the same surface drives Dupire local vol
lv = hh.dupire_local_vol(mkt, 0.5, 100.0)
print("Dupire local vol at (t=0.5, K=100):", round(float(lv), 4))

# ---- 2. American knock-in ---------------------------------------------------
EXPIRY = dt.date(2024, 12, 31)
mkt_flat = hh.BlackScholesInputs(REF, 0.05, S0, 0.25)
crr = hh.CoxRossRubinsteinMethod(1000)


def p(payoff):
    return float(hh.solve(hh.PricingProblem(payoff, mkt_flat), crr).price)


down_in_am = hh.BarrierOption(110.0, EXPIRY, 85.0, hh.American(), hh.Put(),
                              hh.Spot(), hh.Down(), hh.KnockIn())
down_in_eu = hh.BarrierOption(110.0, EXPIRY, 85.0, hh.European(), hh.Put(),
                              hh.Spot(), hh.Down(), hh.KnockIn())
vanilla_am = hh.VanillaOption(110.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())

aki, eki, van = p(down_in_am), p(down_in_eu), p(vanilla_am)
print(f"\ndown-in put 110/85:  European {eki:.4f}  <  American {aki:.4f}"
      f"  <  vanilla American {van:.4f}")

# early-exercise premium conditional on knocking in
print("knock-in early-exercise premium:", round(aki - eki, 4))

# delta through the quadrature engine (AD through lattice + hit law)
d = jax.grad(
    lambda s: hh.solve(
        hh.SpotLens().set(hh.PricingProblem(down_in_am, mkt_flat), s), crr
    ).price
)(jnp.float64(S0))
print("American knock-in delta (AD):", round(float(d), 4))

# the second engine: LSM hit-time estimator — and the HESTON case, where
# the live option's value at the hit depends on the variance state V_tau
# (the conditional grid's joint (S, V) regression carries it per path)
cfg = hh.SimulationConfig(trajectories=1 << 13, steps=50,
                          variance_reduction=hh.Antithetic(), seed=0, qmc=True)
lsm_bs = hh.LSM(hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg), 4)
p_lsm = float(hh.solve(hh.PricingProblem(down_in_am, mkt_flat), lsm_bs).price)
print(f"LSM hit-time engine (GBM grid): {p_lsm:.4f}  (lattice {aki:.4f})")

heston = hh.HestonInputs(REF, 0.05, S0, 0.0625, 2.0, 0.0625, 0.4, -0.6)
cfg_h = hh.SimulationConfig(trajectories=1 << 13, steps=50,
                            variance_reduction=hh.Antithetic(), seed=0)
lsm_h = hh.LSM(hh.MonteCarlo(hh.HestonDynamics(), hh.HestonQE(conditional=True), cfg_h), 3)
p_h = float(hh.solve(hh.PricingProblem(down_in_am, heston), lsm_h).price)
print(f"HESTON American down-in put (hit-time variance state): {p_h:.4f}")
