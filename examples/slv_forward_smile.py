"""Stochastic-local-vol in action: same vanilla surface, different forward
smiles (beyond-reference model family; the reference's roadmap stops at
implied-vol surfaces).

Local vol and SLV both reprice today's vanilla surface — that is the
Gyöngy/Dupire calibration property — but they disagree on FORWARD smiles,
which is exactly what cliquets and forward-start options trade.  This
example calibrates the leverage at two mixing fractions and prices a
forward-start call under each: the stochastic-vol component (m = 1) keeps
the forward smile alive where pure local vol (m = 0) flattens it.

Run: PYTHONPATH=. python examples/slv_forward_smile.py  (CPU ~2 min)
"""

import datetime as dt

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

import hedgehog_tpu as hh  # noqa: E402

REF = dt.date(2025, 1, 1)
EXPIRY = dt.date(2027, 1, 1)

# a skewed market surface (two tenors, five strikes)
strikes = np.array([70.0, 85.0, 100.0, 115.0, 130.0])
tenors = np.array([1.0, 2.5])
vols = np.stack([np.clip(0.25 - 0.10 * np.log(strikes / 100.0), 0.12, 0.45)] * 2)
surf = hh.RectVolSurface(REF, tenors, strikes, vols, interp_strike="cubic")

print("=== calibrate leverage at two mixing fractions ===")
markets = {}
for m_frac in (0.0, 1.0):
    market = hh.SLVInputs(
        REF, 0.02, 100.0, V0=0.0625, kappa=1.5, theta=0.0625, sigma=0.5,
        rho=-0.6, sigma_surface=surf, mixing=m_frac,
    )
    lev = hh.calibrate_leverage(market, EXPIRY, steps=48, paths=32768, bins=61, seed=3)
    markets[m_frac] = market.with_leverage(lev)
    print(f"mixing={m_frac}: leverage range "
          f"[{float(lev.values.min()):.3f}, {float(lev.values.max()):.3f}]")

print("\n=== both reprice today's vanillas (the calibration property) ===")
cfg = hh.SimulationConfig(trajectories=2**16, steps=48,
                          variance_reduction=hh.Antithetic(), seed=11)
mc = hh.MonteCarlo(hh.SLVDynamics(), hh.EulerMaruyama(), cfg)
bsm = hh.BlackScholesInputs(REF, 0.02, 100.0, surf)
for K in (85.0, 100.0, 115.0):
    payoff = hh.VanillaOption(K, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    target = float(hh.solve(hh.PricingProblem(payoff, bsm), hh.BlackScholesAnalytic()).price)
    row = [
        float(hh.solve(hh.PricingProblem(payoff, mk), mc).price)
        for mk in markets.values()
    ]
    print(f"K={K:6.1f}: surface BS {target:8.4f} | SLV m=0 {row[0]:8.4f} | "
          f"SLV m=1 {row[1]:8.4f}")

print("\n=== ...but disagree on the forward smile ===")
# forward-start call: strike set ATM at t1 = 1y, pays (S_T/S_t1 - k)+ * S_t1
fs = hh.ForwardStartOption(0.9, EXPIRY, dt.date(2026, 1, 1))
for m_frac, mk in markets.items():
    p = float(hh.solve(hh.PricingProblem(fs, mk), mc).price)
    print(f"mixing={m_frac}: forward-start call (k=0.9) = {p:.4f}")
print("the m=1 price carries the stochastic forward skew local vol kills")
