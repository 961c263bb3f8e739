#!/usr/bin/env python
"""Measure the rough-Bergomi bridge-barrier bias exponent by refinement.

ADVICE r4 flagged that the Heston-measured Richardson weight (α = 0.75,
montecarlo._RICH_ALPHA) was applied to rBergomi barrier grids unvalidated;
round 5 gated the extrapolation to HestonDynamics.  This study measures the
actual refinement behavior of the PLAIN bridge estimator on rBergomi:

    price(N) ≈ p∞ + C · N^(−α)

fitted over a step-refinement ladder at fixed large QMC path count, for two
Hurst levels.  If α is stable across seeds/H, a validated rBergomi weight
2^α/(2^α − 1) can be shipped; if not, the gate stays and this file is the
evidence.

Run on TPU (default backend) or CPU; prints one line per (H, N) and the
fitted (p∞, C, α) per H.
"""

import datetime as dt
import sys
import time

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
import hedgehog_tpu as hh  # noqa: E402

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2024, 12, 31)
K, H_BAR = 100.0, 85.0
LADDER = (16, 32, 64, 128, 256)
SEEDS = (0, 1)
PAIRS = 1 << 16


def price_at(market, steps: int, seed: int) -> float:
    cfg = hh.SimulationConfig(
        trajectories=PAIRS, steps=steps,
        variance_reduction=hh.Antithetic(), seed=seed, qmc=True,
    )
    m = hh.MonteCarlo(hh.RoughBergomiDynamics(), hh.EulerMaruyama(), cfg)
    ko = hh.BarrierOption(K, EXPIRY, H_BAR, direction=hh.Down(),
                          knock=hh.KnockOut())
    return float(hh.solve(hh.PricingProblem(ko, market), m).price)


def fit_exponent(ns, prices):
    """Least-squares fit of p(N) = p_inf + C·N^(−α) on the ladder."""
    from scipy.optimize import curve_fit

    def model(n, p_inf, c, alpha):
        return p_inf + c * n ** (-alpha)

    p0 = (prices[-1], (prices[0] - prices[-1]) * ns[0] ** 0.5, 0.5)
    popt, _ = curve_fit(model, np.asarray(ns, float), np.asarray(prices),
                        p0=p0, maxfev=20000)
    return popt


def main():
    for hurst in (0.1, 0.3):
        market = hh.RoughBergomiInputs(REF, 0.03, 100.0, 0.04, 1.5, hurst, -0.7)
        rows = []
        for n in LADDER:
            t0 = time.perf_counter()
            ps = [price_at(market, n, s) for s in SEEDS]
            p = float(np.mean(ps))
            spread = float(np.ptp(ps))
            dt_s = time.perf_counter() - t0
            rows.append((n, p))
            print(f"H={hurst} N={n:4d}  price={p:.6f}  seed-spread={spread*1e4:.1f}e-4 "
                  f"({dt_s:.1f}s)", flush=True)
        ns, prices = zip(*rows)
        p_inf, c, alpha = fit_exponent(ns, prices)
        w = 2.0 ** alpha / (2.0 ** alpha - 1.0)
        print(f"H={hurst}  FIT: p_inf={p_inf:.6f}  C={c:.4f}  alpha={alpha:.3f} "
              f"(Richardson weight would be {w:.2f}); "
              f"residual@{ns[-1]}={abs(prices[-1]-p_inf)/p_inf*1e4:.1f}bp",
              flush=True)


if __name__ == "__main__":
    main()
