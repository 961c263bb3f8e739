"""Measure QE-M vanilla-call bias vs step count on the real TPU chip."""
import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh
from hedgehog_tpu.ops.heston_qe_kernel import _LANES, _ROWS, heston_qe_call_price

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
R, SPOT, STRIKE = 0.03, 100.0, 100.0
HESTON = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)

market = hh.HestonInputs(REF, R, SPOT, *HESTON.values())
payoff = hh.VanillaOption(STRIKE, EXPIRY, hh.European(), hh.Call(), hh.Spot())
prob = hh.PricingProblem(payoff, market)
T = hh.yearfrac(REF, payoff.expiry)
with jax.default_device(jax.devices("cpu")[0]):
    cm = float(hh.solve(prob, hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())).price)
discount = float(jnp.exp(-R * T))
print(f"CM oracle: {cm:.6f}")

N_BLOCKS, N_BATCHES = 256, 16
paths_per_call = N_BLOCKS * N_BATCHES * _ROWS * _LANES * 2  # 268M

from hedgehog_tpu.models.heston_qe import matched_gammas

for match in (False, True):
    print(f"--- match_gammas={match} ---")
    for steps in (3, 4, 5, 6, 8, 10, 12, 16, 20):
        if match:
            g1, g2 = matched_gammas(HESTON["kappa"], T / steps)
        else:
            g1 = g2 = 0.5
        reps = 24
        prices = []
        t0 = time.perf_counter()
        for i in range(reps):
            prices.append(
                heston_qe_call_price(
                    jnp.log(SPOT), HESTON["V0"], R, HESTON["kappa"], HESTON["theta"],
                    HESTON["sigma"], HESTON["rho"], T / steps, STRIKE, discount,
                    n_blocks=N_BLOCKS, n_batches=N_BATCHES, steps=steps,
                    seed=1000 * steps + i, gamma1=g1, gamma2=g2,
                )
            )
        arr = jnp.stack(prices)
        jax.block_until_ready(arr)
        el = time.perf_counter() - t0
        mean = float(jnp.mean(arr))
        se = float(jnp.std(arr) / jnp.sqrt(reps))
        bias_bp = (mean - cm) / cm * 1e4
        se_bp = se / cm * 1e4
        pps = paths_per_call * reps / el
        print(
            f"steps={steps:3d}  bias={bias_bp:+7.3f}bp ± {se_bp:.3f}  "
            f"paths/s={pps:.3e}  ({el:.1f}s)"
        )
