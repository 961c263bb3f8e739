"""Validate + time the kernel-side surface pricer on TPU."""
import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh
from hedgehog_tpu.ops.heston_qe_kernel import heston_surface_mc_tpu

REF = dt.date(2024, 1, 1)
EXPIRIES = [dt.date(2024, 7, 1), dt.date(2025, 1, 1), dt.date(2026, 1, 1)]
STRIKES = jnp.array([85.0, 95.0, 100.0, 105.0, 120.0])
market = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)

# CM oracle per point
with jax.default_device(jax.devices("cpu")[0]):
    cm = jnp.stack([
        hh.solve(
            hh.PricingProblem(
                hh.VanillaOption(STRIKES, e, hh.European(), hh.Call(), hh.Spot()), market
            ),
            hh.CarrMadan(1.0, "auto", hh.HestonDynamics()),
        ).price
        for e in EXPIRIES
    ])
print("CM oracle:\n", cm)

# kernel surface: 2^22 pairs (8.4M paths), 32 steps over 2y
cfg = hh.SimulationConfig(trajectories=1 << 22, steps=32,
                          variance_reduction=hh.Antithetic(), seed=0)
surf = heston_surface_mc_tpu(market, EXPIRIES, STRIKES, cfg)
jax.block_until_ready(surf)
err_bp = (surf - cm) / cm * 1e4
print("kernel surface err (bp):\n", jnp.round(err_bp, 2))

# throughput: large run
cfg_big = hh.SimulationConfig(trajectories=1 << 26, steps=32,
                              variance_reduction=hh.Antithetic(), seed=1)
s0 = heston_surface_mc_tpu(market, EXPIRIES, STRIKES, cfg_big)
jax.block_until_ready(s0)
reps = 5
t0 = time.perf_counter()
outs = [heston_surface_mc_tpu(market, EXPIRIES, STRIKES, cfg_big, seed=i + 2) for i in range(reps)]
jax.block_until_ready(outs)
el = time.perf_counter() - t0
paths = 2 * (1 << 26) * reps
print(f"\nthroughput: {paths/el:.3e} paths/s ({len(EXPIRIES)}x{len(STRIKES)} surface, "
      f"{paths/el*15:.2e} point-paths/s), {el/reps*1e3:.0f} ms per 134M-path surface")
mean_err = float(jnp.max(jnp.abs((jnp.mean(jnp.stack(outs), axis=0) - cm) / cm))) * 1e4
print(f"max |err| at 671M paths: {mean_err:.2f}bp")
