"""TPU bench: rough Bergomi exact-Volterra mixing throughput + variance.

Measures paths/s at serving-style megabatches for the mixing estimator
(jit once, amortize dispatch over REPS), and the variance advantage vs the
full-grid Euler estimator at equal paths/steps.  There is no closed form
for rough Bergomi, so "accuracy" is refinement consistency (n vs 2n).
Usage: python benchmarks/rbergomi_bench.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import datetime as dt

import jax
import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh
from hedgehog_tpu.methods.montecarlo import mc_path_values

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2024, 12, 31)
PATHS, STEPS, REPS = 1 << 18, 64, 8

print("backend:", jax.default_backend(), flush=True)
market = hh.RoughBergomiInputs(REF, 0.03, 100.0, 0.04, 1.9, 0.08, -0.9)
opt = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
prob = hh.PricingProblem(opt, market)


def method(strategy, paths=PATHS, steps=STEPS, seed=0):
    return hh.MonteCarlo(
        hh.RoughBergomiDynamics(), strategy,
        hh.SimulationConfig(trajectories=paths, steps=steps, seed=seed,
                            variance_reduction=hh.Antithetic()))


mix = method(hh.RoughBergomiMixing())


@jax.jit
def price_mix(m):
    return hh.solve(hh.PricingProblem(opt, m), mix).price


p = float(price_mix(market))  # compile
t0 = time.time()
for _ in range(REPS):
    p = price_mix(market)
jax.block_until_ready(p)
el = (time.time() - t0) / REPS
total_paths = 2 * PATHS  # antithetic pairs
print(f"mixing f64 {PATHS}x{STEPS} (x2 antithetic): {float(p):.5f}  "
      f"{el * 1e3:.1f} ms/call  {total_paths / el:.3e} paths/s", flush=True)

mix32 = method(hh.RoughBergomiMixing(fp32=True))


@jax.jit
def price_mix32(m):
    return hh.solve(hh.PricingProblem(opt, m), mix32).price


p32 = float(price_mix32(market))
t0 = time.time()
for _ in range(REPS):
    p32 = price_mix32(market)
jax.block_until_ready(p32)
el32 = (time.time() - t0) / REPS
print(f"mixing fp32 {PATHS}x{STEPS}: {float(p32):.5f}  "
      f"{el32 * 1e3:.1f} ms/call  {total_paths / el32:.3e} paths/s  "
      f"(vs f64: {float(p32) / float(p) - 1:+.2e} rel)", flush=True)

# refinement consistency (the no-closed-form accuracy proxy)
p2 = float(hh.solve(prob, method(hh.RoughBergomiMixing(), steps=2 * STEPS)).price)
print(f"refinement: n={STEPS} -> {float(p):.5f}, n={2 * STEPS} -> {p2:.5f}  "
      f"({(float(p) / p2 - 1) * 1e4:+.1f}bp)", flush=True)

# variance: mixing vs Euler at equal paths/steps (per-path value std)
small = 1 << 15
vm = mc_path_values(prob, method(hh.RoughBergomiMixing(), paths=small, seed=3))
ve = mc_path_values(prob, method(hh.EulerMaruyama(), paths=small, seed=3))
vm_std = float(jnp.std(vm))
ve_std = float(jnp.std(ve))
print(f"per-path payoff std: euler {ve_std:.3f}  mixing {vm_std:.3f}  "
      f"variance ratio {ve_std**2 / vm_std**2:.1f}x", flush=True)

# fused Pallas kernel (ops/rbergomi_kernel.py): on-chip draws + MXU Volterra
# matmul + conditional-BS close, one dispatch, on-chip accumulation
if jax.default_backend() == "tpu":
    import functools

    from hedgehog_tpu.ops.rbergomi_kernel import (
        _P,
        _rb_trace_inputs,
        rbergomi_mixing_vanilla_price,
    )

    cfgk = hh.SimulationConfig(trajectories=1, steps=STEPS,
                               variance_reduction=hh.Antithetic())
    ins = hh.PricingProblem(opt, market)
    (chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho, disc,
     _T) = _rb_trace_inputs(ins, cfgk, 64)
    NB, NBAT = 256, 64  # 256·64·2048 pairs = 67.1M paths
    price_kernel = jax.jit(functools.partial(
        rbergomi_mixing_vanilla_price, n_blocks=NB, n_batches=NBAT, steps=STEPS))
    args = (chol, coefs, eta, dtau, f_base, lfk, strike, cp, rho, disc)
    pk = price_kernel(*args, seed=0)
    jax.block_until_ready(pk)
    t0 = time.time()
    for i in range(REPS):
        pk = price_kernel(*args, seed=i + 1)
        jax.block_until_ready(pk)  # per-call: tunnel timings lie when queued
    elk = (time.time() - t0) / REPS
    kpaths = NB * NBAT * _P * 2
    print(f"fused kernel {kpaths / 1e6:.0f}M x{STEPS}: {float(pk):.5f}  "
          f"{elk * 1e3:.1f} ms/call  {kpaths / elk:.3e} paths/s  "
          f"({(el32 / total_paths) / (elk / kpaths):.1f}x pure-fp32 per path; "
          f"price vs pure f64 {float(pk) / float(p) - 1:+.2e} rel)", flush=True)
