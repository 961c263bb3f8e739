"""TPU bench: exact-mixing kernel (segments=2) vs QE-11 mixing kernel.

Both at the serving configuration (256 blocks x 16 batches x 32768 pairs =
268M paths/dispatch).  Prints throughput and bias vs the Carr-Madan oracle.
Usage: python benchmarks/exact_mixing_kernel_bench.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import datetime as dt
import jax, jax.numpy as jnp, numpy as np
import hedgehog_tpu as hh
from hedgehog_tpu.ops.heston_qe_kernel import _ROWS, _LANES, heston_qe_mixing_vanilla_price
from hedgehog_tpu.ops.heston_exact_kernel import heston_exact_mixing_vanilla_price

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2025, 1, 1)
R, SPOT, STRIKE = 0.03, 100.0, 100.0
H = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)
BLOCKS, BATCHES = 256, 16
SEGMENTS, QE_STEPS = 2, 11
REPS = 8

print("backend:", jax.default_backend(), flush=True)
market = hh.HestonInputs(REF, R, SPOT, *H.values())
payoff = hh.VanillaOption(STRIKE, EXPIRY, hh.European(), hh.Call(), hh.Spot())
T = float(hh.yearfrac(REF, payoff.expiry))
with jax.default_device(jax.devices("cpu")[0]):
    cm = float(hh.solve(hh.PricingProblem(payoff, market),
                        hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())).price)
disc = float(np.exp(-R * T))
pairs = BLOCKS * BATCHES * _ROWS * _LANES
print(f"CM oracle {cm:.6f}; {2*pairs:.3e} paths/dispatch", flush=True)

args = (jnp.log(SPOT), H["V0"], R, H["kappa"], H["theta"], H["sigma"], H["rho"])

def run(name, fn, reps=REPS):
    t0 = time.time()
    p0 = float(np.asarray(fn(0)))
    print(f"{name}: compile+first {time.time()-t0:.1f}s  p0={p0:.6f}", flush=True)
    ts, ps = [], []
    for i in range(reps):
        t0 = time.time()
        p = float(np.asarray(fn(i + 1)))
        ts.append(time.time() - t0)
        ps.append(p)
    t = min(ts)
    mean = float(np.mean(ps)); se = float(np.std(ps) / np.sqrt(reps))
    print(f"{name}: best {t*1e3:.1f} ms  {2*pairs/t:.3e} paths/s  "
          f"bias={(mean-cm)/cm*1e4:+.2f}bp (se {se/cm*1e4:.2f})", flush=True)

run("exact2-prng", lambda s: heston_exact_mixing_vanilla_price(
    *args, T/SEGMENTS, STRIKE, disc, n_blocks=BLOCKS, n_batches=BATCHES,
    segments=SEGMENTS, seed=s))

run("qe11-prng  ", lambda s: heston_qe_mixing_vanilla_price(
    *args, T/QE_STEPS, STRIKE, disc, n_blocks=BLOCKS, n_batches=BATCHES,
    steps=QE_STEPS, seed=s))

# QMC period: BLOCKS*BATCHES*32768 = 1.34e8 pairs < 2^30 ok
run("exact2-qmc ", lambda s: heston_exact_mixing_vanilla_price(
    *args, T/SEGMENTS, STRIKE, disc, n_blocks=BLOCKS, n_batches=BATCHES,
    segments=SEGMENTS, seed=s, qmc=True), reps=4)

print("DONE", flush=True)
