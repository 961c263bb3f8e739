"""Kernel-scale greek-vector ratio: fused price+greeks kernel vs price-only
kernel at the bench serving configuration (268M antithetic paths, 11 steps).

Round-3 VERDICT item 1 "done" criterion: 7-param Heston greek vector at
>=2^26 paths with grad <= 2x the KERNEL price; the fused pass returns the
price-only kernel's price bit-for-bit (same PRNG stream).

Run ON TPU: cd /root/repo && python benchmarks/kernel_greeks_bench.py
"""

import datetime as dt
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh
from hedgehog_tpu.ops.heston_qe_greeks_kernel import heston_qe_mixing_price_and_greeks
from hedgehog_tpu.ops.heston_qe_kernel import heston_qe_mixing_vanilla_price

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
R, SPOT, STRIKE = 0.03, 100.0, 100.0
H = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)
STEPS = 11
BLOCKS, BATCHES = 256, 16  # 256*16*32768*2 = 268M paths/dispatch


def main():
    on_tpu = jax.default_backend() == "tpu"
    blocks, batches = (BLOCKS, BATCHES) if on_tpu else (1, 1)
    T = float(hh.yearfrac(REF, hh.to_ticks(EXPIRY)))
    D = float(np.exp(-R * T))
    args = (np.log(SPOT), H["V0"], R, H["kappa"], H["theta"], H["sigma"], H["rho"],
            T / STEPS, STRIKE, D)
    kw = dict(n_blocks=blocks, n_batches=batches, steps=STEPS)

    price_fn = lambda seed: heston_qe_mixing_vanilla_price(*args, seed=seed, **kw)
    greeks_fn = lambda seed: heston_qe_mixing_price_and_greeks(*args, seed=seed, **kw)

    p0 = price_fn(0)
    pg0, g0 = greeks_fn(0)
    jax.block_until_ready((p0, pg0, g0))
    assert abs(float(p0) - float(pg0)) < 1e-12, "stream replay mismatch"

    def best_of(fn, reps=4, outer=3):
        times = []
        for _ in range(outer):
            t0 = time.perf_counter()
            outs = [fn(i + 1) for i in range(reps)]
            jax.block_until_ready(outs)
            times.append((time.perf_counter() - t0) / reps)
        return min(times)

    t_price = best_of(price_fn)
    t_greeks = best_of(greeks_fn)
    paths = blocks * batches * 32768 * 2
    print(f"backend={jax.default_backend()} paths/dispatch={paths:.3g} steps={STEPS}")
    print(f"price kernel:        {t_price*1e3:8.1f} ms  ({paths/t_price:.3g} paths/s)")
    print(f"price+greeks kernel: {t_greeks*1e3:8.1f} ms  ratio={t_greeks/t_price:.2f} (target <2)")
    print("price:", float(pg0))
    print("grad7 (spot,V0,kappa,theta,sigma,rho,rate):", np.asarray(g0))


if __name__ == "__main__":
    main()
