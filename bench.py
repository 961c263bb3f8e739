#!/usr/bin/env python
"""Benchmark: Heston Euler-Maruyama Monte Carlo throughput (paths/sec/chip).

North star (BASELINE.json): >= 1e9 paths/sec/chip on TPU v5e at < 5 bp price
error vs the reference price (Carr-Madan Fourier on the same Heston market —
the reference repo publishes no wall-clock numbers, so the Fourier price is
the accuracy oracle, matching test/agreement/montecarlo_heston.jl).

Prints ONE JSON line:
  {"metric": ..., "value": paths_per_sec, "unit": "paths/s", "vs_baseline": value/1e9}

Run on the real chip (default env). Falls back to the pure-JAX path off-TPU.
"""

import datetime as dt
import json
import sys
import time

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh

STEPS = 100
N_PATH_PAIRS = 2**22  # antithetic pairs per run → 2**23 paths counted
REPS = 10
BASELINE_PATHS_PER_SEC = 1.0e9

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)  # T = 366/365


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    market = hh.HestonInputs(REF, 0.03, 100.0, 0.04, 2.0, 0.04, 0.3, -0.7)
    payoff = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(payoff, market)

    # accuracy oracle: Carr-Madan Fourier price (complex128 → CPU backend;
    # TPU has no native c128 and the oracle is a one-off tiny computation)
    with jax.default_device(jax.devices("cpu")[0]):
        cm_price = float(hh.solve(prob, hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())).price)

    from hedgehog_tpu.methods.montecarlo import reduce_payoffs

    n_pairs = N_PATH_PAIRS if on_tpu else 2**15

    def make_price_fn(use_kernel: bool):
        cfg = hh.SimulationConfig(
            trajectories=n_pairs,
            steps=STEPS,
            variance_reduction=hh.Antithetic(),
            seed=0,
        )
        method = hh.MonteCarlo(hh.HestonDynamics(), hh.EulerMaruyama(use_kernel=use_kernel), cfg)

        @jax.jit
        def price_fn(prob, seed_offset):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed_offset)
            samples = hh.simulate_terminal_prices(prob, method, key=key, device_id=seed_offset)
            payoffs = reduce_payoffs(samples, prob.payoff)
            discount = hh.df(prob.market_inputs.rate, prob.payoff.expiry)
            return discount * jnp.mean(payoffs)

        return price_fn

    # warmup/compile; fall back to the pure-JAX path if the Pallas kernel
    # fails to compile on this backend
    price_fn = make_price_fn(use_kernel=on_tpu)
    try:
        p0 = float(price_fn(prob, 0))
    except Exception as e:  # pragma: no cover - kernel compile fallback
        sys.stderr.write(f"# kernel path failed ({type(e).__name__}); pure-JAX fallback\n")
        price_fn = make_price_fn(use_kernel=False)
        p0 = float(price_fn(prob, 0))

    t0 = time.perf_counter()
    prices = []
    for i in range(REPS):
        prices.append(price_fn(prob, i + 1))
    jax.block_until_ready(prices)
    elapsed = time.perf_counter() - t0

    total_paths = 2 * n_pairs * REPS  # antithetic pair = 2 paths
    paths_per_sec = total_paths / elapsed

    mc_price = float(jnp.mean(jnp.stack(prices)))
    err_bp = abs(mc_price - cm_price) / cm_price * 1e4

    sys.stderr.write(
        f"# backend={jax.default_backend()} steps={STEPS} pairs/run={n_pairs} reps={REPS}\n"
        f"# elapsed={elapsed:.3f}s  mc={mc_price:.5f}  cm={cm_price:.5f}  err={err_bp:.2f}bp\n"
    )
    print(
        json.dumps(
            {
                "metric": f"heston_euler_mc_paths_per_sec_per_chip_steps{STEPS}_err{err_bp:.1f}bp",
                "value": paths_per_sec,
                "unit": "paths/s",
                "vs_baseline": paths_per_sec / BASELINE_PATHS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
