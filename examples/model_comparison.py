"""Per-method price / AD-greek / FD-greek wall-time comparison table.

Mirrors reference examples/comparisons/run_model_comparison.jl:22-118 —
prices a European call (and an American put where supported) with every
method and reports price, AD delta, FD delta and wall times in µs.
"""

import datetime as dt
import time

import jax

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)

market = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.2)
euro = hh.PricingProblem(
    hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot()), market
)
amer = hh.PricingProblem(
    hh.VanillaOption(100.0, EXPIRY, hh.American(), hh.Put(), hh.Spot()), market
)

mc_cfg = hh.SimulationConfig(trajectories=100_000, seed=0, variance_reduction=hh.Antithetic())
lsm_cfg = hh.SimulationConfig(
    trajectories=20_000, steps=100, seed=0, variance_reduction=hh.Antithetic()
)

METHODS = [
    ("BS analytic", euro, hh.BlackScholesAnalytic()),
    ("CRR(800)", euro, hh.CoxRossRubinsteinMethod(800)),
    ("MC exact 100k", euro, hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), mc_cfg)),
    ("Carr-Madan", euro, hh.CarrMadan(1.0, 32.0, hh.LognormalDynamics())),
    ("CRR(800) amer", amer, hh.CoxRossRubinsteinMethod(800)),
    ("LSM 20k deg5", amer, hh.LSM(hh.MonteCarlo(hh.LognormalDynamics(), hh.BlackScholesExact(), lsm_cfg), 5)),
]


def timed(fn, *args):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps * 1e6


def main():
    print(f"{'method':<16}{'price':>10}{'price_us':>10}{'ad_delta':>10}{'ad_us':>8}{'fd_delta':>10}{'fd_us':>8}")
    for name, prob, method in METHODS:
        price_fn = jax.jit(lambda p, m=method: hh.solve(p, m).price)
        ad_fn = jax.jit(lambda p, m=method: jax.grad(
            lambda s: hh.solve(hh.SpotLens().set(p, s), m).price)(p.market_inputs.spot * 1.0))
        price, price_us = timed(price_fn, prob)
        ad, ad_us = timed(ad_fn, prob)
        fd_fn = jax.jit(
            lambda p, m=method: hh.solve(
                hh.GreekProblem(p, hh.SpotLens()), hh.FiniteDifference(1e-4), m
            ).greek
        )
        fd, fd_us = timed(fd_fn, prob)
        print(f"{name:<16}{float(price):>10.4f}{price_us:>10.1f}{float(ad):>10.4f}{ad_us:>8.1f}{float(fd):>10.4f}{fd_us:>8.1f}")


if __name__ == "__main__":
    main()
