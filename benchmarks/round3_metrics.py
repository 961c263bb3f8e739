"""Round-3 metric sweep (one TPU session): the VERDICT r2 "done" numbers.

1. Pure-JAX conditional greek ratio (forward mode) — target < 2.
2. Conditional LSM per-step speedup vs QE-grid LSM (same paths/steps).
3. QMC-vs-PRNG RMSE at fixed paths in the SERVING kernel configuration
   (the accumulating mixing price kernel).

Run: cd /root/repo && python benchmarks/round3_metrics.py
"""

import datetime as dt
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
R, SPOT, STRIKE = 0.03, 100.0, 100.0
H = dict(V0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)


def best_of(fn, reps=6, outer=3):
    """Times fn(i) over distinct i, forcing a HOST TRANSFER per batch:
    on the relay backend block_until_ready can return before remote
    execution completes, reading as ~0 ms."""
    np.asarray(jax.tree.leaves(fn(0))[0])
    ts = []
    for o in range(outer):
        t0 = time.perf_counter()
        outs = [fn(o * reps + i + 1) for i in range(reps)]
        for out in outs:
            jax.tree.map(np.asarray, out)
        ts.append((time.perf_counter() - t0) / reps)
    return min(ts)


def greek_ratio():
    from bench import flagship_greek_ratio

    on_tpu = jax.default_backend() == "tpu"
    ratio, t_p, t_g = flagship_greek_ratio(on_tpu, steps=12, conditional=True)
    print(f"[1] conditional forward-mode greek ratio: price={t_p*1e3:.1f}ms "
          f"grad7={t_g*1e3:.1f}ms ratio={ratio:.2f} (target <2)")


def lsm_speedup():
    n_pairs, steps, degree = 1 << 17, 32, 4
    market = hh.HestonInputs(REF, R, SPOT, *H.values())
    payoff = hh.VanillaOption(105.0, EXPIRY, hh.American(), hh.Put(), hh.Spot())
    prob = hh.PricingProblem(payoff, market)

    def make(strategy, deg):
        cfg = hh.SimulationConfig(trajectories=n_pairs, steps=steps,
                                  variance_reduction=hh.Antithetic(), seed=0)
        m = hh.LSM(hh.MonteCarlo(hh.HestonDynamics(), strategy, cfg), deg)

        @jax.jit
        def price(spot_jitter):
            market_i = hh.HestonInputs(REF, R, SPOT + spot_jitter, *H.values())
            return hh.solve(hh.PricingProblem(payoff, market_i), m).price

        return lambda i: price(jnp.float64(i) * 1e-9)

    f_qe = make(hh.HestonQE(), degree)
    f_cond = make(hh.HestonQE(conditional=True), 2)  # joint (S,V) basis, deg 2 (6 terms)
    t_qe, t_cond = best_of(f_qe), best_of(f_cond)
    p_qe, p_cond = float(f_qe(0)), float(f_cond(0))
    print(f"[2] LSM American ({2*n_pairs} paths x {steps} steps): "
          f"QE-grid {t_qe*1e3:.0f}ms (p={p_qe:.4f})  conditional-bridge "
          f"{t_cond*1e3:.0f}ms (p={p_cond:.4f})  speedup x{t_qe/t_cond:.2f}")


def qmc_rmse():
    from hedgehog_tpu.ops.heston_qe_kernel import heston_qe_mixing_vanilla_price

    T = float(hh.yearfrac(REF, hh.to_ticks(EXPIRY)))
    D = float(np.exp(-R * T))
    steps = 11
    blocks, batches = 8, 4  # 2**21 pairs — small enough that noise is visible
    args = (np.log(SPOT), H["V0"], R, H["kappa"], H["theta"], H["sigma"],
            H["rho"], T / steps, STRIKE, D)
    kw = dict(n_blocks=blocks, n_batches=batches, steps=steps)
    n_rep = 24

    prng = [float(heston_qe_mixing_vanilla_price(*args, seed=s, **kw))
            for s in range(n_rep)]
    qmc = [float(heston_qe_mixing_vanilla_price(*args, seed=s, qmc=True,
                                                point_offset=0, **kw))
           for s in range(n_rep)]
    sd_p, sd_q = float(np.std(prng)), float(np.std(qmc))
    print(f"[3] serving-kernel noise at {blocks*batches*65536} paths "
          f"(mixing-{steps}, {n_rep} seeds): PRNG sd={sd_p:.2e} "
          f"QMC sd={sd_q:.2e}  RMSE gain x{sd_p/max(sd_q,1e-300):.1f}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    greek_ratio()
    lsm_speedup()
    qmc_rmse()
