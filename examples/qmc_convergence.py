"""Quasi-Monte Carlo convergence table: iid MC vs randomized Sobol' (+
Brownian bridge) across path counts — the variance-reduction showcase.

RMSE is estimated over independent randomizations (re-seeding the digital
shift); expect ~O(N^-1/2) for MC and near O(N^-1) for QMC.
"""

import datetime as dt

import numpy as np

import hedgehog_tpu as hh

REF, EXPIRY = dt.date(2024, 1, 1), dt.date(2025, 1, 1)


def main():
    market = hh.BlackScholesInputs(REF, 0.05, 100.0, 0.2)
    opt = hh.VanillaOption(100.0, EXPIRY, hh.European(), hh.Call(), hh.Spot())
    prob = hh.PricingProblem(opt, market)
    truth = float(hh.solve(prob, hh.BlackScholesAnalytic()).price)
    steps, reps = 32, 10

    print(f"{'paths':>8} | {'MC rmse':>10} | {'QMC rmse':>10} | {'gain':>6}")
    print("-" * 44)
    for n in (1024, 4096, 16384, 65536):

        def rmse(qmc):
            errs = []
            for i in range(reps):
                cfg = hh.SimulationConfig(trajectories=n, steps=steps, seed=i, qmc=qmc)
                m = hh.MonteCarlo(hh.LognormalDynamics(), hh.EulerMaruyama(), cfg)
                errs.append(float(hh.solve(prob, m).price) - truth)
            return float(np.sqrt(np.mean(np.square(errs))))

        r_mc, r_qmc = rmse(False), rmse(True)
        print(f"{n:>8} | {r_mc:>10.5f} | {r_qmc:>10.5f} | {r_mc / r_qmc:>5.0f}×")


if __name__ == "__main__":
    main()
