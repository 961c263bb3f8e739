"""End-to-end Heston surface calibration (mirrors reference
examples/heston_calib.jl): generate Carr-Madan quotes from a known Heston
market, perturb the guess, recover all five parameters with box-bounded LBFGS
differentiated through the Fourier pricer."""

import datetime as dt
import time

import jax.numpy as jnp
import numpy as np

import hedgehog_tpu as hh

REF = dt.date(2024, 1, 1)
TRUE = dict(V0=0.010201, kappa=6.21, theta=0.019, sigma=0.61, rho=-0.7)
R, S0 = 0.0319, 100.0


def main():
    market = hh.HestonInputs(REF, R, S0, *TRUE.values())
    strikes = np.arange(60.0, 141.0, 5.0)
    expiries = [REF + dt.timedelta(days=d) for d in (90, 180, 365)]
    payoffs = [
        hh.VanillaOption(float(k), e, hh.European(), hh.Call(), hh.Spot())
        for e in expiries
        for k in strikes
    ]
    method = hh.CarrMadan(1.0, 32.0, hh.HestonDynamics())
    quotes = [float(hh.solve(hh.PricingProblem(p, market), method).price) for p in payoffs]
    print(f"generated {len(quotes)} quotes from the true market")

    guess = [0.02, 3.0, 0.03, 0.4, -0.3]
    lenses = tuple(hh.FieldLens(f"market_inputs.{n}") for n in TRUE)
    calib = hh.CalibrationProblem(
        hh.BasketPricingProblem(payoffs, hh.HestonInputs(REF, R, S0, *guess)),
        jnp.asarray(quotes),
        jnp.asarray(guess),
        method,
        lenses,
    )
    t0 = time.time()
    res = hh.solve(
        calib,
        hh.OptimizerAlgo(max_iters=300),
        lb=jnp.asarray([1e-5, 1e-3, 1e-5, 1e-3, -0.99]),
        ub=jnp.asarray([1.0, 20.0, 1.0, 5.0, 0.99]),
    )
    print(f"calibrated in {time.time()-t0:.1f}s, loss={float(res.loss):.3e}")
    for (name, want), got in zip(TRUE.items(), res.u):
        print(f"  {name:<6} true={want:+.6f}  calibrated={float(got):+.6f}")


if __name__ == "__main__":
    main()
