"""Bias curve of the conditional-MC (Romano-Touzi mixing) QE estimator.

V-path only: QE variance transitions + per-step trapezoid IV and the exact
CIR integral identity for ∫√V dW.  Price = E[ BS(S0·e^{ρJ − ρ²IV/2}, K,
√((1−ρ²)IV/T), T) ] — no z_x draw at all.
"""
import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh
from hedgehog_tpu.models.heston_qe import qe_constants

REF = dt.date(2024, 1, 1)
EXPIRY = dt.date(2025, 1, 1)
R, SPOT, STRIKE = 0.03, 100.0, 100.0
V0, KAPPA, THETA, SIGMA, RHO = 0.04, 2.0, 0.04, 0.3, -0.7

market = hh.HestonInputs(REF, R, SPOT, V0, KAPPA, THETA, SIGMA, RHO)
payoff = hh.VanillaOption(STRIKE, EXPIRY, hh.European(), hh.Call(), hh.Spot())
prob = hh.PricingProblem(payoff, market)
T = float(hh.yearfrac(REF, payoff.expiry))
with jax.default_device(jax.devices("cpu")[0]):
    cm = float(hh.solve(prob, hh.CarrMadan(1.0, 64.0, hh.HestonDynamics(), nodes=1024)).price)
print(f"CM oracle: {cm:.8f}  T={T:.6f}")

DISC = jnp.exp(-R * T)
SQ2 = jnp.sqrt(2.0)


def qe_v_draw(z, u, v, c):
    m = c["theta"] + (v - c["theta"]) * c["e"]
    s2 = v * c["c_s2_v"] + c["c_s2_c"]
    psi = jnp.maximum(s2 / jnp.maximum(m, 1e-30) ** 2, 1e-12)
    two_over_psi = 2.0 / psi
    t1 = jnp.maximum(two_over_psi - 1.0, 0.0)
    b2 = t1 + jnp.sqrt(two_over_psi * t1)
    a = m / (1.0 + b2)
    v_quad = a * (jnp.sqrt(b2) + z) ** 2
    p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-12)
    beta = (1.0 - p) / jnp.maximum(m, 1e-30)
    v_exp = jnp.where(u <= p, 0.0, jnp.log((1.0 - p) / jnp.maximum(1.0 - u, 1e-300)) / beta)
    return jnp.where(psi <= 1.5, v_quad, v_exp)


def norm_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / SQ2))


def bs_call(f_eff, k, var):  # undiscounted Black-76 with total variance `var`
    sd = jnp.sqrt(jnp.maximum(var, 1e-12))
    d1 = (jnp.log(f_eff / k) + 0.5 * var) / sd
    return f_eff * norm_cdf(d1) - k * norm_cdf(d1 - sd)


N = 1 << 23
REPS = 8


def run(steps, seed, antithetic=True):
    dt_ = T / steps
    c = {k: jnp.float32(v) for k, v in
         qe_constants(KAPPA, THETA, SIGMA, RHO, R, dt_).items()}
    dt_ = jnp.float32(dt_)

    def body(carry, k):
        v, iv, j = carry[:3]
        k1, k2 = jax.random.split(k)
        z = jax.random.normal(k1, v.shape, jnp.float32)
        u = jax.random.uniform(k2, v.shape, jnp.float32)
        vn = qe_v_draw(z, u, v, c)
        iv_step = dt_ * 0.5 * (v + vn)
        j_step = (vn - v - KAPPA * THETA * dt_ + KAPPA * iv_step) / SIGMA
        if antithetic:
            va, iva, ja = carry[3:]
            vna = qe_v_draw(-z, 1.0 - u, va, c)
            iva_step = dt_ * 0.5 * (va + vna)
            ja_step = (vna - va - KAPPA * THETA * dt_ + KAPPA * iva_step) / SIGMA
            return (vn, iv + iv_step, j + j_step, vna, iva + iva_step, ja + ja_step), 0.0
        return (vn, iv + iv_step, j + j_step), 0.0

    @jax.jit
    def once(key):
        keys = jax.random.split(key, steps)
        v = jnp.full((N,), V0, jnp.float32)
        z0 = jnp.zeros((N,), jnp.float32)
        init = (v, z0, z0, v, z0, z0) if antithetic else (v, z0, z0)
        out, _ = jax.lax.scan(body, init, keys)

        def leg(iv, j):
            f_eff = SPOT * jnp.exp(R * T + RHO * j - 0.5 * RHO**2 * iv)
            return bs_call(f_eff, STRIKE, (1.0 - RHO**2) * iv)

        if antithetic:
            pay = 0.5 * (leg(out[1], out[2]) + leg(out[4], out[5]))
        else:
            pay = leg(out[1], out[2])
        return DISC * jnp.mean(pay.astype(jnp.float64))

    ps = jnp.stack([once(jax.random.PRNGKey(seed + i)) for i in range(REPS)])
    jax.block_until_ready(ps)
    m = float(jnp.mean(ps))
    se = float(jnp.std(ps) / jnp.sqrt(REPS))
    return (m - cm) / cm * 1e4, se / cm * 1e4


import time

step_list = [int(s) for s in sys.argv[1:]] or [2, 3, 4, 6, 8, 10, 12, 16]
for steps in step_list:
    t0 = time.perf_counter()
    b, se = run(steps, 7000 + steps)
    print(
        f"mixing-QE steps={steps:3d}  bias={b:+8.3f}bp ± {se:.3f}"
        f"  ({time.perf_counter() - t0:.1f}s)"
    )
