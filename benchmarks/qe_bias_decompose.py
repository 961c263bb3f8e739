"""Decompose QE coarse-step bias: V'-law error vs the trapezoid ∫V proxy.

Variants at a fixed coarse step count (pure JAX, fp64 accumulate):
  A. QE-M as shipped               (QE V' draw, trapezoid γ=1/2 ∫V, mcorr)
  B. exact-CIR V' + trapezoid ∫V   (isolates the ∫V-proxy error)
  C. QE V' with midpoint sub-draw  (Simpson ∫V ≈ Δ(V + 4·V_mid + V')/6,
     two QE variance transitions per price step, one x-update)
  D. exact-CIR V' + Simpson ∫V

x-update for B/C/D uses the exact CIR integral identity
  ∫√V dW_v = (V' − V − κθΔ + κ·IV)/σ,
  logS' += rΔ − IV/2 + ρ·∫√V dW_v + √(1−ρ²)·√IV·Z
(no martingale correction — we're measuring the ∫V/V-law structure, and for
A we ship mcorr, so also run A' = QE-M trapezoid without mcorr for reference).
"""
import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import hedgehog_tpu as hh
from hedgehog_tpu.distributions.broadie_kaya import sample_noncentral_chisq
from hedgehog_tpu.models.heston_qe import qe_constants, qe_step

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
print(f"CM oracle: {cm:.8f}")

STEPS = 4
DT = T / STEPS
DISC = jnp.exp(-R * T)


def cir_exact_draw(key, v, dt):
    """Exact CIR transition V_{t+dt} | V_t (Poisson-mixed Gamma)."""
    e = jnp.exp(-KAPPA * dt)
    c = SIGMA**2 * (1.0 - e) / (4.0 * KAPPA)
    d = 4.0 * KAPPA * THETA / SIGMA**2
    lam = v * e / c
    return c * sample_noncentral_chisq(key, d, lam, v.shape)


def qe_v_draw(key, v, c):
    """QE variance transition only (quad/exp branch on psi)."""
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, v.shape)
    u = jax.random.uniform(k2, v.shape)
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
    v_exp = jnp.where(
        u <= p, 0.0, jnp.log((1.0 - p) / jnp.maximum(1.0 - u, 1e-300)) / beta
    )
    return jnp.where(psi <= 1.5, v_quad, v_exp)


def x_update(key, x, v, v_new, iv, dt):
    """Exact-identity log-price update given the integrated variance proxy."""
    z = jax.random.normal(key, x.shape)
    int_sqrtv_dw = (v_new - v - KAPPA * THETA * dt + KAPPA * iv) / SIGMA
    return (
        x + R * dt - 0.5 * iv + RHO * int_sqrtv_dw
        + jnp.sqrt((1.0 - RHO**2) * jnp.maximum(iv, 0.0)) * z
    )


def price_from_x(x):
    s = jnp.exp(x)
    return float(DISC * jnp.mean(jnp.maximum(s - STRIKE, 0.0)))


N = 1 << 24  # 16.7M paths per rep
REPS = 8


def run(step_fn, seed):
    def body(carry, k):
        x, v = carry
        x, v = step_fn(k, x, v)
        return (x, v), 0.0

    @jax.jit
    def once(key):
        keys = jax.random.split(key, STEPS)
        x0 = jnp.full((N,), jnp.log(SPOT))
        v0 = jnp.full((N,), V0)
        (x, v), _ = jax.lax.scan(body, (x0, v0), keys)
        s = jnp.exp(x)
        return DISC * jnp.mean(jnp.maximum(s - STRIKE, 0.0).astype(jnp.float64))

    ps = jnp.stack([once(jax.random.PRNGKey(seed + i)) for i in range(REPS)])
    jax.block_until_ready(ps)
    m = float(jnp.mean(ps))
    se = float(jnp.std(ps) / jnp.sqrt(REPS))
    return (m - cm) / cm * 1e4, se / cm * 1e4


C = qe_constants(KAPPA, THETA, SIGMA, RHO, R, DT)
C_HALF = qe_constants(KAPPA, THETA, SIGMA, RHO, R, DT / 2.0)


def step_A(key, x, v):  # QE-M shipped
    k1, k2, k3 = jax.random.split(key, 3)
    z_v = jax.random.normal(k1, v.shape)
    z_x = jax.random.normal(k2, v.shape)
    u = jax.random.uniform(k3, v.shape)
    return qe_step(x, v, z_v, z_x, u, C, martingale_correction=True)


def step_B(key, x, v):  # exact V' + trapezoid IV
    k1, k2 = jax.random.split(key)
    v_new = cir_exact_draw(k1, v, DT)
    iv = DT * 0.5 * (v + v_new)
    return x_update(k2, x, v, v_new, iv, DT), v_new


def step_C(key, x, v):  # QE V' at half-steps + Simpson IV
    k1, k2, k3 = jax.random.split(key, 3)
    v_mid = qe_v_draw(k1, v, C_HALF)
    v_new = qe_v_draw(k2, v_mid, C_HALF)
    iv = DT * (v + 4.0 * v_mid + v_new) / 6.0
    return x_update(k3, x, v, v_new, iv, DT), v_new


def step_D(key, x, v):  # exact V' at half-steps + Simpson IV
    k1, k2, k3 = jax.random.split(key, 3)
    v_mid = cir_exact_draw(k1, v, DT / 2.0)
    v_new = cir_exact_draw(k2, v_mid, DT / 2.0)
    iv = DT * (v + 4.0 * v_mid + v_new) / 6.0
    return x_update(k3, x, v, v_new, iv, DT), v_new


def step_E(key, x, v):  # QE V' + trapezoid IV via exact-identity x (A minus mcorr/QE-x)
    k1, k2 = jax.random.split(key)
    v_new = qe_v_draw(k1, v, C)
    iv = DT * 0.5 * (v + v_new)
    return x_update(k2, x, v, v_new, iv, DT), v_new


for name, fn in (("A QE-M shipped", step_A), ("B exactV+trap", step_B),
                 ("C qeV+Simpson", step_C), ("D exactV+Simpson", step_D),
                 ("E qeV+trap", step_E)):
    b, se = run(fn, hash(name) % 100000)
    print(f"{name:18s} steps={STEPS}  bias={b:+8.3f}bp ± {se:.3f}")
