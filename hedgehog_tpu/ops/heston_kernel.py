"""Fused Heston Euler-Maruyama megabatch kernel (Pallas TPU).

The hot loop of the whole framework (SURVEY §3.2, north-star metric:
paths/sec/chip).  One kernel program simulates a (ROWS × 128) tile of paths
entirely in VMEM/registers: per time step it draws raw bits from the on-chip
PRNG, converts them to standard normals via Box-Muller, and advances the
full-truncation log-Euler state

    logS += (r − V⁺/2)·dt + √(V⁺·dt)·Z₁
    V    += κ(θ − V⁺)·dt + σ√(V⁺·dt)·(ρZ₁ + ρ̄Z₂)

in fp32 (the 5bp accuracy contract is dominated by MC noise and Euler bias,
not fp32 roundoff: logS accumulates ~100 steps of ~1e-7 relative error).
Only the terminal prices leave the chip (4 bytes/path), so HBM traffic is
negligible and throughput is VPU-transcendental-bound.

RNG discipline: the PRNG is seeded per program with (base_seed, program_id),
so every (seed, block, step) tile of randomness is independent and
reproducible — the counter-based replacement for the reference's
per-trajectory seed vector (montecarlo.jl:58-79), and the property that lets
the path axis shard across chips with zero communication (SURVEY §2c).

Antithetic pairing runs the mirrored state in the same kernel (same bits,
negated normals), amortizing RNG + transcendental cost across the pair.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["heston_euler_terminal", "heston_euler_terminal_pallas", "seed_from_key"]


def seed_from_key(config, key):
    """Effective kernel seed: the config's static seed, or — when the caller
    passes an explicit PRNG key — an int32 derived from that key, so distinct
    keys give independent kernel streams (the same contract as every pure-JAX
    strategy; the kernels take integer seeds, not keys, because the on-chip
    PRNG is seeded with (seed, program_id) scalars)."""
    if key is None:
        return config.seed
    data = jax.random.key_data(key).ravel().astype(jnp.uint32)
    mixed = data[0] ^ (data[-1] * jnp.uint32(2654435761))  # Knuth multiplicative mix
    return jax.lax.bitcast_convert_type(mixed, jnp.int32)

_ROWS = 256  # sublanes per program: 256×128 = 32768 paths/program
_LANES = 128
_TWO_PI = 2.0 * math.pi


def _uniform_from_bits(bits):
    """uint32 → Uniform(0,1) fp32 via the mantissa trick: top 23 bits → [1,2)."""
    mantissa = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    one_to_two = pltpu.bitcast(mantissa | jnp.uint32(0x3F800000), jnp.float32)
    return one_to_two - 1.0


def _box_muller(shape):
    """Two iid N(0,1) fp32 tensors of ``shape`` from on-chip PRNG bits."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = jnp.maximum(_uniform_from_bits(b1), 1.1754944e-38)  # avoid log(0)
    u2 = _uniform_from_bits(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _heston_kernel(params_ref, seed_ref, out_ref, *, steps: int, antithetic: bool):
    # (base seed ⊕ device id, block id) → independent stream per tile per chip
    # (the 3-operand prng_set_seed_32 form fails to legalize on v5e Mosaic,
    # so device id is mixed into the first word with an odd multiplier)
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))

    log_s0 = params_ref[0]
    v0 = params_ref[1]
    r = params_ref[2]
    kappa = params_ref[3]
    theta = params_ref[4]
    sigma = params_ref[5]
    rho = params_ref[6]
    dt = params_ref[7]

    rho_bar = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0))
    drift_r = r * dt

    shape = (_ROWS, _LANES)
    x = jnp.full(shape, log_s0, dtype=jnp.float32)
    v = jnp.full(shape, v0, dtype=jnp.float32)
    if antithetic:
        xa = x
        va = v

    def step(carry):
        z1, z2 = _box_muller(shape)

        def advance(x, v, z1, z2):
            v_plus = jnp.maximum(v, 0.0)
            sqrt_vdt = jnp.sqrt(v_plus * dt)
            x2 = x + (drift_r - 0.5 * v_plus * dt) + sqrt_vdt * z1
            v2 = v + kappa * (theta - v_plus) * dt + sigma * sqrt_vdt * (
                rho * z1 + rho_bar * z2
            )
            return x2, v2

        if antithetic:
            x, v, xa, va = carry
            x, v = advance(x, v, z1, z2)
            xa, va = advance(xa, va, -z1, -z2)
            return (x, v, xa, va)
        x, v = carry
        return advance(x, v, z1, z2)

    # i32 loop bounds: Mosaic cannot legalize the i64 counters that
    # jax_enable_x64 would otherwise give fori_loop.
    lo, hi = jnp.int32(0), jnp.int32(steps)
    if antithetic:
        x, v, xa, va = jax.lax.fori_loop(lo, hi, lambda _, c: step(c), (x, v, xa, va))
        out_ref[0] = jnp.exp(x)
        out_ref[1] = jnp.exp(xa)
    else:
        x, v = jax.lax.fori_loop(lo, hi, lambda _, c: step(c), (x, v))
        out_ref[0] = jnp.exp(x)


@functools.partial(
    jax.jit, static_argnames=("n_paths", "steps", "antithetic", "interpret")
)
def heston_euler_terminal(
    log_s0,
    v0,
    r,
    kappa,
    theta,
    sigma,
    rho,
    dt,
    *,
    n_paths: int,
    steps: int,
    seed,
    antithetic: bool = False,
    interpret: bool = False,
    device_id=0,
):
    """Terminal Heston prices via the fused Pallas kernel.

    Returns (n_groups, n_paths) fp32 with n_groups = 2 under antithetic.
    ``n_paths`` is rounded up to a multiple of 32768 internally; callers get
    exactly ``n_paths`` columns back.
    """
    block = _ROWS * _LANES
    n_blocks = -(-n_paths // block)
    padded = n_blocks * block
    n_groups = 2 if antithetic else 1

    params = jnp.stack(
        [
            jnp.float32(log_s0),
            jnp.float32(v0),
            jnp.float32(r),
            jnp.float32(kappa),
            jnp.float32(theta),
            jnp.float32(sigma),
            jnp.float32(rho),
            jnp.float32(dt),
        ]
    )
    seed_arr = jnp.stack(
        [jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)]
    )

    kernel = functools.partial(_heston_kernel, steps=steps, antithetic=antithetic)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            # explicit i32 index maps: unblocked specs synthesize default
            # index maps whose 0-literals trace as i64 under jax_enable_x64,
            # which Mosaic refuses to legalize
            pl.BlockSpec((8,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_groups, _ROWS, _LANES),
            # jnp.int32 literals: under jax_enable_x64 a bare 0 traces as i64,
            # which Mosaic cannot legalize in the index map's func.return.
            lambda i: (jnp.int32(0), i, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, n_blocks * _ROWS, _LANES), jnp.float32),
        interpret=interpret,
    )(params, seed_arr)
    flat = out.reshape(n_groups, padded)
    return flat[:, :n_paths]


def heston_euler_terminal_pallas(prob, config, key=None, device_id=0):
    """Adapter: MonteCarlo(HestonDynamics, EulerMaruyama(use_kernel=True)).

    Bridges the f64 problem definition to the fp32 kernel; returns terminal
    prices shaped like the pure-JAX path (n_groups, trajectories) in f64.
    An explicit ``key`` reseeds the kernel stream (see :func:`seed_from_key`).
    """
    from ..market.inputs import carry_yield, market_yearfrac
    from ..market.rate_curve import zero_rate_yf
    from ..methods.montecarlo import Antithetic

    market = prob.market_inputs
    T = market_yearfrac(market, prob.payoff.expiry)
    r0 = zero_rate_yf(market.rate, 0.0) - carry_yield(market)
    anti = isinstance(config.variance_reduction, Antithetic)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # No TPU PRNG primitives off-chip (interpret mode stubs them to zero):
        # fall back to the pure-JAX stepper — statistically identical, RNG
        # stream differs.
        from ..methods.montecarlo import _heston_euler_paths

        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(config.seed), device_id)
        return _heston_euler_paths(prob, config, key, return_grid=False)
    out = heston_euler_terminal(
        jnp.log(market.spot),
        market.V0,
        r0,
        market.kappa,
        market.theta,
        market.sigma,
        market.rho,
        T / config.steps,
        n_paths=config.trajectories,
        steps=config.steps,
        seed=seed_from_key(config, key),
        antithetic=anti,
        device_id=device_id,
    )
    return out.astype(jnp.float64)
