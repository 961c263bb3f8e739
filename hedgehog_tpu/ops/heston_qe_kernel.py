"""Fused Andersen QE-M Heston kernel (Pallas TPU) — the throughput flagship.

Same megabatch structure as ops/heston_kernel.py (one (ROWS × 128) tile of
paths per program, on-chip PRNG, fp32, antithetic pair in-register) but
stepping with the Andersen Quadratic-Exponential scheme
(models/heston_qe.py): ~6× fewer steps than full-truncation Euler at the same
vanilla-price bias, which is what carries the paths/sec-at-<5bp metric past
the 1e9 north star.

Antithetic pairing mirrors both the normals (z → −z) and the exponential-
branch uniform (u → 1−u), so the pair is antithetic under both QE branches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .heston_kernel import _box_muller, _uniform_from_bits

__all__ = [
    "heston_qe_terminal",
    "heston_qe_terminal_pallas",
    "heston_qe_call_price",
    "heston_qe_mixing_values",
    "heston_qe_mixing_values_pallas",
    "heston_qe_mixing_vanilla_price",
    "heston_qe_mixing_surface_price",
    "heston_surface_mc_tpu",
]

_ROWS = 256
_LANES = 128
_PSI_CRIT = 1.5

# ---- in-kernel randomized Sobol' (kernel-side QMC) ----
# The flagship QE kernel can draw its (z_v, z_x, u) triples from a digitally-
# shifted Sobol' sequence instead of the on-chip PRNG: dims = 3 per step
# (step-major, matching the pure-JAX _qmc_normals_and_uniforms layout), one
# point per path.  The generator is pure bit arithmetic over a (dims, 31)
# int32 SMEM table ([:, :30] Joe-Kuo directions, [:, 30] digital shift), so —
# unlike the PRNG path — it also runs under interpret mode, which is how the
# CPU tests validate it bit-exactly against math/sobol.py.
_SOBOL_BITS = 30
_SOBOL_SCALE = 2.0**-_SOBOL_BITS

import numpy as _np  # noqa: E402

_np_int = _np.integer


def _sobol_table(seed, n_dims: int):
    """(n_dims, 31) int32 host-side table: Joe-Kuo directions + digital shift.

    The shift is derived from ``seed`` only (never the device id): sharded
    devices must randomize ONE shared sequence and slice it disjointly via
    point offsets (parallel/sharding.py)."""
    import numpy as np

    from ..math.sobol import _BITS, _direction_numbers

    assert _BITS == _SOBOL_BITS
    V = _direction_numbers(n_dims).astype(np.int64)  # (dims, 30), < 2^30
    shift = jax.random.bits(
        jax.random.PRNGKey(seed), (n_dims,), dtype=jnp.uint32
    ) >> jnp.uint32(32 - _SOBOL_BITS)
    table = jnp.concatenate(
        [jnp.asarray(V, jnp.int32), shift.astype(jnp.int32)[:, None]], axis=1
    )
    return table


def _sobol_masks(idx):
    """The 30 per-bit masks of the point-index tile, computed ONCE per
    program — the index never changes across timesteps, so callers hoist
    these out of their step loops (saves 2·BITS tile ops per step)."""
    return [
        (jax.lax.shift_right_logical(idx, jnp.int32(b)) & jnp.int32(1)) != 0
        for b in range(_SOBOL_BITS)
    ]


def _sobol_uniforms_tile(masks, sob_ref, dims):
    """Per-lane Sobol' uniforms for the static dimension list ``dims``.

    ``masks``: the precomputed per-bit index masks (:func:`_sobol_masks`);
    x_{n,d} = ⊕_{bits b of n} V[d,b], XOR digital shift, centered → (0, 1)
    fp32.  All table indices are static, so every load is an SMEM scalar
    broadcast (no gathers)."""
    accs = [jnp.zeros(masks[0].shape, jnp.int32) for _ in dims]
    for b in range(_SOBOL_BITS):
        for i, d in enumerate(dims):
            accs[i] = jnp.where(masks[b], accs[i] ^ sob_ref[d, b], accs[i])
    return [
        ((a ^ sob_ref[d, _SOBOL_BITS]).astype(jnp.float32) + 0.5) * _SOBOL_SCALE
        for a, d in zip(accs, dims)
    ]


# Beasley-Springer-Moro inverse normal CDF (validated vs scipy.ndtri to
# 3e-9 abs over (2^-31, 1−2^-31)).  QMC needs the MONOTONE per-dim map —
# Box-Muller entangles two Sobol' dims through the shared radius and was
# measured to cost ~2.3× of the variance reduction.
_BSM_A = (2.50662823884, -18.61500062529, 41.39119773534, -25.44106049637)
_BSM_B = (-8.47351093090, 23.08336743743, -21.06224101826, 3.13082909833)
_BSM_C = (
    0.3374754822726147, 0.9761690190917186, 0.1607979714918209,
    0.0276438810333863, 0.0038405729373609, 0.0003951896511919,
    0.0000321767881768, 0.0000002888167364, 0.0000003960315187,
)


def _ndtri_approx(u):
    """Branchless fp32 Φ⁻¹(u) for u ∈ (0, 1) (Beasley-Springer-Moro)."""
    r = u - 0.5
    t = r * r
    num = r * (_BSM_A[0] + t * (_BSM_A[1] + t * (_BSM_A[2] + t * _BSM_A[3])))
    den = 1.0 + t * (_BSM_B[0] + t * (_BSM_B[1] + t * (_BSM_B[2] + t * _BSM_B[3])))
    x_central = num * _rcp(den)
    u_min = jnp.minimum(u, 1.0 - u)
    s = jnp.log(-jnp.log(jnp.maximum(u_min, 1e-30)))
    x_tail = jnp.float32(_BSM_C[-1])
    for c in reversed(_BSM_C[:-1]):
        x_tail = x_tail * s + c
    x_tail = jnp.where(r > 0.0, x_tail, -x_tail)
    return jnp.where(jnp.abs(r) <= 0.42, x_central, x_tail)


@jax.custom_jvp
def _rcp(x):
    """Fast reciprocal: hardware approx + one Newton polish (~fp32 accurate).

    Exact fp32 division is the dominant cost of the QE step (6 divides/step);
    the polished approx is ~5× cheaper on the VPU.

    custom_jvp (d(1/x) = −r²·dx, reusing the computed r) makes the kernels
    linearizable in-kernel — pl.reciprocal has no JVP rule of its own — which
    is what the fused price+greeks kernel's tangent propagation needs
    (ops/heston_qe_greeks_kernel.py).  Primal lowering is unchanged."""
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


@_rcp.defjvp
def _rcp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    r = _rcp(x)
    return r, -r * r * dx


def _box_muller_with_uniform(shape):
    """(z1, z2, u) — Box-Muller normal pair plus an INDEPENDENT uniform.

    The exponential-branch uniform must be independent of BOTH normals: z_x is
    consumed on every path, so reusing a Box-Muller input uniform as u couples
    V' with the price-update normal and breaks the QE-M per-step martingale
    property (measured ≈ −3.6e-4 per step in the ψ>1.5 regime).  Three bit
    draws per step; bit generation is cheap next to the transcendentals."""
    z1, z2 = _box_muller(shape)
    u = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    return z1, z2, u


def _qe_advance(x, v, z_v, z_x, u, c, *, mcorr: bool = True):
    """One QE(-M) step on fp32 tiles (branchless; mirrors models/heston_qe.py).
    ``mcorr`` selects the martingale-corrected K0* (QE-M) vs plain K0.

    x64-pitfall notes: min/max instead of jnp.clip (clip materializes strong
    f64 bound constants), jnp.log instead of log1p (f64 lowering path) — both
    fail Mosaic legalization (tpu.truncf).
    """
    theta = c["theta"]
    m = theta + (v - theta) * c["e"]
    s2 = v * c["c_s2_v"] + c["c_s2_c"]
    m_safe = jnp.maximum(m, 1e-20)
    inv_m = _rcp(m_safe)
    psi = jnp.maximum(s2 * inv_m * inv_m, 1e-6)

    two_over_psi = 2.0 * _rcp(psi)
    t1 = jnp.maximum(two_over_psi - 1.0, 0.0)
    b2 = t1 + jnp.sqrt(two_over_psi * t1)
    a = m * _rcp(1.0 + b2)
    v_quad = a * (jnp.sqrt(b2) + z_v) ** 2

    p = jnp.minimum(jnp.maximum((psi - 1.0) * _rcp(psi + 1.0), 0.0), 1.0 - 1e-6)
    one_m_p = 1.0 - p
    beta = one_m_p * inv_m
    # 1/beta = m*(psi+1)/2 capped at the old p-clamp bound (see _qe_v_advance)
    inv_beta = m_safe * jnp.minimum((psi + 1.0) * 0.5, 1e6)
    u_safe = jnp.minimum(jnp.maximum(u, 1e-7), 1.0 - 1e-7)
    v_exp = jnp.where(
        u_safe <= p,
        0.0,
        jnp.log(one_m_p * _rcp(jnp.maximum(1.0 - u_safe, 1e-20))) * inv_beta,
    )

    use_quad = psi <= _PSI_CRIT
    v_new = jnp.where(use_quad, v_quad, v_exp)

    if mcorr:
        A = c["A"]
        two_aa = jnp.minimum(2.0 * A * a, 1.0 - 1e-6)
        inv_1m2aa = _rcp(1.0 - two_aa)
        log_m_quad = A * b2 * a * inv_1m2aa - 0.5 * jnp.log(1.0 - two_aa)
        denom = jnp.maximum(beta - A, 1e-20)
        log_m_exp = jnp.log(jnp.maximum(p + beta * one_m_p * _rcp(denom), 1e-20))
        k0_star = -jnp.where(use_quad, log_m_quad, log_m_exp) - c["K1_half_K3"] * v
    else:
        k0_star = c["K0"]

    var_x = jnp.maximum(c["K3"] * v + c["K4"] * v_new, 0.0)
    x_new = x + c["r_dt"] + k0_star + c["K1"] * v + c["K2"] * v_new + jnp.sqrt(var_x) * z_x
    return x_new, v_new


def _qe_kernel(params_ref, seed_ref, out_ref, *, steps: int, antithetic: bool, mcorr: bool):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))

    log_s0 = params_ref[0]
    v0 = params_ref[1]
    c = dict(
        theta=params_ref[2],
        e=params_ref[3],
        c_s2_v=params_ref[4],
        c_s2_c=params_ref[5],
        K1=params_ref[6],
        K2=params_ref[7],
        K3=params_ref[8],
        K4=params_ref[9],
        A=params_ref[10],
        r_dt=params_ref[11],
        K1_half_K3=params_ref[12],
        K0=params_ref[13],
    )

    shape = (_ROWS, _LANES)
    x = jnp.full(shape, log_s0, dtype=jnp.float32)
    v = jnp.full(shape, v0, dtype=jnp.float32)
    if antithetic:
        xa, va = x, v

    def step(carry):
        z_v, z_x, u = _box_muller_with_uniform(shape)
        if antithetic:
            x, v, xa, va = carry
            x, v = _qe_advance(x, v, z_v, z_x, u, c, mcorr=mcorr)
            xa, va = _qe_advance(xa, va, -z_v, -z_x, 1.0 - u, c, mcorr=mcorr)
            return (x, v, xa, va)
        x, v = carry
        return _qe_advance(x, v, z_v, z_x, u, c, mcorr=mcorr)

    lo, hi = jnp.int32(0), jnp.int32(steps)
    if antithetic:
        x, v, xa, va = jax.lax.fori_loop(lo, hi, lambda _, cr: step(cr), (x, v, xa, va))
        out_ref[0] = jnp.exp(x)
        out_ref[1] = jnp.exp(xa)
    else:
        x, v = jax.lax.fori_loop(lo, hi, lambda _, cr: step(cr), (x, v))
        out_ref[0] = jnp.exp(x)


def _qe_kernel_qmc(
    params_ref, sob_ref, offset_ref, out_ref, *, steps: int, antithetic: bool, mcorr: bool
):
    """QE-M kernel drawing from the in-kernel Sobol' stream (kernel-side QMC).

    The time loop is unrolled (static step index selects the static Sobol'
    dims 3s, 3s+1, 3s+2); antithetic pairs mirror (z → −z, u → 1−u) on the
    SAME point, exactly like the pure-JAX QMC path."""
    log_s0 = params_ref[0]
    v0 = params_ref[1]
    c = dict(
        theta=params_ref[2], e=params_ref[3], c_s2_v=params_ref[4], c_s2_c=params_ref[5],
        K1=params_ref[6], K2=params_ref[7], K3=params_ref[8], K4=params_ref[9],
        A=params_ref[10], r_dt=params_ref[11], K1_half_K3=params_ref[12],
        K0=params_ref[13],
    )

    shape = (_ROWS, _LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = offset_ref[0] + pl.program_id(0) * jnp.int32(_ROWS * _LANES) + row * jnp.int32(_LANES) + lane
    masks = _sobol_masks(idx)  # hoisted: the index is step-invariant

    x = jnp.full(shape, log_s0, dtype=jnp.float32)
    v = jnp.full(shape, v0, dtype=jnp.float32)
    if antithetic:
        xa, va = x, v

    for s in range(steps):
        u1, u2, u3 = _sobol_uniforms_tile(masks, sob_ref, (3 * s, 3 * s + 1, 3 * s + 2))
        z_v, z_x = _ndtri_approx(u1), _ndtri_approx(u2)
        x, v = _qe_advance(x, v, z_v, z_x, u3, c, mcorr=mcorr)
        if antithetic:
            xa, va = _qe_advance(xa, va, -z_v, -z_x, 1.0 - u3, c, mcorr=mcorr)

    out_ref[0] = jnp.exp(x)
    if antithetic:
        out_ref[1] = jnp.exp(xa)


def heston_qe_terminal(
    log_s0, v0, r, kappa, theta, sigma, rho, dt,
    *, n_paths: int, steps: int, seed, antithetic: bool = False, device_id=0,
    martingale_correction: bool = True, qmc: bool = False, point_offset: int = 0,
    interpret: bool = False,
):
    """Host-side wrapper: period guard on concrete offsets, then the jitted
    kernel (see _heston_qe_terminal_impl for the full docstring)."""
    if qmc and isinstance(point_offset, (int, _np_int)):
        block = _ROWS * _LANES
        padded = -(-n_paths // block) * block
        if point_offset + padded > 2**_SOBOL_BITS:
            raise ValueError(
                f"Sobol' period is 2^{_SOBOL_BITS} points; offset "
                f"{point_offset} + {padded} paths would wrap"
            )
    return _heston_qe_terminal_impl(
        log_s0, v0, r, kappa, theta, sigma, rho, dt,
        n_paths=n_paths, steps=steps, seed=seed, antithetic=antithetic,
        device_id=device_id, martingale_correction=martingale_correction,
        qmc=qmc, point_offset=point_offset, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_paths", "steps", "antithetic", "martingale_correction", "qmc", "interpret"),
)
def _heston_qe_terminal_impl(
    log_s0, v0, r, kappa, theta, sigma, rho, dt,
    *, n_paths: int, steps: int, seed, antithetic: bool = False, device_id=0,
    martingale_correction: bool = True, qmc: bool = False, point_offset: int = 0,
    interpret: bool = False,
):
    """Terminal Heston prices via the fused QE-M Pallas kernel
    ((n_groups, n_paths) fp32).

    ``qmc=True`` draws every (z_v, z_x, u) triple from a seed-randomized
    Sobol' sequence generated *inside the kernel* (point index = global path
    index + ``point_offset``), giving the flagship TPU path the QMC RMSE
    gains of the pure-JAX samplers; antithetic pairs share points.  Under
    QMC ``device_id`` is deliberately unused (all devices randomize ONE
    sequence) — multi-device callers distribute via disjoint
    ``point_offset`` slices, as parallel/sharding.py does.
    """
    from ..models.heston_qe import qe_constants

    block = _ROWS * _LANES
    n_blocks = -(-n_paths // block)
    padded = n_blocks * block
    n_groups = 2 if antithetic else 1
    if qmc and padded > 2**_SOBOL_BITS:
        # size-only backstop for traced offsets; the offset+size check lives
        # in the host wrapper (concrete offsets) and parallel/sharding.py
        # (sharded offsets).  NOTE: device_id is deliberately unused under
        # QMC (one shared randomized sequence) — multi-device callers pass
        # disjoint point_offset slices.
        raise ValueError(
            f"Sobol' period is 2^{_SOBOL_BITS} points; {padded} paths would wrap"
        )

    c = qe_constants(kappa, theta, sigma, rho, r, dt)
    params = jnp.stack(
        [
            jnp.float32(log_s0),
            jnp.float32(v0),
            jnp.float32(theta),
            jnp.float32(c["e"]),
            jnp.float32(c["c_s2_v"]),
            jnp.float32(c["c_s2_c"]),
            jnp.float32(c["K1"]),
            jnp.float32(c["K2"]),
            jnp.float32(c["K3"]),
            jnp.float32(c["K4"]),
            jnp.float32(c["A"]),
            jnp.float32(c["r_dt"]),
            jnp.float32(c["K1"] + 0.5 * c["K3"]),
            jnp.float32(c["K0"]),
        ]
    )
    out_specs = pl.BlockSpec(
        (n_groups, _ROWS, _LANES),
        lambda i: (jnp.int32(0), i, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_groups, n_blocks * _ROWS, _LANES), jnp.float32)

    if qmc:
        n_dims = 3 * steps
        table = _sobol_table(seed, n_dims)
        offset_arr = jnp.asarray([point_offset], jnp.int32)
        kernel = functools.partial(
            _qe_kernel_qmc, steps=steps, antithetic=antithetic, mcorr=martingale_correction
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((14,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (n_dims, _SOBOL_BITS + 1),
                    lambda i: (jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((1,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, table, offset_arr)
        return out.reshape(n_groups, padded)[:, :n_paths]

    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)])
    kernel = functools.partial(
        _qe_kernel, steps=steps, antithetic=antithetic, mcorr=martingale_correction
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((14,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(params, seed_arr)
    return out.reshape(n_groups, padded)[:, :n_paths]


def _qe_price_kernel(params_ref, seed_ref, out_ref, *, steps: int, n_batches: int):
    """Multi-batch antithetic QE-M European-call pricing: each program
    simulates ``n_batches`` fresh (ROWS×LANES) antithetic tile pairs and
    accumulates call payoffs on-chip, so one host dispatch carries
    n_blocks × n_batches × 32768 × 2 paths and returns only (8,128) partial
    sums per program — the dispatch-amortized bench configuration."""
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))

    log_s0 = params_ref[0]
    v0 = params_ref[1]
    c = dict(
        theta=params_ref[2], e=params_ref[3], c_s2_v=params_ref[4], c_s2_c=params_ref[5],
        K1=params_ref[6], K2=params_ref[7], K3=params_ref[8], K4=params_ref[9],
        A=params_ref[10], r_dt=params_ref[11], K1_half_K3=params_ref[12],
        K0=params_ref[13],
    )
    strike = params_ref[14]

    shape = (_ROWS, _LANES)

    def one_batch(_, acc):
        x = jnp.full(shape, log_s0, dtype=jnp.float32)
        v = jnp.full(shape, v0, dtype=jnp.float32)
        xa, va = x, v

        def step(carry):
            x, v, xa, va = carry
            z_v, z_x, u = _box_muller_with_uniform(shape)
            x, v = _qe_advance(x, v, z_v, z_x, u, c)
            xa, va = _qe_advance(xa, va, -z_v, -z_x, 1.0 - u, c)
            return (x, v, xa, va)

        x, v, xa, va = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(steps), lambda _, cr: step(cr), (x, v, xa, va)
        )
        payoff = jnp.maximum(jnp.exp(x) - strike, 0.0) + jnp.maximum(jnp.exp(xa) - strike, 0.0)
        # fold (ROWS, LANES) → (8, LANES) partial sums to bound fp32 accumulation depth
        return acc + jnp.sum(payoff.reshape(_ROWS // 8, 8, _LANES), axis=0)

    acc0 = jnp.zeros((8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


@functools.partial(jax.jit, static_argnames=("n_blocks", "n_batches", "steps"))
def heston_qe_call_price(
    log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, discount,
    *, n_blocks: int, n_batches: int, steps: int, seed, device_id=0,
    gamma1=0.5, gamma2=0.5,
):
    """Discounted European-call price over n_blocks·n_batches·65536 antithetic
    QE-M paths, with ONE host dispatch and on-chip payoff accumulation."""
    from ..models.heston_qe import qe_constants

    c = qe_constants(kappa, theta, sigma, rho, r, dt, gamma1, gamma2)
    params = jnp.stack(
        [jnp.float32(p) for p in (
            log_s0, v0, theta, c["e"], c["c_s2_v"], c["c_s2_c"], c["K1"], c["K2"],
            c["K3"], c["K4"], c["A"], c["r_dt"], c["K1"] + 0.5 * c["K3"], c["K0"], strike,
        )]
    )
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)])
    kernel = functools.partial(_qe_price_kernel, steps=steps, n_batches=n_batches)
    sums = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((15,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, _LANES), lambda i: (i, jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, _LANES), jnp.float32),
    )(params, seed_arr)
    total_paths = n_blocks * n_batches * _ROWS * _LANES * 2
    return discount * jnp.sum(sums.astype(jnp.float64)) / total_paths


# ---------------------------------------------------------------------------
# Conditional (Romano-Touzi mixing) QE kernels — the throughput flagship v2.
#
# Given the V path, logS_T is EXACTLY conditionally normal (use the CIR
# integral identity ∫√V dW_v = (V_T − V_0 − κθT + κ∫V)/σ and Cholesky-split
# the price Brownian):  logS_T | {V} ~ N(logS_0 + rT − ½IV + ρJ, (1−ρ²)·IV)
# with IV = ∫V dt, J = ∫√V dW_v.  So the kernel simulates ONLY the variance
# path (one normal + one uniform per step — no z_x, no martingale-correction
# logs, no logS carry) and finishes each path with the conditional
# Black-Scholes closed form.  ~1.7× cheaper per step than the QE-M price
# kernel and ~12× lower payoff variance at ρ=−0.7 (conditional MC smooths
# the kink).  Bias is the V-path discretization alone, measured ≈ 430/n² bp
# on the bench market (benchmarks/qe_mixing_bias.py).
# ---------------------------------------------------------------------------

_NCDF_P = 0.2316419
_NCDF_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327


def _norm_cdf(x):
    """Branchless fp32 Φ(x) — Abramowitz-Stegun 26.2.17, |err| < 7.5e-8."""
    ax = jnp.abs(x)
    t = _rcp(1.0 + _NCDF_P * ax)
    poly = t * (_NCDF_B[0] + t * (_NCDF_B[1] + t * (
        _NCDF_B[2] + t * (_NCDF_B[3] + t * _NCDF_B[4]))))
    upper = 1.0 - _INV_SQRT_2PI * jnp.exp(-0.5 * ax * ax) * poly
    return jnp.where(x >= 0.0, upper, 1.0 - upper)


def _qe_v_advance(v, z, u, c):
    """Variance-only QE transition on fp32 tiles (mirrors models/heston_qe.py
    ``qe_v_step``; same x64-pitfall rules as _qe_advance)."""
    theta = c["theta"]
    m = theta + (v - theta) * c["e"]
    s2 = v * c["c_s2_v"] + c["c_s2_c"]
    m_safe = jnp.maximum(m, 1e-20)
    inv_m = _rcp(m_safe)
    psi = jnp.maximum(s2 * inv_m * inv_m, 1e-6)

    two_over_psi = 2.0 * _rcp(psi)
    t1 = jnp.maximum(two_over_psi - 1.0, 0.0)
    b2 = t1 + jnp.sqrt(two_over_psi * t1)
    a = m * _rcp(1.0 + b2)
    v_quad = a * (jnp.sqrt(b2) + z) ** 2

    p = jnp.minimum(jnp.maximum((psi - 1.0) * _rcp(psi + 1.0), 0.0), 1.0 - 1e-6)
    one_m_p = 1.0 - p
    # algebraic identity: 1/beta = m/(1-p) = m*(psi+1)/2, capped where the
    # p-clamp (1-1e-6) would have bounded the old m*rcp(1-p) form — psi CAN
    # exceed 2e6 in Feller-violating corners (m floored at 1e-20)
    inv_beta = m_safe * jnp.minimum((psi + 1.0) * 0.5, 1e6)
    u_safe = jnp.minimum(jnp.maximum(u, 1e-7), 1.0 - 1e-7)
    v_exp = jnp.where(
        u_safe <= p,
        0.0,
        jnp.log(one_m_p * _rcp(jnp.maximum(1.0 - u_safe, 1e-20))) * inv_beta,
    )
    return jnp.where(psi <= _PSI_CRIT, v_quad, v_exp)


def _mix_advance(v, iv, j, z, u, c):
    """One mixing step: QE V-draw + trapezoid IV + exact-identity J update."""
    vn = _qe_v_advance(v, z, u, c)
    iv_step = c["half_dt"] * (v + vn)
    j_new = j + (vn - v) * c["inv_sigma"] + iv_step * c["k_over_sigma"] - c["ktd_over_sigma"]
    return vn, iv + iv_step, j_new


def _cond_bs_value(iv, j, c):
    """Undiscounted conditional Black-Scholes vanilla value given (IV, J)."""
    e_arg = c["rho"] * j - c["rho2_half"] * iv
    f_eff = c["f_base"] * jnp.exp(e_arg)
    var = jnp.maximum(c["rho_bar2"] * iv, 1e-10)
    sd = jnp.sqrt(var)
    inv_sd = _rcp(sd)
    d1 = (c["log_f_over_k"] + e_arg + 0.5 * var) * inv_sd
    d2 = d1 - sd
    cp = c["cp"]
    return cp * (f_eff * _norm_cdf(cp * d1) - c["strike"] * _norm_cdf(cp * d2))


def _mix_c(params_ref):
    return dict(
        v0=params_ref[0], theta=params_ref[1], e=params_ref[2],
        c_s2_v=params_ref[3], c_s2_c=params_ref[4], half_dt=params_ref[5],
        inv_sigma=params_ref[6], k_over_sigma=params_ref[7],
        ktd_over_sigma=params_ref[8], f_base=params_ref[9],
        strike=params_ref[10], rho=params_ref[11], rho2_half=params_ref[12],
        rho_bar2=params_ref[13], cp=params_ref[14], log_f_over_k=params_ref[15],
    )


def _mix_params(log_s0, v0, r, kappa, theta, sigma, rho, dt, steps, strike, cp):
    """16-entry fp32 SMEM parameter vector for the mixing kernels (scalars
    are traced in f64 and cast once — nothing here runs per step)."""
    from ..models.heston_qe import qe_constants

    c = qe_constants(kappa, theta, sigma, rho, r, dt)
    T = dt * steps
    f_base = jnp.exp(log_s0 + r * T)
    return jnp.stack([
        jnp.float32(v0), jnp.float32(theta), jnp.float32(c["e"]),
        jnp.float32(c["c_s2_v"]), jnp.float32(c["c_s2_c"]),
        jnp.float32(0.5 * dt), jnp.float32(1.0 / sigma),
        jnp.float32(kappa / sigma), jnp.float32(kappa * theta * dt / sigma),
        jnp.float32(f_base), jnp.float32(strike), jnp.float32(rho),
        jnp.float32(0.5 * rho**2), jnp.float32(1.0 - rho**2),
        jnp.float32(cp), jnp.float32(jnp.log(f_base) - jnp.log(strike)),
    ])


def _mix_double_step_prng(carry, c, antithetic: bool):
    """Two mixing steps from one Box-Muller normal pair + two bit uniforms
    (2 bit-draws/step vs 3 for the QE-M price kernel)."""
    z1, z2 = _box_muller((_ROWS, _LANES))
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((_ROWS, _LANES)), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits((_ROWS, _LANES)), jnp.uint32))
    for z, u in ((z1, u1), (z2, u2)):
        if antithetic:
            v, iv, j, va, iva, ja = carry
            v, iv, j = _mix_advance(v, iv, j, z, u, c)
            va, iva, ja = _mix_advance(va, iva, ja, -z, 1.0 - u, c)
            carry = (v, iv, j, va, iva, ja)
        else:
            v, iv, j = carry
            carry = _mix_advance(v, iv, j, z, u, c)
    return carry


def _mix_single_step_prng(carry, c, antithetic: bool):
    """Tail step for odd step counts (one Box-Muller normal is discarded)."""
    z1, _z2, u = _box_muller_with_uniform((_ROWS, _LANES))
    if antithetic:
        v, iv, j, va, iva, ja = carry
        v, iv, j = _mix_advance(v, iv, j, z1, u, c)
        va, iva, ja = _mix_advance(va, iva, ja, -z1, 1.0 - u, c)
        return (v, iv, j, va, iva, ja)
    return _mix_advance(*carry, z1, u, c)


def _mix_path_init(c, antithetic: bool):
    shape = (_ROWS, _LANES)
    v = jnp.full(shape, c["v0"], dtype=jnp.float32)
    zero = jnp.zeros(shape, dtype=jnp.float32)
    return (v, zero, zero, v, zero, zero) if antithetic else (v, zero, zero)


def _mix_run_steps_prng(c, steps: int, antithetic: bool):
    carry = _mix_path_init(c, antithetic)
    carry = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(steps // 2),
        lambda _, cr: _mix_double_step_prng(cr, c, antithetic), carry,
    )
    if steps % 2:
        carry = _mix_single_step_prng(carry, c, antithetic)
    return carry


def _qe_mixing_values_kernel(params_ref, seed_ref, out_ref, *, steps: int, antithetic: bool):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    c = _mix_c(params_ref)
    carry = _mix_run_steps_prng(c, steps, antithetic)
    if antithetic:
        out_ref[0] = _cond_bs_value(carry[1], carry[2], c)
        out_ref[1] = _cond_bs_value(carry[4], carry[5], c)
    else:
        out_ref[0] = _cond_bs_value(carry[1], carry[2], c)


def _qe_mixing_values_kernel_qmc(
    params_ref, sob_ref, offset_ref, out_ref, *, steps: int, antithetic: bool
):
    """Mixing values from the in-kernel Sobol' stream: 2 dims per step
    (z via inverse-CDF, u raw), step-major — matching the pure-JAX
    _qmc_normals_and_uniforms(steps, 1, ·) layout.  Runs under interpret
    mode, which is how CPU tests validate the kernel math."""
    c = _mix_c(params_ref)
    shape = (_ROWS, _LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = offset_ref[0] + pl.program_id(0) * jnp.int32(_ROWS * _LANES) + row * jnp.int32(_LANES) + lane
    masks = _sobol_masks(idx)  # hoisted: the index is step-invariant

    carry = _mix_path_init(c, antithetic)
    for s in range(steps):
        u1, u2 = _sobol_uniforms_tile(masks, sob_ref, (2 * s, 2 * s + 1))
        z = _ndtri_approx(u1)
        if antithetic:
            v, iv, j, va, iva, ja = carry
            v, iv, j = _mix_advance(v, iv, j, z, u2, c)
            va, iva, ja = _mix_advance(va, iva, ja, -z, 1.0 - u2, c)
            carry = (v, iv, j, va, iva, ja)
        else:
            carry = _mix_advance(*carry, z, u2, c)

    out_ref[0] = _cond_bs_value(carry[1], carry[2], c)
    if antithetic:
        out_ref[1] = _cond_bs_value(carry[4], carry[5], c)


def heston_qe_mixing_values(
    log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, cp,
    *, n_paths: int, steps: int, seed, antithetic: bool = False, device_id=0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Host-side wrapper: period guard on concrete offsets, then the jitted
    kernel (see _heston_qe_mixing_values_impl for the full docstring)."""
    if qmc and isinstance(point_offset, (int, _np_int)):
        block = _ROWS * _LANES
        padded = -(-n_paths // block) * block
        if point_offset + padded > 2**_SOBOL_BITS:
            raise ValueError(
                f"Sobol' period is 2^{_SOBOL_BITS} points; offset "
                f"{point_offset} + {padded} paths would wrap"
            )
    return _heston_qe_mixing_values_impl(
        log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, cp,
        n_paths=n_paths, steps=steps, seed=seed, antithetic=antithetic,
        device_id=device_id, qmc=qmc, point_offset=point_offset,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_paths", "steps", "antithetic", "qmc", "interpret"),
)
def _heston_qe_mixing_values_impl(
    log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, cp,
    *, n_paths: int, steps: int, seed, antithetic: bool = False, device_id=0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Per-path UNDISCOUNTED conditional vanilla values ((n_groups, n_paths)
    fp32) via the fused mixing kernel.  ``cp`` = +1 call / −1 put.
    Under QMC ``device_id`` is unused — distribute via disjoint
    ``point_offset`` slices (see heston_qe_terminal)."""
    block = _ROWS * _LANES
    n_blocks = -(-n_paths // block)
    padded = n_blocks * block
    n_groups = 2 if antithetic else 1

    if qmc and padded > 2**_SOBOL_BITS:
        raise ValueError(
            f"Sobol' period is 2^{_SOBOL_BITS} points; {padded} paths would wrap"
        )
    params = _mix_params(log_s0, v0, r, kappa, theta, sigma, rho, dt, steps, strike, cp)
    out_specs = pl.BlockSpec(
        (n_groups, _ROWS, _LANES),
        lambda i: (jnp.int32(0), i, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_groups, n_blocks * _ROWS, _LANES), jnp.float32)

    if qmc:
        table = _sobol_table(seed, 2 * steps)
        offset_arr = jnp.asarray([point_offset], jnp.int32)
        kernel = functools.partial(
            _qe_mixing_values_kernel_qmc, steps=steps, antithetic=antithetic
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((16,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (2 * steps, _SOBOL_BITS + 1),
                    lambda i: (jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((1,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, table, offset_arr)
        return out.reshape(n_groups, padded)[:, :n_paths]

    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)])
    kernel = functools.partial(_qe_mixing_values_kernel, steps=steps, antithetic=antithetic)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((16,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(params, seed_arr)
    return out.reshape(n_groups, padded)[:, :n_paths]


def _qe_mixing_price_kernel(params_ref, seed_ref, out_ref, *, steps: int, n_batches: int):
    """Multi-batch antithetic mixing pricing with on-chip accumulation —
    the dispatch-amortized bench configuration (mirrors _qe_price_kernel)."""
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    c = _mix_c(params_ref)

    def one_batch(_, acc):
        carry = _mix_run_steps_prng(c, steps, antithetic=True)
        val = _cond_bs_value(carry[1], carry[2], c) + _cond_bs_value(carry[4], carry[5], c)
        return acc + jnp.sum(val.reshape(_ROWS // 8, 8, _LANES), axis=0)

    acc0 = jnp.zeros((8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def _mix_batch_qmc(masks, sob_ref, c, steps: int, dim0: int = 0):
    """One antithetic mixing tile pair from the in-kernel Sobol' stream
    (2 dims/step starting at ``dim0``), given the point-index bit masks.
    Returns the 6-tuple carry (v, iv, j, va, iva, ja)."""
    carry = _mix_path_init(c, True)
    for s in range(steps):
        u1, u2 = _sobol_uniforms_tile(masks, sob_ref, (dim0 + 2 * s, dim0 + 2 * s + 1))
        z = _ndtri_approx(u1)
        v, iv, j, va, iva, ja = carry
        v, iv, j = _mix_advance(v, iv, j, z, u2, c)
        va, iva, ja = _mix_advance(va, iva, ja, -z, 1.0 - u2, c)
        carry = (v, iv, j, va, iva, ja)
    return carry


def _program_base_idx(offset_ref, n_batches: int):
    """First Sobol' point index of this program's batch range: batches take
    consecutive 32768-point blocks of ONE sequence.  Must be called at kernel
    top level (pl.program_id has no lowering inside nested control flow under
    interpret mode)."""
    block = jnp.int32(_ROWS * _LANES)
    return offset_ref[0] + pl.program_id(0) * jnp.int32(n_batches) * block


def _batch_masks(base_idx, b):
    """Sobol' point-index masks for batch ``b`` given the program's base
    index (:func:`_program_base_idx`)."""
    shape = (_ROWS, _LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = base_idx + b * jnp.int32(_ROWS * _LANES) + row * jnp.int32(_LANES) + lane
    return _sobol_masks(idx)


def _qe_mixing_price_kernel_qmc(
    params_ref, sob_ref, offset_ref, out_ref, *, steps: int, n_batches: int
):
    """QMC twin of _qe_mixing_price_kernel: the accumulating serving kernel
    drawing from the seed-randomized in-kernel Sobol' stream, so the QMC
    variance win reaches the headline configuration.  Pure bit arithmetic →
    validates under interpret mode against the pure-JAX Sobol' path."""
    c = _mix_c(params_ref)
    base_idx = _program_base_idx(offset_ref, n_batches)

    def one_batch(b, acc):
        masks = _batch_masks(base_idx, b)
        carry = _mix_batch_qmc(masks, sob_ref, c, steps)
        val = _cond_bs_value(carry[1], carry[2], c) + _cond_bs_value(carry[4], carry[5], c)
        return acc + jnp.sum(val.reshape(_ROWS // 8, 8, _LANES), axis=0)

    acc0 = jnp.zeros((8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "n_batches", "steps", "qmc", "interpret")
)
def heston_qe_mixing_vanilla_price(
    log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, discount,
    *, n_blocks: int, n_batches: int, steps: int, seed, device_id=0, cp=1.0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Discounted European vanilla price over n_blocks·n_batches·65536
    antithetic conditional-MC paths, ONE host dispatch, on-chip accumulation.

    ``qmc=True`` draws from the seed-randomized in-kernel Sobol' stream
    (batches take consecutive 32768-point blocks starting at
    ``point_offset``); ``device_id`` is then unused — multi-device callers
    slice ONE sequence disjointly, as everywhere else."""
    params = _mix_params(log_s0, v0, r, kappa, theta, sigma, rho, dt, steps, strike, cp)
    total_pairs = n_blocks * n_batches * _ROWS * _LANES
    if qmc and total_pairs > 2**_SOBOL_BITS:
        raise ValueError(
            f"Sobol' period is 2^{_SOBOL_BITS} points; {total_pairs} pairs would wrap"
        )
    if qmc:
        table = _sobol_table(seed, 2 * steps)
        offset_arr = jnp.asarray([point_offset], jnp.int32)
        kernel = functools.partial(
            _qe_mixing_price_kernel_qmc, steps=steps, n_batches=n_batches
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((16,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (2 * steps, _SOBOL_BITS + 1),
                    lambda i: (jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((1,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, _LANES), lambda i: (i, jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_blocks, 8, _LANES), jnp.float32),
            interpret=interpret,
        )(params, table, offset_arr)
    else:
        seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)])
        kernel = functools.partial(_qe_mixing_price_kernel, steps=steps, n_batches=n_batches)
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((16,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, _LANES), lambda i: (i, jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_blocks, 8, _LANES), jnp.float32),
            interpret=interpret,
        )(params, seed_arr)
    total_paths = 2 * total_pairs
    return discount * jnp.sum(sums.astype(jnp.float64)) / total_paths


# ---- kernel-side surface: a whole (expiry × strike) grid per dispatch ----
#
# The variance path runs once through per-expiry segments (possibly
# different dt per segment); at each expiry the (IV, J) carries close EVERY
# strike with the conditional BS formula and payoffs fold into on-chip
# (8, LANES) partial sums — one dispatch prices n_exp × m surface points
# over n_blocks × n_batches × 65536 antithetic paths.

_SURF_GLOBALS = 8  # v0, theta, inv_sigma, k_over_sigma, rho, rho2_half, rho_bar2, cp
_SURF_PER_SEG = 5  # e, c_s2_v, c_s2_c, half_dt, ktd_over_sigma


def _surf_params(log_s0, v0, r, kappa, theta, sigma, rho, T_host, seg_steps, strikes, cp):
    """SMEM params for the surface kernel: globals + per-segment constants +
    per-expiry f_base + strikes + per-(expiry, strike) log(F/K)."""
    from ..models.heston_qe import qe_constants

    n_exp, m = len(T_host), len(strikes)
    entries = [v0, theta, 1.0 / sigma, kappa / sigma, rho, 0.5 * rho**2,
               1.0 - rho**2, cp]
    t_prev = 0.0
    for i in range(n_exp):
        dt_i = (T_host[i] - t_prev) / seg_steps[i]
        t_prev = T_host[i]
        c = qe_constants(kappa, theta, sigma, rho, r, dt_i)
        entries += [c["e"], c["c_s2_v"], c["c_s2_c"], 0.5 * dt_i,
                    kappa * theta * dt_i / sigma]
    f_bases = [jnp.exp(log_s0 + r * T_host[i]) for i in range(n_exp)]
    entries += f_bases
    entries += [strikes[k] for k in range(m)]
    for i in range(n_exp):
        for k in range(m):
            entries.append(jnp.log(f_bases[i]) - jnp.log(strikes[k]))
    return jnp.stack([jnp.float32(x) for x in entries])


def _surf_c(params_ref, i: int):
    """Per-segment constants dict (mirrors _mix_c) from the SMEM layout."""
    base = _SURF_GLOBALS + _SURF_PER_SEG * i
    return dict(
        v0=params_ref[0], theta=params_ref[1], inv_sigma=params_ref[2],
        k_over_sigma=params_ref[3], rho=params_ref[4], rho2_half=params_ref[5],
        rho_bar2=params_ref[6], cp=params_ref[7],
        e=params_ref[base], c_s2_v=params_ref[base + 1], c_s2_c=params_ref[base + 2],
        half_dt=params_ref[base + 3], ktd_over_sigma=params_ref[base + 4],
    )


def _qe_mixing_surface_kernel(
    params_ref, seed_ref, out_ref, *, seg_steps, m: int, n_batches: int
):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    n_exp = len(seg_steps)
    shape = (_ROWS, _LANES)
    f_off = _SURF_GLOBALS + _SURF_PER_SEG * n_exp
    k_off = f_off + n_exp
    lfk_off = k_off + m

    def one_batch(_, acc):
        c0 = _surf_c(params_ref, 0)
        v = jnp.full(shape, c0["v0"], dtype=jnp.float32)
        zero = jnp.zeros(shape, dtype=jnp.float32)
        carry = (v, zero, zero, v, zero, zero)
        folds = []
        for i, steps_i in enumerate(seg_steps):
            c = _surf_c(params_ref, i)
            carry = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(steps_i // 2),
                lambda _, cr, c=c: _mix_double_step_prng(cr, c, True), carry,
            )
            if steps_i % 2:
                carry = _mix_single_step_prng(carry, c, True)
            _, iv, j, _, iva, ja = carry
            for k in range(m):
                ck = dict(c, f_base=params_ref[f_off + i],
                          strike=params_ref[k_off + k],
                          log_f_over_k=params_ref[lfk_off + i * m + k])
                val = _cond_bs_value(iv, j, ck) + _cond_bs_value(iva, ja, ck)
                folds.append(jnp.sum(val.reshape(_ROWS // 8, 8, _LANES), axis=0))
        return acc + jnp.stack(folds)  # (n_exp*m, 8, LANES)

    acc0 = jnp.zeros((n_exp * m, 8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def _qe_mixing_surface_kernel_qmc(
    params_ref, sob_ref, offset_ref, out_ref, *, seg_steps, m: int, n_batches: int
):
    """QMC twin of _qe_mixing_surface_kernel: Sobol' dims run 2-per-step
    across ALL segments (the V path is one trajectory), batches take
    consecutive point blocks."""
    n_exp = len(seg_steps)
    f_off = _SURF_GLOBALS + _SURF_PER_SEG * n_exp
    k_off = f_off + n_exp
    lfk_off = k_off + m
    base_idx = _program_base_idx(offset_ref, n_batches)

    def one_batch(b, acc):
        masks = _batch_masks(base_idx, b)
        c0 = _surf_c(params_ref, 0)
        v = jnp.full((_ROWS, _LANES), c0["v0"], dtype=jnp.float32)
        zero = jnp.zeros((_ROWS, _LANES), dtype=jnp.float32)
        carry = (v, zero, zero, v, zero, zero)
        folds = []
        dim0 = 0
        for i, steps_i in enumerate(seg_steps):
            c = _surf_c(params_ref, i)
            for s in range(steps_i):
                u1, u2 = _sobol_uniforms_tile(
                    masks, sob_ref, (dim0 + 2 * s, dim0 + 2 * s + 1)
                )
                z = _ndtri_approx(u1)
                v, iv, j, va, iva, ja = carry
                v, iv, j = _mix_advance(v, iv, j, z, u2, c)
                va, iva, ja = _mix_advance(va, iva, ja, -z, 1.0 - u2, c)
                carry = (v, iv, j, va, iva, ja)
            dim0 += 2 * steps_i
            _, iv, j, _, iva, ja = carry
            for k in range(m):
                ck = dict(c, f_base=params_ref[f_off + i],
                          strike=params_ref[k_off + k],
                          log_f_over_k=params_ref[lfk_off + i * m + k])
                val = _cond_bs_value(iv, j, ck) + _cond_bs_value(iva, ja, ck)
                folds.append(jnp.sum(val.reshape(_ROWS // 8, 8, _LANES), axis=0))
        return acc + jnp.stack(folds)

    acc0 = jnp.zeros((n_exp * m, 8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


@functools.partial(
    jax.jit,
    static_argnames=("T_host", "seg_steps", "n_strikes", "n_blocks", "n_batches",
                     "qmc", "interpret"),
)
def heston_qe_mixing_surface_price(
    log_s0, v0, r, kappa, theta, sigma, rho, T_host, strikes, discounts,
    *, seg_steps, n_strikes: int, n_blocks: int, n_batches: int, seed, cp=1.0,
    device_id=0, qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """(n_exp, n_strikes) DISCOUNTED surface prices over
    n_blocks·n_batches·65536 antithetic conditional-MC paths, one dispatch.

    ``T_host``: tuple of host-float expiry year-fractions (strictly
    increasing); ``seg_steps``: static per-segment step counts;
    ``discounts``: (n_exp,) per-expiry discount factors."""
    T_host = tuple(float(t) for t in T_host)
    n_exp = len(T_host)
    strikes = jnp.asarray(strikes)
    params = _surf_params(
        log_s0, v0, r, kappa, theta, sigma, rho, T_host, seg_steps, strikes, cp
    )
    n_params = _SURF_GLOBALS + _SURF_PER_SEG * n_exp + n_exp + n_strikes + n_exp * n_strikes
    out_specs = pl.BlockSpec(
        (1, n_exp * n_strikes, 8, _LANES),
        lambda i: (i, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_blocks, n_exp * n_strikes, 8, _LANES), jnp.float32)
    total_pairs = n_blocks * n_batches * _ROWS * _LANES
    if qmc and total_pairs > 2**_SOBOL_BITS:
        raise ValueError(
            f"Sobol' period is 2^{_SOBOL_BITS} points; {total_pairs} pairs would wrap"
        )
    if qmc:
        total_steps = sum(seg_steps)
        table = _sobol_table(seed, 2 * total_steps)
        offset_arr = jnp.asarray([point_offset], jnp.int32)
        kernel = functools.partial(
            _qe_mixing_surface_kernel_qmc, seg_steps=tuple(seg_steps), m=n_strikes,
            n_batches=n_batches,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((n_params,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (2 * total_steps, _SOBOL_BITS + 1),
                    lambda i: (jnp.int32(0), jnp.int32(0)),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((1,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, table, offset_arr)
    else:
        seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)])
        kernel = functools.partial(
            _qe_mixing_surface_kernel, seg_steps=tuple(seg_steps), m=n_strikes,
            n_batches=n_batches,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((n_params,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, seed_arr)
    total_paths = 2 * total_pairs
    grid_sums = jnp.sum(sums.astype(jnp.float64), axis=(0, 2, 3))  # (n_exp*m,)
    surf = grid_sums.reshape(n_exp, n_strikes) / total_paths
    return jnp.asarray(discounts)[:, None] * surf


def heston_surface_mc_tpu(market, expiries, strikes, config, cp=1.0, seed=None,
                          strategy=None):
    """TPU adapter: kernel-side surface with the SAME segment/step allocation
    as the pure-JAX :func:`hedgehog_tpu.heston_surface_mc` (one shared
    rounding rule, so biases match).

    The fused kernel path is antithetic-only (PRNG or, with ``config.qmc``,
    the in-kernel Sobol' stream); runs with no variance reduction route to
    the pure-JAX estimator, as do off-TPU runs.  ``seed`` overrides
    ``config.seed`` on every path.  ``strategy=HestonExactMixing()`` routes
    to the exact-transition surface kernel (sub-bp at ~2 segments/year;
    primal-only — use the QE kernel surface for kernel-speed gradients)."""
    import dataclasses

    from ..market.inputs import carry_yield
    from ..market.rate_curve import df_yf, zero_rate_yf
    from ..methods.montecarlo import (
        Antithetic,
        HestonExactMixing,
        heston_surface_mc,
        surface_seg_steps,
        validate_surface_expiries,
    )

    T_host = validate_surface_expiries(market, expiries)
    if seed is not None:
        config = dataclasses.replace(config, seed=seed)
    anti = isinstance(config.variance_reduction, Antithetic)
    if jax.default_backend() != "tpu" or not anti:
        return heston_surface_mc(
            market, expiries, strikes, config, cp=cp, strategy=strategy
        )
    seg_len, seg_steps = surface_seg_steps(
        T_host, config.steps,
        min_first=2 if isinstance(strategy, HestonExactMixing) else 1,
    )
    seg_steps = tuple(seg_steps)
    r0 = zero_rate_yf(market.rate, 0.0) - carry_yield(market)
    block = _ROWS * _LANES
    n_pairs = config.trajectories
    n_blocks = max(1, -(-n_pairs // (block * 16)))
    n_batches = -(-n_pairs // (block * n_blocks))
    kw = dict(seg_steps=seg_steps, n_strikes=len(strikes), n_blocks=n_blocks,
              n_batches=n_batches, seed=config.seed, cp=cp)
    if isinstance(strategy, HestonExactMixing):
        from .heston_exact_kernel import heston_exact_mixing_surface_price

        discounts = jnp.stack([df_yf(market.rate, t) for t in T_host])
        return heston_exact_mixing_surface_price(
            jnp.log(market.spot), market.V0, r0, market.kappa, market.theta,
            market.sigma, market.rho, tuple(T_host), jnp.asarray(strikes),
            discounts, qmc=config.qmc, **kw,
        )
    if not config.qmc:
        # differentiable view: identical primal, custom VJP = one
        # surface-Jacobian kernel dispatch (ops/heston_qe_greeks_kernel.py) —
        # kernel-speed gradients for surface calibration objectives.
        # Assumes a flat short rate (discount = e^{−r·T_i}), the HestonInputs
        # scalar-rate contract the mixing kernels already rely on.
        from .heston_qe_greeks_kernel import heston_qe_mixing_surface_price_diff

        # r0 is the carry-adjusted DRIFT; the diff kernel needs the pure
        # rate for its internal e^{−r·T_i} discounts plus the carry
        q = carry_yield(market)
        return heston_qe_mixing_surface_price_diff(
            jnp.log(market.spot), market.V0, r0 + q, market.kappa, market.theta,
            market.sigma, market.rho, tuple(T_host), jnp.asarray(strikes),
            carry=q, **kw,
        )
    discounts = jnp.stack([df_yf(market.rate, t) for t in T_host])
    return heston_qe_mixing_surface_price(
        jnp.log(market.spot), market.V0, r0, market.kappa, market.theta,
        market.sigma, market.rho, tuple(T_host), jnp.asarray(strikes), discounts,
        qmc=True, **kw,
    )


def heston_qe_mixing_values_pallas(prob, config, strat, key=None, device_id=0, point_offset=0):
    """Adapter for MonteCarlo(HestonDynamics, HestonQE(conditional=True,
    use_kernel=True)): per-path conditional values, falling back to the
    pure-JAX mixing estimator off-TPU (same seed → same QMC points).
    An explicit ``key`` reseeds the kernel stream / QMC randomization
    (ops/heston_kernel.py ``seed_from_key``), matching the pure-JAX
    strategies' distinct-keys → independent-draws contract."""
    from ..market.inputs import carry_yield, market_yearfrac
    from ..market.rate_curve import zero_rate_yf
    from ..methods.montecarlo import Antithetic, _heston_qe_mixing_values
    from .heston_kernel import seed_from_key

    market = prob.market_inputs
    anti = isinstance(config.variance_reduction, Antithetic)
    if jax.default_backend() != "tpu":
        if key is None:
            key = (
                jax.random.PRNGKey(config.seed)
                if config.qmc
                else jax.random.fold_in(jax.random.PRNGKey(config.seed), device_id)
            )
        return _heston_qe_mixing_values(prob, config, key, point_offset=point_offset)
    T = market_yearfrac(market, prob.payoff.expiry)
    r0 = zero_rate_yf(market.rate, 0.0) - carry_yield(market)
    # differentiable view on BOTH streams: same primal kernel, plus a custom
    # VJP backed by the cotangent-weighted greek kernel replaying the
    # identical PRNG/Sobol' stream — jax.grad through the kernel-backed
    # solve works (ops/heston_qe_greeks_kernel.py)
    from .heston_qe_greeks_kernel import heston_qe_mixing_values_diff

    out = heston_qe_mixing_values_diff(
        jnp.log(market.spot), market.V0, r0, market.kappa, market.theta,
        market.sigma, market.rho, T / config.steps,
        prob.payoff.strike, prob.payoff.call_put(),
        n_paths=config.trajectories, steps=config.steps,
        # QMC: ALWAYS config.seed — every device (and the pure-JAX twin,
        # whose unsplit base key is PRNGKey(config.seed)) must randomize
        # ONE shared Sobol' sequence and slice it by point_offset; deriving
        # the seed from the caller's key would break the sharded==unsharded
        # and kernel==pure-JAX randomization parity
        seed=config.seed if config.qmc else seed_from_key(config, key),
        antithetic=anti, device_id=device_id,
        qmc=config.qmc, point_offset=point_offset,
    )
    return out.astype(jnp.float64)


def heston_qe_terminal_pallas(prob, config, strat, key=None, device_id=0, point_offset=0):
    """Adapter for MonteCarlo(HestonDynamics, HestonQE(use_kernel=True)).

    ``config.qmc=True`` routes to the in-kernel Sobol' stream (one sequence
    per seed; sharded devices take disjoint ``point_offset`` slices).
    An explicit ``key`` reseeds the kernel stream / QMC randomization
    (ops/heston_kernel.py ``seed_from_key``)."""
    from ..market.inputs import carry_yield, market_yearfrac
    from ..market.rate_curve import zero_rate_yf
    from ..methods.montecarlo import Antithetic, _heston_qe_paths
    from .heston_kernel import seed_from_key

    market = prob.market_inputs
    anti = isinstance(config.variance_reduction, Antithetic)
    if jax.default_backend() != "tpu":
        if key is None:
            key = (
                jax.random.PRNGKey(config.seed)
                if config.qmc  # one shared sequence; offsets give disjoint slices
                else jax.random.fold_in(jax.random.PRNGKey(config.seed), device_id)
            )
        return _heston_qe_paths(
            prob, config, key, strat, return_grid=False, point_offset=point_offset
        )
    T = market_yearfrac(market, prob.payoff.expiry)
    r0 = zero_rate_yf(market.rate, 0.0) - carry_yield(market)
    out = heston_qe_terminal(
        jnp.log(market.spot), market.V0, r0, market.kappa, market.theta,
        market.sigma, market.rho, T / config.steps,
        n_paths=config.trajectories, steps=config.steps,
        seed=config.seed if config.qmc else seed_from_key(config, key),
        antithetic=anti, device_id=device_id,
        martingale_correction=strat.martingale_correction,
        qmc=config.qmc, point_offset=point_offset,
    )
    return out.astype(jnp.float64)
