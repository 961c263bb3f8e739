"""Fused exact-transition mixing kernel (Pallas TPU) — the price flagship.

Kernel form of models/heston_exact.py: per segment each path draws the EXACT
noncentral-χ² CIR transition (fixed-trip Poisson CDF inversion + the
corrected saddlepoint gamma quantile _gamma_qtl with the small-shape boost
Γ(α)=Γ(α+1)·U^{1/α}), computes the exact conditional ∫V moments from the
Broadie-Kaya Laplace transform (Perron continued fraction for the Bessel
ratio, 4-term asymptotic tail), draws the gamma-matched ∫V, and finally
closes with the conditional Black-Scholes formula shared with the QE mixing
kernel.  Measured bias at TWO segments: −0.33±0.08bp on the bench market
(2.1G-path TPU runs, benchmarks/exact_mixing_kernel_bench.py; QMC −0.23bp)
at 2.12e9 paths/s in that harness's single-batch timing style — the
exact-gammaincinv floor of the 2-moment ∫V gamma family, ~3× below the
Wilson-Hilferty cube's −1.00bp (ADR-008 addendum 3) — versus +3.5bp for the
11-step QE mixing kernel at similar speed, and at FEWER random draws per
path (4/segment vs 2/step), which is what moves the
paths/sec-at-equal-error frontier.  At the bench.py SERVING configuration
(n_batches=16 on-chip multi-batch accumulation, 268M paths/dispatch) the
driver-recorded headline is 2.56e9 paths/s/chip at 0.28bp (BENCH_r04).

Same megabatch structure as ops/heston_qe_kernel.py: (256 × 128) path tiles
per program, on-chip PRNG or in-kernel Sobol' (4 dims/segment, step-major,
matching the pure-JAX draw layout), antithetic pair in-register (negated
normals, 1−u uniforms), fp32 with f64 host-side reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .heston_kernel import _box_muller, _uniform_from_bits
from .heston_qe_kernel import (
    _LANES,
    _ROWS,
    _SOBOL_BITS,
    _batch_masks,
    _cond_bs_value,
    _ndtri_approx,
    _np_int,
    _program_base_idx,
    _rcp,
    _sobol_masks,
    _sobol_table,
    _sobol_uniforms_tile,
)

__all__ = [
    "heston_exact_mixing_values",
    "heston_exact_mixing_values_pallas",
    "heston_exact_mixing_vanilla_price",
    "heston_exact_mixing_surface_price",
]

#: default Poisson trip count when the inputs are traced; the host
#: wrappers size it per market via models/heston_exact.poisson_kmax
#: (the loop is ~15% of kernel time at 32; the helper RAISES when even
#: 64 trips cannot meet the tail bound — very low vol-of-vol markets)
_POISSON_KMAX = 32
#: Bessel-ratio continued-fraction trips: 16 gives ≤5.9e-5 max rel err over
#: ν ∈ [−0.9, 3], z ∈ (0, 24] (scipy sweep) — the same order as the f64
#: twin's documented ≤7e-5 contract and invisible next to the ~1bp
#: Wilson-Hilferty scheme bias; measured end-to-end bias change < 0.01bp
#: vs 24 trips (benchmarks: kmax/cf trip probe, 2.1G paths)
_CF_ITERS = 16
_CF_SWITCH = 24.0


def _kernel_kmax(kappa, theta, sigma, dt, v0) -> int:
    from ..models.heston_exact import poisson_kmax

    return poisson_kmax(kappa, theta, sigma, dt, v0, default=_POISSON_KMAX)


# ---- parameter vector ------------------------------------------------------
# One uniform dt = T/segments, so ALL segments share one constant set.

_P_NAMES = (
    # conditional-BS close (keys _cond_bs_value expects)
    "f_base", "strike", "rho", "rho2_half", "rho_bar2", "cp", "log_f_over_k",
    # exact CIR transition
    "v0", "lam_fac", "d_half", "two_cfac",
    # Bessel ratio (ν, ν² and the asymptotic-series coefficients)
    "nu", "nu2", "z_fac", "an1", "an2", "an3", "ad1", "ad2", "ad3",
    # conditional ∫V moment assembly
    "l1c", "l1x", "l2c", "l2x", "q", "p_c", "q2", "m1f", "s2f", "inv_kappa",
    # J closure
    "c_j", "k_over_sigma", "inv_sigma",
)


def _exact_c(params_ref):
    return {name: params_ref[i] for i, name in enumerate(_P_NAMES)}


def _exact_params(log_s0, v0, r, kappa, theta, sigma, rho, dt, segments, strike, cp):
    """fp32 SMEM parameter vector (host-side f64 math, cast once); the
    numeric coefficient formulas live in models/heston_exact.py
    (cir_exact_shared_coeffs / cir_exact_kernel_coeffs), shared with the
    surface kernel so the two cannot drift."""
    from ..models.heston_exact import (
        cir_exact_kernel_coeffs,
        cir_exact_shared_coeffs,
    )

    T = dt * segments
    f_base = jnp.exp(log_s0 + r * T)
    vals = dict(
        cir_exact_shared_coeffs(kappa, theta, sigma),
        **cir_exact_kernel_coeffs(kappa, theta, sigma, dt),
        f_base=f_base, strike=strike, rho=rho, rho2_half=0.5 * rho**2,
        rho_bar2=1.0 - rho**2, cp=cp,
        log_f_over_k=jnp.log(f_base) - jnp.log(strike),
        v0=v0,
        c_j=v0 + kappa * theta * T, k_over_sigma=kappa / sigma,
        inv_sigma=1.0 / sigma,
    )
    return jnp.stack([jnp.float32(vals[n]) for n in _P_NAMES])


# ---- per-segment path update ----------------------------------------------


def _bessel_ratio_tile(z, c):
    """I_{ν+1}(z)/I_ν(z) on fp32 tiles: fixed-trip backward Perron CF below
    z=24 blended into the 4-term asymptotic-series ratio above (coefficients
    precomputed host-side); max rel err ≤ 7e-5 over the reachable range."""
    zc = jnp.minimum(z, _CF_SWITCH)
    r = jnp.zeros_like(z)
    for m in range(_CF_ITERS, 0, -1):
        r = zc * _rcp(2.0 * (c["nu"] + m) + zc * r)
    za = jnp.maximum(z, _CF_SWITCH)
    it = _rcp(8.0 * za)
    num = 1.0 + it * (-c["an1"] + it * (c["an2"] - it * c["an3"]))
    den = 1.0 + it * (-c["ad1"] + it * (c["ad2"] - it * c["ad3"]))
    return jnp.where(z < _CF_SWITCH, r, num * _rcp(den))


def _lam_of_eta(eta, trips: int):
    """λ from λ − 1 − ln λ = η²/2, sign(η) = sign(λ−1): the tile form of
    models/heston_exact.lam_of_eta (series < 0.5, fixed-trip Newton else)."""
    lam_s = 1.0 + eta * (1.0 + eta * (1.0 / 3.0 + eta * (1.0 / 36.0
            + eta * (-1.0 / 270.0 + eta * (1.0 / 4320.0)))))
    cube = 1.0 + eta * (1.0 / 3.0)
    cube = jnp.maximum(cube * cube * cube, 1e-12)
    lam = jnp.where(eta >= 0.0, cube,
                    jnp.maximum(cube, jnp.exp(-1.0 - 0.5 * eta * eta)))
    tgt = 0.5 * eta * eta
    tiny = jnp.full_like(eta, 1e-12)
    for _ in range(trips):
        f = lam - 1.0 - jnp.log(jnp.maximum(lam, 1e-30)) - tgt
        den = jnp.where(jnp.abs(lam - 1.0) < 1e-12, tiny, lam - 1.0)
        lam = jnp.maximum(lam - f * lam * _rcp(den), 1e-30)
    return jnp.where(jnp.abs(eta) < 0.5, lam_s, lam)


def _gamma_qtl(alpha, z):
    """Gamma(α, 1) quantile at Φ(z): tile form of the corrected saddlepoint
    inversion models/heston_exact.gamma_qtl (shared fitted ε₂/ε₃
    coefficients, baked in as compile-time constants) — collapses the
    transition's Wilson-Hilferty distributional bias (bench −1.05 → −0.31bp
    in the f64 study) for ~8 extra log/div-grade ops per draw."""
    from ..models.heston_exact import GQ_NEWTON, GQ_NEWTON_E1, GQ_P2, GQ_P3, GQ_SC

    inv_a = _rcp(alpha)
    eta0 = z * jnp.sqrt(inv_a)
    lam0 = _lam_of_eta(eta0, GQ_NEWTON_E1)
    w = lam0 - 1.0
    safe = jnp.abs(eta0) >= 0.1
    one = jnp.ones_like(eta0)
    w_s = jnp.where(safe, w, one)
    eta_s = jnp.where(safe, eta0, one)
    e1 = jnp.where(
        safe,
        jnp.log(jnp.maximum(eta_s * _rcp(w_s), 1e-30)) * _rcp(eta_s),
        -1.0 / 3.0 + eta0 * (1.0 / 36.0) + eta0 * eta0 * (1.0 / 1620.0),
    )
    t = jnp.minimum(jnp.maximum(eta0 * (1.0 / GQ_SC), -1.0), 1.0)
    q2 = jnp.full_like(t, GQ_P2[-1])
    for cf in GQ_P2[-2::-1]:
        q2 = q2 * t + cf
    q3 = jnp.full_like(t, GQ_P3[-1])
    for cf in GQ_P3[-2::-1]:
        q3 = q3 * t + cf
    eta = eta0 + inv_a * (e1 + inv_a * (q2 + inv_a * q3))
    return alpha * _lam_of_eta(eta, GQ_NEWTON)


def _exact_segment(v, iv, u_pois, z_gam, u_boost, z_iv, c, kmax: int):
    """One exact segment on fp32 tiles: (V, ∫V-so-far) → (V', ∫V + draw)."""
    # Poisson(λ/2) count by fixed-trip CDF inversion
    mu = v * c["lam_fac"]
    p = jnp.exp(-mu)
    cdf = p
    n = jnp.zeros_like(v)
    for k in range(1, kmax + 1):
        n = jnp.where(u_pois > cdf, float(k), n)
        p = p * mu * (1.0 / k)
        cdf = cdf + p

    # Gamma(d/2 + N, 2c) via the boosted corrected-saddlepoint quantile
    alpha = c["d_half"] + n
    u_safe = jnp.maximum(u_boost, 1e-30)
    g = _gamma_qtl(alpha + 1.0, z_gam) * jnp.exp(jnp.log(u_safe) * _rcp(alpha))
    y = c["two_cfac"] * g

    # exact conditional ∫V moments given (v, y)
    z = c["z_fac"] * jnp.sqrt(jnp.maximum(v * y, 1e-30))
    W = z * _bessel_ratio_tile(z, c) + c["nu"]
    xy = v + y
    l1 = c["l1c"] - xy * c["l1x"] + W * c["q"]
    l2 = (c["l2c"] + xy * c["l2x"]
          + (z * z + c["nu2"] - W - W * W) * c["q2"] + W * c["p_c"])
    m1 = jnp.maximum(c["m1f"] * l1, 1e-10)
    s2 = jnp.maximum(c["s2f"] * (l2 - l1 * c["inv_kappa"]), 1e-14)

    # gamma-matched ∫V draw
    inv_s2 = _rcp(s2)
    shape = m1 * m1 * inv_s2
    scale = s2 * _rcp(m1)
    iv_seg = jnp.maximum(scale * _gamma_qtl(shape, z_iv), 1e-10)
    return y, iv + iv_seg


def _exact_close(v, iv, c):
    """Conditional BS close from the full-horizon CIR identity
    J = (V_T − V_0 − κθT)/σ + (κ/σ)·IV."""
    j = (v - c["c_j"]) * c["inv_sigma"] + iv * c["k_over_sigma"]
    return _cond_bs_value(iv, j, c)


def _exact_path_init(c, antithetic: bool):
    shape = (_ROWS, _LANES)
    v = jnp.full(shape, c["v0"], dtype=jnp.float32)
    zero = jnp.zeros(shape, dtype=jnp.float32)
    return (v, zero, v, zero) if antithetic else (v, zero)


def _exact_run_prng(c, segments: int, antithetic: bool, kmax: int):
    """Run all segments from the on-chip PRNG: per segment one Box-Muller
    pair (z_gam, z_iv) + two bit uniforms (u_pois, u_boost); the antithetic
    twin negates the normals and mirrors the uniforms."""
    carry = _exact_path_init(c, antithetic)
    shape = (_ROWS, _LANES)
    for _ in range(segments):  # static unroll: segments is 1-4
        z_gam, z_iv = _box_muller(shape)
        u_pois = _uniform_from_bits(
            pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
        u_boost = _uniform_from_bits(
            pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
        if antithetic:
            v, iv, va, iva = carry
            v, iv = _exact_segment(v, iv, u_pois, z_gam, u_boost, z_iv, c, kmax)
            va, iva = _exact_segment(
                va, iva, 1.0 - u_pois, -z_gam, 1.0 - u_boost, -z_iv, c, kmax)
            carry = (v, iv, va, iva)
        else:
            carry = _exact_segment(*carry, u_pois, z_gam, u_boost, z_iv, c, kmax)
    return carry


def _exact_run_qmc(masks, sob_ref, c, segments: int, kmax: int):
    """Antithetic segment runs from the in-kernel Sobol' stream — 4 dims per
    segment, step-major: (u_pois, u→z_gam, u_boost, u→z_iv), the layout of
    the pure-JAX _heston_exact_mixing_values."""
    carry = _exact_path_init(c, True)
    for s in range(segments):
        u_pois, u_gam = _sobol_uniforms_tile(masks, sob_ref, (4 * s, 4 * s + 1))
        u_boost, u_iv = _sobol_uniforms_tile(masks, sob_ref, (4 * s + 2, 4 * s + 3))
        z_gam, z_iv = _ndtri_approx(u_gam), _ndtri_approx(u_iv)
        v, iv, va, iva = carry
        v, iv = _exact_segment(v, iv, u_pois, z_gam, u_boost, z_iv, c, kmax)
        va, iva = _exact_segment(
            va, iva, 1.0 - u_pois, -z_gam, 1.0 - u_boost, -z_iv, c, kmax)
        carry = (v, iv, va, iva)
    return carry


# ---- kernels ---------------------------------------------------------------


def _exact_values_kernel(params_ref, seed_ref, out_ref, *, segments: int, antithetic: bool, kmax: int):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    c = _exact_c(params_ref)
    carry = _exact_run_prng(c, segments, antithetic, kmax)
    out_ref[0] = _exact_close(carry[0], carry[1], c)
    if antithetic:
        out_ref[1] = _exact_close(carry[2], carry[3], c)


def _exact_values_kernel_qmc(params_ref, sob_ref, offset_ref, out_ref, *, segments: int, kmax: int):
    c = _exact_c(params_ref)
    shape = (_ROWS, _LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (offset_ref[0] + pl.program_id(0) * jnp.int32(_ROWS * _LANES)
           + row * jnp.int32(_LANES) + lane)
    masks = _sobol_masks(idx)
    carry = _exact_run_qmc(masks, sob_ref, c, segments, kmax)
    out_ref[0] = _exact_close(carry[0], carry[1], c)
    out_ref[1] = _exact_close(carry[2], carry[3], c)


def _exact_price_kernel(params_ref, seed_ref, out_ref, *, segments: int, n_batches: int, kmax: int):
    """Multi-batch antithetic accumulating price kernel (the serving/bench
    configuration — mirrors _qe_mixing_price_kernel)."""
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    c = _exact_c(params_ref)

    def one_batch(_, acc):
        carry = _exact_run_prng(c, segments, antithetic=True, kmax=kmax)
        val = _exact_close(carry[0], carry[1], c) + _exact_close(carry[2], carry[3], c)
        return acc + jnp.sum(val.reshape(_ROWS // 8, 8, _LANES), axis=0)

    acc0 = jnp.zeros((8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def _exact_price_kernel_qmc(
    params_ref, sob_ref, offset_ref, out_ref, *, segments: int, n_batches: int,
    kmax: int,
):
    c = _exact_c(params_ref)
    base_idx = _program_base_idx(offset_ref, n_batches)

    def one_batch(b, acc):
        masks = _batch_masks(base_idx, b)
        carry = _exact_run_qmc(masks, sob_ref, c, segments, kmax)
        val = _exact_close(carry[0], carry[1], c) + _exact_close(carry[2], carry[3], c)
        return acc + jnp.sum(val.reshape(_ROWS // 8, 8, _LANES), axis=0)

    acc0 = jnp.zeros((8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


# ---- host wrappers ---------------------------------------------------------


def heston_exact_mixing_values(
    log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, cp,
    *, n_paths: int, segments: int, seed, antithetic: bool = False, device_id=0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Host-side wrapper: Sobol' period guard on concrete offsets, the
    per-market static Poisson trip count, then the jitted kernel (per-path
    UNDISCOUNTED conditional values)."""
    if qmc and isinstance(point_offset, (int, _np_int)):
        block = _ROWS * _LANES
        padded = -(-n_paths // block) * block
        if point_offset + padded > 2**_SOBOL_BITS:
            raise ValueError(
                f"Sobol' period is 2^{_SOBOL_BITS} points; offset "
                f"{point_offset} + {padded} paths would wrap"
            )
    return _heston_exact_mixing_values_impl(
        log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, cp,
        n_paths=n_paths, segments=segments, seed=seed, antithetic=antithetic,
        device_id=device_id, qmc=qmc, point_offset=point_offset,
        interpret=interpret, kmax=_kernel_kmax(kappa, theta, sigma, dt, v0),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_paths", "segments", "antithetic", "qmc", "interpret", "kmax"),
)
def _heston_exact_mixing_values_impl(
    log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, cp,
    *, n_paths: int, segments: int, seed, antithetic: bool = False, device_id=0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
    kmax: int = _POISSON_KMAX,
):
    """Per-path UNDISCOUNTED conditional vanilla values ((n_groups, n_paths)
    fp32) via the fused exact-mixing kernel.  QMC is antithetic-only (the
    Sobol' stream is laid out in mirrored pairs, matching the pure-JAX twin).
    """
    block = _ROWS * _LANES
    n_blocks = -(-n_paths // block)
    padded = n_blocks * block
    n_groups = 2 if antithetic else 1
    if qmc and not antithetic:
        raise ValueError("kernel QMC path is antithetic-only")
    if qmc and padded > 2**_SOBOL_BITS:
        raise ValueError(
            f"Sobol' period is 2^{_SOBOL_BITS} points; {padded} paths would wrap"
        )
    params = _exact_params(
        log_s0, v0, r, kappa, theta, sigma, rho, dt, segments, strike, cp
    )
    out_specs = pl.BlockSpec(
        (n_groups, _ROWS, _LANES),
        lambda i: (jnp.int32(0), i, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_groups, n_blocks * _ROWS, _LANES), jnp.float32)
    n_par = len(_P_NAMES)

    if qmc:
        table = _sobol_table(seed, 4 * segments)
        offset_arr = jnp.asarray([point_offset], jnp.int32)
        kernel = functools.partial(_exact_values_kernel_qmc, segments=segments, kmax=kmax)
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((n_par,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (4 * segments, _SOBOL_BITS + 1),
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
        _exact_values_kernel, segments=segments, antithetic=antithetic, kmax=kmax
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_par,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(params, seed_arr)
    return out.reshape(n_groups, padded)[:, :n_paths]


def heston_exact_mixing_vanilla_price(
    log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, discount,
    *, n_blocks: int, n_batches: int, segments: int, seed, device_id=0, cp=1.0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Discounted European vanilla price over n_blocks·n_batches·65536
    antithetic exact-mixing paths, ONE host dispatch, on-chip accumulation —
    the serving/bench configuration (sub-bp bias at segments=2).  Host-side
    wrapper choosing the static Poisson trip count for the market."""
    return _heston_exact_mixing_vanilla_price_impl(
        log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, discount,
        n_blocks=n_blocks, n_batches=n_batches, segments=segments, seed=seed,
        device_id=device_id, cp=cp, qmc=qmc, point_offset=point_offset,
        interpret=interpret, kmax=_kernel_kmax(kappa, theta, sigma, dt, v0),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_blocks", "n_batches", "segments", "qmc", "interpret", "kmax"),
)
def _heston_exact_mixing_vanilla_price_impl(
    log_s0, v0, r, kappa, theta, sigma, rho, dt, strike, discount,
    *, n_blocks: int, n_batches: int, segments: int, seed, device_id=0, cp=1.0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
    kmax: int = _POISSON_KMAX,
):
    params = _exact_params(
        log_s0, v0, r, kappa, theta, sigma, rho, dt, segments, strike, cp
    )
    total_pairs = n_blocks * n_batches * _ROWS * _LANES
    if qmc and total_pairs > 2**_SOBOL_BITS:
        raise ValueError(
            f"Sobol' period is 2^{_SOBOL_BITS} points; {total_pairs} pairs would wrap"
        )
    n_par = len(_P_NAMES)
    out_specs = pl.BlockSpec(
        (1, 8, _LANES), lambda i: (i, jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_blocks, 8, _LANES), jnp.float32)
    if qmc:
        table = _sobol_table(seed, 4 * segments)
        offset_arr = jnp.asarray([point_offset], jnp.int32)
        kernel = functools.partial(
            _exact_price_kernel_qmc, segments=segments, n_batches=n_batches,
            kmax=kmax,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((n_par,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (4 * segments, _SOBOL_BITS + 1),
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
            _exact_price_kernel, segments=segments, n_batches=n_batches, kmax=kmax
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((n_par,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, seed_arr)
    total_paths = 2 * total_pairs
    return discount * jnp.sum(sums.astype(jnp.float64)) / total_paths


def heston_exact_mixing_values_pallas(prob, config, strat, key=None, device_id=0, point_offset=0):
    """Adapter for MonteCarlo(HestonDynamics, HestonExactMixing(
    use_kernel=True)): per-path conditional values, falling back to the
    pure-JAX estimator off-TPU (same seed → same QMC points).  An explicit
    ``key`` reseeds the PRNG kernel stream (ops/heston_kernel.py
    ``seed_from_key``); under QMC the seed is ALWAYS config.seed so every
    device randomizes ONE shared Sobol' sequence sliced by point_offset."""
    from ..market.inputs import carry_yield, market_yearfrac
    from ..market.rate_curve import zero_rate_yf
    from ..methods.montecarlo import Antithetic, _heston_exact_mixing_values
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
        return _heston_exact_mixing_values(prob, config, key, point_offset=point_offset)
    T = market_yearfrac(market, prob.payoff.expiry)
    r0 = zero_rate_yf(market.rate, 0.0) - carry_yield(market)
    if config.qmc and not anti:
        raise ValueError("kernel QMC path is antithetic-only")
    out = heston_exact_mixing_values(
        jnp.log(market.spot), market.V0, r0, market.kappa, market.theta,
        market.sigma, market.rho, T / config.steps,
        prob.payoff.strike, prob.payoff.call_put(),
        n_paths=config.trajectories, segments=config.steps,
        seed=config.seed if config.qmc else seed_from_key(config, key),
        antithetic=anti, device_id=device_id,
        qmc=config.qmc, point_offset=point_offset,
    )
    return out.astype(jnp.float64)


# ---- kernel-side surface: a whole (expiry × strike) grid per dispatch ----
#
# Exact-transition twin of heston_qe_kernel._qe_mixing_surface_kernel: the
# variance leg runs once through per-expiry-gap EXACT segments (possibly
# different dt per gap); at each expiry the (V, ∫V) carries close EVERY
# strike with the full-horizon CIR identity J_i = (V − V0 − κθT_i + κ·IV)/σ
# and the conditional BS formula, folding into on-chip (8, LANES) partial
# sums.  Sub-bp scheme bias at ~2 segments/year — a 4-segment budget beats
# a 32-step QE surface on both accuracy and work.

_XS_GLOBALS = ("v0", "rho", "rho2_half", "rho_bar2", "cp", "inv_sigma",
               "k_over_sigma")
_XS_SHARED = ("d_half", "nu", "nu2", "an1", "an2", "an3", "ad1", "ad2", "ad3",
              "m1f", "s2f", "inv_kappa")
_XS_PER_GAP = ("lam_fac", "two_cfac", "z_fac", "l1c", "l1x", "l2c", "l2x",
               "q", "q2", "p_c")


def _exact_surf_params(log_s0, v0, r, kappa, theta, sigma, rho, T_host,
                       seg_steps, strikes, cp):
    """SMEM params: globals + dt-independent shared block + per-gap exact
    constants + per-expiry (f_base, c_j) + strikes + per-(i,k) log(F/K).
    Coefficient formulas come from models/heston_exact.py — the same
    helpers _exact_params uses, so the price and surface kernels agree."""
    from ..models.heston_exact import (
        cir_exact_kernel_coeffs,
        cir_exact_shared_coeffs,
    )

    n_exp, m = len(T_host), len(strikes)
    entries = [v0, rho, 0.5 * rho**2, 1.0 - rho**2, cp, 1.0 / sigma,
               kappa / sigma]
    shared = cir_exact_shared_coeffs(kappa, theta, sigma)
    entries += [shared[name] for name in _XS_SHARED]
    t_prev = 0.0
    for i in range(n_exp):
        dt_i = (T_host[i] - t_prev) / seg_steps[i]
        t_prev = T_host[i]
        cg = cir_exact_kernel_coeffs(kappa, theta, sigma, dt_i)
        entries += [cg[name] for name in _XS_PER_GAP]
    f_bases = [jnp.exp(log_s0 + r * T_host[i]) for i in range(n_exp)]
    entries += f_bases
    entries += [v0 + kappa * theta * T_host[i] for i in range(n_exp)]  # c_j
    entries += [strikes[k] for k in range(m)]
    for i in range(n_exp):
        for k in range(m):
            entries.append(jnp.log(f_bases[i]) - jnp.log(strikes[k]))
    return jnp.stack([jnp.float32(x) for x in entries])


def _exact_surf_nparams(n_exp: int, m: int) -> int:
    return (len(_XS_GLOBALS) + len(_XS_SHARED) + len(_XS_PER_GAP) * n_exp
            + 2 * n_exp + m + n_exp * m)


def _exact_surf_c(params_ref, i: int):
    """Constants dict for expiry-gap i in the layout _exact_segment and
    _exact_close expect (c_j/f_base/strike/log_f_over_k set per point)."""
    c = {name: params_ref[k] for k, name in enumerate(_XS_GLOBALS)}
    off = len(_XS_GLOBALS)
    c.update({name: params_ref[off + k] for k, name in enumerate(_XS_SHARED)})
    off += len(_XS_SHARED) + len(_XS_PER_GAP) * i
    c.update({name: params_ref[off + k] for k, name in enumerate(_XS_PER_GAP)})
    return c


def _exact_surf_fold(params_ref, carry, i, n_exp, m, c, folds):
    """Close both antithetic twins against every strike of expiry i."""
    f_off = len(_XS_GLOBALS) + len(_XS_SHARED) + len(_XS_PER_GAP) * n_exp
    cj_off = f_off + n_exp
    k_off = cj_off + n_exp
    lfk_off = k_off + m
    v, iv, va, iva = carry
    for k in range(m):
        ck = dict(c, c_j=params_ref[cj_off + i], f_base=params_ref[f_off + i],
                  strike=params_ref[k_off + k],
                  log_f_over_k=params_ref[lfk_off + i * m + k])
        val = _exact_close(v, iv, ck) + _exact_close(va, iva, ck)
        folds.append(jnp.sum(val.reshape(_ROWS // 8, 8, _LANES), axis=0))


def _exact_surface_kernel(
    params_ref, seed_ref, out_ref, *, seg_steps, m: int, n_batches: int, kmaxes
):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    n_exp = len(seg_steps)
    shape = (_ROWS, _LANES)

    def one_batch(_, acc):
        c0 = _exact_surf_c(params_ref, 0)
        v = jnp.full(shape, c0["v0"], dtype=jnp.float32)
        zero = jnp.zeros(shape, dtype=jnp.float32)
        carry = (v, zero, v, zero)
        folds = []
        for i, steps_i in enumerate(seg_steps):
            c = _exact_surf_c(params_ref, i)
            for _s in range(steps_i):
                z_gam, z_iv = _box_muller(shape)
                u_pois = _uniform_from_bits(
                    pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
                u_boost = _uniform_from_bits(
                    pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
                v, iv, va, iva = carry
                v, iv = _exact_segment(v, iv, u_pois, z_gam, u_boost, z_iv,
                                       c, kmaxes[i])
                va, iva = _exact_segment(va, iva, 1.0 - u_pois, -z_gam,
                                         1.0 - u_boost, -z_iv, c, kmaxes[i])
                carry = (v, iv, va, iva)
            _exact_surf_fold(params_ref, carry, i, n_exp, m, c, folds)
        return acc + jnp.stack(folds)  # (n_exp*m, 8, LANES)

    acc0 = jnp.zeros((n_exp * m, 8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def _exact_surface_kernel_qmc(
    params_ref, sob_ref, offset_ref, out_ref, *, seg_steps, m: int,
    n_batches: int, kmaxes
):
    """QMC twin: Sobol' dims run 4-per-segment step-major across ALL gaps
    (one V trajectory), batches take consecutive point blocks."""
    n_exp = len(seg_steps)
    base_idx = _program_base_idx(offset_ref, n_batches)

    def one_batch(b, acc):
        masks = _batch_masks(base_idx, b)
        c0 = _exact_surf_c(params_ref, 0)
        v = jnp.full((_ROWS, _LANES), c0["v0"], dtype=jnp.float32)
        zero = jnp.zeros((_ROWS, _LANES), dtype=jnp.float32)
        carry = (v, zero, v, zero)
        folds = []
        dim0 = 0
        for i, steps_i in enumerate(seg_steps):
            c = _exact_surf_c(params_ref, i)
            for s in range(steps_i):
                d = dim0 + 4 * s
                u_pois, u_gam = _sobol_uniforms_tile(masks, sob_ref, (d, d + 1))
                u_boost, u_iv = _sobol_uniforms_tile(masks, sob_ref, (d + 2, d + 3))
                z_gam, z_iv = _ndtri_approx(u_gam), _ndtri_approx(u_iv)
                v, iv, va, iva = carry
                v, iv = _exact_segment(v, iv, u_pois, z_gam, u_boost, z_iv,
                                       c, kmaxes[i])
                va, iva = _exact_segment(va, iva, 1.0 - u_pois, -z_gam,
                                         1.0 - u_boost, -z_iv, c, kmaxes[i])
                carry = (v, iv, va, iva)
            dim0 += 4 * steps_i
            _exact_surf_fold(params_ref, carry, i, n_exp, m, c, folds)
        return acc + jnp.stack(folds)

    acc0 = jnp.zeros((n_exp * m, 8, _LANES), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def heston_exact_mixing_surface_price(
    log_s0, v0, r, kappa, theta, sigma, rho, T_host, strikes, discounts,
    *, seg_steps, n_strikes: int, n_blocks: int, n_batches: int, seed, cp=1.0,
    device_id=0, qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """(n_exp, n_strikes) DISCOUNTED exact-transition surface prices over
    n_blocks·n_batches·65536 antithetic paths, one dispatch — the kernel
    twin of heston_surface_mc(..., strategy=HestonExactMixing()).  Host
    wrapper choosing the per-gap static Poisson trip counts."""
    T_host = tuple(float(t) for t in T_host)
    t_prev = 0.0
    kmaxes = []
    for i, steps_i in enumerate(seg_steps):
        dt_i = (T_host[i] - t_prev) / steps_i
        t_prev = T_host[i]
        kmaxes.append(_kernel_kmax(kappa, theta, sigma, dt_i, v0))
    return _heston_exact_mixing_surface_price_impl(
        log_s0, v0, r, kappa, theta, sigma, rho, T_host, strikes, discounts,
        seg_steps=tuple(seg_steps), n_strikes=n_strikes, n_blocks=n_blocks,
        n_batches=n_batches, seed=seed, cp=cp, device_id=device_id, qmc=qmc,
        point_offset=point_offset, interpret=interpret, kmaxes=tuple(kmaxes),
    )


@functools.partial(
    jax.jit,
    static_argnames=("T_host", "seg_steps", "n_strikes", "n_blocks", "n_batches",
                     "qmc", "interpret", "kmaxes"),
)
def _heston_exact_mixing_surface_price_impl(
    log_s0, v0, r, kappa, theta, sigma, rho, T_host, strikes, discounts,
    *, seg_steps, n_strikes: int, n_blocks: int, n_batches: int, seed, cp=1.0,
    device_id=0, qmc: bool = False, point_offset: int = 0, interpret: bool = False,
    kmaxes=(),
):
    n_exp = len(T_host)
    strikes = jnp.asarray(strikes)
    params = _exact_surf_params(
        log_s0, v0, r, kappa, theta, sigma, rho, T_host, seg_steps, strikes, cp
    )
    n_params = _exact_surf_nparams(n_exp, n_strikes)
    out_specs = pl.BlockSpec(
        (1, n_exp * n_strikes, 8, _LANES),
        lambda i: (i, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (n_blocks, n_exp * n_strikes, 8, _LANES), jnp.float32
    )
    total_pairs = n_blocks * n_batches * _ROWS * _LANES
    if qmc and total_pairs > 2**_SOBOL_BITS:
        raise ValueError(
            f"Sobol' period is 2^{_SOBOL_BITS} points; {total_pairs} pairs would wrap"
        )
    if qmc:
        total_segs = sum(seg_steps)
        table = _sobol_table(seed, 4 * total_segs)
        offset_arr = jnp.asarray([point_offset], jnp.int32)
        kernel = functools.partial(
            _exact_surface_kernel_qmc, seg_steps=tuple(seg_steps), m=n_strikes,
            n_batches=n_batches, kmaxes=kmaxes,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((n_params,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (4 * total_segs, _SOBOL_BITS + 1),
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
            _exact_surface_kernel, seg_steps=tuple(seg_steps), m=n_strikes,
            n_batches=n_batches, kmaxes=kmaxes,
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
