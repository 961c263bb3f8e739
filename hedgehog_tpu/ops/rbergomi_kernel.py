"""Fused rough-Bergomi mixing kernel (Pallas TPU).

Beyond-reference model family (the reference's only stochastic-vol model is
Heston, /root/reference/src/distributions/heston.jl); the pure-JAX estimator
this kernel serves lives in methods/montecarlo.py::_rbergomi_mixing_values
and the exact-Volterra scheme in models/rough_bergomi.py.

Why a kernel: the pure-JAX fp32 path is HBM-bound — every (2n × paths)
intermediate (draws, the Volterra matmul output, the variance grid, the
mixing reductions) round-trips HBM, measured ~47 ms for 1M×64 paths on one
v5e (benchmarks/rbergomi_bench.py).  The fused kernel keeps the whole
pipeline in VMEM per path tile:

    on-chip PRNG/Sobol' draws ξ (2n × P)          [no HBM]
    X = L @ ξ on the MXU                           [the only real FLOPs]
    V_k = C_k · exp(η·Z_{t_k}),  IV = Σ V_k Δt,  J = Σ √V_k ΔW_k
    conditional-BS close per path (Romano-Touzi)   [VPU]

with L the (2n × 2n) Volterra Cholesky factor (computed ONCE at trace time
in f64 — conditioning-sensitive — then cast to f32; it is the same factor
the pure-JAX fp32 path multiplies by) and C_k = ξ₀(t_k)·exp(−½η²t_k^{2H})
the per-step variance coefficients, both tiny trace-time inputs.  Per path
the matmul costs 2·(2n)² FLOPs — at n = 64 that is 32 KFLOP/path on the
MXU, so the kernel is compute-dense exactly where the hardware is fastest.

Antithetic pairs are algebraic, not re-simulated: X(−ξ) = −X, so the mirror
path's variance is C_k·exp(−η·Z) = C_k / exp(η·Z) (one reciprocal) and its
J flips the ΔW sign — both groups from ONE matmul.

Seeding/QMC discipline matches ops/heston_qe_kernel.py: PRNG streams are
(seed ⊕ device_id·odd, program_id); QMC draws consecutive blocks of ONE
seed-randomized Sobol' sequence (dims 0..2n−1 = the ξ rows, the SAME dim
order as the pure-JAX `_rbergomi_draws` under ``config.qmc`` — validated
bit-exactly under interpret mode in tests/unit/test_rbergomi_kernel.py).

Differentiability: the fused price+greeks kernel
(:func:`rbergomi_mixing_price_and_greeks`) propagates forward-mode tangents
inside the kernel, with ∂/∂H riding ONE extra matmul against the trace-time
tangent factor dL/dH; and the values kernel has a differentiable view
(:func:`rbergomi_mixing_values_diff`, served by the TPU adapter) whose
custom VJP runs one cotangent-weighted kernel replaying the same stream —
``jax.grad`` through the kernel-backed ``solve`` works, including the
maturity chain (theta) via the Volterra covariance's self-similarity.
Bucketed ForwardVarianceCurve vegas and exotic payoffs stay on the smooth
pure-JAX estimator, whose plain `jax.grad` covers everything
(RoughBergomiMixing docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .heston_kernel import _box_muller, seed_from_key
from .heston_qe_kernel import (
    _SOBOL_BITS,
    _ndtri_approx,
    _norm_cdf,
    _rcp,
    _sobol_masks,
    _sobol_table,
    _sobol_uniforms_tile,
)

__all__ = [
    "GREEK_ORDER_RB",
    "rbergomi_kernel_price_and_greeks",
    "rbergomi_kernel_smile",
    "rbergomi_mixing_price_and_greeks",
    "rbergomi_mixing_smile_price",
    "rbergomi_mixing_values",
    "rbergomi_mixing_values_diff",
    "rbergomi_mixing_values_diff_curve",
    "rbergomi_mixing_vanilla_price",
    "rbergomi_mixing_values_pallas",
]

_P = 2048  # paths per program per batch: the lane-flat path axis


def _pad_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


# ---------------------------------------------------------------- params

_N_SCALARS = 9  # eta, dt, f_base, log_f_over_k, strike, cp, rho, rho2_half, rho_bar2


def _rb_params(eta, dt, f_base, log_f_over_k, strike, cp, rho):
    """SMEM scalar vector (f32): close constants + the variance exponent."""
    vals = [eta, dt, f_base, log_f_over_k, strike, cp, rho, 0.5 * rho**2,
            1.0 - rho**2]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])


def _rb_bs_close(p_ref, iv, j):
    """Undiscounted conditional Black-Scholes vanilla value given the
    per-path (IV, J) mixing factors (same formula as heston_qe_kernel's
    _cond_bs_value, reading this kernel's param layout)."""
    rho, rho2_half, rho_bar2 = p_ref[6], p_ref[7], p_ref[8]
    e_arg = rho * j - rho2_half * iv
    f_eff = p_ref[2] * jnp.exp(e_arg)
    var = jnp.maximum(rho_bar2 * iv, 1e-10)
    sd = jnp.sqrt(var)
    inv_sd = _rcp(sd)
    d1 = (p_ref[3] + e_arg + 0.5 * var) * inv_sd
    d2 = d1 - sd
    cp = p_ref[5]
    return cp * (f_eff * _norm_cdf(cp * d1) - p_ref[4] * _norm_cdf(cp * d2))


def _rb_values_from_xi(p_ref, coef_ref, chol_ref, xi, *, n: int, antithetic: bool):
    """(n_groups, 1, P) per-path values from one standard-normal tile ξ
    (m_pad, P): the Volterra matmul, the left-point variance close and the
    conditional-BS value — the whole estimator, entirely in VMEM."""
    eta, dt = p_ref[0], p_ref[1]
    x = jnp.dot(chol_ref[...], xi, preferred_element_type=jnp.float32)
    dw0 = x[0:1]                      # ΔW_0 (1, P)
    c0 = coef_ref[0, 0]               # C_0 = ξ₀(0) (V_0 is deterministic)
    s0 = coef_ref[0, 1]               # √C_0
    if n > 1:
        dwr = x[1:n]                  # ΔW_1..ΔW_{n−1}
        z = x[n : 2 * n - 1]          # Z_{t_1}..Z_{t_{n−1}} (left points)
        cc = coef_ref[1:n, 0:1]       # C_k column
        sc = coef_ref[1:n, 1:2]       # √C_k column
        ep = jnp.exp(eta * z)
        sep = jnp.sqrt(ep)
        iv_p = dt * (c0 + jnp.sum(cc * ep, axis=0, keepdims=True))
        j_p = s0 * dw0 + jnp.sum(sc * sep * dwr, axis=0, keepdims=True)
    else:
        iv_p = dt * c0 * jnp.ones_like(dw0)
        j_p = s0 * dw0
    vals = [_rb_bs_close(p_ref, iv_p, j_p)]
    if antithetic:
        if n > 1:
            em = _rcp(ep)             # exp(−η·Z) — the mirror variance
            sem = _rcp(sep)
            iv_m = dt * (c0 + jnp.sum(cc * em, axis=0, keepdims=True))
            j_m = -(s0 * dw0) - jnp.sum(sc * sem * dwr, axis=0, keepdims=True)
        else:
            iv_m = iv_p
            j_m = -j_p
        vals.append(_rb_bs_close(p_ref, iv_m, j_m))
    return jnp.stack(vals)


def _prng_xi(m_pad: int):
    z1, z2 = _box_muller((m_pad // 2, _P))
    return jnp.concatenate([z1, z2], axis=0)


def _sobol_xi(sob_ref, idx, *, n: int, m_pad: int):
    """ξ rows 0..2n−1 from Sobol' dims 0..2n−1 at point-index tile ``idx``
    (1, P) — the SAME (point, dim) → normal map as the pure-JAX
    ``sobol_uniforms`` + ndtri path, so validation is bit-level."""
    masks = _sobol_masks(idx)
    us = _sobol_uniforms_tile(masks, sob_ref, tuple(range(2 * n)))
    rows = [_ndtri_approx(u) for u in us]
    if m_pad > 2 * n:
        rows.append(jnp.zeros((m_pad - 2 * n, _P), jnp.float32))
    return jnp.concatenate(rows, axis=0)


# ------------------------------------------------------------- values kernel


def _rb_values_kernel(p_ref, coef_ref, chol_ref, seed_ref, out_ref,
                      *, n: int, m_pad: int, antithetic: bool):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    out_ref[...] = _rb_values_from_xi(
        p_ref, coef_ref, chol_ref, _prng_xi(m_pad), n=n, antithetic=antithetic
    )


def _rb_values_kernel_qmc(p_ref, coef_ref, chol_ref, sob_ref, offset_ref, out_ref,
                          *, n: int, m_pad: int, antithetic: bool):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)
    idx = offset_ref[0] + pl.program_id(0) * jnp.int32(_P) + lane
    xi = _sobol_xi(sob_ref, idx, n=n, m_pad=m_pad)
    out_ref[...] = _rb_values_from_xi(
        p_ref, coef_ref, chol_ref, xi, n=n, antithetic=antithetic
    )


def _rb_inputs(chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho,
               *, n: int, m_pad: int):
    """(params SMEM vector, coef VMEM tile, padded Cholesky) — the three
    trace-time kernel inputs shared by the values and price variants."""
    chol_p = jnp.zeros((m_pad, m_pad), jnp.float32).at[: 2 * n, : 2 * n].set(
        jnp.asarray(chol, jnp.float32)
    )
    c32 = jnp.asarray(coefs, jnp.float32)
    n_pad = _pad_up(n, 8)
    coef_arr = (
        jnp.zeros((n_pad, 128), jnp.float32)
        .at[:n, 0].set(c32)
        .at[:n, 1].set(jnp.sqrt(c32))
    )
    params = _rb_params(eta, dt, f_base, log_f_over_k, strike, cp, rho)
    return params, coef_arr, chol_p


def _rb_in_specs(n_pad: int, m_pad: int, *, qmc: bool, dims: int):
    """BlockSpecs for (params, coefs, chol) + the stream inputs."""
    base = [
        pl.BlockSpec((_N_SCALARS,), lambda i: (jnp.int32(0),),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_pad, 128), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, m_pad), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
    ]
    if qmc:
        base += [
            pl.BlockSpec((dims, _SOBOL_BITS + 1),
                         lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
        ]
    else:
        base.append(
            pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM)
        )
    return base


@functools.partial(
    jax.jit, static_argnames=("n_paths", "steps", "antithetic", "qmc", "interpret")
)
def rbergomi_mixing_values(
    chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho,
    *, n_paths: int, steps: int, seed, antithetic: bool = False, device_id=0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Per-path UNDISCOUNTED conditional vanilla values ((n_groups, n_paths)
    fp32) via the fused kernel.  ``chol``: (2n, 2n) Volterra Cholesky factor
    (f64 factorization upstream; cast here), ``coefs``: (n,) variance
    coefficients C_k = ξ₀(t_k)·exp(−½η²t_k^{2H}) at the LEFT grid points.
    Under QMC ``device_id`` is unused — shard via disjoint ``point_offset``
    slices of the one seed-randomized sequence, as everywhere else."""
    n = steps
    m_pad = _pad_up(2 * n, 128)
    n_blocks = -(-n_paths // _P)
    padded = n_blocks * _P
    n_groups = 2 if antithetic else 1
    if qmc:
        start = point_offset if isinstance(point_offset, int) else 0
        if start + padded > 2**_SOBOL_BITS:
            raise ValueError(
                f"Sobol' period is 2^{_SOBOL_BITS} points; offset {start} + "
                f"{padded} paths would wrap"
            )
    params, coef_arr, chol_p = _rb_inputs(
        chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho,
        n=n, m_pad=m_pad,
    )
    out_specs = pl.BlockSpec(
        (n_groups, 1, _P),
        lambda i: (jnp.int32(0), i, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_groups, n_blocks, _P), jnp.float32)
    if qmc:
        table = _sobol_table(seed, 2 * n)
        kernel = functools.partial(
            _rb_values_kernel_qmc, n=n, m_pad=m_pad, antithetic=antithetic
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=_rb_in_specs(coef_arr.shape[0], m_pad, qmc=True, dims=2 * n),
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, table, jnp.asarray([point_offset], jnp.int32))
    else:
        seed_arr = jnp.stack(
            [jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)]
        )
        kernel = functools.partial(
            _rb_values_kernel, n=n, m_pad=m_pad, antithetic=antithetic
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=_rb_in_specs(coef_arr.shape[0], m_pad, qmc=False, dims=0),
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, seed_arr)
    return out.reshape(n_groups, padded)[:, :n_paths]


# -------------------------------------------------------------- price kernel


def _rb_price_kernel(p_ref, coef_ref, chol_ref, seed_ref, out_ref,
                     *, n: int, m_pad: int, n_batches: int):
    """Multi-batch antithetic pricing with on-chip accumulation — the
    dispatch-amortized serving configuration (mirrors heston_qe_kernel's
    _qe_mixing_price_kernel)."""
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))

    def one_batch(_, acc):
        vals = _rb_values_from_xi(
            p_ref, coef_ref, chol_ref, _prng_xi(m_pad), n=n, antithetic=True
        )
        return acc + vals[0, 0] + vals[1, 0]

    acc0 = jnp.zeros((1, _P), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def _rb_price_kernel_qmc(p_ref, coef_ref, chol_ref, sob_ref, offset_ref, out_ref,
                         *, n: int, m_pad: int, n_batches: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)
    base_idx = offset_ref[0] + pl.program_id(0) * jnp.int32(n_batches) * jnp.int32(_P)

    def one_batch(b, acc):
        idx = base_idx + b * jnp.int32(_P) + lane
        xi = _sobol_xi(sob_ref, idx, n=n, m_pad=m_pad)
        vals = _rb_values_from_xi(
            p_ref, coef_ref, chol_ref, xi, n=n, antithetic=True
        )
        return acc + vals[0, 0] + vals[1, 0]

    acc0 = jnp.zeros((1, _P), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "n_batches", "steps", "qmc", "interpret")
)
def rbergomi_mixing_vanilla_price(
    chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho, discount,
    *, n_blocks: int, n_batches: int, steps: int, seed, device_id=0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Discounted European vanilla price over n_blocks·n_batches·4096
    antithetic conditional-MC paths, ONE host dispatch, on-chip accumulation
    (2048 antithetic pairs per program-batch)."""
    n = steps
    m_pad = _pad_up(2 * n, 128)
    total_pairs = n_blocks * n_batches * _P
    if qmc:
        start = point_offset if isinstance(point_offset, int) else 0
        if start + total_pairs > 2**_SOBOL_BITS:
            raise ValueError(
                f"Sobol' period is 2^{_SOBOL_BITS} points; offset {start} + "
                f"{total_pairs} pairs would wrap"
            )
    params, coef_arr, chol_p = _rb_inputs(
        chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho,
        n=n, m_pad=m_pad,
    )
    out_specs = pl.BlockSpec(
        (1, 1, _P), lambda i: (i, jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_blocks, 1, _P), jnp.float32)
    if qmc:
        table = _sobol_table(seed, 2 * n)
        kernel = functools.partial(
            _rb_price_kernel_qmc, n=n, m_pad=m_pad, n_batches=n_batches
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=_rb_in_specs(coef_arr.shape[0], m_pad, qmc=True, dims=2 * n),
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, table, jnp.asarray([point_offset], jnp.int32))
    else:
        seed_arr = jnp.stack(
            [jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)]
        )
        kernel = functools.partial(
            _rb_price_kernel, n=n, m_pad=m_pad, n_batches=n_batches
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=_rb_in_specs(coef_arr.shape[0], m_pad, qmc=False, dims=0),
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, seed_arr)
    total_paths = 2 * total_pairs
    return discount * jnp.sum(sums.astype(jnp.float64)) / total_paths


# ------------------------------------------------------------------ adapter


def _rb_trace_inputs(prob, config, quad_nodes: int):
    """Trace-time (chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp,
    rho, discount, T) for the kernel from a PricingProblem — the f64
    covariance/Cholesky and the close constants, exactly the quantities the
    pure-JAX fp32 path computes before its bulk work."""
    from ..market.rate_curve import df_yf
    from ..methods.montecarlo import _sim_params
    from ..models.rough_bergomi import ForwardVarianceCurve, _pow, volterra_chol

    market, T, r0 = _sim_params(prob)
    n = config.steps
    chol = volterra_chol(market.hurst, T, n, quad_nodes=quad_nodes)
    t_left = (jnp.arange(n) / n) * T
    xi0 = market.xi0
    level = xi0(t_left) if isinstance(xi0, ForwardVarianceCurve) else xi0
    coefs = level * jnp.exp(-0.5 * market.eta**2 * _pow(t_left, 2.0 * market.hurst))
    f_base = market.spot * jnp.exp(r0 * T)
    strike = prob.payoff.strike
    log_f_over_k = jnp.log(f_base / strike)
    cp = prob.payoff.call_put()
    disc = df_yf(market.rate, T)
    return chol, coefs, market.eta, T / n, f_base, log_f_over_k, strike, cp, \
        market.rho, disc, T


def rbergomi_mixing_values_pallas(prob, config, strat, key=None, device_id=0,
                                  point_offset=0):
    """Adapter for MonteCarlo(RoughBergomiDynamics,
    RoughBergomiMixing(use_kernel=True)): per-path conditional values,
    falling back to the pure-JAX mixing estimator off-TPU (same seed → same
    QMC points).  An explicit ``key`` reseeds the kernel stream
    (ops/heston_kernel.py ``seed_from_key``); under QMC the seed is ALWAYS
    ``config.seed`` so every device randomizes the one shared sequence and
    slices it by ``point_offset`` (same contract as the Heston kernels)."""
    from ..methods.montecarlo import Antithetic, _rbergomi_mixing_values

    anti = isinstance(config.variance_reduction, Antithetic)
    if jax.default_backend() != "tpu":
        # forward the key untouched: key=None resolves to PRNGKey(config.seed)
        # inside the estimator, exactly like the use_kernel=False branch, so
        # the fallback is bit-identical to the pure-JAX strategy; sharded
        # callers always pass an explicit folded key (parallel/sharding.py)
        return _rbergomi_mixing_values(
            prob, config, key, point_offset=point_offset,
            quad_nodes=strat.quad_nodes, fp32=strat.fp32,
        )
    from ..models.rough_bergomi import ForwardVarianceCurve

    market = prob.market_inputs
    seed = config.seed if config.qmc else seed_from_key(config, key)
    if config.steps >= 2:
        # differentiable views: same primal kernel, plus a custom VJP backed
        # by the cotangent-weighted kernel replaying the identical stream —
        # jax.grad through the kernel-backed solve works, incl. BUCKETED
        # forward-variance vegas via the per-step VJP variant
        from ..methods.montecarlo import _sim_params

        _market, T, r0 = _sim_params(prob)
        common = dict(
            n_paths=config.trajectories, steps=config.steps, seed=seed,
            antithetic=anti, device_id=device_id, qmc=config.qmc,
            point_offset=point_offset, quad_nodes=strat.quad_nodes,
        )
        if isinstance(market.xi0, ForwardVarianceCurve):
            out = rbergomi_mixing_values_diff_curve(
                market.spot, jnp.asarray(market.xi0.xi),
                jnp.asarray(market.xi0.tenors), market.eta, market.hurst,
                market.rho, r0, T, prob.payoff.strike,
                prob.payoff.call_put(), **common,
            )
        else:
            out = rbergomi_mixing_values_diff(
                market.spot, market.xi0, market.eta, market.hurst,
                market.rho, r0, T, prob.payoff.strike,
                prob.payoff.call_put(), **common,
            )
        return out.astype(jnp.float64)
    (chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho, _disc,
     _T) = _rb_trace_inputs(prob, config, strat.quad_nodes)
    out = rbergomi_mixing_values(
        chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho,
        n_paths=config.trajectories, steps=config.steps,
        seed=seed,
        antithetic=anti, device_id=device_id, qmc=config.qmc,
        point_offset=point_offset,
    )
    return out.astype(jnp.float64)


# ---------------------------------------------------------------------------
# Fused price + greeks: forward-mode tangents INSIDE the kernel (the same
# recipe as ops/heston_qe_greeks_kernel.py, adapted to the Volterra scheme).
#
# The estimator's per-path value is closed-form Black-Scholes in (IV, J), so
# (spot, rho, rate) close analytically at the value stage and only the
# (xi0, eta, H) tangents touch the variance path:
#
#   P_k = C_k·exp(eta·Z_k),  IV = dt·SUM P_k,  J = SUM sqrt(P_k)·dW_k
#   d ln P_k/d xi0 = 1/xi0                    (flat forward variance)
#   d ln P_k/d eta = Z_k − eta·t_k^{2H}       (the `ae` coef column)
#   d ln P_k/d H   = −eta²·t_k^{2H}·ln t_k    (the `bh` column)
#                    + eta·Ż_k with (Ẋ = dL/dH @ ξ)  — ONE extra matmul
#
# so dIV = dt·SUM P_k·dlnP_k and dJ = SUM [½·dlnP_k·s_k·dW_k + s_k·dẆ_k].
# Antithetic mirrors are sign flips of (x, ẋ).  The H tangent factor dL/dH
# is computed ONCE at trace time by jax.jacfwd through the (smooth) Volterra
# covariance + Cholesky.  Scalar xi0 only (a ForwardVarianceCurve's bucketed
# vegas stay on the pure-JAX estimator, whose AD covers them).
# ---------------------------------------------------------------------------

_N_GREEK_ROWS = 6  # Y, chain_xi0, chain_eta, chain_H, w (=dY/dlogF), Y_rho

GREEK_ORDER_RB = ("spot", "xi0", "eta", "rho", "hurst", "rate")


def _rb_partials(p_ref, iv, j):
    """Value + value-stage partials — reuses the QE greek kernel's
    _cond_bs_partials through a param-dict view."""
    from .heston_qe_greeks_kernel import _cond_bs_partials

    c = dict(
        rho=p_ref[6], rho2_half=p_ref[7], rho_bar2=p_ref[8],
        f_base=p_ref[2], log_f_over_k=p_ref[3], strike=p_ref[4], cp=p_ref[5],
    )
    return _cond_bs_partials(iv, j, c)


def _rb_greek_sums(p_ref, coef_ref, chol_ref, cholh_ref, xi, *, n: int):
    """(6, P) per-tile sums over both antithetic groups:
    [Y, chain_xi0, chain_eta, chain_H, w, Y_rho]."""
    eta, dt = p_ref[0], p_ref[1]
    inv_xi0 = p_ref[9]
    x = jnp.dot(chol_ref[...], xi, preferred_element_type=jnp.float32)
    xd = jnp.dot(cholh_ref[...], xi, preferred_element_type=jnp.float32)
    c0 = coef_ref[0, 0]
    s0 = coef_ref[0, 1]
    cc = coef_ref[1:n, 0:1]
    sc = coef_ref[1:n, 1:2]
    ae = coef_ref[1:n, 2:3]
    bh = coef_ref[1:n, 3:4]

    ep = jnp.exp(eta * x[n : 2 * n - 1])
    sep = jnp.sqrt(ep)

    # the mirror group reuses the + group's exponentials through exact IEEE
    # identities (rcp + sign flips), so the Y row stays bit-identical to the
    # price kernel's accumulation (asserted in test_rbergomi_kernel.py)
    def group(sign, ex, sex):
        dw0 = sign * x[0:1]
        dwr = sign * x[1:n]
        z = sign * x[n : 2 * n - 1]
        dwd0 = sign * xd[0:1]
        dwdr = sign * xd[1:n]
        zd = sign * xd[n : 2 * n - 1]
        p = cc * ex
        s = sc * sex
        sdw = s * dwr
        iv = dt * (c0 + jnp.sum(p, axis=0, keepdims=True))
        j = s0 * dw0 + jnp.sum(sdw, axis=0, keepdims=True)
        a = z + ae               # d ln P_k / d eta   (a_0 = 0: no k=0 term)
        g = bh + eta * zd        # d ln P_k / d H     (C_0, Z_0 are H-free)
        div_eta = dt * jnp.sum(p * a, axis=0, keepdims=True)
        dj_eta = 0.5 * jnp.sum(a * sdw, axis=0, keepdims=True)
        div_h = dt * jnp.sum(p * g, axis=0, keepdims=True)
        dj_h = (0.5 * jnp.sum(g * sdw, axis=0, keepdims=True)
                + s0 * dwd0 + jnp.sum(s * dwdr, axis=0, keepdims=True))
        y, y_iv, y_j, y_rho, w = _rb_partials(p_ref, iv, j)
        return [
            y,
            (y_iv * iv + y_j * 0.5 * j) * inv_xi0,
            y_iv * div_eta + y_j * dj_eta,
            y_iv * div_h + y_j * dj_h,
            w,
            y_rho,
        ]

    gp = group(jnp.float32(1.0), ep, sep)
    gm = group(jnp.float32(-1.0), _rcp(ep), _rcp(sep))
    return jnp.concatenate([a_ + b_ for a_, b_ in zip(gp, gm)], axis=0)


def _rb_greeks_kernel(p_ref, coef_ref, chol_ref, cholh_ref, seed_ref, out_ref,
                      *, n: int, m_pad: int, n_batches: int):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))

    def one_batch(_, acc):
        return acc + _rb_greek_sums(
            p_ref, coef_ref, chol_ref, cholh_ref, _prng_xi(m_pad), n=n
        )

    acc0 = jnp.zeros((_N_GREEK_ROWS, _P), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def _rb_greeks_kernel_qmc(p_ref, coef_ref, chol_ref, cholh_ref, sob_ref,
                          offset_ref, out_ref, *, n: int, m_pad: int,
                          n_batches: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)
    base_idx = offset_ref[0] + pl.program_id(0) * jnp.int32(n_batches) * jnp.int32(_P)

    def one_batch(b, acc):
        idx = base_idx + b * jnp.int32(_P) + lane
        xi = _sobol_xi(sob_ref, idx, n=n, m_pad=m_pad)
        return acc + _rb_greek_sums(p_ref, coef_ref, chol_ref, cholh_ref, xi, n=n)

    acc0 = jnp.zeros((_N_GREEK_ROWS, _P), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "n_batches", "steps", "qmc", "interpret")
)
def rbergomi_mixing_price_and_greeks(
    chol, chol_h, coefs, coefs_h, xi0, eta, dt, spot, f_base, log_f_over_k,
    strike, cp, rho, discount, horizon,
    *, n_blocks: int, n_batches: int, steps: int, seed, device_id=0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Discounted price AND the 6-greek vector (GREEK_ORDER_RB: spot, xi0,
    eta, rho, hurst, flat rate) over n_blocks·n_batches·4096 antithetic
    paths in ONE fused dispatch.  ``chol_h`` = d(chol)/dH and ``coefs_h`` =
    (ae, bh) per-step log-derivative columns, both trace-time inputs
    (:func:`_rb_greek_trace_inputs`).  The draw stream matches
    :func:`rbergomi_mixing_vanilla_price`, so the price agrees with the
    price-only kernel bit-for-bit."""
    n = steps
    if n < 2:
        raise ValueError("the greeks kernel needs steps >= 2")
    m_pad = _pad_up(2 * n, 128)
    total_pairs = n_blocks * n_batches * _P
    if qmc:
        start = point_offset if isinstance(point_offset, int) else 0
        if start + total_pairs > 2**_SOBOL_BITS:
            raise ValueError(
                f"Sobol' period is 2^{_SOBOL_BITS} points; offset {start} + "
                f"{total_pairs} pairs would wrap"
            )
    params, coef_arr, chol_p = _rb_inputs(
        chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho,
        n=n, m_pad=m_pad,
    )
    params = jnp.concatenate([params, jnp.stack([
        jnp.asarray(1.0 / xi0, jnp.float32)])])
    coef_arr = (
        coef_arr
        .at[:n, 2].set(jnp.asarray(coefs_h[0], jnp.float32))
        .at[:n, 3].set(jnp.asarray(coefs_h[1], jnp.float32))
    )
    cholh_p = jnp.zeros((m_pad, m_pad), jnp.float32).at[: 2 * n, : 2 * n].set(
        jnp.asarray(chol_h, jnp.float32)
    )
    n_pad = coef_arr.shape[0]
    base_specs = [
        pl.BlockSpec((_N_SCALARS + 1,), lambda i: (jnp.int32(0),),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_pad, 128), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, m_pad), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, m_pad), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec(
        (1, _N_GREEK_ROWS, _P), lambda i: (i, jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_blocks, _N_GREEK_ROWS, _P), jnp.float32)
    if qmc:
        table = _sobol_table(seed, 2 * n)
        kernel = functools.partial(
            _rb_greeks_kernel_qmc, n=n, m_pad=m_pad, n_batches=n_batches
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=base_specs + [
                pl.BlockSpec((2 * n, _SOBOL_BITS + 1),
                             lambda i: (jnp.int32(0), jnp.int32(0)),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda i: (jnp.int32(0),),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, cholh_p, table,
          jnp.asarray([point_offset], jnp.int32))
    else:
        seed_arr = jnp.stack(
            [jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)]
        )
        kernel = functools.partial(
            _rb_greeks_kernel, n=n, m_pad=m_pad, n_batches=n_batches
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=base_specs + [
                pl.BlockSpec((2,), lambda i: (jnp.int32(0),),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, cholh_p, seed_arr)
    total_paths = 2 * total_pairs
    tot = jnp.sum(sums.astype(jnp.float64), axis=(0, 2)) / total_paths  # (6,)
    price = discount * tot[0]
    grad = jnp.stack([
        discount * tot[4] / spot,                 # spot (w = dY/dlogF)
        discount * tot[1],                        # xi0
        discount * tot[2],                        # eta
        discount * tot[5],                        # rho
        discount * tot[3],                        # hurst
        discount * tot[4] * horizon - horizon * price,  # flat rate
    ])
    return price, grad


def _rb_greek_trace_inputs(prob, config, quad_nodes: int):
    """Trace-time inputs for the greeks kernel: the price inputs plus
    dL/dH (one jacfwd through the smooth Volterra covariance + Cholesky)
    and the (ae, bh) per-step log-derivative columns.  Scalar xi0 only."""
    from ..models.rough_bergomi import ForwardVarianceCurve, volterra_chol

    market = prob.market_inputs
    if isinstance(market.xi0, ForwardVarianceCurve):
        raise TypeError(
            "the rough-Bergomi greeks kernel covers scalar xi0; bucketed "
            "ForwardVarianceCurve vegas come from jax.grad of the pure-JAX "
            "estimator"
        )
    (chol, coefs, eta, dtau, f_base, log_f_over_k, strike, cp, rho, disc,
     T) = _rb_trace_inputs(prob, config, quad_nodes)
    n = config.steps
    chol_h = jax.jacfwd(
        lambda h: volterra_chol(h, T, n, quad_nodes=quad_nodes)
    )(market.hurst)
    t_left = (jnp.arange(n) / n) * T
    t2h = jnp.where(t_left > 0.0,
                    jnp.where(t_left > 0.0, t_left, 1.0) ** (2.0 * market.hurst),
                    0.0)
    log_t = jnp.log(jnp.where(t_left > 0.0, t_left, 1.0))
    ae = -eta * t2h                              # d ln C_k/d eta (E part in-kernel)
    bh = -(eta**2) * t2h * log_t                 # d ln C_k / d H
    return (chol, chol_h, coefs, (ae, bh), market.xi0, eta, dtau, market.spot,
            f_base, log_f_over_k, strike, cp, rho, disc, T)


def rbergomi_kernel_price_and_greeks(prob, config, *, n_blocks: int,
                                     n_batches: int, quad_nodes: int = 64,
                                     seed=None, device_id=0, point_offset=0,
                                     interpret: bool = False):
    """Problem-level adapter: (discounted price, {greek: value}) for a
    scalar-strike vanilla under rough Bergomi from the fused price+greeks
    kernel (keys = GREEK_ORDER_RB).  ``config.trajectories`` is ignored —
    the path count is n_blocks·n_batches·4096 (antithetic built in)."""
    from ..core.payoffs import VanillaOption

    if not isinstance(prob.payoff, VanillaOption) or (
        jnp.ndim(prob.payoff.strike) > 0
    ):
        raise TypeError(
            "the rough-Bergomi greeks kernel closes scalar-strike vanillas "
            "only"
        )
    ins = _rb_greek_trace_inputs(prob, config, quad_nodes)
    price, grad = rbergomi_mixing_price_and_greeks(
        *ins, n_blocks=n_blocks, n_batches=n_batches, steps=config.steps,
        seed=config.seed if seed is None else seed, device_id=device_id,
        qmc=config.qmc, point_offset=point_offset, interpret=interpret,
    )
    return price, dict(zip(GREEK_ORDER_RB, grad))


# ---------------------------------------------------------------------------
# Cotangent-weighted VJP: the custom-vjp backward for the per-path values
# kernel (same recipe as ops/heston_qe_greeks_kernel.py::_mixing_values_vjp).
# Replays the values kernel's exact stream (PRNG or Sobol'); each path's
# 8-direction tangent row is contracted against the incoming per-path
# cotangent, so ``jax.grad`` works through ANY downstream reduction of
# rbergomi_mixing_values — the kernel-backed ``solve`` included.
#
# The maturity (T) chain costs nothing beyond the eta chain: the Volterra
# covariance is self-similar (Σ(T) = D·Σ(1)·D with D = diag(√T on the ΔW
# rows, T^H on the Z rows)), so L(T) = D·L(1) and d(ΔW_k)/dT = ΔW_k/(2T),
# dZ_k/dT = H·Z_k/T.  With C_k = ξ₀·exp(−½η²t_k^{2H}) and t_k ∝ T this
# collapses to d ln P_k/dT = H·η·a_k/T where a_k = Z_k − η·t_k^{2H} is
# EXACTLY the eta-chain column, giving
#     dIV/dT = (IV + H·η·dIV/dη)/T,   dJ/dT = (H·η·dJ/dη + J/2)/T.
# ---------------------------------------------------------------------------

_N_W_ROWS = 7  # chain_xi0, chain_eta, chain_H, chain_T, w, Y_rho, Y_K


def _rb_weighted_sums(p_ref, coef_ref, chol_ref, cholh_ref, ct_ref, xi,
                      *, n: int, antithetic: bool, per_step: bool = False):
    """(7, P) cotangent-weighted tangent rows for one ξ tile — the
    group-separated twin of _rb_greek_sums (each antithetic group carries
    its own cotangent row instead of being summed).

    ``per_step=True`` replaces the single chain_xi0 row with n per-step
    rows ∂(ct·value)/∂ln C_k (shape (n + 6, P)) — ANY trace-time
    parameterization of the variance-coefficient levels (bucketed
    forward-variance curves included) chains through those at the trace
    level, since ln P_k = ln C_k + η·Z_k."""
    eta, dt = p_ref[0], p_ref[1]
    inv_xi0 = p_ref[9]
    h_eta = p_ref[10]    # hurst · eta
    inv_t = p_ref[11]    # 1 / T
    x = jnp.dot(chol_ref[...], xi, preferred_element_type=jnp.float32)
    xd = jnp.dot(cholh_ref[...], xi, preferred_element_type=jnp.float32)
    c0 = coef_ref[0, 0]
    s0 = coef_ref[0, 1]
    cc = coef_ref[1:n, 0:1]
    sc = coef_ref[1:n, 1:2]
    ae = coef_ref[1:n, 2:3]
    bh = coef_ref[1:n, 3:4]
    ep = jnp.exp(eta * x[n : 2 * n - 1])
    sep = jnp.sqrt(ep)

    def group(sign, ex, sex, ct):
        dw0 = sign * x[0:1]
        dwr = sign * x[1:n]
        z = sign * x[n : 2 * n - 1]
        dwd0 = sign * xd[0:1]
        dwdr = sign * xd[1:n]
        zd = sign * xd[n : 2 * n - 1]
        p = cc * ex
        s = sc * sex
        sdw = s * dwr
        iv = dt * (c0 + jnp.sum(p, axis=0, keepdims=True))
        j = s0 * dw0 + jnp.sum(sdw, axis=0, keepdims=True)
        a = z + ae
        g = bh + eta * zd
        div_eta = dt * jnp.sum(p * a, axis=0, keepdims=True)
        dj_eta = 0.5 * jnp.sum(a * sdw, axis=0, keepdims=True)
        div_h = dt * jnp.sum(p * g, axis=0, keepdims=True)
        dj_h = (0.5 * jnp.sum(g * sdw, axis=0, keepdims=True)
                + s0 * dwd0 + jnp.sum(s * dwdr, axis=0, keepdims=True))
        div_t = inv_t * (iv + h_eta * div_eta)
        dj_t = inv_t * (h_eta * dj_eta + 0.5 * j)
        y, y_iv, y_j, y_rho, w = _rb_partials(p_ref, iv, j)
        # strike partial at fixed (IV, J): the exact BS identity −cp·Φ(cp·d2)
        rho, rho2_half, rho_bar2 = p_ref[6], p_ref[7], p_ref[8]
        e_arg = rho * j - rho2_half * iv
        var = jnp.maximum(rho_bar2 * iv, 1e-10)
        sd = jnp.sqrt(var)
        d2 = (p_ref[3] + e_arg + 0.5 * var) * _rcp(sd) - sd
        y_k = -p_ref[5] * _norm_cdf(p_ref[5] * d2)
        if per_step:
            xi_rows = [
                ct * (y_iv * dt * c0 + y_j * 0.5 * s0 * dw0),  # ∂/∂lnC_0
                ct * (y_iv * dt * p + y_j * 0.5 * sdw),        # ∂/∂lnC_{1..n−1}
            ]
        else:
            xi_rows = [ct * ((y_iv * iv + y_j * 0.5 * j) * inv_xi0)]
        return xi_rows + [
            ct * (y_iv * div_eta + y_j * dj_eta),
            ct * (y_iv * div_h + y_j * dj_h),
            ct * (y_iv * div_t + y_j * dj_t),
            ct * w,
            ct * y_rho,
            ct * y_k,
        ]

    rows = group(jnp.float32(1.0), ep, sep, ct_ref[0])
    if antithetic:
        gm = group(jnp.float32(-1.0), _rcp(ep), _rcp(sep), ct_ref[1])
        rows = [a_ + b_ for a_, b_ in zip(rows, gm)]
    return jnp.concatenate(rows, axis=0)


def _rb_weighted_kernel(p_ref, coef_ref, chol_ref, cholh_ref, seed_ref, ct_ref,
                        out_ref, *, n: int, m_pad: int, antithetic: bool,
                        per_step: bool = False):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    out_ref[0] = _rb_weighted_sums(
        p_ref, coef_ref, chol_ref, cholh_ref, ct_ref, _prng_xi(m_pad),
        n=n, antithetic=antithetic, per_step=per_step,
    )


def _rb_weighted_kernel_qmc(p_ref, coef_ref, chol_ref, cholh_ref, sob_ref,
                            offset_ref, ct_ref, out_ref, *, n: int, m_pad: int,
                            antithetic: bool, per_step: bool = False):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)
    idx = offset_ref[0] + pl.program_id(0) * jnp.int32(_P) + lane
    xi = _sobol_xi(sob_ref, idx, n=n, m_pad=m_pad)
    out_ref[0] = _rb_weighted_sums(
        p_ref, coef_ref, chol_ref, cholh_ref, ct_ref, xi,
        n=n, antithetic=antithetic, per_step=per_step,
    )


def _rb_diff_coeffs(xi0, eta, hurst, T, steps: int, quad_nodes: int):
    """Trace-time (chol, chol_h, coefs, ae, bh) shared by the diff primal
    and its weighted backward — the same quantities _rb_greek_trace_inputs
    derives from a problem, as functions of the raw scalars."""
    from ..models.rough_bergomi import _pow, volterra_chol

    n = steps
    chol = volterra_chol(hurst, T, n, quad_nodes=quad_nodes)
    chol_h = jax.jacfwd(
        lambda h: volterra_chol(h, T, n, quad_nodes=quad_nodes)
    )(hurst)
    t_left = (jnp.arange(n) / n) * T
    t2h = jnp.where(t_left > 0.0,
                    _pow(jnp.where(t_left > 0.0, t_left, 1.0), 2.0 * hurst),
                    0.0)
    log_t = jnp.log(jnp.where(t_left > 0.0, t_left, 1.0))
    coefs = xi0 * jnp.exp(-0.5 * eta**2 * t2h)
    ae = -eta * t2h
    bh = -(eta**2) * t2h * log_t
    return chol, chol_h, coefs, ae, bh


@functools.partial(
    jax.jit,
    static_argnames=("n_paths", "steps", "antithetic", "qmc", "quad_nodes",
                     "interpret"),
)
def _rb_values_vjp(
    spot, xi0, eta, hurst, rho, r0, T, strike, cp, ct,
    *, n_paths: int, steps: int, seed, antithetic: bool, device_id=0,
    qmc: bool = False, point_offset: int = 0, quad_nodes: int = 64,
    interpret: bool = False,
):
    """Gradients of sum(ct · values) w.r.t. the 8 differentiable scalars of
    the rough-Bergomi values kernel — (spot, xi0, eta, hurst, rho, r0, T,
    strike) — from ONE weighted kernel dispatch replaying the identical
    PRNG/Sobol' stream."""
    n = steps
    if n < 2:
        raise ValueError("the weighted VJP kernel needs steps >= 2")
    m_pad = _pad_up(2 * n, 128)
    n_blocks = -(-n_paths // _P)
    padded = n_blocks * _P
    n_groups = 2 if antithetic else 1
    ct_pad = jnp.zeros((n_groups, padded), jnp.float32)
    ct_pad = ct_pad.at[:, :n_paths].set(ct.astype(jnp.float32))
    ct_pad = ct_pad.reshape(n_groups, n_blocks, _P)

    chol, chol_h, coefs, ae, bh = _rb_diff_coeffs(
        xi0, eta, hurst, T, steps, quad_nodes
    )
    dt = T / n
    f_base = spot * jnp.exp(r0 * T)
    log_f_over_k = jnp.log(f_base / strike)
    params, coef_arr, chol_p = _rb_inputs(
        chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho,
        n=n, m_pad=m_pad,
    )
    params = jnp.concatenate([params, jnp.stack([
        jnp.asarray(1.0 / xi0, jnp.float32),
        jnp.asarray(hurst * eta, jnp.float32),
        jnp.asarray(1.0 / T, jnp.float32),
    ])])
    coef_arr = (
        coef_arr
        .at[:n, 2].set(jnp.asarray(ae, jnp.float32))
        .at[:n, 3].set(jnp.asarray(bh, jnp.float32))
    )
    cholh_p = jnp.zeros((m_pad, m_pad), jnp.float32).at[: 2 * n, : 2 * n].set(
        jnp.asarray(chol_h, jnp.float32)
    )
    n_pad = coef_arr.shape[0]
    base_specs = [
        pl.BlockSpec((_N_SCALARS + 3,), lambda i: (jnp.int32(0),),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_pad, 128), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, m_pad), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, m_pad), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
    ]
    ct_spec = pl.BlockSpec(
        (n_groups, 1, _P), lambda i: (jnp.int32(0), i, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_specs = pl.BlockSpec(
        (1, _N_W_ROWS, _P), lambda i: (i, jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_blocks, _N_W_ROWS, _P), jnp.float32)
    if qmc:
        table = _sobol_table(seed, 2 * n)
        kernel = functools.partial(
            _rb_weighted_kernel_qmc, n=n, m_pad=m_pad, antithetic=antithetic
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=base_specs + [
                pl.BlockSpec((2 * n, _SOBOL_BITS + 1),
                             lambda i: (jnp.int32(0), jnp.int32(0)),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda i: (jnp.int32(0),),
                             memory_space=pltpu.SMEM),
                ct_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, cholh_p, table,
          jnp.asarray([point_offset], jnp.int32), ct_pad)
    else:
        seed_arr = jnp.stack(
            [jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)]
        )
        kernel = functools.partial(
            _rb_weighted_kernel, n=n, m_pad=m_pad, antithetic=antithetic
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=base_specs + [
                pl.BlockSpec((2,), lambda i: (jnp.int32(0),),
                             memory_space=pltpu.SMEM),
                ct_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, cholh_p, seed_arr, ct_pad)

    tot = jnp.sum(sums.astype(jnp.float64), axis=(0, 2))  # (7,)
    ch_xi0, ch_eta, ch_h, ch_t, w_sum, rho_sum, k_sum = tuple(tot)
    return (
        w_sum / spot,          # spot  (w = dY/dlogF, logF = logS0 + r0·T)
        ch_xi0,                # xi0
        ch_eta,                # eta
        ch_h,                  # hurst
        rho_sum,               # rho
        w_sum * T,             # r0    (values are undiscounted)
        ch_t + w_sum * r0,     # T     (variance-path chain + the f_base term)
        k_sum,                 # strike
    )


def rbergomi_mixing_values_diff(
    spot, xi0, eta, hurst, rho, r0, T, strike, cp,
    *, n_paths: int, steps: int, seed, antithetic: bool = False, device_id=0,
    qmc: bool = False, point_offset: int = 0, quad_nodes: int = 64,
    interpret: bool = False,
):
    """Differentiable view of the values kernel: identical primal to
    :func:`rbergomi_mixing_values` (the Cholesky/coefs are derived from the
    raw scalars inside), with a custom VJP that runs ONE cotangent-weighted
    kernel replaying the same stream — so ``jax.grad`` through the
    kernel-backed ``solve`` (any reduction of the per-path values) works at
    kernel speed.  All 8 leading scalars are differentiable, including the
    maturity ``T`` (theta) and ``strike``.  Scalar ``xi0`` only — bucketed
    ForwardVarianceCurve vegas stay on the pure-JAX estimator."""
    from ..models.rough_bergomi import _pow, volterra_chol

    if steps < 2:
        raise ValueError("the differentiable values kernel needs steps >= 2")

    # seed/cp/device_id/qmc/point_offset are never differentiated — close
    # over them so the custom_vjp's arguments are the 8 differentiable scalars
    @jax.custom_vjp
    def values(spot, xi0, eta, hurst, rho, r0, T, strike):
        chol = volterra_chol(hurst, T, steps, quad_nodes=quad_nodes)
        t_left = (jnp.arange(steps) / steps) * T
        coefs = xi0 * jnp.exp(-0.5 * eta**2 * _pow(t_left, 2.0 * hurst))
        f_base = spot * jnp.exp(r0 * T)
        return rbergomi_mixing_values(
            chol, coefs, eta, T / steps, f_base, jnp.log(f_base / strike),
            strike, cp, rho, n_paths=n_paths, steps=steps, seed=seed,
            antithetic=antithetic, device_id=device_id, qmc=qmc,
            point_offset=point_offset, interpret=interpret,
        )

    def fwd(spot, xi0, eta, hurst, rho, r0, T, strike):
        out = values(spot, xi0, eta, hurst, rho, r0, T, strike)
        return out, (spot, xi0, eta, hurst, rho, r0, T, strike)

    def bwd(res, ct):
        spot, xi0, eta, hurst, rho, r0, T, strike = res
        return _rb_values_vjp(
            spot, xi0, eta, hurst, rho, r0, T, strike, cp, ct,
            n_paths=n_paths, steps=steps, seed=seed, antithetic=antithetic,
            device_id=device_id, qmc=qmc, point_offset=point_offset,
            quad_nodes=quad_nodes, interpret=interpret,
        )

    values.defvjp(fwd, bwd)
    return values(spot, xi0, eta, hurst, rho, r0, T, strike)


def _rb_curve_coefs(xi, tenors, eta, hurst, T, steps: int):
    """Trace-time variance coefficients under a piecewise-linear forward
    variance curve: C_k = ξ₀(t_k)·exp(−½η²t_k^{2H}) at the left grid points
    (the curve level replaces the flat xi0 of _rb_diff_coeffs)."""
    from ..models.rough_bergomi import _pow

    n = steps
    t_left = (jnp.arange(n) / n) * T
    t2h = _pow(t_left, 2.0 * hurst)
    log_t = jnp.log(jnp.where(t_left > 0.0, t_left, 1.0))
    level = jnp.interp(t_left, tenors, xi)
    coefs = level * jnp.exp(-0.5 * eta**2 * t2h)
    ae = -eta * t2h
    bh = -(eta**2) * t2h * log_t
    return coefs, ae, bh


@functools.partial(
    jax.jit,
    static_argnames=("n_paths", "steps", "antithetic", "qmc", "quad_nodes",
                     "interpret"),
)
def _rb_values_vjp_curve(
    spot, xi, tenors, eta, hurst, rho, r0, T, strike, cp, ct,
    *, n_paths: int, steps: int, seed, antithetic: bool, device_id=0,
    qmc: bool = False, point_offset: int = 0, quad_nodes: int = 64,
    interpret: bool = False,
):
    """Gradients of sum(ct · values) under a bucketed forward-variance curve:
    the per-step kernel rows give ∂/∂ln C_k, and every curve chain (the
    bucket vegas ∂/∂ξᵢ, the tenor sensitivities, and the curve part of the
    maturity chain from t_k = (k/n)·T sliding along the spine) assembles at
    the trace level by jax.vjp through the piecewise-linear interp."""
    from ..models.rough_bergomi import volterra_chol

    n = steps
    if n < 2:
        raise ValueError("the weighted VJP kernel needs steps >= 2")
    m_pad = _pad_up(2 * n, 128)
    n_blocks = -(-n_paths // _P)
    padded = n_blocks * _P
    n_groups = 2 if antithetic else 1
    ct_pad = jnp.zeros((n_groups, padded), jnp.float32)
    ct_pad = ct_pad.at[:, :n_paths].set(ct.astype(jnp.float32))
    ct_pad = ct_pad.reshape(n_groups, n_blocks, _P)

    chol = volterra_chol(hurst, T, n, quad_nodes=quad_nodes)
    chol_h = jax.jacfwd(
        lambda h: volterra_chol(h, T, n, quad_nodes=quad_nodes)
    )(hurst)
    coefs, ae, bh = _rb_curve_coefs(xi, tenors, eta, hurst, T, steps)
    dt = T / n
    f_base = spot * jnp.exp(r0 * T)
    log_f_over_k = jnp.log(f_base / strike)
    params, coef_arr, chol_p = _rb_inputs(
        chol, coefs, eta, dt, f_base, log_f_over_k, strike, cp, rho,
        n=n, m_pad=m_pad,
    )
    params = jnp.concatenate([params, jnp.stack([
        jnp.asarray(0.0, jnp.float32),  # inv_xi0 slot, unused in per-step mode
        jnp.asarray(hurst * eta, jnp.float32),
        jnp.asarray(1.0 / T, jnp.float32),
    ])])
    coef_arr = (
        coef_arr
        .at[:n, 2].set(jnp.asarray(ae, jnp.float32))
        .at[:n, 3].set(jnp.asarray(bh, jnp.float32))
    )
    cholh_p = jnp.zeros((m_pad, m_pad), jnp.float32).at[: 2 * n, : 2 * n].set(
        jnp.asarray(chol_h, jnp.float32)
    )
    n_rows = n + _N_W_ROWS - 1
    n_pad = coef_arr.shape[0]
    base_specs = [
        pl.BlockSpec((_N_SCALARS + 3,), lambda i: (jnp.int32(0),),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_pad, 128), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, m_pad), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, m_pad), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
    ]
    ct_spec = pl.BlockSpec(
        (n_groups, 1, _P), lambda i: (jnp.int32(0), i, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_specs = pl.BlockSpec(
        (1, n_rows, _P), lambda i: (i, jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_blocks, n_rows, _P), jnp.float32)
    if qmc:
        table = _sobol_table(seed, 2 * n)
        kernel = functools.partial(
            _rb_weighted_kernel_qmc, n=n, m_pad=m_pad, antithetic=antithetic,
            per_step=True,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=base_specs + [
                pl.BlockSpec((2 * n, _SOBOL_BITS + 1),
                             lambda i: (jnp.int32(0), jnp.int32(0)),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda i: (jnp.int32(0),),
                             memory_space=pltpu.SMEM),
                ct_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, cholh_p, table,
          jnp.asarray([point_offset], jnp.int32), ct_pad)
    else:
        seed_arr = jnp.stack(
            [jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)]
        )
        kernel = functools.partial(
            _rb_weighted_kernel, n=n, m_pad=m_pad, antithetic=antithetic,
            per_step=True,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=base_specs + [
                pl.BlockSpec((2,), lambda i: (jnp.int32(0),),
                             memory_space=pltpu.SMEM),
                ct_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coef_arr, chol_p, cholh_p, seed_arr, ct_pad)

    tot = jnp.sum(sums.astype(jnp.float64), axis=(0, 2))  # (n + 6,)
    R = tot[:n]  # ∂(ct·values)/∂ln C_k
    ch_eta, ch_h, ch_t, w_sum, rho_sum, k_sum = tuple(tot[n:])
    t_left = (jnp.arange(n) / n) * T
    # bucket vegas + tenor cotangents: chain R through ln ξ₀(t_k)
    _lvl, pull = jax.vjp(
        lambda xi_, ten_: jnp.log(jnp.interp(t_left, ten_, xi_)), xi, tenors
    )
    g_xi, g_tenors = pull(R)
    # curve part of the maturity chain: t_k = (k/n)·T slides along the spine
    _lvl_t, pull_t = jax.vjp(
        lambda T_: jnp.log(jnp.interp((jnp.arange(n) / n) * T_, tenors, xi)), T
    )
    (g_t_curve,) = pull_t(R)
    return (
        w_sum / spot,                      # spot
        g_xi,                              # xi buckets
        g_tenors,                          # tenors
        ch_eta,                            # eta
        ch_h,                              # hurst
        rho_sum,                           # rho
        w_sum * T,                         # r0
        ch_t + w_sum * r0 + g_t_curve,     # T
        k_sum,                             # strike
    )


def rbergomi_mixing_values_diff_curve(
    spot, xi, tenors, eta, hurst, rho, r0, T, strike, cp,
    *, n_paths: int, steps: int, seed, antithetic: bool = False, device_id=0,
    qmc: bool = False, point_offset: int = 0, quad_nodes: int = 64,
    interpret: bool = False,
):
    """Differentiable view of the values kernel under a bucketed
    (piecewise-linear) forward-variance curve ξ₀ — the ForwardVarianceCurve
    twin of :func:`rbergomi_mixing_values_diff`.  ``jax.grad`` of any
    reduction returns BUCKETED VEGAS ∂/∂ξᵢ (one per spine point) alongside
    the other scalars, at kernel speed: the backward is one per-step
    weighted kernel dispatch, with the curve chains assembled at the trace
    level."""
    from ..models.rough_bergomi import volterra_chol

    if steps < 2:
        raise ValueError("the differentiable values kernel needs steps >= 2")

    @jax.custom_vjp
    def values(spot, xi, tenors, eta, hurst, rho, r0, T, strike):
        chol = volterra_chol(hurst, T, steps, quad_nodes=quad_nodes)
        coefs, _ae, _bh = _rb_curve_coefs(xi, tenors, eta, hurst, T, steps)
        f_base = spot * jnp.exp(r0 * T)
        return rbergomi_mixing_values(
            chol, coefs, eta, T / steps, f_base, jnp.log(f_base / strike),
            strike, cp, rho, n_paths=n_paths, steps=steps, seed=seed,
            antithetic=antithetic, device_id=device_id, qmc=qmc,
            point_offset=point_offset, interpret=interpret,
        )

    def fwd(spot, xi, tenors, eta, hurst, rho, r0, T, strike):
        out = values(spot, xi, tenors, eta, hurst, rho, r0, T, strike)
        return out, (spot, xi, tenors, eta, hurst, rho, r0, T, strike)

    def bwd(res, ct):
        spot, xi, tenors, eta, hurst, rho, r0, T, strike = res
        return _rb_values_vjp_curve(
            spot, xi, tenors, eta, hurst, rho, r0, T, strike, cp, ct,
            n_paths=n_paths, steps=steps, seed=seed, antithetic=antithetic,
            device_id=device_id, qmc=qmc, point_offset=point_offset,
            quad_nodes=quad_nodes, interpret=interpret,
        )

    values.defvjp(fwd, bwd)
    return values(spot, xi, tenors, eta, hurst, rho, r0, T, strike)


# ---------------------------------------------------------------------------
# Smile kernel: the conditional close is closed-form in the strike, so ONE
# V-path simulation prices a whole strike grid — the instrument-parallel
# idiom of the Heston surface kernel (ops/heston_qe_kernel.py) applied to
# rough Bergomi, where a calibration smile is otherwise one dispatch per
# strike.  The draws + Volterra matmul (the dominant cost) are shared; only
# the tiny value stage runs per strike.
# ---------------------------------------------------------------------------


def _rb_smile_kernel(p_ref, ks_ref, coef_ref, chol_ref, seed_ref, out_ref,
                     *, n: int, m_pad: int, n_batches: int, n_strikes: int):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))

    def one_batch(_, acc):
        return acc + _rb_smile_sums(
            p_ref, ks_ref, coef_ref, chol_ref, _prng_xi(m_pad),
            n=n, n_strikes=n_strikes,
        )

    acc0 = jnp.zeros((n_strikes, _P), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def _rb_smile_kernel_qmc(p_ref, ks_ref, coef_ref, chol_ref, sob_ref, offset_ref,
                         out_ref, *, n: int, m_pad: int, n_batches: int,
                         n_strikes: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)
    base_idx = offset_ref[0] + pl.program_id(0) * jnp.int32(n_batches) * jnp.int32(_P)

    def one_batch(b, acc):
        idx = base_idx + b * jnp.int32(_P) + lane
        xi = _sobol_xi(sob_ref, idx, n=n, m_pad=m_pad)
        return acc + _rb_smile_sums(
            p_ref, ks_ref, coef_ref, chol_ref, xi, n=n, n_strikes=n_strikes
        )

    acc0 = jnp.zeros((n_strikes, _P), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_batches), one_batch, acc0)


def _rb_smile_sums(p_ref, ks_ref, coef_ref, chol_ref, xi, *, n: int,
                   n_strikes: int):
    """(n_strikes, P) antithetic-summed per-path values: one (IV, J) carry
    pair closes EVERY strike.  Per strike the close recomputes only
    (d1, d2, two Φ's) — the mixing factors, exp(e_arg) and the variance
    terms are shared."""
    eta, dt = p_ref[0], p_ref[1]
    x = jnp.dot(chol_ref[...], xi, preferred_element_type=jnp.float32)
    dw0 = x[0:1]
    c0 = coef_ref[0, 0]
    s0 = coef_ref[0, 1]
    dwr = x[1:n]
    zp = x[n : 2 * n - 1]
    cc = coef_ref[1:n, 0:1]
    sc = coef_ref[1:n, 1:2]
    ep = jnp.exp(eta * zp)
    sep = jnp.sqrt(ep)

    def carry(ex, sex, sign):
        p = cc * ex
        iv = dt * (c0 + jnp.sum(p, axis=0, keepdims=True))
        j = sign * (s0 * dw0) + jnp.sum(sc * sex * (sign * dwr),
                                        axis=0, keepdims=True)
        return iv, j

    pairs = [carry(ep, sep, jnp.float32(1.0)),
             carry(_rcp(ep), _rcp(sep), jnp.float32(-1.0))]
    rho, rho2_half, rho_bar2 = p_ref[6], p_ref[7], p_ref[8]
    cp = p_ref[5]
    rows = []
    shared = []
    for iv, j in pairs:
        e_arg = rho * j - rho2_half * iv
        f_eff = p_ref[2] * jnp.exp(e_arg)
        var = jnp.maximum(rho_bar2 * iv, 1e-10)
        sd = jnp.sqrt(var)
        inv_sd = _rcp(sd)
        base_d1 = (e_arg + 0.5 * var) * inv_sd  # + log(f_base/K)·inv_sd per K
        shared.append((f_eff, sd, inv_sd, base_d1))
    for k in range(n_strikes):
        log_f_over_k = ks_ref[2 * k]
        strike = ks_ref[2 * k + 1]
        acc = None
        for f_eff, sd, inv_sd, base_d1 in shared:
            d1 = base_d1 + log_f_over_k * inv_sd
            d2 = d1 - sd
            y = cp * (f_eff * _norm_cdf(cp * d1) - strike * _norm_cdf(cp * d2))
            acc = y if acc is None else acc + y
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


@functools.partial(
    jax.jit, static_argnames=("n_blocks", "n_batches", "steps", "qmc", "interpret")
)
def rbergomi_mixing_smile_price(
    chol, coefs, eta, dt, f_base, strikes, cp, rho, discount,
    *, n_blocks: int, n_batches: int, steps: int, seed, device_id=0,
    qmc: bool = False, point_offset: int = 0, interpret: bool = False,
):
    """Discounted European vanilla prices for a WHOLE strike grid (m,) from
    one fused dispatch over n_blocks·n_batches·4096 antithetic paths — every
    strike shares the same V-path simulation (the variance-coupled smile
    idiom: strike-wise prices are maximally correlated, which is what
    calibration objectives want).  The draw stream matches
    :func:`rbergomi_mixing_vanilla_price`."""
    n = steps
    if n < 2:
        raise ValueError("the smile kernel needs steps >= 2")
    m_pad = _pad_up(2 * n, 128)
    strikes = jnp.asarray(strikes, jnp.float32).reshape(-1)
    m = strikes.shape[0]
    total_pairs = n_blocks * n_batches * _P
    if qmc:
        start = point_offset if isinstance(point_offset, int) else 0
        if start + total_pairs > 2**_SOBOL_BITS:
            raise ValueError(
                f"Sobol' period is 2^{_SOBOL_BITS} points; offset {start} + "
                f"{total_pairs} pairs would wrap"
            )
    params, coef_arr, chol_p = _rb_inputs(
        chol, coefs, eta, dt, f_base, 0.0, 0.0, cp, rho, n=n, m_pad=m_pad
    )
    # per-strike SMEM pairs [log(f_base/K), K] — the only K-dependent inputs
    ks = jnp.stack(
        [jnp.log(jnp.asarray(f_base, jnp.float32) / strikes), strikes], axis=1
    ).reshape(-1)
    n_pad = coef_arr.shape[0]
    base_specs = [
        pl.BlockSpec((_N_SCALARS,), lambda i: (jnp.int32(0),),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((2 * m,), lambda i: (jnp.int32(0),),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_pad, 128), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, m_pad), lambda i: (jnp.int32(0), jnp.int32(0)),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec(
        (1, m, _P), lambda i: (i, jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((n_blocks, m, _P), jnp.float32)
    if qmc:
        table = _sobol_table(seed, 2 * n)
        kernel = functools.partial(
            _rb_smile_kernel_qmc, n=n, m_pad=m_pad, n_batches=n_batches,
            n_strikes=m,
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=base_specs + [
                pl.BlockSpec((2 * n, _SOBOL_BITS + 1),
                             lambda i: (jnp.int32(0), jnp.int32(0)),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda i: (jnp.int32(0),),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, ks, coef_arr, chol_p, table,
          jnp.asarray([point_offset], jnp.int32))
    else:
        seed_arr = jnp.stack(
            [jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)]
        )
        kernel = functools.partial(
            _rb_smile_kernel, n=n, m_pad=m_pad, n_batches=n_batches, n_strikes=m
        )
        sums = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=base_specs + [
                pl.BlockSpec((2,), lambda i: (jnp.int32(0),),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(params, ks, coef_arr, chol_p, seed_arr)
    total_paths = 2 * total_pairs
    return discount * jnp.sum(sums.astype(jnp.float64), axis=(0, 2)) / total_paths


def rbergomi_kernel_smile(prob, config, strikes, *, n_blocks: int,
                          n_batches: int, quad_nodes: int = 64, seed=None,
                          device_id=0, point_offset=0,
                          interpret: bool = False):
    """Problem-level adapter: discounted prices (m,) for ``strikes`` under
    the problem's rough-Bergomi market — the payoff's own strike is ignored;
    its expiry/call-put/underlying conventions apply to every grid point."""
    ins = _rb_trace_inputs(prob, config, quad_nodes)
    chol, coefs, eta, dtau, f_base, _lfk, _k, cp, rho, disc, _T = ins
    return rbergomi_mixing_smile_price(
        chol, coefs, eta, dtau, f_base, strikes, cp, rho, disc,
        n_blocks=n_blocks, n_batches=n_batches, steps=config.steps,
        seed=config.seed if seed is None else seed, device_id=device_id,
        qmc=config.qmc, point_offset=point_offset, interpret=interpret,
    )
