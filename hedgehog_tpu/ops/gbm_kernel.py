"""Fused exact-GBM terminal sampler (Pallas TPU).

Black-Scholes MC needs no time stepping — the terminal law is lognormal
(montecarlo.jl:293-303) — so the kernel is a single Box-Muller draw and one
exp per path: S_T = exp(mean + std·Z).  Used for huge-path BS MC pricing and
as the grid-free fast path of LSM's exact-GBM simulation when only terminals
are needed.  Same RNG/seeding discipline as ops/heston_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .heston_kernel import _box_muller

__all__ = ["gbm_exact_terminal", "gbm_exact_terminal_pallas"]

_ROWS = 256
_LANES = 128


def _gbm_kernel(params_ref, seed_ref, out_ref, *, antithetic: bool):
    pltpu.prng_seed(seed_ref[0] + seed_ref[1] * jnp.int32(1000003), pl.program_id(0))
    mean = params_ref[0]
    std = params_ref[1]
    z1, z2 = _box_muller((_ROWS // 2, _LANES))
    z = jnp.concatenate([z1, z2], axis=0)  # both BM outputs used: (ROWS, LANES)
    out_ref[0] = jnp.exp(mean + std * z)
    if antithetic:
        out_ref[1] = jnp.exp(mean - std * z)


@functools.partial(jax.jit, static_argnames=("n_paths", "antithetic"))
def gbm_exact_terminal(mean, std, *, n_paths: int, seed, antithetic: bool = False, device_id=0):
    """Terminal lognormal prices (n_groups, n_paths) fp32 via the Pallas kernel."""
    block = _ROWS * _LANES
    n_blocks = -(-n_paths // block)
    n_groups = 2 if antithetic else 1
    params = jnp.stack([jnp.float32(mean), jnp.float32(std)])
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32), jnp.asarray(device_id, jnp.int32)])
    kernel = functools.partial(_gbm_kernel, antithetic=antithetic)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
            pl.BlockSpec((2,), lambda i: (jnp.int32(0),), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_groups, _ROWS, _LANES),
            lambda i: (jnp.int32(0), i, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, n_blocks * _ROWS, _LANES), jnp.float32),
    )(params, seed_arr)
    return out.reshape(n_groups, n_blocks * block)[:, :n_paths]


def gbm_exact_terminal_pallas(prob, config, key=None, device_id=0):
    """Adapter matching simulate_terminal_prices' (n_groups, paths) contract.
    An explicit ``key`` reseeds the kernel stream (ops/heston_kernel.py
    ``seed_from_key``)."""
    from ..methods.montecarlo import Antithetic, _gbm_exact_terminal
    from ..models.dynamics import lognormal_terminal_law
    from .heston_kernel import seed_from_key

    anti = isinstance(config.variance_reduction, Antithetic)
    if jax.default_backend() != "tpu":
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(config.seed), device_id)
        return _gbm_exact_terminal(prob, config, key)
    mean, std = lognormal_terminal_law(prob.market_inputs, prob.payoff.expiry)
    out = gbm_exact_terminal(
        mean, std, n_paths=config.trajectories, seed=seed_from_key(config, key),
        antithetic=anti, device_id=device_id,
    )
    return out.astype(jnp.float64)
