"""Multi-chip scaling: path-sharded Monte Carlo over a jax.sharding.Mesh.

The distributed story of the framework (SURVEY §2c): this domain is
embarrassingly parallel across *paths* and *instruments*.  We shard the path
axis over ICI with ``shard_map``; per-device RNG streams are derived by
folding the device index into the base key (zero communication for sampling),
and the only collective is the ``psum`` of payoff sums — exactly the
"path sharding + RNG stream discipline + psum reduction" recipe.  The LSM
regression's (degree+1)² normal equations are the second (tiny) psum.

Everything here is differentiable: ``jax.grad`` through ``shard_map``/psum
gives sharded pathwise Greeks and calibration gradients.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.problems import PricingProblem
from ..market.rate_curve import df
from ..methods.montecarlo import MonteCarlo, reduce_payoffs, simulate_terminal_prices

__all__ = ["make_paths_mesh", "sharded_mc_price", "sharded_mc_price_fn"]


def make_paths_mesh(devices=None, axis_name: str = "paths") -> Mesh:
    """1-D mesh over all (or the given) devices with a ``paths`` axis."""
    import numpy as np

    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _local_method(method: MonteCarlo, n_dev: int) -> MonteCarlo:
    cfg = method.config
    if cfg.trajectories % n_dev != 0:
        raise ValueError(
            f"trajectories ({cfg.trajectories}) must divide evenly over {n_dev} devices"
        )
    local_cfg = dataclasses.replace(cfg, trajectories=cfg.trajectories // n_dev)
    return dataclasses.replace(method, config=local_cfg)


def sharded_mc_price_fn(method: MonteCarlo, mesh: Mesh, axis_name: str = "paths"):
    """Build ``price(prob) -> scalar`` with the path axis sharded over ``mesh``.

    The returned function is jit-able and differentiable w.r.t. any traced
    leaf of ``prob`` (spot, Heston params, curve pillars, …): the reduction
    is a psum whose transpose XLA handles natively.
    """
    n_dev = mesh.shape[axis_name]
    local = _local_method(method, n_dev)
    total_paths = method.config.trajectories

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(),),  # problem replicated; path axis is implicit in RNG
        out_specs=P(),
        check_rep=False,
    )
    def price(prob: PricingProblem):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(jax.random.PRNGKey(local.config.seed), idx)
        samples = simulate_terminal_prices(prob, local, key=key, device_id=idx)
        payoffs = reduce_payoffs(samples, prob.payoff)
        local_sum = jnp.sum(payoffs)
        total = jax.lax.psum(local_sum, axis_name)
        discount = df(prob.market_inputs.rate, prob.payoff.expiry)
        return discount * total / total_paths

    return price


def sharded_mc_price(prob: PricingProblem, method: MonteCarlo, mesh: Optional[Mesh] = None):
    """Price a European option with paths sharded across all devices."""
    mesh = mesh or make_paths_mesh()
    return sharded_mc_price_fn(method, mesh)(prob)
