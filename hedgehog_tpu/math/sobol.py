"""Randomized quasi-Monte Carlo: Sobol' low-discrepancy points in JAX.

Beyond-reference capability (cf. the retrieved "Quasi-Monte Carlo methods for
the Heston model" paper, PAPERS.md): replacing iid uniforms with a scrambled
Sobol' sequence cuts the MC error of smooth payoffs from O(N^-1/2) to nearly
O(N^-1), i.e. orders of magnitude fewer paths at equal accuracy.

Direction numbers (Joe-Kuo, 30 bits) are baked from scipy.stats.qmc at trace
time — a host-side constant, so generation itself is pure JAX bit arithmetic
(jit/vmap/shard-safe): x_{n,d} = ⊕_{bits b of n} V[d,b], randomized by an
XOR digital shift derived from a PRNG key (unbiased; each key gives an
independent randomization, so confidence intervals come from re-keying).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sobol_uniforms"]

_BITS = 30
_SCALE = np.float64(2.0**-_BITS)


@functools.lru_cache(maxsize=None)
def _direction_numbers(dims: int) -> np.ndarray:
    from scipy.stats import qmc

    sob = qmc.Sobol(d=dims, scramble=False)
    return np.asarray(sob._sv, dtype=np.uint32)  # (dims, 30)


def sobol_uniforms(key, n_points: int, dims: int, skip: int = 0):
    """(n_points, dims) digitally-shifted Sobol' uniforms in (0, 1).

    ``skip`` offsets the sequence index (sharded callers pass their global
    point offset so devices take disjoint slices of one sequence).
    ``key`` drives the XOR digital-shift randomization.
    """
    if isinstance(skip, int) and skip + n_points > 2**_BITS:
        raise ValueError(
            f"Sobol' sequence period is 2^{_BITS} points; skip+n_points = "
            f"{skip + n_points} would wrap and duplicate points"
        )
    V = jnp.asarray(_direction_numbers(dims))  # (dims, BITS) uint32
    n = jnp.arange(n_points, dtype=jnp.uint32)[:, None] + jnp.asarray(skip, jnp.uint32)  # (N, 1)

    acc = jnp.zeros((n_points, dims), dtype=jnp.uint32)
    for b in range(_BITS):
        bit_set = (jax.lax.shift_right_logical(n, jnp.uint32(b)) & jnp.uint32(1)).astype(
            jnp.bool_
        )
        acc = jnp.where(bit_set, acc ^ V[None, :, b], acc)

    shift = jax.random.bits(key, (dims,), dtype=jnp.uint32) >> jnp.uint32(32 - _BITS)
    acc = acc ^ shift[None, :]
    # center each 30-bit integer in its cell → strictly inside (0, 1)
    return (acc.astype(jnp.float64) + 0.5) * _SCALE
