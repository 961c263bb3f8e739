"""Brownian-bridge path construction for quasi-Monte Carlo.

Plain increment-by-increment path building spreads variance evenly over all
Sobol' dimensions, so high-dimensional QMC loses its edge.  The Brownian
bridge assigns the FIRST (best-distributed) Sobol' dimensions to the
coarsest structure — terminal value, then midpoints recursively — so ~90% of
the path's variance lives in the first few dimensions and the near-O(N⁻¹)
QMC rate survives long paths (the classic Moskowitz-Caflisch construction;
cf. the retrieved QMC-for-Heston paper, PAPERS.md).

The bisection schedule and conditional-moment coefficients are static
(precomputed per step count); the device-side work is one unrolled chain of
fused multiply-adds.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["brownian_bridge_increments"]


@functools.lru_cache(maxsize=None)
def _bb_schedule(steps: int):
    """Bisection fill order for times {0, 1, …, steps}·dt.

    Returns arrays (left, mid, right, weight, cond_std_over_sqrt_dt) with one
    row per interior point, in the order their Sobol' dimension is consumed.
    """
    sched = []
    queue = [(0, steps)]
    while queue:
        lo, hi = queue.pop(0)
        if hi - lo < 2:
            continue
        mid = (lo + hi) // 2
        sched.append((lo, mid, hi))
        queue.append((lo, mid))
        queue.append((mid, hi))
    left = np.array([s[0] for s in sched], dtype=np.int32)
    mid = np.array([s[1] for s in sched], dtype=np.int32)
    right = np.array([s[2] for s in sched], dtype=np.int32)
    # conditional N( a·W_l + (1−a)·W_r, (m−l)(r−m)/(r−l)·dt )
    a = (right - mid) / (right - left)
    std = np.sqrt((mid - left) * (right - mid) / (right - left))
    return left, mid, right, a, std


def brownian_bridge_increments(z, dt, steps: int):
    """Map (…, steps) iid/Sobol' normals to Brownian increments of the same
    shape via bridge ordering: dim 0 drives W(T), later dims fill midpoints.

    Returned increments have the usual √dt scaling: ΔW_k ~ N(0, dt) with the
    exact joint law of a Brownian path — only the *assignment* of input
    dimensions changes, so plugging into an existing Euler scan is exact.
    """
    z = jnp.asarray(z)
    sqrt_dt = jnp.sqrt(dt)
    batch_shape = z.shape[:-1]
    W = jnp.zeros(batch_shape + (steps + 1,), dtype=z.dtype)
    W = W.at[..., steps].set(jnp.sqrt(steps * dt) * z[..., 0])
    left, mid, right, a, std = _bb_schedule(steps)
    for k in range(len(mid)):
        wl = W[..., int(left[k])]
        wr = W[..., int(right[k])]
        W = W.at[..., int(mid[k])].set(
            float(a[k]) * wl + float(1.0 - a[k]) * wr + float(std[k]) * sqrt_dt * z[..., k + 1]
        )
    return jnp.diff(W, axis=-1)
