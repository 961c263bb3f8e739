"""Checkpoint/resume (SURVEY §5).

The reference's reproducibility story is per-trajectory seed vectors; ours is
counter-based RNG — any path is re-derivable from (seed, device, block, path),
so MC state never needs checkpointing.  What *does* persist is calibration
state (parameter vectors mid-optimization) and calibrated market objects
(curves/surfaces), which are plain pytrees: save/load round-trips them
through npz + the treedef structure.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def save_pytree(path: str, tree: Any) -> None:
    """Persist a pytree of arrays/scalars to ``<path>.npz``.

    The treedef is stored as a string and must be re-suppliable at load time
    via an example tree of the same structure.
    """
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path, __n_leaves__=len(leaves), **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_pytree` into the structure of
    ``like`` (an example tree with the same treedef)."""
    p = Path(path)
    if p.suffix != ".npz":
        p = p.with_name(p.name + ".npz")
    data = np.load(p)
    n = int(data["__n_leaves__"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    treedef = jax.tree.structure(like)
    if treedef.num_leaves != n:
        raise ValueError(f"checkpoint has {n} leaves; example tree has {treedef.num_leaves}")
    return jax.tree.unflatten(treedef, leaves)
