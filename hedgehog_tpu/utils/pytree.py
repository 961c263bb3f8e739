"""Pytree-registered frozen dataclasses: the substrate for every problem,
method, market-input and solution container in hedgehog_tpu.

The reference framework (Hedgehog.jl) builds everything out of immutable,
type-parametric Julia structs so that ForwardDiff Dual numbers can flow through
whole problem objects (see reference src/payoffs/payoffs.jl:101-113,
src/pricing_methods/pricing_methods.jl:19-22).  The JAX-native equivalent is a
frozen dataclass registered as a pytree: numeric fields are *leaves* (traced,
differentiated, vmapped), while structural/marker fields are *static* metadata
that participates in jit specialization and dispatch.

Usage:

    @pytree
    class VanillaOption:
        strike: ArrayLike
        expiry: ArrayLike
        exercise_style: ExerciseStyle = static_field(default=European())

Static fields must be hashable; leaves may be scalars or jnp arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")

__all__ = ["pytree", "static_field", "field", "replace", "is_pytree_dataclass"]

_REGISTERED: set[type] = set()


def static_field(**kwargs: Any) -> dataclasses.Field:
    """A dataclass field held as static (hashable) pytree metadata.

    Static fields are part of the treedef: jit re-traces when they change and
    they never receive tracers.  Use for marker types (Call/Put, European/
    American), step counts, interpolation-kind strings, etc.
    """
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs: Any) -> dataclasses.Field:
    """A regular (leaf) dataclass field; mirror of :func:`static_field`."""
    return dataclasses.field(**kwargs)


def pytree(cls: type[_T]) -> type[_T]:
    """Class decorator: frozen dataclass + JAX pytree registration.

    Fields declared with ``static_field`` become treedef metadata; all other
    fields become pytree leaves (or sub-trees).  Equality and hashing follow
    dataclass semantics, which keeps zero-field marker classes usable as
    singletons and lens objects usable as dict keys.
    """
    cls = dataclasses.dataclass(frozen=True, eq=True)(cls)
    flds = dataclasses.fields(cls)
    meta = tuple(f.name for f in flds if f.metadata.get("static", False))
    data = tuple(f.name for f in flds if not f.metadata.get("static", False))
    jax.tree_util.register_dataclass(cls, data_fields=list(data), meta_fields=list(meta))
    _REGISTERED.add(cls)
    return cls


def is_pytree_dataclass(obj: Any) -> bool:
    return type(obj) in _REGISTERED


def replace(obj: _T, **changes: Any) -> _T:
    """Functional field update (the lens-set primitive).

    Mirrors Accessors.jl's ``@set`` used throughout the reference
    (e.g. reference src/greeks/greeks_problem.jl:47-49).
    """
    return dataclasses.replace(obj, **changes)
