"""Pytree / static-config helpers.

The reference composes solvers out of policy objects dispatched on Julia types
(`lib/NonlinearSolveBase/src/abstract_types.jl:104-675`).  The TPU-native
equivalent splits every policy into

  * a **static config** — a frozen, hashable dataclass that selects code paths
    at trace time (the analogue of a Julia type parameter), and
  * a **runtime state** — a pytree threaded through ``lax.while_loop`` carries
    (the analogue of a mutable cache).

``static_config`` builds the former; ``pytree_dataclass`` builds the latter
(a frozen dataclass registered as a JAX pytree node with ``.replace``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")


def static_config(cls: type[T]) -> type[T]:
    """Frozen, hashable dataclass used as trace-time configuration."""
    cls = dataclasses.dataclass(frozen=True, eq=True)(cls)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Frozen dataclass registered as a pytree; every field is a leaf subtree."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, name) for name in fields), None

    def flatten_with_keys(obj):
        return (
            tuple((jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in fields),
            None,
        )

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls


def tree_add(a, b):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


def tree_scale(a, s):
    return jax.tree_util.tree_map(lambda x: x * s, a)
