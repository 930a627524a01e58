"""Norms and tolerance defaults.

Reference semantics: /root/reference/lib/NonlinearSolveBase/src/common_defaults.jl
(L2_NORM, Linf_NORM, get_tolerance) and utils.jl:74-102 (apply_norm / norm_op).

All norms are **pytree-native and shape-agnostic**: reductions run per leaf
and combine scalars, never concatenating or flattening — on TPU a ravel of a
tiled (N, N, C) array is a physical relayout, and these norms sit inside
every hot loop (termination checks, Krylov reductions, line searches).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _leaves(x):
    return [jnp.asarray(l) for l in jax.tree_util.tree_leaves(x)]


def tree_size(x) -> int:
    return sum(int(l.size) for l in _leaves(x))


def tree_dot(a, b):
    """Σ aᵢbᵢ over all leaves/elements (real inner product)."""
    la, lb = _leaves(a), _leaves(b)
    return sum(jnp.vdot(x, y).real if jnp.iscomplexobj(x) else jnp.vdot(x, y)
               for x, y in zip(la, lb))


def l2_norm(x):
    acc = sum(jnp.sum(jnp.real(l * jnp.conj(l))) if jnp.iscomplexobj(l)
              else jnp.sum(l * l) for l in _leaves(x))
    return jnp.sqrt(acc)


def linf_norm(x):
    parts = [jnp.max(jnp.abs(l)) if l.ndim else jnp.abs(l)
             for l in _leaves(x)]
    if len(parts) == 1:
        return parts[0]
    return jnp.max(jnp.stack(parts))


_NORMS = {"l2": l2_norm, "linf": linf_norm}


def get_norm(name: str):
    return _NORMS[name]


def apply_norm(name: str, x, y=None):
    """``apply_norm(f, x) = f(x)``; ``apply_norm(f, x, y) = f(x .+ y)``.

    (reference utils.jl:80-102: norm_op with ``+``.)
    """
    f = get_norm(name)
    if y is None:
        return f(x)
    return f(jax.tree_util.tree_map(lambda a, b: jnp.asarray(a)
                                    + jnp.asarray(b), x, y))


def nan_check(x):
    flags = [jnp.any(~jnp.isfinite(l)) for l in _leaves(x)]
    out = flags[0]
    for fl in flags[1:]:
        out = out | fl
    return out


def default_tolerance(dtype) -> float:
    """``eps(T)^(4/5)``, with the Float64 literal 3.0e-13 special case
    (common_defaults.jl:40-48)."""
    dtype = np.dtype(dtype)
    if dtype == np.float64:
        return 3.0e-13
    eps = float(np.finfo(dtype).eps)
    return float(eps ** 0.8)


def get_tolerance(tol, dtype) -> float:
    if tol is None:
        return default_tolerance(dtype)
    return float(tol)
