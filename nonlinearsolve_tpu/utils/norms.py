"""Norms and tolerance defaults.

Reference semantics: /root/reference/lib/NonlinearSolveBase/src/common_defaults.jl
(L2_NORM, Linf_NORM, get_tolerance) and utils.jl:74-102 (apply_norm / norm_op).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def l2_norm(x):
    x = jnp.asarray(x)
    return jnp.sqrt(jnp.sum(jnp.real(x * jnp.conj(x))))


def linf_norm(x):
    x = jnp.asarray(x)
    if x.ndim == 0:
        return jnp.abs(x)
    return jnp.max(jnp.abs(x))


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
    return f(jnp.asarray(x) + jnp.asarray(y))


def nan_check(x):
    x = jnp.asarray(x)
    return jnp.any(~jnp.isfinite(x))


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
