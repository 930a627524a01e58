"""Bounds handling via logit/log reparameterization.

Port of /root/reference/lib/NonlinearSolveBase/src/bounds_transform.jl:
``lb ≤ u ≤ ub`` is enforced by solving in an unconstrained variable t with
u = lb + (ub-lb)·logistic(t) (two-sided), lb + eᵗ / ub - eᵗ (one-sided);
u0 is nudged into the strict interior by eps^(3/4)-scaled margins before the
forward transform (bounds_transform.jl:38-54).  All elementwise, vectorized,
and branch-free via ``jnp.where`` on bound finiteness masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _logit(x):
    return jnp.log(x) - jnp.log1p(-x)


def to_unbounded(u, lb, ub):
    has_lb = jnp.isfinite(lb)
    has_ub = jnp.isfinite(ub)
    width = jnp.where(has_lb & has_ub, ub - lb, jnp.ones_like(ub))
    both = _logit(jnp.clip((u - lb) / width, 1e-300, 1.0))
    lo = jnp.log(jnp.maximum(u - lb, jnp.finfo(u.dtype).tiny))
    hi = jnp.log(jnp.maximum(ub - u, jnp.finfo(u.dtype).tiny))
    return jnp.where(has_lb & has_ub, both,
                     jnp.where(has_lb, lo, jnp.where(has_ub, hi, u)))


def from_unbounded(t, lb, ub):
    has_lb = jnp.isfinite(lb)
    has_ub = jnp.isfinite(ub)
    both = lb + (ub - lb) * jax.nn.sigmoid(t)
    lo = lb + jnp.exp(t)
    hi = ub - jnp.exp(t)
    return jnp.where(has_lb & has_ub, both,
                     jnp.where(has_lb, lo, jnp.where(has_ub, hi, t)))


def clamp_to_bounds(u, lb, ub):
    """Interior clamp with eps^(3/4) margins (bounds_transform.jl:38-54)."""
    has_lb = jnp.isfinite(lb)
    has_ub = jnp.isfinite(ub)
    eps_frac = jnp.finfo(u.dtype).eps ** 0.75
    margin = (ub - lb) * eps_frac
    both = jnp.clip(u, lb + margin, ub - margin)
    lo = jnp.maximum(u, lb + eps_frac * jnp.maximum(jnp.abs(lb), 1.0))
    hi = jnp.minimum(u, ub - eps_frac * jnp.maximum(jnp.abs(ub), 1.0))
    return jnp.where(has_lb & has_ub, both,
                     jnp.where(has_lb, lo, jnp.where(has_ub, hi, u)))


def normalize_bounds(lb, ub, u0_flat):
    """nothing → ±Inf, scalars broadcast (bounds_transform.jl:58-75)."""
    n = u0_flat.shape[0]
    dtype = u0_flat.dtype

    def norm(b, fill):
        if b is None:
            return jnp.full((n,), fill, dtype)
        b = jnp.asarray(b, dtype)
        return jnp.broadcast_to(jnp.ravel(b) if b.ndim else b, (n,))

    return norm(lb, -jnp.inf), norm(ub, jnp.inf)
