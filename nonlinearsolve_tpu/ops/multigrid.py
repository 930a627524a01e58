"""Geometric multigrid preconditioner for structured-grid operators.

The reference's large-system tutorial reaches ILU/AMG through
LinearSolve.jl `precs` (/root/reference/docs/src/tutorials/
large_systems.md:246-318).  Both are sequential/sparse-hierarchy
algorithms; the TPU-native counterpart for *structured* PDE Jacobians is
geometric multigrid:

* smoothing = weighted Jacobi (pure VPU elementwise),
* restriction = full-weighting average pooling (a reshape-mean),
* prolongation = piecewise-constant injection (a repeat/kron),
* coarse solve = Jacobi sweeps at O(1) size.

Everything is shape-native on the (N, N[, N]) grid — no sparse
hierarchy, no gathers — and jit/vmap/shard_map compatible.  Unlike the
FFT preconditioner it handles variable coefficients and non-periodic
boundaries: the operator at each level is re-discretized with the
restricted coefficient field.

``multigrid_preconditioner`` targets operators of the form
``A u = alpha·Δ_h u − c(x)·u`` (the frozen-coefficient normal form of
reaction-diffusion Jacobians, c = reaction-derivative field ≥ 0 for
definiteness), with 'periodic' or 'dirichlet' boundaries.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _lap(u, bc: str):
    """Dimension-agnostic 5/7-point Laplacian numerator (no 1/h²)."""
    nd = u.ndim
    out = -(2.0 * nd) * u
    for ax in range(nd):
        if bc == "periodic":
            out = out + jnp.roll(u, 1, ax) + jnp.roll(u, -1, ax)
        else:   # dirichlet: zero outside the domain
            pads_lo = [(0, 0)] * nd
            pads_lo[ax] = (1, 0)
            pads_hi = [(0, 0)] * nd
            pads_hi[ax] = (0, 1)
            lo = jnp.pad(
                jax.lax.slice_in_dim(u, 0, u.shape[ax] - 1, axis=ax),
                pads_lo)
            hi = jnp.pad(jax.lax.slice_in_dim(u, 1, u.shape[ax], axis=ax),
                         pads_hi)
            out = out + lo + hi
    return out


def _restrict(u):
    """Full-weighting restriction: 2x average pooling per axis."""
    nd = u.ndim
    shape = []
    for s in u.shape:
        shape += [s // 2, 2]
    v = u.reshape(shape)
    return v.mean(axis=tuple(range(1, 2 * nd, 2)))


def _prolong(u):
    """Piecewise-constant prolongation: repeat 2x per axis."""
    for ax in range(u.ndim):
        u = jnp.repeat(u, 2, axis=ax)
    return u


def multigrid_preconditioner(grid_shape: Sequence[int], alpha, h, *,
                             c=None, bc: str = "periodic",
                             levels: int = None, nu: int = 2,
                             cycles: int = 1, omega: float = 2.0 / 3.0,
                             smoother: str = "jacobi"):
    """Return ``M(v) ≈ A⁻¹ v`` for ``A = alpha·Δ_h − diag(c)``.

    ``c``: reaction/shift field on the grid (scalar or array; default 1).
    ``bc``: 'periodic' | 'dirichlet'.  ``levels``: V-cycle depth (default:
    down to a ≤4-point axis).  ``nu``: pre+post smoothing sweeps.
    ``smoother``: 'jacobi' (weighted, ω) or 'chebyshev' (degree-``nu``
    polynomial on the D⁻¹A high-frequency interval [λmax/4, λmax] —
    stronger on rough error, no inner products, same VPU-only profile).
    """
    grid_shape = tuple(int(s) for s in grid_shape)
    if levels is None:
        levels = max(1, min(s.bit_length() - 3 for s in grid_shape) + 1)
    alpha = jnp.asarray(alpha)

    # Per-level coefficient fields and mesh widths (static structure).
    def build_levels(c0):
        cs, hs = [c0], [h]
        for _ in range(levels - 1):
            cs.append(_restrict(cs[-1]))
            hs.append(hs[-1] * 2.0)
        return cs, hs

    def apply_A(u, c_l, h_l):
        return (alpha / (h_l * h_l)) * _lap(u, bc) - c_l * u

    def diag_A(shape_nd, c_l, h_l):
        return -(2.0 * len(grid_shape)) * alpha / (h_l * h_l) - c_l

    def smooth(u, f, c_l, h_l, sweeps):
        d = diag_A(None, c_l, h_l)
        if smoother == "chebyshev" and sweeps >= 2:
            # Chebyshev semi-iteration on D⁻¹A: eigenvalues lie in (0, 2)
            # by Gershgorin (|offdiag row sum| < |diag|); smooth the
            # high-frequency band [lmax/4, lmax].
            lmax, lmin = 1.95, 1.95 / 4.0
            theta = (lmax + lmin) / 2.0
            delta = (lmax - lmin) / 2.0
            sigma = theta / delta
            rho = 1.0 / sigma
            r = (f - apply_A(u, c_l, h_l)) / d
            du = r / theta
            u = u + du
            for _ in range(sweeps - 1):
                rho_new = 1.0 / (2.0 * sigma - rho)
                r = (f - apply_A(u, c_l, h_l)) / d
                du = rho_new * rho * du + (2.0 * rho_new / delta) * r
                u = u + du
                rho = rho_new
            return u
        for _ in range(sweeps):
            r = f - apply_A(u, c_l, h_l)
            u = u + omega * r / d
        return u

    def vcycle(f, lvl, cs, hs):
        u = smooth(jnp.zeros_like(f), f, cs[lvl], hs[lvl], nu)
        if lvl == levels - 1:
            return smooth(u, f, cs[lvl], hs[lvl], 2 * nu)
        r = f - apply_A(u, cs[lvl], hs[lvl])
        e = vcycle(_restrict(r), lvl + 1, cs, hs)
        u = u + _prolong(e)
        return smooth(u, f, cs[lvl], hs[lvl], nu)

    def apply(v):
        dtype = v.dtype
        c0 = (jnp.broadcast_to(jnp.asarray(1.0 if c is None else c, dtype),
                               grid_shape))
        cs, hs = build_levels(c0)
        f = v.reshape(grid_shape)
        u = jnp.zeros_like(f)
        for _ in range(cycles):
            u = u + vcycle(f - apply_A(u, cs[0], hs[0]), 0, cs, hs)
        return u.reshape(v.shape).astype(dtype)

    return apply
