"""2D Bratu problem — BASELINE config 3.

``Δu + λ eᵘ = 0`` on the unit square with homogeneous Dirichlet BCs,
discretized on an (N+2)×(N+2) grid (N×N interior unknowns), λ = 3.5 by
default (below the fold point λ* ≈ 6.80812).  The classic sparse-direct
Newton benchmark: 5-point stencil Jacobian, colored sparse AD, CSR/banded
direct solve.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.sparse import CSR


def bratu_2d(u, p):
    """u: (N, N) interior values; p = λ."""
    lam = p
    N = u.shape[0]
    h = 1.0 / (N + 1)
    up = jnp.pad(u, 1)
    lap = (up[:-2, 1:-1] + up[2:, 1:-1] + up[1:-1, :-2] + up[1:-1, 2:]
           - 4.0 * u) / (h * h)
    return lap + lam * jnp.exp(u)


def sparsity_pattern(N: int) -> CSR:
    """5-point Dirichlet stencil pattern on the N×N interior."""
    idx = np.arange(N * N).reshape(N, N)
    rows_list, cols_list = [idx.ravel()], [idx.ravel()]
    for shift, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
        shifted = np.roll(idx, shift, axis=axis)
        valid = np.ones((N, N), bool)
        if axis == 0:
            (valid[0, :] if shift == 1 else valid[-1, :])[...] = False
        else:
            (valid[:, 0] if shift == 1 else valid[:, -1])[...] = False
        rows_list.append(idx[valid].ravel())
        cols_list.append(shifted[valid].ravel())
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    return CSR.from_pattern(rows, cols, (N * N, N * N))


def make_problem(N: int = 32, lam: float = 3.5, dtype=jnp.float64,
                 with_sparsity: bool = True):
    from ..core.problems import NonlinearFunction, NonlinearProblem
    u0 = jnp.zeros((N, N), dtype)
    f = (NonlinearFunction(f=bratu_2d, sparsity=sparsity_pattern(N))
         if with_sparsity else bratu_2d)
    return NonlinearProblem(f, u0, jnp.asarray(lam, dtype))
