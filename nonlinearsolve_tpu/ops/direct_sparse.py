"""TPU-native sparse direct solvers.

The reference reaches KLU/UMFPACK (SuiteSparse, C) for sparse direct Newton
steps (SURVEY §2.9).  Sequential elimination is hostile to TPUs; the
TPU-native direct methods here are **log-depth, fully vectorized**:

* ``tridiagonal_solve_pcr`` — parallel cyclic reduction: ⌈log₂ n⌉ vectorized
  elimination sweeps, each a handful of shifted elementwise ops (VPU), no
  gathers, no sequential scan.  The classic GPU/TPU tridiagonal algorithm.
* ``banded_solve`` — general banded systems: currently routed to PCR for
  (1,1) bandwidth and dense LU otherwise (block cyclic reduction for wider
  bands is the round-2 extension; the `csrc` bandwidth/RCM analysis already
  computes the routing information).

``solve_sparse_direct`` routes a CSR/DIA system appropriately.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import CSR, DIA


def tridiagonal_solve_pcr(dl, d, du, b):
    """Solve a tridiagonal system via parallel cyclic reduction.

    dl: (n,) subdiagonal (dl[0] ignored); d: (n,) diagonal; du: (n,)
    superdiagonal (du[n-1] ignored); b: (n,) rhs.  Returns x with
    ``A @ x = b``.  ⌈log₂ n⌉ sweeps, each O(n) elementwise work.
    """
    n = d.shape[0]
    dtype = d.dtype
    a = dl.at[0].set(0.0)
    c = du.at[n - 1].set(0.0)
    x = b

    def shift_down(v, k):   # v[i-k], zero-filled
        return jnp.roll(v, k).at[:k].set(0.0)

    def shift_up(v, k):     # v[i+k], zero-filled
        return jnp.roll(v, -k).at[n - k:].set(0.0)

    steps = max(1, math.ceil(math.log2(max(n, 2))))
    k = 1
    for _ in range(steps):
        d_down = shift_down(d, k)
        d_up = shift_up(d, k)
        safe_down = jnp.where(d_down == 0, jnp.ones_like(d_down), d_down)
        safe_up = jnp.where(d_up == 0, jnp.ones_like(d_up), d_up)
        alpha = jnp.where(shift_down(jnp.ones_like(d), k) > 0,
                          -a / safe_down, jnp.zeros_like(a))
        gamma = jnp.where(shift_up(jnp.ones_like(d), k) > 0,
                          -c / safe_up, jnp.zeros_like(c))
        a_new = alpha * shift_down(a, k)
        c_new = gamma * shift_up(c, k)
        d_new = d + alpha * shift_down(c, k) + gamma * shift_up(a, k)
        x_new = x + alpha * shift_down(x, k) + gamma * shift_up(x, k)
        a, c, d, x = a_new, c_new, d_new, x_new
        k *= 2

    safe_d = jnp.where(d == 0, jnp.ones_like(d), d)
    return x / safe_d


def dia_tridiagonal_parts(A: DIA):
    """Extract (dl, d, du) from a DIA matrix with offsets ⊆ {-1, 0, 1}."""
    n = A.shape[0]
    dtype = A.data.dtype
    zero = jnp.zeros((n,), dtype)
    parts = {off: zero for off in (-1, 0, 1)}
    for i, off in enumerate(A.offsets):
        if off == 0:
            parts[0] = A.data[i]
        elif off == 1:
            # data[d, i] = A[i, i+1] (superdiagonal at row i)
            parts[1] = A.data[i]
        elif off == -1:
            parts[-1] = A.data[i]
    return parts[-1], parts[0], parts[1]


def is_tridiagonal(A) -> bool:
    if isinstance(A, DIA):
        return all(off in (-1, 0, 1) for off in A.offsets)
    if isinstance(A, CSR):
        from ..native import bandwidths
        bw = bandwidths(A.indptr, A.indices, A.shape[0])
        if bw is None:
            offs = A.indices.astype(np.int64) - A.row_ids
            return offs.min() >= -1 and offs.max() <= 1
        kl, ku = bw
        return kl <= 1 and ku <= 1
    return False


def solve_sparse_direct(A, b):
    """Direct solve of a sparse system: PCR for tridiagonal structure,
    dense LU fallback otherwise.  Returns (x, success)."""
    from .linear_solve import solve_dense

    if isinstance(A, CSR) and is_tridiagonal(A):
        A = DIA.from_csr(A)
    if isinstance(A, DIA) and is_tridiagonal(A):
        dl, d, du = dia_tridiagonal_parts(A)
        # PCR expects sub/super diagonals aligned to rows:
        # A[i, i-1] = dl_row[i]; DIA stores data[-1][i] = A[i, i-1] already.
        x = tridiagonal_solve_pcr(dl, d, du, b)
        return x, jnp.all(jnp.isfinite(x))
    dense = A.todense() if isinstance(A, (CSR, DIA)) else A
    return solve_dense(dense, b)
