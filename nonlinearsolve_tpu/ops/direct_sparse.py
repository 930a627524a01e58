"""TPU-native sparse direct solvers.

The reference reaches KLU/UMFPACK (SuiteSparse, C) for sparse direct Newton
steps (SURVEY §2.9).  Sequential elimination is hostile to TPUs; the
TPU-native direct methods here are **log-depth, fully vectorized**:

* ``tridiagonal_solve_pcr`` — parallel cyclic reduction: ⌈log₂ n⌉ vectorized
  elimination sweeps, each a handful of shifted elementwise ops (VPU), no
  gathers, no sequential scan.  The classic GPU/TPU tridiagonal algorithm.
* ``block_tridiagonal_solve_pcr`` — block cyclic reduction: the same
  log-depth recurrence at block granularity, with every sweep a batch of
  (m, b, b) matmuls/solves — MXU work.  General banded systems with
  bandwidth (kl, ku) are reblocked to block-tridiagonal with
  ``b = max(kl, ku)`` and solved this way (the role KLU plays for the
  reference's banded Jacobians).

``solve_sparse_direct`` routes a CSR/DIA system appropriately:
tridiagonal → scalar PCR; banded (bandwidth ≤ _BCR_MAX_BW) → block PCR;
otherwise dense LU.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

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


def block_tridiagonal_solve_pcr(L, D, U, y):
    """Solve a block-tridiagonal system via block cyclic reduction.

    ``L, D, U``: (m, b, b) sub/diag/super blocks (L[0] and U[m-1] ignored);
    ``y``: (m, b) rhs.  ⌈log₂ m⌉ sweeps; each sweep is a batch of b×b
    solves + matmuls over all m block rows — MXU-shaped work, no
    sequential elimination.  Requires the reduced diagonal blocks to stay
    nonsingular (diagonally-dominant Jacobians qualify)."""
    m, b, _ = D.shape
    eye = jnp.broadcast_to(jnp.eye(b, dtype=D.dtype), (m, b, b))
    L = L.at[0].set(0.0)
    U = U.at[m - 1].set(0.0)

    def shift_down(X, k, fill=None):   # X[i-k]
        out = jnp.roll(X, k, axis=0)
        pad = jnp.zeros_like(out[:k]) if fill is None else fill[:k]
        return out.at[:k].set(pad)

    def shift_up(X, k, fill=None):     # X[i+k]
        out = jnp.roll(X, -k, axis=0)
        pad = jnp.zeros_like(out[:k]) if fill is None else fill[:k]
        return out.at[m - k:].set(pad[: min(k, m)])

    steps = max(1, math.ceil(math.log2(max(m, 2))))
    k = 1
    for _ in range(steps):
        kk = min(k, m)
        Dd = shift_down(D, kk, eye)
        Du = shift_up(D, kk, eye)
        # alpha = -L @ inv(Dd)  computed as  -solve(Ddᵀ, Lᵀ)ᵀ  (batched)
        alpha = -jnp.swapaxes(
            jnp.linalg.solve(jnp.swapaxes(Dd, -1, -2),
                             jnp.swapaxes(L, -1, -2)), -1, -2)
        gamma = -jnp.swapaxes(
            jnp.linalg.solve(jnp.swapaxes(Du, -1, -2),
                             jnp.swapaxes(U, -1, -2)), -1, -2)
        L_new = jnp.einsum("mij,mjk->mik", alpha, shift_down(L, kk))
        U_new = jnp.einsum("mij,mjk->mik", gamma, shift_up(U, kk))
        D_new = (D + jnp.einsum("mij,mjk->mik", alpha, shift_down(U, kk))
                 + jnp.einsum("mij,mjk->mik", gamma, shift_up(L, kk)))
        y_new = (y + jnp.einsum("mij,mj->mi", alpha, shift_down(y, kk))
                 + jnp.einsum("mij,mj->mi", gamma, shift_up(y, kk)))
        L, U, D, y = L_new, U_new, D_new, y_new
        k *= 2

    return jnp.linalg.solve(D, y[..., None])[..., 0]


def dia_to_block_tridiag(A: DIA, b: int):
    """Reblock a banded DIA matrix (all |offsets| ≤ b) into (L, D, U, m)
    block-tridiagonal form with b×b blocks.  Index plumbing is host-side
    numpy (the pattern is static); only the diagonal data is traced."""
    n = A.shape[0]
    m = -(-n // b)
    npad = m * b
    T = jnp.zeros((3, m, b, b), A.data.dtype)
    r = np.arange(n)
    for d, off in enumerate(A.offsets):
        if abs(off) > b:
            raise ValueError(f"offset {off} exceeds block size {b}")
        c = r + off
        valid = (c >= 0) & (c < n)
        rv, cv = r[valid], c[valid]
        I, q = rv // b, rv % b
        J, p = cv // b, cv % b
        delta = (J - I) + 1          # ∈ {0, 1, 2}
        T = T.at[delta, I, q, p].add(A.data[d][valid])
    # Identity rows for the zero padding [n, npad) keep D nonsingular.
    if npad > n:
        rpad = np.arange(n, npad)
        T = T.at[1, rpad // b, rpad % b, rpad % b].add(1.0)
    return T[0], T[1], T[2], m


_BCR_MAX_BW = 64


def bandwidth_of(A) -> Optional[Tuple[int, int]]:
    """(kl, ku) of a CSR/DIA matrix, or None if not cheaply available."""
    if isinstance(A, DIA):
        return (max((-o for o in A.offsets if o < 0), default=0),
                max((o for o in A.offsets if o > 0), default=0))
    if isinstance(A, CSR):
        from ..native import bandwidths
        bw = bandwidths(A.indptr, A.indices, A.shape[0])
        if bw is None:
            offs = A.indices.astype(np.int64) - A.row_ids
            if offs.size == 0:
                return (0, 0)
            return (int(max(-offs.min(), 0)), int(max(offs.max(), 0)))
        return (int(bw[0]), int(bw[1]))
    return None


def banded_solve(A, rhs):
    """Direct banded solve: scalar PCR for tridiagonal, block cyclic
    reduction otherwise.  ``A`` is DIA (or CSR, converted)."""
    if isinstance(A, CSR):
        A = DIA.from_csr(A)
    if is_tridiagonal(A):
        dl, d, du = dia_tridiagonal_parts(A)
        x = tridiagonal_solve_pcr(dl, d, du, rhs)
        return x, jnp.all(jnp.isfinite(x))
    kl, ku = bandwidth_of(A)
    b = max(kl, ku, 1)
    L, D, U, m = dia_to_block_tridiag(A, b)
    n = A.shape[0]
    ypad = jnp.zeros((m * b,), rhs.dtype).at[:n].set(rhs).reshape(m, b)
    x = block_tridiagonal_solve_pcr(L, D, U, ypad).reshape(-1)[:n]
    return x, jnp.all(jnp.isfinite(x))


import functools


@functools.lru_cache(maxsize=64)
def _rcm_band_plan(indptr_bytes, indices_bytes, n):
    """Host-side symbolic pass: RCM-order a general CSR pattern and check
    whether the permuted pattern is banded enough for block cyclic
    reduction (the fill-reducing-ordering role AMD plays inside KLU).

    Returns (perm, pinv, offsets, scatter plans) or None.  Cached on the
    raw pattern bytes — the pattern is static across a jitted solve."""
    from ..native import rcm_ordering
    indptr = np.frombuffer(indptr_bytes, np.int32)
    indices = np.frombuffer(indices_bytes, np.int32)
    perm = rcm_ordering(indptr, indices, n)
    if perm is None:
        return None
    pinv = np.empty(n, np.int64)
    pinv[perm] = np.arange(n)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    new_r = pinv[row_ids]
    new_c = pinv[indices.astype(np.int64)]
    offs = new_c - new_r
    kl, ku = int(max(-offs.min(), 0)), int(max(offs.max(), 0))
    if max(kl, ku) == 0 or max(kl, ku) > _BCR_MAX_BW or n <= 4 * max(kl, ku):
        return None
    uniq = np.unique(offs)
    # per-diagonal scatter plan: (dia index, permuted row, csr data index)
    plans = []
    for d, off in enumerate(uniq):
        sel = np.nonzero(offs == off)[0]
        plans.append((d, new_r[sel], sel))
    return perm, pinv, tuple(int(o) for o in uniq), tuple(plans)


def _rcm_banded_solve(A: CSR, b):
    plan = _rcm_band_plan(A.indptr.tobytes(), A.indices.tobytes(),
                          A.shape[0])
    if plan is None:
        return None
    perm, pinv, offsets, scatters = plan
    n = A.shape[0]
    data = jnp.zeros((len(offsets), n), A.data.dtype)
    for d, rows, sel in scatters:
        data = data.at[d, rows].set(A.data[sel])
    B = DIA(data, offsets, (n, n))      # B = P A Pᵀ, banded
    z, ok = banded_solve(B, b[jnp.asarray(perm)])
    return z[jnp.asarray(pinv)], ok


# ---------------------------------------------------------------------------
# General host sparse LU (the KLU role proper).
#
# Patterns beyond the device tiers (tridiagonal PCR / banded BCR, directly
# or after RCM) factor host-side: AMD fill-reducing ordering + native
# Gilbert–Peierls LU with threshold partial pivoting
# (csrc/sparsetools.cpp:sp_lu_solve), invoked once per solve through
# jax.pure_callback.  This is the reference's own architecture — KLU is a
# CPU library even in the CUDA stack (large_systems.md:211-244 recommends
# KLUFactorization; LinearSolve.jl runs it on host).  O(nnz + fill) memory
# instead of the dense O(n²) fallback.
#
# Crossover policy: for very large systems the host round-trip and the
# sequential factorization lose to matrix-free Krylov on-device — the
# default linsolve selection prefers GMRES above ~50k unknowns; this path
# serves explicit sparse-direct requests (LinearSolver(method='sparse_lu')
# or concrete sparse Jacobians below that size).
# ---------------------------------------------------------------------------

_DENSE_CROSSOVER = 64        # below this, the dense device LU is faster


@functools.lru_cache(maxsize=64)
def _amd_plan(indptr_bytes, indices_bytes, n):
    """Host-side symbolic pass: AMD ordering bytes, or None when the
    native library is unavailable.  Cached on the static pattern."""
    from ..native import amd_ordering, get_lib
    if get_lib() is None:
        return None
    indptr = np.frombuffer(indptr_bytes, np.int32)
    indices = np.frombuffer(indices_bytes, np.int32)
    perm = amd_ordering(indptr, indices, n)
    return None if perm is None else perm.tobytes()


def sparse_lu_fill(A: CSR, *, ordering: str = "amd") -> Optional[int]:
    """nnz(L)+nnz(U) of the native LU under the given ordering
    ('amd' | 'rcm' | 'natural') — the fill-in regression diagnostic.
    Host-only; returns None if the native library is missing."""
    from ..native import amd_ordering, rcm_ordering, sp_lu_solve
    n = A.shape[0]
    perm = None
    if ordering == "amd":
        perm = amd_ordering(A.indptr, A.indices, n)
    elif ordering == "rcm":
        perm = rcm_ordering(A.indptr, A.indices, n)
    data = np.asarray(A.data, np.float64)
    out = sp_lu_solve(A.indptr, A.indices, data, np.zeros(n), perm)
    return None if out is None else out[1]


class _FactorCache:
    """Bounded pattern-keyed cache of persistent native LU factors.

    The symbolic analysis + pivot order are computed on the FIRST
    factorization of a pattern; every later Newton step / ``reinit`` with
    the same pattern runs a numeric-only refactorization + triangular
    solves (the reference's ``reuse_A_if_factorization`` economics,
    lib/NonlinearSolveBase/src/linear_solve.jl:91-115).  Handles are freed
    on LRU eviction."""

    def __init__(self, maxsize=32):
        import threading
        from collections import OrderedDict
        self.maxsize = maxsize
        self._d = OrderedDict()
        self._lock = threading.Lock()   # callbacks run on XLA's pool

    def get(self, A: CSR):
        key = (A.indptr.tobytes(), A.indices.tobytes(), A.shape[0])
        with self._lock:
            fac = self._d.get(key)
            if fac is not None:
                self._d.move_to_end(key)
                return fac
        plan = _amd_plan(A.indptr.tobytes(), A.indices.tobytes(), A.shape[0])
        if plan is None:
            return None
        from ..native import SpLuFactor
        try:
            fac = SpLuFactor(A.indptr, A.indices, A.shape[0],
                             perm=np.frombuffer(plan, np.int32))
        except RuntimeError:
            return None
        with self._lock:
            hit = self._d.get(key)
            if hit is not None:          # raced: keep the first one
                return hit
            self._d[key] = fac
            if len(self._d) > self.maxsize:
                _, old = self._d.popitem(last=False)
                old.close()
        return fac


_FACTORS = _FactorCache()

# Above this row count the sequential host factorization + the device<->host
# round trip (≈25 ms each way on a tunnel-attached TPU) lose to an on-device
# preconditioned Krylov solve of the assembled operator — the measured-not-
# asserted crossover ADVICE r2 asked for lives in tests/test_direct_sparse.py.
_HOST_LU_MAX_N = 50_000


def _host_sparse_lu_solve(A: CSR, b):
    """General sparse direct via the persistent native host LU factor
    (symbolic/numeric split — numeric-only refactor on repeated patterns);
    None if the native library is unavailable."""
    n = A.shape[0]
    fac = _FACTORS.get(A)
    if fac is None:
        return None
    dtype = jnp.result_type(A.data.dtype, b.dtype)

    def cb(data, rhs):
        # atomic factorize+solve: concurrent callbacks sharing this cached
        # factor must not interleave (solving with the other call's
        # factors would return a finite-but-wrong x)
        x = fac.factorize_solve(np.asarray(data, np.float64),
                                np.asarray(rhs, np.float64))
        ok = x is not None and bool(np.all(np.isfinite(x)))
        if not ok:
            x = np.full(n, np.nan)
        return (x.astype(dtype), np.asarray(ok, np.bool_))

    x, ok = jax.pure_callback(
        cb,
        (jax.ShapeDtypeStruct((n,), dtype),
         jax.ShapeDtypeStruct((), jnp.bool_)),
        A.data, b, vmap_method="sequential")
    return x, ok


def _iterative_sparse_solve(A: CSR, b):
    """On-device fallback for patterns too large for the host LU round
    trip: Jacobi-preconditioned BiCGStab over the STAGED assembled matvec
    (packing hoisted out of the iteration loop; Pallas kernel on TPU)."""
    from .krylov import bicgstab
    d = A.diagonal()
    dinv = jnp.where(jnp.abs(d) > 0, 1.0 / d, jnp.ones_like(d))
    # rtol must respect the working-dtype residual floor: at f32 the
    # attainable relative residual is ~eps_f32·κ-ish scale (≈6e-8·scale),
    # so a fixed 1e-8 would burn the full iteration budget every Newton
    # step on TPU before the host-LU fallback fires (ADVICE r3).
    eps = jnp.finfo(jnp.result_type(A.data.dtype, b.dtype)).eps
    rtol = max(1e-8, float(50.0 * eps))
    maxiter = min(4 * A.shape[0], 20_000 if eps < 1e-10 else 2_000)
    res = bicgstab(A.matvec_fn(), b, maxiter=maxiter,
                   rtol=rtol, M=lambda x: dinv * x)
    return res.x, res.success


def solve_sparse_direct(A, b):
    """Direct solve of a sparse system: PCR for tridiagonal structure,
    block cyclic reduction for banded (bandwidth ≤ 64) — directly or
    after an RCM reordering recovers bandedness — then the general
    AMD-ordered native host LU (the KLU role); dense LU only for tiny
    systems or when the native library is missing.  Returns (x, success)."""
    from .linear_solve import solve_dense

    if isinstance(A, CSR) and is_tridiagonal(A):
        A = DIA.from_csr(A)
    if isinstance(A, DIA) and is_tridiagonal(A):
        dl, d, du = dia_tridiagonal_parts(A)
        # PCR expects sub/super diagonals aligned to rows:
        # A[i, i-1] = dl_row[i]; DIA stores data[-1][i] = A[i, i-1] already.
        x = tridiagonal_solve_pcr(dl, d, du, b)
        return x, jnp.all(jnp.isfinite(x))
    bw = bandwidth_of(A)
    if bw is not None and 0 < max(bw) <= _BCR_MAX_BW \
            and A.shape[0] > 4 * max(bw):
        return banded_solve(A, b)
    if isinstance(A, CSR) and A.shape[0] > 16:
        out = _rcm_banded_solve(A, b)
        if out is not None:
            return out
    if isinstance(A, CSR) and A.shape[0] >= _DENSE_CROSSOVER:
        if A.shape[0] > _HOST_LU_MAX_N:
            # Host round-trip economics lose at this scale (ADVICE r2):
            # stay on-device with preconditioned Krylov over the
            # assembled-operator matvec — but keep the exact host LU as
            # the safety net: an ill-conditioned system that stalls the
            # Jacobi-BiCGStab sweep must not turn a previously-exact
            # solve into a Newton failure.  lax.cond executes the
            # callback branch only when taken.
            x_it, ok_it = _iterative_sparse_solve(A, b)
            if _FACTORS.get(A) is None:        # native lib unavailable
                return x_it, ok_it
            def _keep(_):
                return x_it, ok_it

            def _exact(_):
                return _host_sparse_lu_solve(A, b)

            return jax.lax.cond(ok_it, _keep, _exact, operand=None)
        out = _host_sparse_lu_solve(A, b)
        if out is not None:
            return out
    dense = A.todense() if isinstance(A, (CSR, DIA)) else A
    return solve_dense(dense, b)
