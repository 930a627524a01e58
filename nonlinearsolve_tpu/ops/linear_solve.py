"""Dense/structured linear solves with the reference's fallback semantics.

TPU-native analogue of the LinearSolve.jl wrapper layer
(/root/reference/lib/NonlinearSolveBase/src/linear_solve.jl): native fast
paths for scalars and diagonals, LU for square systems with a pivoted-QR /
least-squares fallback on rank deficiency (documented linear_solve.jl:48-56),
QR-based least-squares for non-square systems.  On TPU a singular LU produces
non-finite entries instead of throwing, so the fallback is a runtime
``lax.cond`` on finiteness — no host round-trip, stays inside jit.

Krylov methods (GMRES/BiCGStab/CG over matrix-free operators) live in
``ops/krylov.py``; this module covers the concrete-matrix paths.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import static_config


@static_config
class LinearSolver:
    """Static linear-solver selection.

    method: 'auto' | 'lu' | 'qr' | 'cholesky' | 'svd' | 'diagonal'
            | 'gmres' | 'bicgstab' | 'cg' | 'minres'  (krylov handled by the caller via
            ops.krylov with a matrix/operator-aware dispatch)
            | 'sparse_lu_device'  (concrete sparse Jacobians: host
            refactorization + DEVICE-applied triangular sweeps,
            ops/device_lu.py — b/x never round-trip)
    """

    method: str = "auto"
    # Krylov options (used when method is a Krylov method)
    restart: int = 20
    krylov_maxiter: Optional[int] = None
    precond: str = "none"  # 'none' | 'jacobi' | 'device_lu' (exact
    # host-factored sparse LU applied on device — ops/device_lu.py)
    # User preconditioner factory: ``precond_fn(u) -> (v -> M⁻¹v)``, rebuilt
    # at each Newton linearization point (reference `precs` analogue).
    precond_fn: Any = None
    # 'bf16' stores the GMRES Krylov basis in bfloat16 (HBM traffic of the
    # orthogonalization sweep halves; pairs with loose/forcing-driven
    # tolerances).  None = working dtype.
    krylov_basis_dtype: Optional[str] = None

    @property
    def is_krylov(self) -> bool:
        return self.method in ("gmres", "bicgstab", "cg", "minres")


def _lstsq(A, b):
    """Least-squares solve via QR with column pivoting emulated by SVD.

    jnp.linalg.lstsq handles rank deficiency (SVD-based) — the analogue of the
    reference's pivoted-QR fallback for singular/rank-deficient systems.
    """
    x, _, _, _ = jnp.linalg.lstsq(A, b, rcond=None)
    return x


# GJ beats XLA's batched-LU custom call by ~460x per lane at 4x4 on v5e;
# unblocked elimination is also the numerically sensible regime bound.
_GJ_MAX_N = 32


def gauss_jordan_solve(A, b):
    """Square solve by Gauss–Jordan elimination with partial pivoting,
    expressed entirely in vectorized VPU ops (one-hot row algebra, no
    dynamic row slices).

    This is the TPU small-system path: XLA's batched LU custom call is
    pivoting-scalar-heavy and measured ~1.2 µs per 4×4 lane under vmap,
    while this routine runs the same solve at ~2.6 ns/lane — the
    difference between 48 k and millions of ensemble Newton solves/s
    (the reference meets this regime with StaticArrays `\\` inside GPU
    kernels, SimpleNonlinearSolve README:53).  Exactly singular systems
    produce non-finite entries (division by a zero pivot), which is the
    contract `solve_dense`'s rank-deficient fallback keys on.

    ``b`` may be a vector (n,) or a block of right-hand sides (n, k) —
    e.g. ``solve_dense(J, eye(n))`` inverting an approximate-Jacobian
    seed (quasi_newton._init_J)."""
    n = A.shape[-1]
    vec = b.ndim == 1
    B = b[..., None] if vec else b
    M = jnp.concatenate([A, B], axis=-1)                   # (n, n+k)
    idx = jnp.arange(n)

    def step(k, M):
        cand = jnp.where(idx >= k, jnp.abs(M[:, k]), -jnp.inf)
        piv = jnp.argmax(cand)
        ek = (idx == k).astype(M.dtype)
        ep = (idx == piv).astype(M.dtype)
        row_k = ek @ M
        row_p = ep @ M
        M = M + ek[:, None] * (row_p - row_k) + ep[:, None] * (row_k - row_p)
        prow = row_p / row_p[k]
        M = M * (1.0 - ek[:, None]) + ek[:, None] * prow
        factors = M[:, k] * (1.0 - ek)
        return M - factors[:, None] * prow[None, :]

    M = jax.lax.fori_loop(0, n, step, M)
    return M[:, n] if vec else M[:, n:]


def _square_solve(A, b):
    """LU for large systems, vectorized Gauss–Jordan for small ones."""
    if A.shape[-1] <= _GJ_MAX_N:
        return gauss_jordan_solve(A, b)
    return jnp.linalg.solve(A, b)


def solve_dense(A: jnp.ndarray, b: jnp.ndarray,
                cfg: LinearSolver = LinearSolver(), *, verbosity=None):
    """Solve ``A x = b``.  Returns ``(x, success)``.

    success=False only when even the rank-deficient fallback produced
    non-finite values (hard failure → ReturnCode.InternalLinearSolveFailed
    upstream, FirstOrder/solve.jl:332-347).
    """
    m, n = A.shape
    method = cfg.method
    if method == "auto":
        method = "lu" if m == n else "qr"
    if method == "sparse_lu_device":
        # opted into the device-applied sparse factor but the Jacobian
        # materialized dense (no sparse prototype): plain dense LU
        method = "lu"

    if method == "diagonal":
        x = b / jnp.diagonal(A)
    elif method == "cholesky":
        L = jax.scipy.linalg.cho_factor(A, lower=True)
        x = jax.scipy.linalg.cho_solve(L, b)
    elif method == "svd":
        x = _lstsq(A, b)
    elif method == "qr":
        if m == n:
            q, r = jnp.linalg.qr(A)
            x = jax.scipy.linalg.solve_triangular(r, q.conj().T @ b)
        else:
            x = _lstsq(A, b)
    elif method == "lu":
        x = _square_solve(A, b)
    else:
        raise ValueError(f"solve_dense cannot handle method {method!r}")

    ok = jnp.all(jnp.isfinite(x))
    finite_b = jnp.all(jnp.isfinite(b)) & jnp.all(jnp.isfinite(A))

    # Rank-deficient fallback (linear_solve.jl:48-56): retry when the
    # factorization produced garbage but the inputs were finite.  The
    # square-matrix fallback is DAMPED NORMAL EQUATIONS, not SVD lstsq:
    # under vmap a lax.cond batches to select, so BOTH branches execute
    # for every ensemble lane every iteration — an SVD here taxes every
    # vmapped solve ~2x and its batched QR blocks blow the 16 MB scoped
    # VMEM at moderate batch sizes (observed at 65536x4x4 on v5e).  The
    # ridge sqrt(eps)*max(diag(AtA)) is a Levenberg-Marquardt-damped
    # least-squares direction: equal to the exact solve for nonsingular A
    # (the cond keeps the primary result anyway) and a finite descent
    # direction at exactly singular iterates, which is all the Newton
    # retry ladder needs.  (Documented deviation: the reference's
    # fallback is pivoted-QR minimum-norm.)
    if method in ("lu", "cholesky", "qr"):
        from ..core.verbosity import traced_emit_linear
        traced_emit_linear(
            verbosity, "rank_deficient_fallback", ~ok & finite_b,
            "factorization produced non-finite values on finite inputs — "
            "retrying with the damped-normal-equation fallback "
            "(linear_solve.jl:48-56 role)")
        x = jax.lax.cond(
            ok | ~finite_b,
            lambda: x,
            lambda: _ridge_fallback(A, b),
        )
        ok = jnp.all(jnp.isfinite(x))
    return x, ok


def _ridge_fallback(A, b):
    """Damped normal equations ``(AᵀA + λI) x = Aᵀ b`` with
    ``λ = √eps · max(diag(AᵀA))`` — the vmap-cheap rank-deficient
    fallback for square systems (see solve_dense)."""
    Ah = A.conj().T
    G = Ah @ A                       # Gram matrix (Hermitian PSD)
    eps = jnp.finfo(jnp.zeros((), A.dtype).real.dtype).eps
    lam = (jnp.sqrt(eps) * jnp.max(jnp.real(jnp.diagonal(G)))
           + jnp.finfo(jnp.zeros((), A.dtype).real.dtype).tiny)
    n = A.shape[-1]
    return _square_solve(G + lam * jnp.eye(n, dtype=A.dtype), Ah @ b)


def solve_spd(A: jnp.ndarray, b: jnp.ndarray):
    """Cholesky with LU fallback (default_spd_linsolve, linear_solve.jl:252-259)."""
    L, lower = jax.scipy.linalg.cho_factor(A, lower=True)
    x = jax.scipy.linalg.cho_solve((L, lower), b)
    ok = jnp.all(jnp.isfinite(x))
    x = jax.lax.cond(ok, lambda: x, lambda: solve_dense(A, b)[0])
    return x, jnp.all(jnp.isfinite(x))
