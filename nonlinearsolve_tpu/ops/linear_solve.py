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
    """

    method: str = "auto"
    # Krylov options (used when method is a Krylov method)
    restart: int = 20
    krylov_maxiter: Optional[int] = None
    precond: str = "none"  # 'none' | 'jacobi'
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


def solve_dense(A: jnp.ndarray, b: jnp.ndarray, cfg: LinearSolver = LinearSolver()):
    """Solve ``A x = b``.  Returns ``(x, success)``.

    success=False only when even the rank-deficient fallback produced
    non-finite values (hard failure → ReturnCode.InternalLinearSolveFailed
    upstream, FirstOrder/solve.jl:332-347).
    """
    m, n = A.shape
    method = cfg.method
    if method == "auto":
        method = "lu" if m == n else "qr"

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
            x = jax.scipy.linalg.solve_triangular(r, q.T @ b)
        else:
            x = _lstsq(A, b)
    elif method == "lu":
        x = jnp.linalg.solve(A, b)
    else:
        raise ValueError(f"solve_dense cannot handle method {method!r}")

    ok = jnp.all(jnp.isfinite(x))
    finite_b = jnp.all(jnp.isfinite(b)) & jnp.all(jnp.isfinite(A))

    # Rank-deficient fallback (linear_solve.jl:48-56): retry with a
    # least-squares solve when the factorization produced garbage but the
    # inputs were finite.
    if method in ("lu", "cholesky", "qr") :
        x = jax.lax.cond(
            ok | ~finite_b,
            lambda: x,
            lambda: _lstsq(A, b),
        )
        ok = jnp.all(jnp.isfinite(x))
    return x, ok


def solve_spd(A: jnp.ndarray, b: jnp.ndarray):
    """Cholesky with LU fallback (default_spd_linsolve, linear_solve.jl:252-259)."""
    L, lower = jax.scipy.linalg.cho_factor(A, lower=True)
    x = jax.scipy.linalg.cho_solve((L, lower), b)
    ok = jnp.all(jnp.isfinite(x))
    x = jax.lax.cond(ok, lambda: x, lambda: solve_dense(A, b)[0])
    return x, jnp.all(jnp.isfinite(x))
