"""Matrix-free Krylov solvers: GMRES, BiCGStab, CG.

TPU-native replacement for the reference's Krylov.jl path
(``KrylovJL_GMRES`` wiring, SURVEY.md §2.9; used with JacobianOperator at
/root/reference/lib/NonlinearSolveBase/src/jacobian.jl:90-102).

Design notes:
* ``A`` is any callable ``v -> A@v`` (dense matrix, sparse container via
  ``ops.sparse.spmv``, or a ``jax.jvp`` JacobianOperator) — communication-
  minimal by construction.
* All reductions are ``jnp.dot``/norm ops on global arrays: under ``jit``
  with sharded inputs XLA lowers them to ``psum`` over ICI automatically
  (GSPMD), which is how the distributed layer (parallel/) rides this exact
  code path unchanged.
* Static restart/maxiter bounds, ``lax.while_loop``/``fori_loop`` bodies,
  convergence handled by masking — fully jit/vmap compatible.
* GMRES uses modified Gram–Schmidt Arnoldi + Givens rotations (standard
  Saad formulation), left-preconditioned.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass


class KrylovResult(NamedTuple):
    x: Any
    residual_norm: Any
    iterations: Any
    success: Any


def _identity_precond(x):
    return x


def gmres(matvec: Callable, b, x0=None, *, restart: int = 20,
          maxiter: Optional[int] = None, rtol=1e-5, atol=0.0,
          M: Optional[Callable] = None) -> KrylovResult:
    """Restarted GMRES(m), left-preconditioned: solves M⁻¹A x = M⁻¹b."""
    n = b.shape[0]
    dtype = b.dtype
    m = min(restart, n)
    if maxiter is None:
        maxiter = 10 * max(1, n // m)
    M = M or _identity_precond

    x0 = jnp.zeros_like(b) if x0 is None else x0
    b_norm = jnp.linalg.norm(M(b))
    tol = jnp.maximum(rtol * b_norm, atol)

    def arnoldi_cycle(x):
        r = M(b - matvec(x))
        beta = jnp.linalg.norm(r)
        # Guard: if beta == 0 we are done; avoid NaN.
        safe_beta = jnp.where(beta == 0, 1.0, beta)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(r / safe_beta)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)

        def body(k, carry):
            V, H, cs, sn, g, done, niters = carry
            w = M(matvec(V[k]))
            # Modified Gram-Schmidt against all m+1 basis vectors, masked to
            # the first k+1 (static shapes).
            mask = (jnp.arange(m + 1) <= k).astype(dtype)
            h = (V * mask[:, None]) @ w          # (m+1,)
            w = w - (h * mask) @ V
            h_next = jnp.linalg.norm(w)
            happy = h_next <= 1e-14 * jnp.abs(g[0])
            V = V.at[k + 1].set(jnp.where(happy, V[k + 1],
                                          w / jnp.where(h_next == 0, 1.0,
                                                        h_next)))
            h = h.at[k + 1].set(jnp.where(happy, 0.0, h_next))

            # Apply previous Givens rotations to the new column.
            def apply_rot(i, hcol):
                hi = cs[i] * hcol[i] + sn[i] * hcol[i + 1]
                hi1 = -sn[i] * hcol[i] + cs[i] * hcol[i + 1]
                return hcol.at[i].set(jnp.where(i < k, hi, hcol[i])) \
                           .at[i + 1].set(jnp.where(i < k, hi1, hcol[i + 1]))

            h = jax.lax.fori_loop(0, m, apply_rot, h)
            # New rotation to zero h[k+1].
            denom = jnp.sqrt(h[k] ** 2 + h[k + 1] ** 2)
            safe = jnp.where(denom == 0, 1.0, denom)
            ck = jnp.where(denom == 0, 1.0, h[k] / safe)
            sk = jnp.where(denom == 0, 0.0, h[k + 1] / safe)
            cs = cs.at[k].set(ck)
            sn = sn.at[k].set(sk)
            h = h.at[k].set(ck * h[k] + sk * h[k + 1]).at[k + 1].set(0.0)
            gk1 = -sk * g[k]
            g = g.at[k + 1].set(gk1).at[k].set(ck * g[k])
            H = H.at[:, k].set(jnp.where(done, H[:, k], h))
            converged = jnp.abs(gk1) <= tol
            niters = niters + jnp.where(done, 0, 1)
            return V, H, cs, sn, g, done | converged | happy, niters

        V, H, cs, sn, g, done, k_eff = jax.lax.fori_loop(
            0, m, body, (V, H, cs, sn, g, beta <= tol, jnp.int32(0)))

        # Solve the (masked) upper-triangular system H[:m,:m] y = g[:m] for
        # the first k_eff columns.
        R = H[:m, :m]
        mask = jnp.arange(m) < k_eff
        R = jnp.where(jnp.eye(m, dtype=bool) & ~mask[None, :],
                      jnp.ones_like(R), R)   # unit diagonal on unused cols
        R = R + jnp.diag(jnp.where(jnp.diagonal(R) == 0, 1.0, 0.0))
        y = jax.scipy.linalg.solve_triangular(R, jnp.where(mask, g[:m], 0.0))
        y = jnp.where(mask, y, 0.0)
        dx = y @ V[:m]
        return x + dx, jnp.abs(g[m]), k_eff

    def cond(carry):
        x, rnorm, it, cycles = carry
        return (rnorm > tol) & (it < maxiter)

    def body(carry):
        x, rnorm, it, cycles = carry
        x, rnorm, k_eff = arnoldi_cycle(x)
        return x, rnorm, it + k_eff, cycles + 1

    r0 = M(b - matvec(x0))
    x, rnorm, iters, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.linalg.norm(r0), jnp.int32(0), jnp.int32(0)))
    return KrylovResult(x=x, residual_norm=rnorm, iterations=iters,
                        success=(rnorm <= tol) & jnp.all(jnp.isfinite(x)))


def bicgstab(matvec: Callable, b, x0=None, *, maxiter: Optional[int] = None,
             rtol=1e-5, atol=0.0, M: Optional[Callable] = None
             ) -> KrylovResult:
    """Preconditioned BiCGStab (van der Vorst)."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = 2 * n
    M = M or _identity_precond
    x0 = jnp.zeros_like(b) if x0 is None else x0
    b_norm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * b_norm, atol)

    r0 = b - matvec(x0)
    rhat = r0

    def cond(c):
        x, r, p, v, rho, alpha, omega, it, ok = c
        return (jnp.linalg.norm(r) > tol) & (it < maxiter) & ok

    def body(c):
        x, r, p, v, rho, alpha, omega, it, ok = c
        rho_new = jnp.dot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, 1.0, rho)) * \
            (alpha / jnp.where(omega == 0, 1.0, omega))
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = matvec(phat)
        denom = jnp.dot(rhat, v)
        alpha = rho_new / jnp.where(denom == 0, 1.0, denom)
        s = r - alpha * v
        shat = M(s)
        t = matvec(shat)
        tt = jnp.dot(t, t)
        omega = jnp.dot(t, s) / jnp.where(tt == 0, 1.0, tt)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        ok = jnp.isfinite(jnp.linalg.norm(r)) & (rho_new != 0) & (denom != 0)
        return x, r, p, v, rho_new, alpha, omega, it + 1, ok

    one = jnp.ones((), b.dtype)
    x, r, *_, it, ok = jax.lax.while_loop(
        cond, body,
        (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
         jnp.int32(0), jnp.bool_(True)))
    rnorm = jnp.linalg.norm(r)
    return KrylovResult(x=x, residual_norm=rnorm, iterations=it,
                        success=(rnorm <= tol) & jnp.all(jnp.isfinite(x)))


def cg(matvec: Callable, b, x0=None, *, maxiter: Optional[int] = None,
       rtol=1e-5, atol=0.0, M: Optional[Callable] = None) -> KrylovResult:
    """Preconditioned conjugate gradients (SPD systems)."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = 2 * n
    M = M or _identity_precond
    x0 = jnp.zeros_like(b) if x0 is None else x0
    tol = jnp.maximum(rtol * jnp.linalg.norm(b), atol)

    r0 = b - matvec(x0)
    z0 = M(r0)

    def cond(c):
        x, r, z, p, rz, it = c
        return (jnp.linalg.norm(r) > tol) & (it < maxiter)

    def body(c):
        x, r, z, p, rz, it = c
        Ap = matvec(p)
        denom = jnp.dot(p, Ap)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    x, r, *_, it = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, jnp.dot(r0, z0), jnp.int32(0)))
    rnorm = jnp.linalg.norm(r)
    return KrylovResult(x=x, residual_norm=rnorm, iterations=it,
                        success=(rnorm <= tol) & jnp.all(jnp.isfinite(x)))


def solve_krylov(method: str, matvec, b, x0=None, **kw) -> KrylovResult:
    if method == "gmres":
        return gmres(matvec, b, x0, **kw)
    if method == "bicgstab":
        kw.pop("restart", None)
        return bicgstab(matvec, b, x0, **kw)
    if method == "cg":
        kw.pop("restart", None)
        return cg(matvec, b, x0, **kw)
    raise ValueError(f"unknown Krylov method {method!r}")
