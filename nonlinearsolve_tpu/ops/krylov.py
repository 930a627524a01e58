"""Matrix-free Krylov solvers: GMRES, BiCGStab, CG.

TPU-native replacement for the reference's Krylov.jl path
(``KrylovJL_GMRES`` wiring, SURVEY.md §2.9; used with JacobianOperator at
/root/reference/lib/NonlinearSolveBase/src/jacobian.jl:90-102).

Design notes:
* ``A`` is any callable ``v -> A@v`` (dense matrix, sparse container via
  ``ops.sparse.spmv``, or a ``jax.jvp`` JacobianOperator) — communication-
  minimal by construction.
* **Pytree/shape-native**: iterate vectors keep their natural array shapes
  (or arbitrary pytree structure) end-to-end — no ravel.  On TPU a ravel of
  a tiled (N, N, C) state is a physical relayout; keeping the stencil shape
  through the whole Krylov iteration is worth ~20× on the SpMV-bound path
  (measured on the Brusselator 512² jvp operator: 4 → 94 Gnnz/s).  The
  Arnoldi basis is stored as a pytree of leaves with a leading Krylov axis;
  dots/norms are per-leaf reductions combined as scalars.
* All reductions are jnp ops on global arrays: under ``jit`` with sharded
  inputs XLA lowers them to ``psum`` over ICI automatically (GSPMD), which
  is how the distributed layer (parallel/) rides this exact code path.
* Static restart/maxiter bounds, ``lax.while_loop``/``fori_loop`` bodies,
  convergence by masking — fully jit/vmap compatible.
* GMRES uses **batched classical Gram–Schmidt with reorthogonalization**
  (CGS2) + Givens rotations, left-preconditioned.  Sequential modified GS
  would issue k dependent dot/axpy round-trips per Arnoldi step — pure
  latency on a TPU; CGS computes all ⟨vᵢ, w⟩ in ONE masked batched
  reduction over the basis (an (m+1, n)·(n,) contraction), and the second
  pass restores MGS-level orthogonality (Giraud et al. 2005: CGS2 loss of
  orthogonality is O(ε·κ), vs O(ε·κ^(m-1)) for plain CGS).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.norms import l2_norm, tree_dot, tree_size


class KrylovResult(NamedTuple):
    x: Any
    residual_norm: Any
    iterations: Any
    success: Any


def _identity_precond(x):
    return x


def _tmap(f, *ts):
    return jax.tree_util.tree_map(f, *ts)


def _axpy(a, x, y):
    """y + a*x on pytrees (a scalar)."""
    return _tmap(lambda xl, yl: yl + a * xl, x, y)


def _scale(a, x):
    return _tmap(lambda l: a * l, x)


def _sub(x, y):
    return _tmap(lambda a, b: a - b, x, y)


def _zeros_like(x):
    return _tmap(jnp.zeros_like, x)


def _all_finite(x):
    flags = [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(x)]
    out = flags[0]
    for f in flags[1:]:
        out = out & f
    return out


def gmres(matvec: Callable, b, x0=None, *, restart: int = 20,
          maxiter: Optional[int] = None, rtol=1e-5, atol=0.0,
          M: Optional[Callable] = None, basis_dtype=None) -> KrylovResult:
    """Restarted GMRES(m), left-preconditioned: solves M⁻¹A x = M⁻¹b.

    ``b``/``x`` may be arrays of any shape or pytrees; the Krylov basis adds
    a leading axis per leaf.

    ``basis_dtype`` (e.g. ``jnp.bfloat16``) stores the Krylov basis V in a
    narrower dtype: basis vectors are rounded on store and upcast on read,
    halving the dominant HBM traffic of the orthogonalization sweep (basis
    reads grow linearly in k).  The Hessenberg/Givens recurrences, norms
    and dot accumulations stay in the working dtype, so this pairs with
    loose tolerances (Eisenstat–Walker inexact Newton), not rtol ≲ 1e-4.
    """
    n = tree_size(b)
    leaves, _ = jax.tree_util.tree_flatten(b)
    dtype = leaves[0].dtype
    if basis_dtype is not None and any(jnp.iscomplexobj(l) for l in leaves):
        raise ValueError("basis_dtype narrowing stores a REAL basis; "
                         "complex systems must keep the working dtype")
    m = min(restart, n)
    if maxiter is None:
        maxiter = min(10 * max(1, n // m), 1000) * m
    M = M or _identity_precond

    x0_is_zero = x0 is None
    x0 = _zeros_like(b) if x0 is None else x0
    mb = M(b)
    b_norm = l2_norm(mb)
    tol = jnp.maximum(rtol * b_norm, atol)

    # Basis storage is padded to a whole number of CHUNK-slot chunks so the
    # orthogonalization sweeps can contract against only the occupied prefix
    # (lax.switch over ⌈(k+1)/CHUNK⌉ static prefix sizes, one branch
    # executed).  Without this, every Arnoldi iteration reads the FULL
    # (m+1)-vector basis from HBM — the dominant traffic — even at k = 0;
    # chunked prefixes cut the per-cycle basis traffic nearly in half and
    # make early iterations ~(m/CHUNK)× cheaper.  (Under vmap the switch
    # degrades to compute-all-and-select, i.e. back to the full sweep.)
    CHUNK = min(4, m + 1)
    nch = -(-(m + 1) // CHUNK)
    mp = nch * CHUNK

    def basis_alloc():
        return _tmap(lambda l: jnp.zeros((mp,) + l.shape,
                                         basis_dtype or l.dtype), b)

    def basis_set(V, k, w):
        return _tmap(lambda Vl, wl: Vl.at[k].set(wl.astype(Vl.dtype)), V, w)

    def basis_read(V, k):
        return _tmap(lambda Vl, bl: Vl[k].astype(bl.dtype), V, b)

    def basis_dots(V, w, k):
        """(m+1,) vector of ⟨V[i], w⟩ for the occupied prefix i ≤ k
        (accumulated in the working dtype — bf16 basis entries upcast in
        registers); entries beyond the prefix are zero."""
        Vls = jax.tree_util.tree_leaves(V)
        wls = jax.tree_util.tree_leaves(w)

        def make_branch(nslots):
            def branch():
                tot = jnp.zeros((nslots,), dtype)
                for Vl, wl in zip(Vls, wls):
                    Vc = Vl[:nslots].astype(wl.dtype)
                    axes = tuple(range(1, Vc.ndim))
                    tot = tot + (jnp.sum(Vc * wl[None], axis=axes)
                                 if axes else Vc * wl)
                return jnp.pad(tot, (0, mp - nslots))
            return branch

        out = jax.lax.switch(jnp.minimum(k // CHUNK, nch - 1),
                             [make_branch((i + 1) * CHUNK)
                              for i in range(nch)])
        return out[:m + 1]

    def basis_comb(V, coeffs, last):
        """Σ_i coeffs[i] V[i] as a b-shaped tree; ``coeffs[i]`` is zero for
        ``i > last`` (``last`` may be -1 → only the first chunk is read,
        contracting zero coefficients)."""
        c = jnp.pad(coeffs, (0, mp - coeffs.shape[0]))
        Vls = jax.tree_util.tree_leaves(V)
        tdef = jax.tree_util.tree_structure(b)

        def make_branch(nslots):
            def branch():
                return [jnp.tensordot(c[:nslots], Vl[:nslots].astype(c.dtype),
                                      axes=1) for Vl in Vls]
            return branch

        idx = jnp.minimum(jnp.maximum(last, 0) // CHUNK, nch - 1)
        out = jax.lax.switch(idx, [make_branch((i + 1) * CHUNK)
                                   for i in range(nch)])
        return jax.tree_util.tree_unflatten(tdef, out)

    def arnoldi_cycle(x, r):
        # ``r`` is the PRECONDITIONED residual M(b - A x), threaded through
        # the restart carry so each cycle start doesn't redundantly pay a
        # matvec + preconditioner application (for the common x0 = 0 Newton
        # path the initial residual is M(b), already in hand).
        beta = l2_norm(r)
        safe_beta = jnp.where(beta == 0, 1.0, beta)
        V = basis_set(basis_alloc(), 0, _scale(1.0 / safe_beta, r))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)

        def body(carry):
            k, V, H, cs, sn, g, done = carry
            w = M(matvec(basis_read(V, k)))
            # Classical Gram-Schmidt against the first k+1 basis vectors in
            # one batched reduction (masked; static shapes).  A second pass
            # (CGS2) restores MGS-level orthogonality, but doubles the
            # basis traffic — the dominant HBM cost per iteration — so it
            # runs only when the Rutishauser criterion detects cancellation
            # (‖w_orth‖ < ‖w‖/√2), which well-preconditioned solves never
            # trigger.
            mask = (jnp.arange(m + 1) <= k).astype(dtype)
            w_norm0 = l2_norm(w)
            h = basis_dots(V, w, k) * mask
            w = _sub(w, basis_comb(V, h, k))

            def reorth(args):
                w, h = args
                h2 = basis_dots(V, w, k) * mask
                return _sub(w, basis_comb(V, h2, k)), h + h2

            w, h = jax.lax.cond(
                l2_norm(w) < 0.7071 * w_norm0, reorth,
                lambda args: args, (w, h))
            h_next = l2_norm(w)
            happy = h_next <= 1e-14 * jnp.abs(g[0])
            V = basis_set(V, k + 1,
                          _scale(jnp.where(happy, 0.0,
                                           1.0 / jnp.where(h_next == 0, 1.0,
                                                           h_next)), w))
            h = h.at[k + 1].set(jnp.where(happy, 0.0, h_next))

            # Apply previous Givens rotations to the new column.
            def apply_rot(i, hcol):
                hi = cs[i] * hcol[i] + sn[i] * hcol[i + 1]
                hi1 = -sn[i] * hcol[i] + cs[i] * hcol[i + 1]
                return hcol.at[i].set(jnp.where(i < k, hi, hcol[i])) \
                           .at[i + 1].set(jnp.where(i < k, hi1, hcol[i + 1]))

            h = jax.lax.fori_loop(0, m, apply_rot, h)
            denom = jnp.sqrt(h[k] ** 2 + h[k + 1] ** 2)
            safe = jnp.where(denom == 0, 1.0, denom)
            ck = jnp.where(denom == 0, 1.0, h[k] / safe)
            sk = jnp.where(denom == 0, 0.0, h[k + 1] / safe)
            cs = cs.at[k].set(ck)
            sn = sn.at[k].set(sk)
            h = h.at[k].set(ck * h[k] + sk * h[k + 1]).at[k + 1].set(0.0)
            gk1 = -sk * g[k]
            g = g.at[k + 1].set(gk1).at[k].set(ck * g[k])
            H = H.at[:, k].set(h)
            converged = jnp.abs(gk1) <= tol
            return k + 1, V, H, cs, sn, g, done | converged | happy

        # Early-exit Arnoldi: a while_loop stops the cycle at convergence or
        # happy breakdown instead of running all m iterations with masked
        # results — each skipped iteration saves a matvec + preconditioner
        # application + a full-basis orthogonalization sweep, the three
        # dominant costs.  (The per-iteration work is large, so the dynamic
        # loop's lost pipelining is noise by comparison.)  The exit value of
        # k counts the iterations actually run.
        k_eff, V, H, cs, sn, g, done = jax.lax.while_loop(
            lambda c: (c[0] < m) & ~c[6],
            body,
            (jnp.int32(0), V, H, cs, sn, g, beta <= tol))

        # Solve the (masked) upper-triangular system for the first k_eff cols.
        R = H[:m, :m]
        mask = jnp.arange(m) < k_eff
        R = R + jnp.diag(jnp.where(jnp.diagonal(R) == 0, 1.0, 0.0))
        y = jax.scipy.linalg.solve_triangular(R, jnp.where(mask, g[:m], 0.0))
        y = jnp.where(mask, y, 0.0)
        dx = basis_comb(V, y, k_eff - 1)
        # Residual of the cycle lives at g[k_eff] (the rotated RHS entry the
        # exited iteration produced); g[m] is only reached when all m
        # iterations ran.
        return _tmap(lambda a, d: a + d, x, dx), jnp.abs(g[k_eff]), k_eff

    def cond(carry):
        x, r, rnorm, it, cycles = carry
        return (rnorm > tol) & (it < maxiter)

    def body(carry):
        x, r, rnorm, it, cycles = carry
        x, rnorm, k_eff = arnoldi_cycle(x, r)
        # The restart residual is only needed if another cycle runs; skip
        # the matvec + preconditioner when this cycle converged.
        r = jax.lax.cond(rnorm > tol,
                         lambda xc: M(_sub(b, matvec(xc))),
                         lambda xc: _zeros_like(b), x)
        return x, r, rnorm, it + k_eff, cycles + 1

    r0 = mb if x0_is_zero else M(_sub(b, matvec(x0)))
    x, _, rnorm, iters, _ = jax.lax.while_loop(
        cond, body, (x0, r0, l2_norm(r0), jnp.int32(0), jnp.int32(0)))
    return KrylovResult(x=x, residual_norm=rnorm, iterations=iters,
                        success=(rnorm <= tol) & _all_finite(x))


def bicgstab(matvec: Callable, b, x0=None, *, maxiter: Optional[int] = None,
             rtol=1e-5, atol=0.0, M: Optional[Callable] = None
             ) -> KrylovResult:
    """Preconditioned BiCGStab (van der Vorst); pytree-native."""
    n = tree_size(b)
    if maxiter is None:
        maxiter = 2 * n
    M = M or _identity_precond
    x0 = _zeros_like(b) if x0 is None else x0
    b_norm = l2_norm(b)
    tol = jnp.maximum(rtol * b_norm, atol)

    r0 = _sub(b, matvec(x0))
    rhat = r0
    leaves = jax.tree_util.tree_leaves(b)
    one = jnp.ones((), leaves[0].dtype)

    def cond(c):
        x, r, p, v, rho, alpha, omega, it, ok = c
        return (l2_norm(r) > tol) & (it < maxiter) & ok

    def body(c):
        x, r, p, v, rho, alpha, omega, it, ok = c
        rho_new = tree_dot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, 1.0, rho)) * \
            (alpha / jnp.where(omega == 0, 1.0, omega))
        p = _axpy(beta, _axpy(-omega, v, p), r)
        phat = M(p)
        v = matvec(phat)
        denom = tree_dot(rhat, v)
        alpha = rho_new / jnp.where(denom == 0, 1.0, denom)
        s = _axpy(-alpha, v, r)
        shat = M(s)
        t = matvec(shat)
        tt = tree_dot(t, t)
        omega = tree_dot(t, s) / jnp.where(tt == 0, 1.0, tt)
        x = _axpy(alpha, phat, _axpy(omega, shat, x))
        r = _axpy(-omega, t, s)
        ok = jnp.isfinite(l2_norm(r)) & (rho_new != 0) & (denom != 0)
        return x, r, p, v, rho_new, alpha, omega, it + 1, ok

    x, r, *_, it, ok = jax.lax.while_loop(
        cond, body,
        (x0, r0, _zeros_like(b), _zeros_like(b), one, one, one,
         jnp.int32(0), jnp.bool_(True)))
    rnorm = l2_norm(r)
    return KrylovResult(x=x, residual_norm=rnorm, iterations=it,
                        success=(rnorm <= tol) & _all_finite(x))


def cg(matvec: Callable, b, x0=None, *, maxiter: Optional[int] = None,
       rtol=1e-5, atol=0.0, M: Optional[Callable] = None) -> KrylovResult:
    """Preconditioned conjugate gradients (SPD systems); pytree-native."""
    n = tree_size(b)
    if maxiter is None:
        maxiter = 2 * n
    M = M or _identity_precond
    x0 = _zeros_like(b) if x0 is None else x0
    tol = jnp.maximum(rtol * l2_norm(b), atol)

    r0 = _sub(b, matvec(x0))
    z0 = M(r0)

    def cond(c):
        x, r, z, p, rz, it = c
        return (l2_norm(r) > tol) & (it < maxiter)

    def body(c):
        x, r, z, p, rz, it = c
        Ap = matvec(p)
        denom = tree_dot(p, Ap)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z = M(r)
        rz_new = tree_dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = _axpy(beta, p, z)
        return x, r, z, p, rz_new, it + 1

    x, r, *_, it = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, tree_dot(r0, z0), jnp.int32(0)))
    rnorm = l2_norm(r)
    return KrylovResult(x=x, residual_norm=rnorm, iterations=it,
                        success=(rnorm <= tol) & _all_finite(x))


def minres(matvec: Callable, b, x0=None, *, maxiter: Optional[int] = None,
           rtol=1e-5, atol=0.0, M: Optional[Callable] = None
           ) -> KrylovResult:
    """MINRES (Paige–Saunders) for SYMMETRIC (possibly indefinite)
    systems; pytree-native.  Short Lanczos recurrences — O(1) stored
    vectors, no basis, so per-iteration HBM traffic is a fraction of
    GMRES's.  ``M`` must be SPD when given (preconditioned Lanczos)."""
    n = tree_size(b)
    if maxiter is None:
        maxiter = 2 * n
    M = M or _identity_precond
    x0 = _zeros_like(b) if x0 is None else x0
    tol = jnp.maximum(rtol * l2_norm(b), atol)

    r0 = _sub(b, matvec(x0))
    y0 = M(r0)
    beta0 = jnp.sqrt(jnp.maximum(tree_dot(r0, y0), 0.0))
    safe_b0 = jnp.where(beta0 == 0, 1.0, beta0)

    def cond(c):
        (x, r_norm, v, y, v_old, w, w_old, beta, c_rot, s_rot, eta, it,
         ok) = c
        return (r_norm > tol) & (it < maxiter) & ok

    def body(cst):
        (x, r_norm, v, y, v_old, w, w_old, beta, c_rot, s_rot, eta, it,
         ok) = cst
        # Lanczos step on the M-preconditioned operator
        Av = matvec(y)
        alpha = tree_dot(y, Av)
        # v_{k+1} = A y_k - alpha v_k - beta v_{k-1}
        v_new = _tmap(lambda a, vk, vo: a - alpha * vk - beta * vo,
                      Av, v, v_old)
        y_new = M(v_new)
        beta_new = jnp.sqrt(jnp.maximum(tree_dot(v_new, y_new), 0.0))
        safe_bn = jnp.where(beta_new == 0, 1.0, beta_new)

        # apply previous rotations to the new tridiagonal column
        delta = c_rot[0] * alpha - c_rot[1] * s_rot[0] * beta
        rho2 = s_rot[1] * beta
        rho3 = s_rot[0] * alpha + c_rot[1] * c_rot[0] * beta
        # new rotation annihilating beta_new
        gamma = jnp.sqrt(delta ** 2 + beta_new ** 2)
        safe_g = jnp.where(gamma == 0, 1.0, gamma)
        cs = delta / safe_g
        sn = beta_new / safe_g

        w_new = _tmap(lambda yk, wk, wo:
                      (yk - rho3 * wk - rho2 * wo) / safe_g, y, w, w_old)
        x = _axpy(cs * eta, w_new, x)
        r_norm = jnp.abs(sn * eta)
        eta = -sn * eta

        v_norm = _scale(1.0 / safe_bn, v_new)
        y_norm = _scale(1.0 / safe_bn, y_new)
        ok = jnp.isfinite(r_norm) & (gamma != 0)
        return (x, r_norm, v_norm, y_norm, v, w_new, w,
                beta_new, jnp.stack([cs, c_rot[0]]),
                jnp.stack([sn, s_rot[0]]), eta, it + 1, ok)

    leaves = jax.tree_util.tree_leaves(b)
    rdt = jnp.zeros((), leaves[0].dtype).real.dtype
    init = (x0, beta0,
            _scale(1.0 / safe_b0, r0), _scale(1.0 / safe_b0, y0),
            _zeros_like(b), _zeros_like(b), _zeros_like(b),
            jnp.zeros((), rdt),
            jnp.asarray([1.0, 1.0], rdt), jnp.asarray([0.0, 0.0], rdt),
            beta0, jnp.int32(0), jnp.bool_(True))
    out = jax.lax.while_loop(cond, body, init)
    x, r_norm, *_, it, ok = out
    true_r = l2_norm(_sub(b, matvec(x)))
    return KrylovResult(x=x, residual_norm=true_r, iterations=it,
                        success=(true_r <= jnp.maximum(tol, 10 * tol))
                        & _all_finite(x))


def solve_krylov(method: str, matvec, b, x0=None, **kw) -> KrylovResult:
    if method == "gmres":
        return gmres(matvec, b, x0, **kw)
    if method == "bicgstab":
        kw.pop("restart", None)
        return bicgstab(matvec, b, x0, **kw)
    if method == "cg":
        kw.pop("restart", None)
        return cg(matvec, b, x0, **kw)
    if method == "minres":
        kw.pop("restart", None)
        return minres(matvec, b, x0, **kw)
    raise ValueError(f"unknown Krylov method {method!r}")
