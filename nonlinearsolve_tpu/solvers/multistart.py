"""Taylor polynomialization + multistart root finding.

The reference's HomotopyContinuation extension can only consume genuinely
polynomial systems; for smooth non-polynomial residuals users fall back to
single-start iteration.  This module closes that gap the TPU way:

1. ``polynomialize`` — build the degree-``order`` Taylor model of
   ``f(·, p)`` at ``u0`` from nested ``jax.jacfwd`` derivative tensors
   (dense einsum contractions — MXU work, exact AD, no symbolic algebra).
2. ``solve_multistart`` — find ALL roots of the Taylor model with the
   total-degree polynomial homotopy (``solve_polynomial``), then polish
   every real candidate against the TRUE residual with a vmapped Newton
   and return the distinct converged roots.

This recovers multiple basins of attraction near ``u0`` — the standard
"where else does this system vanish locally?" workflow — with all the
heavy lifting (path tracking, polish) batched.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def polynomialize(f, u0, p, order: int = 3):
    """Return ``(poly_f, degrees)``: the Taylor model of ``f(·, p)`` at
    ``u0`` to total degree ``order`` (1 ≤ order ≤ 4) as a polynomial
    callable ``poly_f(u, p_ignored)``, plus per-equation degrees."""
    if not 1 <= order <= 4:
        raise ValueError("polynomialize supports 1 <= order <= 4")
    u0 = jnp.asarray(u0)
    n = u0.size

    def f_fixed(u):
        return jnp.atleast_1d(jnp.asarray(f(u, p)))

    f0 = f_fixed(u0)
    tensors = []
    deriv = f_fixed
    for _ in range(order):
        deriv = jax.jacfwd(deriv)
        tensors.append(deriv(u0))

    letters = "abcdefgh"

    def poly_f(u, _p=None):
        d = jnp.asarray(u) - u0.astype(jnp.asarray(u).dtype)
        out = f0.astype(d.dtype)
        for k, T in enumerate(tensors, start=1):
            spec = "z" + letters[:k] + "," + ",".join(letters[:k]) \
                + "->z"
            term = jnp.einsum(spec, T.astype(d.dtype), *([d] * k))
            out = out + term / math.factorial(k)
        return out

    return poly_f, (order,) * n


def solve_multistart(prob, *, order: int = 3, polish_alg=None,
                     real_tol: float = 1e-6, dedupe_tol: float = 1e-6,
                     resid_tol: Optional[float] = None, maxiters: int = 100):
    """Find the distinct real roots of ``prob`` near ``prob.u0``.

    Returns an ``(n_roots, n)`` array of converged, deduplicated roots of
    the true residual (possibly empty).  ``order`` controls the Taylor
    model degree (Bézout count = order**n paths — keep ``n·order`` small);
    ``polish_alg`` defaults to NewtonRaphson.
    """
    from ..core.problems import NonlinearProblem
    from ..core.solve import solve
    from .first_order import NewtonRaphson
    from .poly_homotopy import PolynomialHomotopy, solve_polynomial

    u0 = jnp.atleast_1d(jnp.asarray(prob.u0))
    n = u0.size
    f = prob.f.f

    poly_f, degrees = polynomialize(f, u0, prob.p, order)
    poly_prob = NonlinearProblem(poly_f, u0, None)
    poly_sol = solve_polynomial(
        poly_prob, PolynomialHomotopy(degrees=degrees), all_roots=True,
        real_only=True, imag_tol=real_tol, dedupe_tol=dedupe_tol)
    starts = np.atleast_2d(np.asarray(poly_sol.u, np.float64).real)
    if starts.size == 0:
        return jnp.zeros((0, n), u0.dtype)

    alg = polish_alg if polish_alg is not None else NewtonRaphson()
    starts_j = jnp.asarray(starts, u0.dtype)

    def polish(s):
        sub = NonlinearProblem(f, s, prob.p)
        sol = solve(sub, alg, maxiters=maxiters)
        return sol.u, sol.resid

    roots, resids = jax.vmap(polish)(starts_j)
    roots = np.asarray(roots)
    good = np.max(np.abs(np.asarray(resids)), axis=-1) < (
        resid_tol if resid_tol is not None
        else 1e3 * np.sqrt(np.finfo(roots.dtype).eps))

    uniq = []
    for r, ok in zip(roots, good):
        if not ok or not np.all(np.isfinite(r)):
            continue
        if not any(np.linalg.norm(r - q) < dedupe_tol * (1 + np.linalg.norm(q))
                   for q in uniq):
            uniq.append(r)
    if not uniq:
        return jnp.zeros((0, n), u0.dtype)
    return jnp.asarray(np.stack(uniq), u0.dtype)
