"""Implicit-function-theorem sensitivities.

TPU-native replacement for the reference's dual-number forward sensitivity
(nonlinearsolve_forwarddiff_solve,
/root/reference/lib/NonlinearSolveBase/ext/NonlinearSolveBaseForwardDiffExt.jl:193-340)
and the ChainRules reverse rules (_solve_adjoint, solve.jl:896-929):

Every solve is wrapped in a ``jax.custom_jvp`` whose rule is the IFT linear
solve ``J_u u̇ = -(∂f/∂p) ṗ`` at the converged root.  The rule is linear in
the tangents, so JAX's transpose machinery derives the reverse-mode adjoint
``p̄ = -(∂f/∂p)ᵀ J_u⁻ᵀ ū`` automatically — one wrapper covers
``jax.jvp``, ``jax.jacfwd``, ``jax.grad`` and ``jax.jacrev`` through
``solve(...)``, and it also makes the reverse mode *possible* at all (a bare
``lax.while_loop`` is not reverse-differentiable).

The IFT jacobian is dense ``jacfwd`` for small systems and a
``lax.custom_linear_solve`` over the jvp operator (GMRES, with the
transpose solve on the vjp operator) for large ones.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

_DENSE_IFT_LIMIT = 2048


def _zero_tangent(x):
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return jax.dtypes.float0 and jnp.zeros(jnp.shape(x),
                                           dtype=jax.dtypes.float0)


def _ift_linear_solve(f_flat_fixed_p: Callable, u_star, b,
                      symmetric: bool = False):
    """Solve ``J_u x = b`` at the root.  Transposable; shape-agnostic
    (the iterate may be a multi-dimensional array in shaped mode).

    ``symmetric=True`` (the NLLS stationarity system, whose operator is
    the exact Hessian of ½‖F‖²) switches the large-scale path to MINRES
    — short recurrences instead of a GMRES basis, and the transpose
    solve IS the forward solve."""
    n = int(u_star.size)
    if n <= _DENSE_IFT_LIMIT:
        J = jax.jacfwd(f_flat_fixed_p)(u_star)
        x = jnp.linalg.solve(J.reshape(n, n), jnp.ravel(b))
        return x.reshape(u_star.shape)

    from ..ops.krylov import gmres, minres

    def matvec(v):
        return jax.jvp(f_flat_fixed_p, (u_star,), (v,))[1]

    if symmetric:
        def solve_sym(mv, rhs):
            return minres(mv, rhs, maxiter=10 * n, rtol=1e-8).x

        return jax.lax.custom_linear_solve(
            matvec, b, solve=solve_sym, symmetric=True)

    def solve(mv, rhs):
        return gmres(mv, rhs, restart=min(50, n),
                     maxiter=500, rtol=1e-8).x

    def transpose_solve(vecmat, rhs):
        return gmres(vecmat, rhs, restart=min(50, n),
                     maxiter=500, rtol=1e-8).x

    return jax.lax.custom_linear_solve(
        matvec, b, solve=solve, transpose_solve=transpose_solve)


def differentiable_root(make_f_flat: Callable, run_solver: Callable):
    """Build ``root(u0_flat, p, aux) -> SolveCarry`` with the IFT
    custom-jvp rule.

    ``make_f_flat(p, aux) -> f_flat`` rebuilds the flat residual for a
    (traced) parameter pytree; ``run_solver(f_flat, u0_flat, aux) -> carry``
    runs the configured algorithm to completion.  ``aux`` carries every other
    traced input (tolerances, maxiters, bound arrays) so the custom_jvp
    closure stays tracer-free; tangents through ``u0`` and ``aux`` are
    symbolically zero (the converged root depends only on ``p`` locally —
    derivatives w.r.t. the bounds themselves are not propagated).
    """

    def zeros_like_leaf(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros_like(x)
        return jnp.zeros(x.shape, dtype=jax.dtypes.float0)

    @jax.custom_jvp
    def root(u0_flat, p, aux):
        return run_solver(make_f_flat(p, aux), u0_flat, aux)

    @root.defjvp
    def root_jvp(primals, tangents):
        u0_flat, p, aux = primals
        _u0_dot, p_dot, _aux_dot = tangents
        carry = root(u0_flat, p, aux)
        u_star = carry.u

        # Non-square residual (least squares): the root is a stationary
        # point of ½‖F‖², so the IFT applies to the stationarity system
        # g(u, p) = J(u, p)ᵀ F(u, p) = 0 instead of F itself.  Computing g
        # via jax.vjp makes ∂g/∂u the EXACT Gauss-Newton Hessian
        # JᵀJ + Σᵢ Fᵢ∇²Fᵢ (second-order terms included by AD), which is
        # what the reference's NLLS adjoint uses (solve.jl:896-929).
        f_fixed = make_f_flat(p, aux)
        is_square = f_fixed(u_star).size == u_star.size

        if is_square:
            def residual_of(pp):
                return make_f_flat(pp, aux)
        else:
            def residual_of(pp):
                f_pp = make_f_flat(pp, aux)

                def g(u):
                    Fu, vjp_fn = jax.vjp(f_pp, u)
                    return vjp_fn(Fu)[0]

                return g

        # b = (∂g/∂p)·ṗ at the root (linear in ṗ; float0 tangents for
        # integer/None leaves are handled by jvp natively).
        _, b = jax.jvp(lambda pp: residual_of(pp)(u_star), (p,), (p_dot,))
        u_dot = -_ift_linear_solve(residual_of(p), u_star, b,
                                   symmetric=not is_square)

        # fu tangent at the root: J u̇ + (∂f/∂p)ṗ = -b + b = 0.
        carry_dot = jax.tree_util.tree_map(zeros_like_leaf, carry)
        carry_dot = carry_dot.replace(u=u_dot)
        return carry, carry_dot

    return root
