"""Mixed-precision iterative refinement (double-f32 defect correction).

The reference certifies its large-system anchors in Float64 at abstol=1e-10
(/root/reference/docs/src/tutorials/large_systems.md:141-165).  TPU compute
is f32, so a plain f32 Newton–Krylov solve stalls at the residual-evaluation
noise floor ``O(eps_f32 · max |term|)`` (~3 digits in u on the 512²
Brusselator).  Classic iterative refinement lifts that floor without f64
hardware:

    repeat:  d   = f(u_hi + u_lo)        # defect in double-f32 (~1e-14 rel)
             δ   = solve(J(u_hi), -d)    # f32 Krylov, modest tolerance
             u  += δ                     # double-word accumulation

Each round contracts the error by ~(inner rtol + O(|e|²) nonlinear term);
with the defect computed in double-f32 the attainable floor is the
double-word noise (~1e-13 relative), far below the 1e-6 certification bar.
The linear solves, preconditioner, and Jacobian stay entirely f32 — all the
expensive work remains native TPU speed; only the (bandwidth-bound,
elementwise) defect evaluation pays the ~10× double-word flop multiplier.

This is the role of LinearSolve.jl's mixed-precision/refinement wrappers and
the classic Wilkinson scheme, built TPU-first on error-free f32 transforms
(:mod:`..ops.doublef32`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.doublef32 import DF, df_add_f
from ..ops.krylov import gmres


class RefineResult(NamedTuple):
    u: DF                     # refined double-word root (hi + lo)
    defect_norm: jnp.ndarray  # |f(u)|_inf of the final double-f32 defect
    rounds: int


def _stage_precond(precond_fn, u, fu):
    """Same contract as the Krylov descent (core/descent.py): a factory
    ``u -> (v -> M⁻¹v)`` (optionally ``wants_residual``: ``(u, fu) ->``),
    or a plain ``v -> M⁻¹v`` applier."""
    if precond_fn is None:
        return None
    if getattr(precond_fn, "wants_residual", False):
        M = precond_fn(u, fu)
        if not callable(M):
            raise TypeError(
                "a wants_residual preconditioner factory must return a "
                f"v -> M⁻¹v callable; got {type(M).__name__}")
        return M
    M = precond_fn(u)
    if not callable(M):
        # plain applier: calling it with u returned an array
        return precond_fn
    return M


def refine_root(u0,
                residual_df: Callable,
                jvp_at: Callable,
                *,
                vjp_at: Optional[Callable] = None,
                rounds: int = 3,
                inner_rtol: float = 1e-2,
                restart: int = 16,
                krylov_maxiter: int = 100,
                precond_fn: Optional[Callable] = None) -> RefineResult:
    """Refine an f32 root ``u0`` to double-f32 accuracy.

    Args:
      u0: converged f32 iterate (any array shape).
      residual_df: ``(u_hi, u_lo) -> (f_hi, f_lo)`` — the residual evaluated
        in double-f32 (write it with the :mod:`..ops.doublef32` ops).
      jvp_at: ``u_hi -> (v -> J(u_hi) @ v)`` — the f32 Jacobian-vector
        product at a point (matrix-free; the Pallas stencil JVPs slot in
        directly).
      vjp_at: optional ``u_hi -> (v -> J(u_hi)ᵀ @ v)``.  When given the
        residual may be NON-SQUARE (least squares): corrections solve the
        Gauss–Newton normal equations ``JᵀJ δ = -Jᵀ d`` via GMRES on the
        lazy ``vjp∘jvp`` operator.  Zero-residual NLLS problems refine to
        the double-word floor (``Jᵀd`` loses only eps·|J|·|d| with |d|→0);
        for nonzero-residual problems the attainable stationarity floor is
        eps·|J|·|F*| — f32-grade in the Jᵀ application, documented.
      rounds: refinement sweeps (static; unrolled under jit).  3 rounds
        take a 1e-3-grade f32 root below 1e-8 relative for inner_rtol=1e-2.
      inner_rtol/restart/krylov_maxiter/precond_fn: the f32 GMRES
        correction solve configuration (same knobs as LinearSolver).

    Returns a :class:`RefineResult`; reconstruct the refined root as
    ``res.u.hi`` (f32) or ``res.u.hi.astype(f64) + res.u.lo`` off-chip.
    """
    u = DF(u0, jnp.zeros_like(u0)) if not isinstance(u0, DF) else u0
    for _ in range(int(rounds)):
        f_hi, f_lo = residual_df(u.hi, u.lo)
        d = f_hi + f_lo                       # rounding adds only eps·|d|
        jv = jvp_at(u.hi)
        if vjp_at is not None:                # least squares: JᵀJ δ = -Jᵀd
            vj = vjp_at(u.hi)
            mv = lambda v, jv=jv, vj=vj: vj(jv(v))
            rhs = -vj(d)
        else:
            mv = jv
            rhs = -d
        M = _stage_precond(precond_fn, u.hi, d)
        res = gmres(mv, rhs, restart=restart, maxiter=krylov_maxiter,
                    rtol=inner_rtol, M=M)
        u = df_add_f(u, res.x)
    f_hi, f_lo = residual_df(u.hi, u.lo)      # final certified defect
    defect = jnp.max(jnp.abs(f_hi + f_lo))
    return RefineResult(u=u, defect_norm=defect, rounds=int(rounds))


def auto_refine(prob, u, *, p64=None, rounds: int = 3,
                inner_rtol: float = 1e-2, restart: int = 16,
                krylov_maxiter: int = 100,
                precond_fn: Optional[Callable] = None,
                first_order_transcendentals: bool = False) -> RefineResult:
    """One-call refinement for a NonlinearProblem: the double-f32 defect is
    produced AUTOMATICALLY by re-evaluating the problem's residual through
    the jaxpr interpreter (ops/doublef32_eval.py) — no hand-written
    double-word residual needed for polynomial/rational systems.

    Args:
      prob: the solved problem (f(u, p); an analytic ``jvp`` on its
        NonlinearFunction is used for the correction solves when present).
      u: the converged f32 iterate (``sol.u``).
      p64: optional host float64 parameter pytree — split exactly into
        double-f32 so parameter rounding does not cap the refinement (the
        f32 ``prob.p`` values are used otherwise, treated as exact).
      rounds/inner_rtol/restart/krylov_maxiter/precond_fn: see
        :func:`refine_root`.

    exp/log/sin/cos/pow residuals evaluate at GENUINE double-word grade
    (doublef32.df_exp & co, r4) — Bratu-class ``e^u`` systems certify
    like polynomials.  Remaining transcendentals (tanh/sinh/…) raise
    NotImplementedError with guidance; ``first_order_transcendentals=True``
    opts those into the first-order overlay (that term f32-accurate, the
    rest double-word — ops.doublef32_eval.first_order_rules).
    """
    import numpy as np

    from ..core.problems import NonlinearFunction
    from ..ops.doublef32 import df_from_f64
    from ..ops.doublef32_eval import df_eval, first_order_rules

    nf = prob.f if isinstance(prob.f, NonlinearFunction) \
        else NonlinearFunction(f=prob.f)
    raw_f = nf.f
    dtype = jnp.asarray(u).dtype

    if p64 is not None:
        p_df = jax.tree_util.tree_map(
            lambda x: df_from_f64(np.asarray(x, np.float64), dtype), p64)
    elif prob.p is not None:
        p_df = jax.tree_util.tree_map(
            lambda x: DF(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
            else jnp.asarray(x), prob.p)
    else:
        p_df = None

    rules = first_order_rules() if first_order_transcendentals else None

    def residual_df(uh, ul):
        args = (DF(uh, ul),) if p_df is None else (DF(uh, ul), p_df)
        fn = (lambda uu: raw_f(uu, None)) if p_df is None else raw_f
        out = df_eval(fn, *args, rules=rules)
        return out.hi, out.lo

    p_for_jvp = prob.p

    def jvp_at(uh):
        if nf.jvp is not None:
            return lambda v: nf.jvp(v, uh, p_for_jvp)
        return lambda v: jax.jvp(
            lambda uu: raw_f(uu, p_for_jvp), (uh,), (v,))[1]

    vjp_at = None
    if getattr(prob, "is_least_squares", False):
        def vjp_at(uh):                                  # noqa: F811
            if nf.vjp is not None:
                return lambda v: nf.vjp(v, uh, p_for_jvp)
            _, pull = jax.vjp(lambda uu: raw_f(uu, p_for_jvp), uh)
            return lambda v: pull(v)[0]

    return refine_root(u, residual_df, jvp_at, vjp_at=vjp_at,
                       rounds=rounds, inner_rtol=inner_rtol,
                       restart=restart, krylov_maxiter=krylov_maxiter,
                       precond_fn=precond_fn)
