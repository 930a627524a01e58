"""Polyalgorithm engine + default ladders.

TPU-native redesign of the reference polyalgorithm
(/root/reference/lib/NonlinearSolveBase/src/polyalg.jl and the @generated
unrolled solve, solve.jl:462-781): the rung tuple is unrolled at trace time
(each rung jit-specialized exactly like the reference's per-rung type
specialization), each rung's whole while_loop runs under ``lax.cond`` gated on
"no success yet", and on total failure the lowest-residual rung's iterate is
returned (findmin_resids, solve.jl:745-777).

Default ladders: ``FastShortcutNonlinearPolyalg``
(/root/reference/src/poly_algs.jl:26-92 — Broyden → Klement → NewtonRaphson →
TrustRegion → TrustRegion(Fan) → LevenbergMarquardt, start_index=3 when
len(u0) ≤ 25), ``RobustMultiNewton`` and ``FastShortcutNLLSPolyalg``
(/root/reference/lib/NonlinearSolveFirstOrder/src/poly_algs.jl:22-88).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.returncode import ReturnCode
from ..core.solution import NLStats
from ..utils import tree_where
from ..utils.norms import l2_norm
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class NonlinearSolvePolyAlgorithm:
    algs: Tuple[Any, ...] = ()
    start_index: int = 1          # 1-based, as in the reference
    name: str = "PolyAlgorithm"


def FastShortcutNonlinearPolyalg(*, autodiff=None, linsolve=None,
                                 must_use_jacobian: bool = False,
                                 prefer_simplenonlinearsolve: bool = False,
                                 u0_len: Optional[int] = None,
                                 complex_eltype: bool = False):
    """poly_algs.jl:26-92; ``complex_eltype`` selects the reduced Complex
    ladders (trust-region/LM radius logic assumes real arithmetic)."""
    from .first_order import LevenbergMarquardt, NewtonRaphson, TrustRegion
    from .quasi_newton import Broyden, Klement
    kw = dict(autodiff=autodiff)
    if complex_eltype:
        if must_use_jacobian:
            algs = (NewtonRaphson(**kw),)
        else:
            algs = (Broyden(autodiff=autodiff), Klement(autodiff=autodiff),
                    NewtonRaphson(**kw))
        return NonlinearSolvePolyAlgorithm(
            algs=algs, name="FastShortcutNonlinearPolyalg")
    if must_use_jacobian:
        algs = (
            NewtonRaphson(**kw),
            TrustRegion(**kw),
            TrustRegion(radius_update_scheme="fan", **kw),
            LevenbergMarquardt(**kw),
        )
        return NonlinearSolvePolyAlgorithm(algs=algs,
                                           name="FastShortcutNonlinearPolyalg")
    if prefer_simplenonlinearsolve:
        from .simple import SimpleBroyden, SimpleKlement
        first, second = SimpleBroyden(), SimpleKlement()
    else:
        first, second = Broyden(autodiff=autodiff), Klement(autodiff=autodiff)
    start_index = 3 if (u0_len is not None and u0_len <= 25) else 1
    algs = (
        first, second,
        NewtonRaphson(**kw),
        TrustRegion(**kw),
        TrustRegion(radius_update_scheme="fan", **kw),
        LevenbergMarquardt(**kw),
    )
    return NonlinearSolvePolyAlgorithm(algs=algs, start_index=start_index,
                                       name="FastShortcutNonlinearPolyalg")


def RobustMultiNewton(*, autodiff=None, linsolve=None):
    """FirstOrder poly_algs.jl:22-44."""
    from ..core.linesearch import BackTracking
    from .first_order import NewtonRaphson, TrustRegion
    kw = dict(autodiff=autodiff)
    algs = (
        TrustRegion(**kw),
        TrustRegion(radius_update_scheme="bastin", **kw),
        NewtonRaphson(**kw),
        NewtonRaphson(linesearch=BackTracking(), **kw),
        TrustRegion(radius_update_scheme="nlsolve", **kw),
        TrustRegion(radius_update_scheme="fan", **kw),
    )
    return NonlinearSolvePolyAlgorithm(algs=algs, name="RobustMultiNewton")


def FastShortcutNLLSPolyalg(*, autodiff=None, linsolve=None):
    """FirstOrder poly_algs.jl:62-88."""
    from ..core.linesearch import BackTracking
    from .first_order import (GaussNewton, LevenbergMarquardt, TrustRegion)
    kw = dict(autodiff=autodiff)
    algs = (
        GaussNewton(**kw),
        LevenbergMarquardt(disable_geodesic=True, **kw),
        TrustRegion(**kw),
        GaussNewton(linesearch=BackTracking(), **kw),
        TrustRegion(radius_update_scheme="fan", **kw),
        LevenbergMarquardt(**kw),
    )
    return NonlinearSolvePolyAlgorithm(algs=algs,
                                       name="FastShortcutNLLSPolyalg")


@pytree_dataclass
class PolyCarry:
    u: Any
    fu: Any
    retcode: Any
    stats: Any
    done: Any
    best_u: Any
    best_fu: Any
    best_resid: Any
    best_retcode: Any
    winner: Any          # int32 index of the successful rung (-1 = none)


def run_polyalg(alg: NonlinearSolvePolyAlgorithm, ctx, term_cfg, jac_spec,
                u0_flat, abstol, reltol, maxiters, start_hint=None):
    """Unrolled rung ladder.  ``start_hint`` (dynamic int32, optional) is the
    best-subalgorithm retention of the reference (polyalg.jl:30-64): rungs
    before the hint are skipped on the first pass and retried only in the
    wrap-around escalation pass; ``carry.winner`` reports the rung that
    succeeded so a warm-restarting driver (continuation, iterator reinit)
    can resume from it."""
    from .dispatch import run_algorithm

    fu0 = ctx.f_flat(u0_flat)
    inf = jnp.asarray(jnp.inf, u0_flat.dtype)
    carry = PolyCarry(
        u=u0_flat, fu=fu0, retcode=jnp.int32(ReturnCode.Default),
        stats=NLStats.zeros(), done=jnp.bool_(False),
        best_u=u0_flat, best_fu=fu0, best_resid=inf,
        best_retcode=jnp.int32(ReturnCode.Failure),
        winner=jnp.int32(-1),
    )

    rungs = list(enumerate(alg.algs))[alg.start_index - 1:]

    def make_run_rung(idx, sub):
        def run_rung(carry):
            final = run_algorithm(sub, ctx, term_cfg, jac_spec, u0_flat,
                                  abstol, reltol, maxiters)
            success = ReturnCode.successful(final.retcode)
            resid = l2_norm(final.fu)
            better = (resid < carry.best_resid) & jnp.isfinite(resid)
            return PolyCarry(
                u=jnp.where(success, final.u, carry.u),
                fu=jnp.where(success, final.fu, carry.fu),
                retcode=jnp.where(success, final.retcode, carry.retcode),
                stats=carry.stats.incr(
                    nf=final.stats.nf, njacs=final.stats.njacs,
                    nfactors=final.stats.nfactors, nsolve=final.stats.nsolve,
                    nsteps=final.stats.nsteps),
                done=success,
                best_u=jnp.where(better, final.u, carry.best_u),
                best_fu=jnp.where(better, final.fu, carry.best_fu),
                best_resid=jnp.where(better, resid, carry.best_resid),
                best_retcode=jnp.where(better, final.retcode,
                                       carry.best_retcode),
                winner=jnp.where(success, jnp.int32(idx), carry.winner),
            )

        return run_rung

    if start_hint is None:
        for idx, sub in rungs:
            carry = jax.lax.cond(carry.done, lambda c: c,
                                 make_run_rung(idx, sub), carry)
    else:
        hint = jnp.maximum(start_hint, jnp.int32(alg.start_index - 1))
        # pass 1: from the retained winner to the end of the ladder
        for idx, sub in rungs:
            skip = carry.done | (jnp.int32(idx) < hint)
            carry = jax.lax.cond(skip, lambda c: c,
                                 make_run_rung(idx, sub), carry)
        # pass 2 (wrap-around escalation): the rungs before the hint
        for idx, sub in rungs:
            skip = carry.done | (jnp.int32(idx) >= hint)
            carry = jax.lax.cond(skip, lambda c: c,
                                 make_run_rung(idx, sub), carry)

    # All rungs failed → return the lowest-residual iterate with its retcode.
    u = jnp.where(carry.done, carry.u, carry.best_u)
    fu = jnp.where(carry.done, carry.fu, carry.best_fu)
    retcode = jnp.where(carry.done, carry.retcode, carry.best_retcode)
    return carry.replace(u=u, fu=fu, retcode=retcode)
