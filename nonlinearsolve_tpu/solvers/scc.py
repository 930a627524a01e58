"""SCC (strongly-connected-component) driver.

Port of /root/reference/lib/SCCNonlinearSolve/src/SCCNonlinearSolve.jl:24-207:
solve an ordered sequence of subproblems (nonlinear, linear, or homotopy
blocks), where each block's parameters may be computed from the
already-solved blocks via ``explicitfuns`` (the reference's
``explicitfuns!`` parameter injectors); concatenate u/resid; overall
retcode = Success iff every block succeeded, else the first failing
block's code.

Blocks are statically unrolled (the reference's @generated tuple path) — each
block's solve is independently jit-cached.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..core.problems import (HomotopyProblem, NonlinearProblem,
                             SCCNonlinearProblem)
from ..core.returncode import ReturnCode
from ..core.solution import NLStats, NonlinearSolution


@dataclasses.dataclass(frozen=True)
class SCCAlg:
    """The reference's SCC entry-point constructor
    (lib/SCCNonlinearSolve/src/SCCNonlinearSolve.jl:24-50):
    ``nlalg`` solves the nonlinear blocks, ``linalg`` the linear blocks
    (a LinearSolver config here), ``store_original`` keeps the per-block
    solutions on ``sol.original`` (default True here — the reference
    defaults to false; ours always stored them pre-r3 and tests rely on
    the tuple, documented deviation)."""

    nlalg: Any = None
    linalg: Any = None
    store_original: bool = True


@dataclasses.dataclass(frozen=True)
class LinearSCCBlock:
    """A linear block ``A(p) u = b(p)`` in an SCC sequence (the reference
    supports LinearProblem blocks alongside nonlinear ones)."""

    A: Callable       # p_block -> (n, n) matrix
    b: Callable       # p_block -> (n,) rhs


def solve_scc(prob: SCCNonlinearProblem, alg=None, **kwargs
              ) -> NonlinearSolution:
    from ..core.solve import solve_nonlinear, _default_algorithm
    from ..ops.linear_solve import solve_dense

    linalg = None
    store_original = True
    if isinstance(alg, SCCAlg):
        linalg = alg.linalg
        store_original = alg.store_original
        alg = alg.nlalg

    # maxtime applies PER BLOCK (the reference forwards solve kwargs to
    # each block's CommonSolve.solve); blocks carrying it go through the
    # front door, which owns the chunked-advance budget machinery.
    maxtime = kwargs.pop("maxtime", None)

    sols = []
    us = []
    resids = []
    retcode = jnp.int32(ReturnCode.Success)
    stats = NLStats.zeros()

    for i, block in enumerate(prob.probs):
        if prob.explicitfuns is not None and prob.explicitfuns[i] is not None:
            p_block = prob.explicitfuns[i](prob.p, tuple(sols))
        else:
            p_block = getattr(block, "p", prob.p)

        if isinstance(block, LinearSCCBlock):
            A = jnp.asarray(block.A(p_block))
            b = jnp.asarray(block.b(p_block))
            x, ok = (solve_dense(A, b, linalg) if linalg is not None
                     else solve_dense(A, b))
            sol = NonlinearSolution(
                u=x, resid=A @ x - b,
                retcode=jnp.where(ok, jnp.int32(ReturnCode.Success),
                                  jnp.int32(
                                      ReturnCode.InternalLinearSolveFailed)),
                stats=NLStats.zeros().incr(nsolve=1, nfactors=1))
        elif isinstance(block, HomotopyProblem):
            # A HomotopyProblem block (e.g. a Modelica `homotopy` operator
            # block) is swept by continuation; the SCC's nonlinear algorithm
            # is threaded in as the INNER corrector so its autodiff /
            # linear-solver choices are honored
            # (SCCNonlinearSolve.jl:96-107).
            from .homotopy import (ArcLengthContinuation,
                                   HomotopyPolyAlgorithm, HomotopySweep)
            block_prob = HomotopyProblem(block.f, block.u0, p_block,
                                         lambdaspan=block.lambdaspan,
                                         **block.kwargs)
            block_alg = HomotopyPolyAlgorithm(
                stages=(HomotopySweep(inner=alg),
                        ArcLengthContinuation(inner=alg)))
            from ..core.solve import solve
            sol = solve(block_prob, block_alg, **kwargs)
        else:
            block_prob = block.remake(p=p_block) \
                if p_block is not getattr(block, "p", None) else block
            block_alg = alg if alg is not None \
                else _default_algorithm(block_prob)
            if maxtime is not None:
                from ..core.solve import solve
                sol = solve(block_prob, block_alg, maxtime=maxtime,
                            **kwargs)
            else:
                sol = solve_nonlinear(block_prob, block_alg, **kwargs)

        sols.append(sol)
        us.append(jnp.ravel(jnp.asarray(sol.u)))
        resids.append(jnp.ravel(jnp.asarray(sol.resid)))
        block_failed = ~ReturnCode.successful(sol.retcode)
        retcode = jnp.where(
            block_failed & (retcode == ReturnCode.Success),
            sol.retcode, retcode)
        s = sol.stats
        stats = stats.incr(nf=s.nf, njacs=s.njacs, nfactors=s.nfactors,
                           nsolve=s.nsolve, nsteps=s.nsteps)

    return NonlinearSolution(
        u=jnp.concatenate(us), resid=jnp.concatenate(resids),
        retcode=retcode, stats=stats,
        original=tuple(sols) if store_original else None)


def scc_solve_up(prob: SCCNonlinearProblem, sensealg=None, u0=None, p=None,
                 alg=None, **kwargs) -> NonlinearSolution:
    """AD-hookable SCC solve entry (reference:
    lib/SCCNonlinearSolve/src/SCCNonlinearSolve.jl:66-72, exported at :209).

    In the reference this indirection exists so ChainRulesCore can attach an
    rrule; here JAX differentiates straight through ``solve_scc`` (each block
    solve carries the IFT custom-jvp), so this is a signature-parity shim.
    ``sensealg`` is accepted and ignored; ``u0`` is AD-hook-only in the
    reference too (SCC subproblems own their u0). A non-None ``p`` overrides
    ``prob.p``.
    """
    del sensealg, u0
    if p is not None:
        prob = SCCNonlinearProblem(probs=prob.probs,
                                   explicitfuns=prob.explicitfuns, p=p)
    return solve_scc(prob, alg, **kwargs)
