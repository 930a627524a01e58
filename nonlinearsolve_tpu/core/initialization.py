"""DAE-style initialization hook.

Port of the reference's ``NonlinearSolveDefaultInit`` / ``run_initialization!``
protocol (/root/reference/src/initialization.jl:3-38, defaults wired at
src/default.jl:52-63 and solve.jl:442-444, 686-697): when a problem's
function carries ``initialization_data``, a *sub* nonlinear problem (the
ModelingToolkit "OverrideInit" analogue — e.g. consistent algebraic states
for a DAE steady-state) is solved FIRST; its solution is mapped onto the
main problem's ``u0``/``p``.  If the init solve fails, the main solve is
aborted with ``ReturnCode.InitialFailure`` (initialization.jl:33-36).

TPU design: the init problem is itself an ordinary jitted solve (any
algorithm), composed at the host level before the main jitted solve — two
compiled executables, no tracing interaction between them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from .returncode import ReturnCode
from .solution import NonlinearSolution


@dataclasses.dataclass(frozen=True)
class InitializationData:
    """``initializeprob``: the sub-problem solved before the main solve.

    ``initializeprobmap(init_sol) -> u0`` maps the init solution onto the
    main problem's state (None keeps the original u0);
    ``initializeprobpmap(init_sol, p) -> p`` updates parameters (None keeps
    them).  ``alg`` optionally overrides the init solver.  Mirrors the
    fields SciMLBase's OverrideInitData exposes to run_initialization!.
    """

    initializeprob: Any
    initializeprobmap: Optional[Callable] = None
    initializeprobpmap: Optional[Callable] = None
    alg: Any = None
    abstol: Optional[float] = None

    def __hash__(self):
        return hash((id(self.initializeprob), self.initializeprobmap,
                     self.initializeprobpmap, id(self.alg)))


def run_initialization(prob, data: InitializationData):
    """Solve the init sub-problem and remap (u0, p).

    Returns ``(prob', init_sol, ok)`` — ``prob'`` has the mapped u0/p.
    """
    from .solve import solve as _solve

    kwargs = {} if data.abstol is None else {"abstol": data.abstol}
    init_sol = _solve(data.initializeprob, data.alg, **kwargs)
    ok = bool(init_sol.success)
    if not ok:
        return prob, init_sol, False
    u0 = (data.initializeprobmap(init_sol)
          if data.initializeprobmap is not None else prob.u0)
    p = (data.initializeprobpmap(init_sol, prob.p)
         if data.initializeprobpmap is not None else prob.p)
    return prob.remake(u0=u0, p=p), init_sol, True


def initial_failure_solution(prob, init_sol) -> NonlinearSolution:
    """The aborted-solve result (initialization.jl:33-36)."""
    resid = prob.f(prob.u0, prob.p)
    return NonlinearSolution(
        u=prob.u0, resid=resid,
        retcode=jnp.int32(ReturnCode.InitialFailure),
        stats=None, original=init_sol)
