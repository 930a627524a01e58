"""NonlinearSolution and NLStats.

Mirrors ``SciMLBase.NonlinearSolution`` / ``SciMLBase.NLStats`` as used by the
reference's solution building
(/root/reference/lib/NonlinearSolveBase/src/solve.jl:400-440).  Both are
pytrees so whole solves stay jit/vmap-compatible; counters are int32 scalars.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .returncode import ReturnCode, retcode_name


@pytree_dataclass
class NLStats:
    """Solve counters (reference ``NLStats``: nf/njacs/nfactors/nsolve/nsteps,
    reset at abstract_types.jl:43-49)."""

    nf: Any = 0
    njacs: Any = 0
    nfactors: Any = 0
    nsolve: Any = 0
    nsteps: Any = 0

    @staticmethod
    def zeros():
        z = jnp.int32(0)
        return NLStats(z, z, z, z, z)

    def incr(self, *, nf=0, njacs=0, nfactors=0, nsolve=0, nsteps=0):
        return NLStats(
            self.nf + nf, self.njacs + njacs, self.nfactors + nfactors,
            self.nsolve + nsolve, self.nsteps + nsteps,
        )


@pytree_dataclass
class NonlinearSolution:
    """Result of a nonlinear solve.

    ``u``: solution iterate; ``resid``: f(u); ``retcode``: int32 ReturnCode;
    ``stats``: NLStats; ``trace``: optional stacked per-iteration diagnostics;
    ``original``: optional sub-solution (polyalgorithm / wrapper provenance).
    """

    u: Any
    resid: Any
    retcode: Any
    stats: Any = None
    trace: Any = None
    original: Any = None
    # per-phase timing dict from solve(..., time_phases=True)
    # (reference timer_outputs.jl role); None otherwise.
    timer: Any = None

    @property
    def success(self):
        return ReturnCode.successful(self.retcode)

    def __repr__(self):
        try:
            code = retcode_name(self.retcode)
        except Exception:
            code = "<traced>"
        return (f"NonlinearSolution(retcode={code}, u={self.u!r}, "
                f"resid={self.resid!r})")
