"""Return codes for nonlinear solves.

Mirrors the subset of ``SciMLBase.ReturnCode`` the reference uses
(see /root/reference/lib/NonlinearSolveBase/src/termination_conditions.jl and
FirstOrder ``solve.jl``).  Codes are plain ints so they can live inside jit
carries as ``int32`` scalars.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class ReturnCode(enum.IntEnum):
    Default = 0
    Success = 1
    Failure = 2
    MaxIters = 3
    MaxTime = 4
    Unstable = 5
    Stalled = 6
    StalledSuccess = 7
    Terminated = 8
    InternalLinearSolveFailed = 9
    InternalLineSearchFailed = 10
    ShrinkThresholdExceeded = 11
    InitialFailure = 12
    ConvergenceFailure = 13
    FloatingPointLimit = 14
    ExactSolutionLeft = 15
    ExactSolutionRight = 16
    # All polynomial-space roots were filtered (denominator zeros / NaN
    # preimages) — SciMLBase.ReturnCode.Infeasible as used by the
    # HomotopyContinuation bridge (solve.jl:98-105).
    Infeasible = 17

    @staticmethod
    def successful(code):
        """True for codes that count as a successful solve.

        Matches ``SciMLBase.successful_retcode``: Success, StalledSuccess and
        FloatingPointLimit (bracketing's eps-limited success) qualify.
        """
        code = jnp.asarray(code)
        return (
            (code == ReturnCode.Success)
            | (code == ReturnCode.StalledSuccess)
            | (code == ReturnCode.FloatingPointLimit)
            | (code == ReturnCode.ExactSolutionLeft)
            | (code == ReturnCode.ExactSolutionRight)
        )


def retcode_name(code) -> str:
    try:
        return ReturnCode(int(code)).name
    except ValueError:
        return f"Unknown({int(code)})"
