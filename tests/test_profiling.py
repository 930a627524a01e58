"""Device-side measurement helpers (utils/profiling.py) — the TimerOutputs
/ @btime analogue of the reference's performance tooling."""

import os
import tempfile

import jax.numpy as jnp

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.utils.profiling import (chained_solve_time,
                                                profile_solve)


def test_profile_solve_writes_trace():
    prob = nls.NonlinearProblem(lambda u, p: u ** 2 - p,
                                jnp.array([1.0, 1.0]), 2.0)
    with tempfile.TemporaryDirectory() as d:
        sol, td = profile_solve(prob, nls.NewtonRaphson(), trace_dir=d)
        assert bool(sol.success)
        files = [f for _, _, fs in os.walk(d) for f in fs]
        assert files, "profiler trace produced no files"


def test_chained_solve_time_slope():
    prob = nls.NonlinearProblem(lambda u, p: u ** 2 - p,
                                jnp.array([1.0, 1.0]), 2.0)
    # Slope timing: (T_k - T_1)/(k - 1).  On CPU the per-solve work for a
    # 2-vector problem is microseconds, so the clamped slope may be 0
    # under timer noise — assert well-formed, not strictly positive.
    t = chained_solve_time(prob, nls.NewtonRaphson(), k=3, reps=2)
    assert 0 <= t < 60
    import pytest
    with pytest.raises(ValueError, match="k >= 2"):
        chained_solve_time(prob, nls.NewtonRaphson(), k=1)
