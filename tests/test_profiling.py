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


def test_chained_solve_time_positive():
    prob = nls.NonlinearProblem(lambda u, p: u ** 2 - p,
                                jnp.array([1.0, 1.0]), 2.0)
    t = chained_solve_time(prob, nls.NewtonRaphson(), k=2, reps=1)
    assert 0 < t < 60
