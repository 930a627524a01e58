"""Device-side performance measurement helpers.

The shared-tunnel TPU time-slices across users and each dispatch pays a
host round-trip, so naive wall clocks lie twice over.  Two honest tools
(docs/tpu_tuning.md §8):

* ``profile_solve`` — capture a ``jax.profiler`` trace of one already-
  compiled solve; the engines annotate phases with ``jax.named_scope``
  ("nls.jacobian", "nls.descent"), so XProf/TensorBoard attributes kernel
  time to solver stages — the device-side analogue of the reference's
  TimerOutputs regions (timer_outputs.jl:3-55).
* ``chained_solve_time`` — per-solve marginal DEVICE seconds via the
  chain-length-slope method: two jitted chains of 1 and k data-dependent
  solves, completion forced by fetching a scalar, and the paired-median
  slope ``(T_k − T_1)/(k − 1)`` taken so every fixed term (dispatch,
  constant shipping, fetch latency) cancels.
* ``slope_time`` — the shared paired-median slope estimator both of the
  above and ``bench.py`` build on.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp


def profile_solve(prob, alg=None, trace_dir: str = "/tmp/nls_trace",
                  **solve_kwargs):
    """Run one warm (pre-compiled) solve under ``jax.profiler.trace``.

    Returns ``(solution, trace_dir)``; inspect with
    ``tensorboard --logdir trace_dir`` (XProf trace viewer)."""
    from ..core.solve import solve

    sol = solve(prob, alg, **solve_kwargs)        # compile + warm caches
    jax.block_until_ready(sol.u)
    with jax.profiler.trace(trace_dir):
        sol = solve(prob, alg, **solve_kwargs)
        jax.block_until_ready(sol.u)
    return sol, trace_dir


def slope_time(run_short, run_long, span: int, rounds: int = 5) -> float:
    """Paired-median chain-length slope: seconds of marginal device work
    per unit of ``span``.

    Remote-dispatch tunnels make naive timings lie three ways: dispatch
    ships program constants every execution (tens of ms for MB-scale
    embedded arrays), ``block_until_ready`` can acknowledge before the
    work completes, and each dispatch+fetch pays a ~25 ms round-trip.
    ``run_short``/``run_long`` must execute the SAME computation at two
    chain lengths differing by ``span`` and force completion internally
    (fetch a scalar — a host transfer cannot be acknowledged early).
    Each round times the pair back-to-back so both share a chip-load
    window; the MEDIAN round slope is kept because time-slicing bursts
    skew individual differences in either direction (a min chases rounds
    where load dropped mid-pair — observed as absurd or zero slopes)."""
    slopes = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        run_short()
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_long()
        tl = time.perf_counter() - t0
        slopes.append((tl - ts) / span)
    slopes.sort()
    return max(slopes[len(slopes) // 2], 0.0)


def chained_solve_time(prob, alg=None, k: int = 4, reps: int = 3,
                       **solve_kwargs) -> float:
    """Per-solve marginal DEVICE seconds: ``slope_time`` over jitted
    chains of 1 and ``k`` data-dependent solves (every fixed dispatch/
    shipping/fetch term appears in both chains and cancels)."""
    from ..core.solve import solve

    if k < 2:
        raise ValueError("slope timing needs k >= 2")
    u0 = prob.u0

    def make(n):
        @jax.jit
        def chained(u0arr):
            def body(_, acc):
                s = solve(prob.remake(u0=jax.tree_util.tree_map(
                    lambda a, b: a + 0.0 * b, u0arr, acc)), alg,
                    **solve_kwargs)
                return s.u
            out = jax.lax.fori_loop(0, n, body, u0arr)
            return sum(jnp.sum(jnp.abs(leaf).astype(jnp.float32))
                       for leaf in jax.tree_util.tree_leaves(out))
        return chained

    c1, ck = make(1), make(k)
    float(c1(u0))                                 # compile + warm
    float(ck(u0))
    return slope_time(lambda: float(c1(u0)), lambda: float(ck(u0)),
                      span=k - 1, rounds=reps)
