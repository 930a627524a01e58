"""Device-side performance measurement helpers.

The shared-tunnel TPU time-slices across users and each dispatch pays a
host round-trip, so naive wall clocks lie twice over.  Two honest tools
(docs/tpu_tuning.md §8):

* ``profile_solve`` — capture a ``jax.profiler`` trace of one already-
  compiled solve; the engines annotate phases with ``jax.named_scope``
  ("nls.jacobian", "nls.descent"), so XProf/TensorBoard attributes kernel
  time to solver stages — the device-side analogue of the reference's
  TimerOutputs regions (timer_outputs.jl:3-55).
* ``chained_solve_time`` — per-solve device cost with dispatch amortized:
  chain k solves inside one jitted ``fori_loop``, threading a
  zero-weighted dependency of each u0 on the previous result so XLA
  cannot parallelize or elide the repeats.
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


def chained_solve_time(prob, alg=None, k: int = 4, reps: int = 3,
                       **solve_kwargs) -> float:
    """Per-solve DEVICE seconds, measured as a chain-length slope.

    Remote-dispatch tunnels make two naive timings lie: dispatch ships
    program constants every execution (tens of ms for MB-scale embedded
    arrays), and ``block_until_ready`` can acknowledge before the work
    completes.  So: build two jitted chains of 1 and ``k`` data-dependent
    solves, force completion of each by FETCHING a scalar reduced from
    the result (a host transfer cannot be acknowledged early), take
    min-of-``reps`` wall times, and return ``(T_k − T_1)/(k − 1)`` — the
    dispatch, shipping, and fetch-latency terms are identical in both
    chains and cancel in the difference."""
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

    def best_of(fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(u0))                         # fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = best_of(c1), best_of(ck)
    return max(tk - t1, 0.0) / (k - 1)
