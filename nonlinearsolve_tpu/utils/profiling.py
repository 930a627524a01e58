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


# ---------------------------------------------------------------------------
# Load-calibration probes (VERDICT r4 next#2)
# ---------------------------------------------------------------------------
# The tunnel chip is time-sliced: the same kernel moves ±30-100% between
# bench invocations with chip load (r3->r4 flagship 662->569 Gnnz/s).
# These probes measure two known-bound primitives IN THE SAME WINDOW as
# a bench row so raw numbers can be normalized by the chip time actually
# available:
#   * hbm_triad_probe  — y = a*x + y over arrays far beyond VMEM: pure
#     HBM stream, reports achieved GB/s (3 accesses/element/iteration).
#   * vpu_issue_probe  — a long fused elementwise chain on a VMEM-
#     resident tile: pure vector-issue, reports achieved Gop/s.
# Both use the chain-length slope discipline (slope_time) — fixed
# dispatch/fetch terms cancel.

def hbm_triad_probe(elems: int = 1 << 24, rounds: int = 5) -> float:
    """Achieved HBM stream bandwidth in GB/s (f32 triad).

    The recurrence is NONLINEAR (y ← x + y − εy², bounded fixed point
    ≈ √(x/ε)) so XLA cannot strength-reduce the loop to a closed form
    (an affine y += c body measured 2.4 TB/s — folded, not streamed).
    The span is sized so the long chain runs tens of ms of device time,
    well above the tunnel's dispatch noise."""
    x = jnp.arange(elems, dtype=jnp.float32) * 1e-9 + 1.0

    def make(length):
        @jax.jit
        def run(xa, y0):
            def body(y, _):
                # read x + read y + write y: 3 * 4 * elems bytes/iter —
                # ONE fused pass, no reduction
                return xa + y - 1e-6 * (y * y), None
            out, _ = jax.lax.scan(body, y0, None, length=length)
            return jnp.sum(out[:8])
        return run

    y0 = jnp.ones((elems,), jnp.float32)
    l1, l2 = 8, 264
    r1, r2 = make(l1), make(l2)
    float(r1(x, y0)); float(r2(x, y0))            # compile + warm
    t = max(slope_time(lambda: float(r1(x, y0)), lambda: float(r2(x, y0)),
                       span=l2 - l1, rounds=rounds), 1e-12)
    return 3.0 * 4.0 * elems / t / 1e9


def vpu_issue_probe(rounds: int = 5) -> float:
    """Achieved vector-issue rate in Gop/s: 32 unrolled mul-adds per
    scan step over a VMEM-resident (64, 128) tile — wide elementwise
    ops pipeline across the 8 native sublane tiles, so the chain is
    ISSUE-bound, not fma-latency-bound."""
    UNROLL = 32
    tile = jnp.full((64, 128), 1.0001, jnp.float32)

    def make(length):
        @jax.jit
        def run(t0):
            def body(t, _):
                for _i in range(UNROLL):
                    t = t * 1.0000001 + 1e-7     # one fused mul-add
                # growth ≈ 1.0000032^length: bounded, no clamp needed
                return t, None
            out, _ = jax.lax.scan(body, t0, None, length=length)
            return jnp.sum(out)
        return run

    l1, l2 = 1024, 132096
    r1, r2 = make(l1), make(l2)
    float(r1(tile)); float(r2(tile))
    t = max(slope_time(lambda: float(r1(tile)), lambda: float(r2(tile)),
                       span=l2 - l1, rounds=rounds), 1e-12)
    return 2.0 * UNROLL * tile.size / t / 1e9
