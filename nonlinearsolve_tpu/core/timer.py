"""Per-phase solve timing — the reference's ``@static_timeit`` /
TimerOutputs subsystem (/root/reference/lib/NonlinearSolveBase/src/
timer_outputs.jl:3-55: regions "jacobian", "descent", "linesearch",
"linear solve" around the step! phases, gated by a preference so the
default path pays nothing).

TPU-native analogue: the solver loop is ONE compiled ``lax.while_loop`` —
host timers cannot see inside it.  When ``solve(..., time_phases=True)``
is requested, ordered host callbacks (``jax.experimental.io_callback``)
are traced in at the phase boundaries; each callback records a wall-clock
timestamp as the computation streams past it, and consecutive timestamps
attribute the elapsed segment to the phase that opened it.  This is an
opt-in diagnostic mode exactly like the reference's (the callbacks
serialize the phases, so it perturbs absolute performance); the default
path keeps zero-cost ``jax.named_scope`` annotations for the profiler.

On CPU the callbacks run inline (timings are sharp); on TPU they flush
through the host callback stream (timings are approximate but ordered).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

PHASES = ("jacobian", "descent", "linesearch", "other")


class PhaseTimer:
    """Host-side accumulator fed by traced ordered callbacks.

    One instance per instrumented solve; entering it into the jit plan
    keys a fresh compilation (diagnostic mode — mirrors the reference
    recompiling when the timer preference flips).
    """

    def __init__(self):
        self._events = []     # (phase_id, perf_counter)

    # -- host side ----------------------------------------------------------
    def _record(self, pid):
        self._events.append((int(pid), time.perf_counter()))

    # -- trace side ---------------------------------------------------------
    def mark(self, phase: str):
        """Trace a phase-boundary marker (the segment that follows is
        attributed to ``phase``)."""
        from jax.experimental import io_callback
        io_callback(self._record, None, jnp.int32(PHASES.index(phase)),
                    ordered=True)

    # -- reporting ----------------------------------------------------------
    def summarize(self) -> Dict[str, float]:
        """Total seconds per phase (the segment opened by each marker runs
        until the next marker)."""
        totals = {p: 0.0 for p in PHASES}
        ev = self._events
        for (pid, t0), (_, t1) in zip(ev, ev[1:]):
            totals[PHASES[pid]] += t1 - t0
        totals["total"] = ev[-1][1] - ev[0][1] if len(ev) >= 2 else 0.0
        totals["n_marks"] = len(ev)
        return totals

    def report(self) -> str:
        s = self.summarize()
        lines = [f"{'phase':<12s}{'seconds':>12s}{'share':>9s}"]
        tot = s["total"] or 1.0
        for p in PHASES:
            lines.append(f"{p:<12s}{s[p]:>12.6f}{s[p] / tot:>8.1%}")
        lines.append(f"{'total':<12s}{s['total']:>12.6f}")
        return "\n".join(lines)
