"""Iteration tracing and live trace printing.

Port of /root/reference/lib/NonlinearSolveBase/src/tracing.jl: the
``show_trace`` / ``store_trace`` / ``trace_level`` solve options.  Levels
mirror TraceMinimal (iter, ‖f‖, ‖δu‖), TraceWithJacobianConditionNumber
(+cond(J)) and TraceAll (+ full iterate copies) (tracing.jl:19-53).

TPU design (SURVEY §5.1): traces are host-callback-free — stored traces are
stacked carry outputs (a fixed-size ring of per-iteration records riding in
the while_loop carry), and ``show_trace`` prints live from inside jit via
``jax.debug.print``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_config


@static_config
class TraceConfig:
    store: bool = False
    show: bool = False
    level: str = "minimal"     # 'minimal' | 'condition' | 'all'
    buffer: int = 128          # stored-entry capacity (ring)

    @property
    def active(self) -> bool:
        return self.store or self.show


def TraceMinimal(**kw):
    return TraceConfig(level="minimal", **kw)


def TraceWithJacobianConditionNumber(**kw):
    return TraceConfig(level="condition", **kw)


def TraceAll(**kw):
    return TraceConfig(level="all", **kw)


@pytree_dataclass
class TraceState:
    n: Any               # int32 number of recorded entries
    fnorm: Any           # (buffer,)
    dunorm: Any          # (buffer,)
    condJ: Any           # (buffer,) or None
    u_history: Any       # (buffer, n_state) or None


@pytree_dataclass
class Trace:
    """Stored trace attached to NonlinearSolution.trace."""

    n: Any
    fnorm: Any
    dunorm: Any
    condJ: Any = None
    u_history: Any = None

    def __repr__(self):
        try:
            n = int(self.n)
        except Exception:
            return "Trace(<traced>)"
        lines = ["iter      ‖f‖           ‖δu‖" +
                 ("          cond(J)" if self.condJ is not None else "")]
        for i in range(min(n, self.fnorm.shape[0])):
            row = f"{i + 1:5d}  {float(self.fnorm[i]):12.6e}  " \
                  f"{float(self.dunorm[i]):12.6e}"
            if self.condJ is not None:
                row += f"  {float(self.condJ[i]):12.6e}"
            lines.append(row)
        return "\n".join(lines)


def init_trace(cfg: Optional[TraceConfig], u0_flat, dtype):
    if cfg is None or not cfg.active:
        return None
    b = cfg.buffer
    return TraceState(
        n=jnp.int32(0),
        fnorm=jnp.zeros((b,), dtype),
        dunorm=jnp.zeros((b,), dtype),
        condJ=(jnp.zeros((b,), dtype) if cfg.level in ("condition", "all")
               else None),
        u_history=(jnp.zeros((b, int(u0_flat.size)), dtype)
                   if cfg.level == "all" else None),
    )


def record_trace(cfg: Optional[TraceConfig], state, nsteps, fu, du, J, u):
    """Record one iteration (update_trace! analogue).  Returns new state."""
    if cfg is None or not cfg.active or state is None:
        return state
    from ..utils.norms import l2_norm
    fnorm = l2_norm(fu)
    dunorm = l2_norm(du)
    if cfg.show:
        jax.debug.print("iter {i}: ‖f‖={f:.6e}  ‖δu‖={d:.6e}",
                        i=nsteps, f=fnorm, d=dunorm, ordered=True)
    slot = jnp.mod(state.n, cfg.buffer)
    new = TraceState(
        n=state.n + 1,
        fnorm=state.fnorm.at[slot].set(fnorm),
        dunorm=state.dunorm.at[slot].set(dunorm),
        condJ=state.condJ, u_history=state.u_history)
    if state.condJ is not None and isinstance(J, jnp.ndarray) \
            and J.ndim == 2 and J.shape[0] == J.shape[1]:
        sv = jnp.linalg.svd(J, compute_uv=False)
        cond = sv[0] / jnp.where(sv[-1] == 0, jnp.finfo(sv.dtype).tiny,
                                 sv[-1])
        new = new.replace(condJ=state.condJ.at[slot].set(cond))
    if state.u_history is not None:
        new = new.replace(
            u_history=state.u_history.at[slot].set(jnp.ravel(u)))
    return new


def finalize_trace(cfg: Optional[TraceConfig], state) -> Optional[Trace]:
    if cfg is None or not cfg.store or state is None:
        return None
    return Trace(n=state.n, fnorm=state.fnorm, dunorm=state.dunorm,
                 condJ=state.condJ, u_history=state.u_history)
