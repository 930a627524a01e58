"""User-defined algorithm extension point.

The reference lets users subclass AbstractNonlinearSolveAlgorithm and
implement the InternalAPI; here the contract is one method:

    class MySolver:
        name = "MySolver"
        def __hash__(self): ...            # static config -> jit plan key
        def run_flat(self, ctx, term_cfg, u0_flat, abstol, reltol,
                     maxiters) -> carry

``ctx.f_flat(u) -> fu`` is the flattened residual; the returned carry
must expose u / fu / retcode / stats / nsteps (``make_custom_carry``
assembles one and ``run_fixed_point_loop`` provides a ready-made
termination-integrated while_loop for solvers expressible as
``u_next = step(u, fu)``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core import termination as trm
from ..core.returncode import ReturnCode
from ..core.solution import NLStats
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class CustomCarry:
    u: Any
    fu: Any
    nsteps: Any
    force_stop: Any
    retcode: Any
    stats: Any
    term: Any
    state: Any = None


def make_custom_carry(u, fu, *, retcode=None, stats=None, nsteps=0,
                      term=None, state=None):
    return CustomCarry(
        u=u, fu=fu, nsteps=jnp.int32(nsteps),
        force_stop=jnp.bool_(False),
        retcode=(jnp.int32(ReturnCode.Default) if retcode is None
                 else retcode),
        stats=(NLStats.zeros() if stats is None else stats),
        term=term, state=state)


def run_fixed_point_loop(step: Callable, ctx, term_cfg, u0_flat, abstol,
                         reltol, maxiters, *, state0=None):
    """Drive ``u_next, state_next = step(u, fu, state)`` to convergence
    with the standard termination/retcode machinery."""
    fu0 = ctx.f_flat(u0_flat)
    term = trm.init_termination(term_cfg, fu0, u0_flat, reltol)
    carry0 = make_custom_carry(u0_flat, fu0, term=term, state=state0,
                               stats=NLStats.zeros().incr(nf=1))

    def cond(c):
        return (~c.force_stop) & (c.nsteps < maxiters)

    def body(c):
        u_new, state_new = step(c.u, c.fu, c.state)
        fu_new = ctx.f_flat(u_new)
        stop, term = trm.check_termination(
            term_cfg, c.term, fu_new, u_new, c.u, abstol, reltol,
            is_least_squares=ctx.is_least_squares)
        return CustomCarry(
            u=u_new, fu=fu_new, nsteps=c.nsteps + 1,
            force_stop=c.force_stop | stop,
            retcode=jnp.where(stop, term.retcode, c.retcode),
            stats=c.stats.incr(nf=1, nsteps=1), term=term,
            state=state_new)

    final = jax.lax.while_loop(cond, body, carry0)
    retcode = jnp.where(
        final.retcode == ReturnCode.Default,
        jnp.where(final.nsteps >= maxiters, jnp.int32(ReturnCode.MaxIters),
                  jnp.int32(ReturnCode.Success)),
        final.retcode)
    u_final = trm.termination_result(term_cfg, final.term, final.u)
    fu_final = ctx.f_flat(u_final) if term_cfg.keeps_best else final.fu
    return final.replace(u=u_final, fu=fu_final, retcode=retcode)
