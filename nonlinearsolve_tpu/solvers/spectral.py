"""GeneralizedDFSane — Jacobian-free spectral engine.

TPU-native redesign of
/root/reference/lib/NonlinearSolveSpectralMethods/src/solve.jl: spectral step
``δu = -σₙ fu`` globalized by the robust non-monotone line search, with the
Barzilai–Borwein spectral parameter update
``σₙ = ⟨Δu, Δu⟩ / ⟨Δu, Δfu⟩`` clamped to ``[σ_min, σ_max]`` and the
``clamp(1/‖fu‖, 1, 1e5)`` fallback (solve.jl:269-290).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core import linesearch as lsr
from ..core import termination as trm
from ..core.tracing import init_trace, record_trace
from ..core.returncode import ReturnCode
from ..core.solution import NLStats
from ..utils.norms import l2_norm, tree_dot
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class GeneralizedDFSane:
    linesearch: Any = lsr.RobustNonMonotoneLineSearch()
    sigma_min: float = 1e-10
    sigma_max: float = 1e10
    sigma_1: Optional[float] = None
    name: str = "GeneralizedDFSane"


def DFSane(*, sigma_min: float = 1e-10, sigma_max: float = 1e10,
           sigma_1: float = 1.0, M: int = 10, gamma: float = 1e-4,
           tau_min: float = 0.1, tau_max: float = 0.5, n_exp: int = 2,
           max_inner_iterations: int = 100):
    """dfsane.jl:22-35.  Note the reference passes ``sigma_1 = nothing`` to
    the engine (adaptive initialization) while exposing ``sigma_1`` for the
    line search's initial step."""
    return GeneralizedDFSane(
        linesearch=lsr.RobustNonMonotoneLineSearch(
            gamma=gamma, sigma_1=sigma_1, M=M, tau_min=tau_min,
            tau_max=tau_max, n_exp=n_exp, maxiters=max_inner_iterations),
        sigma_min=sigma_min, sigma_max=sigma_max, sigma_1=None,
        name="DFSane",
    )


@pytree_dataclass
class DFSaneCarry:
    u: Any
    u_prev: Any
    fu: Any
    fu_prev: Any
    du: Any
    sigma: Any
    nsteps: Any
    force_stop: Any
    retcode: Any
    stats: Any
    term: Any
    ls_state: Any
    trace_state: Any = None


def _initial_sigma(alg: GeneralizedDFSane, u, fu):
    """solve.jl:205-214: σ = ⟨u,u⟩/⟨u,fu⟩, falling back to
    clamp(1/‖fu‖, 1, 1e5) outside [σ_min, σ_max]."""
    if alg.sigma_1 is not None:
        return jnp.asarray(alg.sigma_1,
                           jnp.zeros((), u.dtype).real.dtype)
    denom = tree_dot(u, fu)
    sigma = tree_dot(u, u) / jnp.where(denom == 0, jnp.ones_like(denom),
                                       denom)
    fallback = jnp.clip(1.0 / l2_norm(fu), 1.0, 1e5)
    in_bounds = ((alg.sigma_min <= jnp.abs(sigma))
                 & (jnp.abs(sigma) <= alg.sigma_max)
                 & (denom != 0) & jnp.isfinite(sigma))
    return jnp.where(in_bounds, sigma, fallback)


def init_dfsane(alg: GeneralizedDFSane, ctx, term_cfg, u0_flat,
                reltol) -> DFSaneCarry:
    fu0 = ctx.f_flat(u0_flat)
    term = trm.init_termination(term_cfg, fu0, u0_flat, reltol)
    ls_state = lsr.ls_init(alg.linesearch, ctx, fu0, u0_flat)
    return DFSaneCarry(
        u=u0_flat, u_prev=u0_flat, fu=fu0, fu_prev=fu0,
        du=jnp.zeros_like(u0_flat), sigma=_initial_sigma(alg, u0_flat, fu0),
        nsteps=jnp.int32(0), force_stop=jnp.bool_(False),
        retcode=jnp.int32(ReturnCode.Default),
        stats=NLStats.zeros().incr(nf=1), term=term, ls_state=ls_state,
        trace_state=init_trace(ctx.trace, u0_flat, u0_flat.dtype),
    )


def step_dfsane(alg: GeneralizedDFSane, ctx, term_cfg, carry: DFSaneCarry,
                abstol, reltol) -> DFSaneCarry:
    u, fu = carry.u, carry.fu
    du = -carry.sigma * fu

    ls_res = lsr.ls_solve(alg.linesearch, carry.ls_state, ctx, u, du, fu,
                          None, carry.nsteps)
    ls_failed = ~ls_res.success
    u_new = u + ls_res.alpha * du
    fu_new = ctx.f_flat(u_new)
    stats = carry.stats.incr(nf=ls_res.nf + 1, nsteps=1)
    if ctx.postcondition is not None:
        u_new = ctx.postcondition(u_new, u)
        fu_new = ctx.f_flat(u_new)
        stats = stats.incr(nf=1)
    ls_state = lsr.ls_post_step(alg.linesearch, ls_res.state, fu_new)

    stop, term = trm.check_termination(
        term_cfg, carry.term, fu_new, u_new, u, abstol, reltol,
        is_least_squares=ctx.is_least_squares)

    # Spectral parameter update (solve.jl:269-287).
    s = u_new - u
    y = fu_new - fu
    denom = tree_dot(s, y)
    sigma = tree_dot(s, s) / jnp.where(denom == 0, jnp.ones_like(denom),
                                       denom)
    fallback = jnp.clip(1.0 / l2_norm(fu_new), 1.0, 1e5)
    in_bounds = ((alg.sigma_min <= jnp.abs(sigma))
                 & (jnp.abs(sigma) <= alg.sigma_max)
                 & (denom != 0) & jnp.isfinite(sigma))
    sigma = jnp.where(in_bounds, sigma, fallback)

    retcode = jnp.int32(ReturnCode.Default)
    retcode = jnp.where(ls_failed,
                        jnp.int32(ReturnCode.InternalLineSearchFailed),
                        retcode)
    retcode = jnp.where(stop, term.retcode, retcode)
    force_stop = stop | ls_failed

    return DFSaneCarry(
        u=u_new, u_prev=u, fu=fu_new, fu_prev=fu, du=du, sigma=sigma,
        nsteps=carry.nsteps + 1,
        force_stop=carry.force_stop | force_stop,
        retcode=jnp.where(carry.force_stop, carry.retcode, retcode),
        stats=stats, term=term, ls_state=ls_state,
        trace_state=record_trace(ctx.trace, carry.trace_state,
                                 carry.nsteps + 1, fu_new,
                                 ls_res.alpha * du, None, u_new),
    )


def run_dfsane(alg: GeneralizedDFSane, ctx, term_cfg, u0_flat, abstol, reltol,
               maxiters):
    carry0 = init_dfsane(alg, ctx, term_cfg, u0_flat, reltol)

    def cond(carry):
        return (~carry.force_stop) & (carry.nsteps < maxiters)

    def body(carry):
        return step_dfsane(alg, ctx, term_cfg, carry, abstol, reltol)

    final = jax.lax.while_loop(cond, body, carry0)
    retcode = jnp.where(
        final.retcode == ReturnCode.Default,
        jnp.where(final.nsteps >= maxiters, jnp.int32(ReturnCode.MaxIters),
                  jnp.int32(ReturnCode.Success)),
        final.retcode)
    u_final = trm.termination_result(term_cfg, final.term, final.u)
    if term_cfg.keeps_best:
        fu_final = ctx.f_flat(u_final)
        final = final.replace(stats=final.stats.incr(nf=1))
    else:
        fu_final = final.fu
    return final.replace(u=u_final, fu=fu_final, retcode=retcode)
