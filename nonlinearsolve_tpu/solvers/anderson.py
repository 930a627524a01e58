"""Anderson acceleration — fixed-point acceleration for root finding.

The reference reaches Anderson through its extension wrappers
(FixedPointAccelerationJL / SpeedMappingJL / NLsolveJL's :anderson,
/root/reference/src/extension_algs.jl:478-490 and the corresponding ext/
implementations).  This is the TPU-native engine: Walker & Ni (2011)
Type-II Anderson with

* static ring buffers ``dU``/``dF`` of the last ``m`` state/residual
  differences (shape (m, n) — fully static, while_loop friendly),
* the per-step least-squares ``min_γ ‖F_k − dFᵀ γ‖`` solved via
  Tikhonov-regularized m×m normal equations — an MXU-shaped batch of tiny
  matmuls rather than the sequential QR updates CPU implementations use,
* damping/mixing β, and Picard fallback when the history is empty.

For ``f(u) = 0`` the underlying fixed-point map is ``g(u) = u + β f(u)``;
for genuine fixed-point problems pass ``f(u) = g(u) − u``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core import termination as trm
from ..core.tracing import init_trace, record_trace
from ..core.returncode import ReturnCode
from ..core.solution import NLStats
from ..ops.linear_solve import _square_solve
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class AndersonAcceleration:
    """``m``: history depth; ``beta``: mixing/damping; ``regularization``:
    Tikhonov λ on the normal equations (scaled by trace)."""

    m: int = 5
    beta: float = 1.0
    regularization: float = 1e-10
    name: str = "AndersonAcceleration"


@pytree_dataclass
class AndersonCarry:
    u: Any
    fu: Any
    dU: Any          # (m, n) state differences ring
    dF: Any          # (m, n) residual differences ring
    count: Any       # total updates written
    nsteps: Any
    force_stop: Any
    retcode: Any
    stats: Any
    term: Any
    trace_state: Any = None


def _anderson_gamma(dF, fu, hist_mask, reg):
    """Solve the masked normal equations (dF dFᵀ + λI) γ = dF fu.
    Invalid history rows are masked to zero and their diagonal set to 1 so
    the system stays well-posed with γᵢ = 0 there."""
    m = dF.shape[0]
    dFm = dF * hist_mask[:, None]
    G = dFm @ dFm.T
    lam = reg * (jnp.trace(G) + 1.0)
    G = G + lam * jnp.eye(m, dtype=G.dtype)
    # rows with no history: identity row, zero rhs -> gamma = 0
    G = jnp.where((hist_mask[:, None] * hist_mask[None, :]) > 0, G,
                  jnp.eye(m, dtype=G.dtype))
    rhs = (dFm @ fu) * hist_mask
    gamma = _square_solve(G, rhs)
    return jnp.where(jnp.isfinite(gamma), gamma, 0.0)


def init_anderson(alg: AndersonAcceleration, ctx, term_cfg, u0_flat,
                  reltol) -> AndersonCarry:
    fu0 = ctx.f_flat(u0_flat)
    n = u0_flat.shape[0]
    m = min(alg.m, n)
    dtype = u0_flat.dtype
    term = trm.init_termination(term_cfg, fu0, u0_flat, reltol)
    return AndersonCarry(
        u=u0_flat, fu=fu0,
        dU=jnp.zeros((m, n), dtype), dF=jnp.zeros((m, n), dtype),
        count=jnp.int32(0), nsteps=jnp.int32(0),
        force_stop=jnp.bool_(False),
        retcode=jnp.int32(ReturnCode.Default),
        stats=NLStats.zeros().incr(nf=1), term=term,
        trace_state=init_trace(ctx.trace, u0_flat, u0_flat.dtype),
    )


def step_anderson(alg: AndersonAcceleration, ctx, term_cfg,
                  carry: AndersonCarry, abstol, reltol) -> AndersonCarry:
    dtype = carry.u.dtype
    m = carry.dU.shape[0]
    beta = jnp.asarray(alg.beta, dtype)
    u, fu = carry.u, carry.fu
    hist = jnp.minimum(carry.count, m)
    hist_mask = (jnp.arange(m) < hist).astype(dtype)

    gamma = _anderson_gamma(carry.dF, fu, hist_mask,
                            jnp.asarray(alg.regularization, dtype))
    # u⁺ = u + βF − (dU + β dF)ᵀ γ  (Walker-Ni type II)
    u_new = u + beta * fu - (carry.dU + beta * carry.dF).T @ gamma
    fu_new = ctx.f_flat(u_new)
    stats = carry.stats.incr(nf=1, nsteps=1)
    if ctx.postcondition is not None:
        u_new = ctx.postcondition(u_new, u)
        fu_new = ctx.f_flat(u_new)
        stats = stats.incr(nf=1)

    # ring update with the new (Δu, ΔF) pair
    slot = carry.count % m
    dU = carry.dU.at[slot].set(u_new - u)
    dF = carry.dF.at[slot].set(fu_new - fu)

    stop, term = trm.check_termination(
        term_cfg, carry.term, fu_new, u_new, u, abstol, reltol,
        is_least_squares=ctx.is_least_squares)
    retcode = jnp.where(stop, term.retcode,
                        jnp.int32(ReturnCode.Default))

    return AndersonCarry(
        u=u_new, fu=fu_new, dU=dU, dF=dF, count=carry.count + 1,
        nsteps=carry.nsteps + 1,
        force_stop=carry.force_stop | stop,
        retcode=jnp.where(carry.force_stop, carry.retcode, retcode),
        stats=stats, term=term,
        trace_state=record_trace(ctx.trace, carry.trace_state,
                                 carry.nsteps + 1, fu_new, u_new - u,
                                 None, u_new),
    )


def run_anderson(alg: AndersonAcceleration, ctx, term_cfg, u0_flat, abstol,
                 reltol, maxiters):
    carry0 = init_anderson(alg, ctx, term_cfg, u0_flat, reltol)

    def cond(carry):
        return (~carry.force_stop) & (carry.nsteps < maxiters)

    def body(carry):
        return step_anderson(alg, ctx, term_cfg, carry, abstol, reltol)

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
