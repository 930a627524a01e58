"""Steady-state solvers — the SteadyStateDiffEq.jl surface, TPU-native.

The reference solves ``SteadyStateProblem`` either by conversion to a
``NonlinearProblem`` (the ``SSRootfind`` wrapper) or by integrating
``du/dt = f(u, p)`` until the derivative is near zero (``DynamicSS``,
documented at /root/reference/docs/src/solvers/steady_state_solvers.md:39-70
and /root/reference/docs/src/native/steadystatediffeq.md).  ``DynamicSS``
converges to *stable* equilibria only, which is exactly why it exists: a
rootfinder may land on an unstable fixed point, the flow never will.

TPU-native design: the whole adaptive integration is one
``lax.while_loop`` whose body attempts a single step (accept or reject),
so solves jit, vmap, and compose into polyalgorithms like every other
engine.  Two integrators:

* ``method="tsit5"`` — Tsitouras 5(4) explicit RK (FSAL: the residual that
  is already in the carry is stage 1), PI step-size controller.  The
  reference's example choice (``DynamicSS(ODE.Tsit5())``).
* ``method="rosenbrock23"`` — Shampine–Reichelt ode23s, a 2(3) Rosenbrock-W
  method: one ``jacfwd`` + one LU factorization + three triangular solves
  per step.  The "adaptive stiff solver to allow very large time steps as
  the steady state approaches" the reference docs recommend.

Termination is the ``TerminateSteadyState`` callback test: after each
accepted step, stop when ``all(|du_i| ≤ abstol)`` or
``all(|du_i| ≤ reltol·|u_i|)`` (the solve-level abstol/reltol, as in the
reference where "the absolute and relative tolerances specify the
termination conditions on the derivative's closeness to zero").  The ODE
step-error tolerances are separate (``ode_abstol``/``ode_reltol``).
Reaching ``tspan`` first yields ``ReturnCode.MaxTime``; exhausting the
attempt budget yields ``MaxIters``; a collapsed step size yields
``Unstable``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.returncode import ReturnCode
from ..core.solution import NLStats
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class SSRootfind:
    """Solve the steady-state problem with a rootfinder (the reference's
    ``SSRootfind(alg)``): ``solve()`` unwraps this to ``alg`` (or the
    default polyalgorithm) on the converted ``NonlinearProblem``."""
    alg: Any = None


@static_config
class DynamicSS:
    method: str = "tsit5"          # "tsit5" | "rosenbrock23"
    tspan: float = float("inf")    # simulated-time budget
    dt: Optional[float] = None     # initial step (Hairer-style guess if None)
    # Derivative-test (TerminateSteadyState) tolerance OVERRIDES.  None →
    # the solve-level abstol/reltol (solve() defaults those to the
    # reference's 1e-8/1e-6 for DynamicSS, while an explicit solve(...,
    # abstol=...) wins).  Set these when composing DynamicSS inside a
    # polyalgorithm or the iterator cache, where the solve-level values
    # are the rootfinder eps^(4/5) defaults — far below what an
    # integrator's derivative test can reach.
    term_abstol: Optional[float] = None
    term_reltol: Optional[float] = None
    ode_abstol: float = 1e-6       # step-error control, not termination
    ode_reltol: float = 1e-3
    safety: float = 0.9
    qmin: float = 0.2
    qmax: float = 10.0
    name: str = "DynamicSS"


@pytree_dataclass
class SSCarry:
    u: Any
    fu: Any            # f(u) — both the ODE RHS at u and the residual
    t: Any
    dt: Any
    dt_cap: Any        # explicit-stability cap (see body comment)
    err_prev: Any      # previous accepted error norm (PI controller)
    nsteps: Any        # accepted steps
    attempts: Any      # accepted + rejected (budget)
    force_stop: Any
    retcode: Any
    stats: Any


# Tsitouras 2011 coefficients (the standard Tsit5 tableau).
_TSIT5_A = (
    (0.161,),
    (-0.008480655492356989, 0.335480655492357),
    (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
    (5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525),
    (5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401, -0.028269050394068383),
    (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774),
)
_TSIT5_BTILDE = (
    -0.00178001105222577714, -0.0008164344596567469, 0.007880878010261995,
    -0.1447110071732629, 0.5823571654525552, -0.45808210592918697,
    0.015151515151515152,
)


def _err_norm(err, u, u_new, ode_abstol, ode_reltol):
    sc = ode_abstol + jnp.maximum(jnp.abs(u), jnp.abs(u_new)) * ode_reltol
    return jnp.sqrt(jnp.mean((err / sc) ** 2))


def _tsit5_attempt(f, u, k1, h):
    """One Tsit5 attempt from (u, k1 = f(u)); returns (u_new, k7, err, nf)."""
    ks = [k1]
    for row in _TSIT5_A[:-1]:
        ui = u + h * sum(a * k for a, k in zip(row, ks))
        ks.append(f(ui))
    row7 = _TSIT5_A[-1]
    u_new = u + h * sum(a * k for a, k in zip(row7, ks))
    k7 = f(u_new)          # FSAL: k7 is f at the proposed iterate
    ks.append(k7)
    err = h * sum(b * k for b, k in zip(_TSIT5_BTILDE, ks))
    return u_new, k7, err, 6


_ROS_D = 1.0 / (2.0 + 2.0 ** 0.5)
_ROS_E32 = 6.0 + 2.0 ** 0.5


def _rosenbrock23_attempt(f, u, f0, h):
    """One ode23s attempt; returns (u_new, f_new, err, counters)."""
    from jax.scipy.linalg import lu_factor, lu_solve
    n = u.shape[0]
    J = jax.jacfwd(f)(u)
    W = jnp.eye(n, dtype=u.dtype) - (h * _ROS_D) * J
    lu = lu_factor(W)
    k1 = lu_solve(lu, f0)
    f1 = f(u + 0.5 * h * k1)
    k2 = k1 + lu_solve(lu, f1 - k1)
    u_new = u + h * k2
    f2 = f(u_new)
    k3 = lu_solve(lu, f2 - _ROS_E32 * (k2 - f1) - 2.0 * (k1 - f0))
    err = (h / 6.0) * (k1 - 2.0 * k2 + k3)
    return u_new, f2, err, 2


def run_dynamic_ss(alg: DynamicSS, ctx, term_cfg, u0_flat, abstol, reltol,
                   maxiters):
    """Engine entry: integrate to steady state (dispatch.run_algorithm)."""
    del term_cfg  # DynamicSS terminates on the derivative test (see module doc)
    f = ctx.f_flat
    dtype = jnp.zeros((), u0_flat.dtype).real.dtype
    f0 = f(u0_flat)
    order = 5.0 if alg.method == "tsit5" else 2.0
    beta1 = 0.7 / order
    beta2 = 0.4 / order

    if alg.dt is not None:
        dt0 = jnp.asarray(alg.dt, dtype)
    else:
        # Hairer's cheap h0 guess: 0.01·(scaled |u|)/(scaled |u'|).
        sc = alg.ode_abstol + jnp.abs(u0_flat) * alg.ode_reltol
        d0 = jnp.sqrt(jnp.mean((u0_flat / sc) ** 2))
        d1 = jnp.sqrt(jnp.mean((f0 / sc) ** 2))
        dt0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5),
                        jnp.asarray(1e-6, dtype), 0.01 * d0 / d1)
    tspan = jnp.asarray(alg.tspan, dtype)
    dt0 = jnp.minimum(dt0, tspan)
    dt_min = jnp.asarray(jnp.finfo(dtype).eps * 1e3, dtype)

    # Termination tolerances (TerminateSteadyState): config overrides win,
    # else the solve-level values.
    term_abstol = jnp.asarray(
        abstol if alg.term_abstol is None else alg.term_abstol, dtype)
    term_reltol = jnp.asarray(
        reltol if alg.term_reltol is None else alg.term_reltol, dtype)

    carry0 = SSCarry(
        u=u0_flat, fu=f0, t=jnp.zeros((), dtype), dt=dt0,
        dt_cap=jnp.asarray(jnp.inf, dtype),
        err_prev=jnp.ones((), dtype), nsteps=jnp.int32(0),
        attempts=jnp.int32(0), force_stop=jnp.bool_(False),
        retcode=jnp.int32(ReturnCode.Default),
        stats=NLStats.zeros().incr(nf=1))

    def cond(c):
        return (~c.force_stop) & (c.attempts < maxiters)

    def body(c):
        h = jnp.minimum(c.dt, tspan - c.t)
        if alg.method == "tsit5":
            u_new, f_new, err, nf = _tsit5_attempt(f, c.u, c.fu, h)
            counters = dict(nf=nf)
        else:
            u_new, f_new, err, nf = _rosenbrock23_attempt(f, c.u, c.fu, h)
            counters = dict(nf=nf, njacs=1, nfactors=1, nsolve=3)
        en = _err_norm(err, c.u, u_new, alg.ode_abstol, alg.ode_reltol)
        finite = jnp.isfinite(en) & jnp.all(jnp.isfinite(u_new))
        accept = finite & (en <= 1.0)

        # PI controller (predictive on accept, pure reject shrink otherwise).
        en_safe = jnp.maximum(en, 1e-10)
        q = alg.safety * en_safe ** (-beta1) * c.err_prev ** beta2
        q = jnp.clip(q, alg.qmin, alg.qmax)
        q = jnp.where(finite, q, jnp.asarray(alg.qmin, dtype))
        dt_new = jnp.where(accept, h * q,
                           h * jnp.minimum(q, jnp.ones((), dtype)))

        # Explicit-stability cap.  Near a stable equilibrium the local
        # error of the embedded pair stays small even at step sizes where
        # |R(hλ)| ≈ 1, so pure error control lets h drift to the stability
        # boundary and the iteration hovers without contracting (|du|
        # plateaus above the termination tolerance).  Estimate the dominant
        # local |λ| from the step just taken — ‖Δ(du/dt)‖/‖Δu‖, a free
        # directional Jacobian-norm estimate that also covers complex
        # pairs — and keep h·|λ| ≤ 2.5, safely inside Tsit5's ≈3.5
        # real-axis stability interval so the RK map contracts to the
        # fixed point.  (rosenbrock23 is L-stable: no cap needed.)
        if alg.method == "tsit5":
            du_step = u_new - c.u
            nd = jnp.sqrt(jnp.sum(du_step * du_step))
            nf_ = jnp.sqrt(jnp.sum((f_new - c.fu) ** 2))
            lam = nf_ / jnp.where(nd == 0, jnp.ones_like(nd), nd)
            cap = 2.5 / jnp.where(lam == 0, jnp.ones_like(lam), lam)
            cap = jnp.where((lam > 0) & (nd > 0) & jnp.isfinite(cap), cap,
                            jnp.asarray(jnp.inf, dtype))
            dt_cap = jnp.where(accept, cap, c.dt_cap)
            dt_new = jnp.minimum(dt_new, dt_cap)
        else:
            dt_cap = c.dt_cap

        t_new = jnp.where(accept, c.t + h, c.t)
        u_next = jnp.where(accept, u_new, c.u)
        f_next = jnp.where(accept, f_new, c.fu)

        # TerminateSteadyState on the accepted derivative: the test is
        # ELEMENTWISE-or (each component may pass either the absolute or
        # the relative criterion — DiffEqCallbacks' allDerivPass), so
        # mixed-scale systems terminate.
        du = f_next
        steady = jnp.all((jnp.abs(du) <= term_abstol)
                         | (jnp.abs(du) <= term_reltol * jnp.abs(u_next)))
        steady = accept & steady
        out_of_time = accept & (t_new >= tspan) & ~steady
        dead = (dt_new < dt_min) | (~finite & (h <= dt_min))

        retcode = jnp.where(
            steady, jnp.int32(ReturnCode.Success),
            jnp.where(out_of_time, jnp.int32(ReturnCode.MaxTime),
                      jnp.where(dead, jnp.int32(ReturnCode.Unstable),
                                jnp.int32(ReturnCode.Default))))
        return SSCarry(
            u=u_next, fu=f_next, t=t_new, dt=dt_new, dt_cap=dt_cap,
            err_prev=jnp.where(accept, en_safe, c.err_prev),
            nsteps=c.nsteps + jnp.where(accept, 1, 0),
            attempts=c.attempts + 1,
            force_stop=steady | out_of_time | dead,
            retcode=retcode,
            stats=c.stats.incr(nsteps=jnp.where(accept, 1, 0), **counters))

    final = jax.lax.while_loop(cond, body, carry0)
    retcode = jnp.where(final.retcode == ReturnCode.Default,
                        jnp.int32(ReturnCode.MaxIters), final.retcode)
    return final.replace(retcode=retcode)
