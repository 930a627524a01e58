"""Iterator interface — init / step / solve / reinit.

Port of the reference's cache/iterator protocol
(/root/reference/lib/NonlinearSolveBase/src/solve.jl:229-311, 783-822 and
``InternalAPI.reinit!`` via @internal_caches, abstract_types.jl:690-729):

    cache = init(prob, alg)
    cache.step()              # one iteration (CommonSolve.step!)
    sol = cache.solve()       # run to completion from the current state
    cache.reinit(u0=..., p=...)   # warm-reset for the next solve

This is how ODE integrators and the continuation drivers consume nonlinear
solvers.  The TPU design keeps TWO jitted executables per (prob.f, alg):
one single-step and one run-to-completion, both operating on the same carry
pytree, so stepping and solving share compilation and the carry round-trips
without host copies.  In-memory resumability is first-class (SURVEY §5.4):
the carry is a pytree → checkpointable with orbax as-is.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..utils.norms import get_tolerance
from .descent import DescentCtx
from .jacobian import JacobianSpec
from .returncode import ReturnCode
from .solution import NonlinearSolution
from .termination import default_termination_mode


def _build_ctx_and_engine(plan, u0, p):
    """Shared trace-time setup: returns (engine_fns, ctx, unravels)."""
    f, alg, term_cfg, is_lsq = plan
    u0_flat, unravel_u = ravel_pytree(u0)
    fu0_flat, unravel_fu = ravel_pytree(f(u0, p))

    def f_flat(u_vec):
        out, _ = ravel_pytree(f(unravel_u(u_vec), p))
        return out

    ctx = DescentCtx(f_flat=f_flat, n_in=int(u0_flat.size),
                     n_out=int(fu0_flat.size), is_least_squares=bool(is_lsq))
    return ctx, u0_flat, unravel_u, unravel_fu


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_init(plan, u0, p, reltol):
    from ..solvers.anderson import AndersonAcceleration, init_anderson
    from ..solvers.first_order import (GeneralizedFirstOrderAlgorithm,
                                       init_first_order)
    from ..solvers.quasi_newton import QuasiNewtonAlgorithm, init_quasi_newton
    from ..solvers.spectral import GeneralizedDFSane, init_dfsane
    from ..core.jacobian import construct_jacobian
    f, alg, term_cfg, is_lsq = plan
    ctx, u0_flat, _, _ = _build_ctx_and_engine(plan, u0, p)
    if isinstance(alg, GeneralizedFirstOrderAlgorithm):
        return init_first_order(alg, ctx, term_cfg, u0_flat, reltol)
    if isinstance(alg, QuasiNewtonAlgorithm):
        jac_fn, _ = construct_jacobian(alg.jacobian, None, ctx, None)
        return init_quasi_newton(alg, ctx, term_cfg, jac_fn, u0_flat, reltol)
    if isinstance(alg, GeneralizedDFSane):
        return init_dfsane(alg, ctx, term_cfg, u0_flat, reltol)
    if isinstance(alg, AndersonAcceleration):
        return init_anderson(alg, ctx, term_cfg, u0_flat, reltol)
    raise ValueError(
        f"iterator interface supports first-order, quasi-Newton, spectral "
        f"and Anderson algorithms, got {alg!r}")


_STEP_CHUNK = 16


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_step(plan, carry, p, u0_proto, abstol, reltol):
    return _step_body(plan, carry, p, u0_proto, abstol, reltol)


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_advance(plan, carry, p, u0_proto, abstol, reltol, upto):
    """Iterate up to ``nsteps == upto`` WITHOUT finalizing — used both by
    the run-to-completion path and by maxtime chunking (a chunk boundary
    must not trigger the MaxIters mapping or best-u retention)."""

    def cond(c):
        return (~c.force_stop) & (c.nsteps < upto)

    def body(c):
        return _step_body(plan, c, p, u0_proto, abstol, reltol)

    return jax.lax.while_loop(cond, body, carry)


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_finalize(plan, carry, p, u0_proto, maxiters):
    """Map Default retcode to MaxIters/Success and apply safe-best
    retention.  Pre-set retcodes (termination failures, MaxTime) stick."""
    from ..core import termination as trm
    f, alg, term_cfg, is_lsq = plan
    retcode = jnp.where(
        carry.retcode == ReturnCode.Default,
        jnp.where(carry.nsteps >= maxiters, jnp.int32(ReturnCode.MaxIters),
                  jnp.int32(ReturnCode.Success)),
        carry.retcode)
    ctx, _, _, _ = _build_ctx_and_engine(plan, u0_proto, p)
    u_final = trm.termination_result(term_cfg, carry.term, carry.u)
    fu_final = ctx.f_flat(u_final) if term_cfg.keeps_best else carry.fu
    return carry.replace(u=u_final, fu=fu_final, retcode=retcode)


def _jit_solve_from(plan, carry, p, u0_proto, abstol, reltol, maxiters):
    """Run to completion from an existing carry (CommonSolve.solve!)."""
    final = _jit_advance(plan, carry, p, u0_proto, abstol, reltol, maxiters)
    return _jit_finalize(plan, final, p, u0_proto, maxiters)


def _step_body(plan, carry, p, u0_proto, abstol, reltol):
    from ..solvers.anderson import AndersonAcceleration, step_anderson
    from ..solvers.first_order import (GeneralizedFirstOrderAlgorithm,
                                       step_first_order)
    from ..solvers.quasi_newton import step_quasi_newton
    from ..solvers.spectral import GeneralizedDFSane, step_dfsane
    from ..core.jacobian import construct_jacobian
    f, alg, term_cfg, is_lsq = plan
    ctx, _, _, _ = _build_ctx_and_engine(plan, u0_proto, p)
    if isinstance(alg, GeneralizedFirstOrderAlgorithm):
        jac_fn, _ = construct_jacobian(alg.jacobian, alg.get_linsolve(), ctx,
                                       None, alg.concrete_jac)
        return step_first_order(alg, ctx, term_cfg, jac_fn, carry, abstol,
                                reltol)
    if isinstance(alg, GeneralizedDFSane):
        return step_dfsane(alg, ctx, term_cfg, carry, abstol, reltol)
    if isinstance(alg, AndersonAcceleration):
        return step_anderson(alg, ctx, term_cfg, carry, abstol, reltol)
    jac_fn, _ = construct_jacobian(alg.jacobian, None, ctx, None)
    return step_quasi_newton(alg, ctx, term_cfg, jac_fn, carry, abstol,
                             reltol)


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_polyalg_solve(plan, u0, p, abstol, reltol, maxiters, hint):
    from ..core.jacobian import JacobianSpec
    from ..solvers.polyalg import run_polyalg
    f, alg, term_cfg, is_lsq = plan
    ctx, u0_flat, _, _ = _build_ctx_and_engine(plan, u0, p)
    carry = run_polyalg(alg, ctx, term_cfg, JacobianSpec(), u0_flat, abstol,
                        reltol, maxiters, start_hint=hint)
    return carry


class _PolyalgResult:
    """Accessor adapter over a finished polyalgorithm run."""

    def __init__(self, *, u, fu, retcode, stats, nsteps):
        self.u = u
        self.fu = fu
        self.retcode = retcode
        self.stats = stats
        self.nsteps = nsteps


class _PolyalgCacheMixin:
    """Warm polyalgorithm cache: best-subalgorithm retention across
    reinit/solve cycles with re-probing every 8th solve and wrap-around
    escalation (the reference's retain_best cache, polyalg.jl:30-64 +
    generated solve!, solve.jl:541-568)."""

    _REPROBE_EVERY = 8

    def _polyalg_solve(self) -> NonlinearSolution:
        hint = jnp.int32(0) if (self._winner is None
                                or self._nsolves % self._REPROBE_EVERY == 0) \
            else jnp.int32(self._winner)
        carry = _jit_polyalg_solve(self._plan, self.prob.u0, self.p,
                                   self.abstol, self.reltol, self.maxiters,
                                   hint)
        self._nsolves += 1
        winner = int(carry.winner)
        self._winner = winner if winner >= 0 else None
        # PolyCarry has no per-step fields (nsteps/force_stop/term); keep
        # a uniform accessor surface via a tiny adapter.
        self.carry = _PolyalgResult(u=carry.u, fu=carry.fu,
                                    retcode=carry.retcode, stats=carry.stats,
                                    nsteps=carry.stats.nsteps)
        _, unravel_fu = ravel_pytree(self.prob.f(self.prob.u0, self.p))
        return NonlinearSolution(
            u=self._unravel_u(carry.u), resid=unravel_fu(carry.fu),
            retcode=carry.retcode, stats=carry.stats)


class NonlinearSolveCache(_PolyalgCacheMixin):
    """Stateful handle over the functional carry (the reference's
    AbstractNonlinearSolveCache role)."""

    def __init__(self, prob, alg, *, abstol=None, reltol=None, maxiters=1000,
                 termination_condition=None):
        from .problems import NonlinearProblem
        # DAE-style initialization hook runs at init time too
        # (solve.jl:686-697 runs run_initialization! inside __init).
        init_data = getattr(getattr(prob, "f", None),
                            "initialization_data", None)
        if init_data is not None:
            from .initialization import run_initialization
            prob, init_sol, ok = run_initialization(prob, init_data)
            if not ok:
                raise RuntimeError(
                    "initialization problem failed to converge "
                    f"(retcode={int(init_sol.retcode)}); cannot build a "
                    "solver cache from an inconsistent state")
        self.prob = prob
        self.alg = alg
        u0_flat, unravel_u = ravel_pytree(prob.u0)
        self._unravel_u = unravel_u
        self._dtype = u0_flat.dtype
        self.abstol = jnp.asarray(get_tolerance(abstol, self._dtype),
                                  self._dtype)
        self.reltol = jnp.asarray(get_tolerance(reltol, self._dtype),
                                  self._dtype)
        self.maxiters = jnp.int32(maxiters)
        if termination_condition is None:
            termination_condition = default_termination_mode(
                prob.is_least_squares)
        self._plan = (prob.f, alg, termination_condition,
                      bool(prob.is_least_squares))
        self.p = prob.p
        from ..solvers.polyalg import NonlinearSolvePolyAlgorithm
        self._is_polyalg = isinstance(alg, NonlinearSolvePolyAlgorithm)
        self._winner = None
        self._nsolves = 0
        if self._is_polyalg:
            # No per-step carry until the first solve; accessors reflect u0.
            self.carry = None
            return
        self.carry = _jit_init(self._plan, prob.u0, prob.p, self.reltol)

    # -- accessors (get_u / get_fu / get_nsteps, abstract_types.jl:366-463)
    @property
    def u(self):
        if self.carry is None:
            return self.prob.u0
        return self._unravel_u(self.carry.u)

    @property
    def fu(self):
        if self.carry is None:
            return ravel_pytree(self.prob.f(self.prob.u0, self.p))[0]
        return self.carry.fu

    @property
    def nsteps(self) -> int:
        return 0 if self.carry is None else int(self.carry.nsteps)

    @property
    def retcode(self):
        if self.carry is None:
            return jnp.int32(ReturnCode.Default)
        return self.carry.retcode

    @property
    def stats(self):
        from .solution import NLStats
        return NLStats.zeros() if self.carry is None else self.carry.stats

    @property
    def best_subalgorithm(self):
        """Index of the retained winning rung (polyalgorithm caches), or
        None before the first successful solve."""
        return self._winner

    def step(self, n: int = 1):
        """Advance ``n`` iterations (CommonSolve.step!, solve.jl:799-822)."""
        if self._is_polyalg:
            raise NotImplementedError(
                "per-step iteration of a polyalgorithm cache is not "
                "supported — use solve(); the winning subalgorithm is "
                "retained across reinit()/solve() cycles")
        for _ in range(n):
            self.carry = _jit_step(self._plan, self.carry, self.p,
                                   self.prob.u0, self.abstol, self.reltol)
        return self

    def solve(self, maxtime: Optional[float] = None) -> NonlinearSolution:
        """Run to completion from the current state (CommonSolve.solve!).

        ``maxtime`` (seconds, host wall clock) mirrors the reference's
        MaxTime budget (solve.jl:811-819): the solve proceeds in compiled
        step chunks and stops with ReturnCode.MaxTime once the budget is
        exhausted."""
        if self._is_polyalg:
            if maxtime is not None:
                raise NotImplementedError(
                    "maxtime is not supported for polyalgorithm caches "
                    "(the ladder runs as one compiled program); set "
                    "maxiters or use a single-algorithm cache")
            return self._polyalg_solve()
        # A previous MaxTime stop is a host-level budget, not solver state:
        # clear it so a later solve()/solve(maxtime=...) resumes iterating.
        if int(self.carry.retcode) == int(ReturnCode.MaxTime):
            self.carry = self.carry.replace(
                retcode=jnp.int32(ReturnCode.Default),
                force_stop=jnp.bool_(False))
        if maxtime is None:
            self.carry = _jit_solve_from(self._plan, self.carry, self.p,
                                         self.prob.u0, self.abstol,
                                         self.reltol, self.maxiters)
        else:
            import time as _time
            deadline = _time.monotonic() + maxtime
            while (not bool(self.carry.force_stop)
                   and int(self.carry.nsteps) < int(self.maxiters)):
                if _time.monotonic() >= deadline:
                    self.carry = self.carry.replace(
                        retcode=jnp.int32(ReturnCode.MaxTime),
                        force_stop=jnp.bool_(True))
                    break
                chunk = jnp.minimum(
                    self.maxiters,
                    jnp.int32(int(self.carry.nsteps) + _STEP_CHUNK))
                self.carry = _jit_advance(self._plan, self.carry, self.p,
                                          self.prob.u0, self.abstol,
                                          self.reltol, chunk)
            self.carry = _jit_finalize(self._plan, self.carry, self.p,
                                       self.prob.u0, self.maxiters)
        _, unravel_fu = ravel_pytree(self.prob.f(self.prob.u0, self.p))
        return NonlinearSolution(
            u=self._unravel_u(self.carry.u), resid=unravel_fu(self.carry.fu),
            retcode=self.carry.retcode, stats=self.carry.stats)

    def reinit(self, u0=None, *, p=None, abstol=None, reltol=None,
               maxiters=None):
        """Warm-reset for the next solve (SciMLBase.reinit! /
        InternalAPI.reinit!): rebuilds the carry at the new (u0, p), keeping
        the compiled executables."""
        if u0 is not None:
            self.prob = self.prob.remake(u0=u0)
        if p is not None:
            self.p = p
            self.prob = self.prob.remake(p=p)
        if abstol is not None:
            self.abstol = jnp.asarray(abstol, self._dtype)
        if reltol is not None:
            self.reltol = jnp.asarray(reltol, self._dtype)
        if maxiters is not None:
            self.maxiters = jnp.int32(maxiters)
        if self._is_polyalg:
            self.carry = None   # winner retention survives the reinit
            return self
        self.carry = _jit_init(self._plan, self.prob.u0, self.p, self.reltol)
        return self


class HomotopySolveCache:
    """init/reinit/solve handle for continuation drivers (the reference's
    cache interface for HomotopyProblem, homotopy_sweep_tests__item23.jl:
    ``init`` captures problem + algorithm + options, ``reinit!`` swaps
    (u0, p, tolerances) keeping the compiled executables — the jitted
    sweep plan is cached on static structure, so a reinit-ed solve reuses
    it — and ``solve!`` runs the full sweep)."""

    def __init__(self, prob, alg=None, **kwargs):
        self.prob = prob
        self.alg = alg
        self.kwargs = dict(kwargs)

    def reinit(self, u0=None, *, p=None, abstol=None, reltol=None,
               maxiters=None, lambdaspan=None):
        remake_kw = {}
        if u0 is not None:
            remake_kw["u0"] = u0
        if p is not None:
            remake_kw["p"] = p
        if lambdaspan is not None:
            remake_kw["lambdaspan"] = lambdaspan
        if remake_kw:
            self.prob = self.prob.remake(**remake_kw)
        for k, v in (("abstol", abstol), ("reltol", reltol),
                     ("maxiters", maxiters)):
            if v is not None:
                self.kwargs[k] = v
        return self

    def solve(self):
        from .solve import solve
        return solve(self.prob, self.alg, **self.kwargs)

    # Continuation drivers expose whole-solve granularity only: a sweep's
    # "step" is a λ-advance with internal correction, not a Newton step
    # (ADVICE r2: generic CommonSolve callers get a clear message, not a
    # ``NoneType is not callable``).
    def step(self, *_args, **_kwargs):
        raise NotImplementedError(
            "HomotopySolveCache has no per-step iteration: continuation "
            "drivers expose whole-solve granularity (call .solve(); "
            "per-lambda tracing is available via solve(..., "
            "store_trace=True))")

    def __iter__(self):
        raise NotImplementedError(
            "HomotopySolveCache is not iterable: continuation drivers "
            "expose whole-solve granularity — call .solve()")


def init(prob, alg=None, **kwargs):
    """Build an iterable solver cache (CommonSolve.init)."""
    from .problems import HomotopyProblem
    if isinstance(prob, HomotopyProblem):
        return HomotopySolveCache(prob, alg, **kwargs)
    if alg is None:
        from ..solvers.first_order import NewtonRaphson
        alg = NewtonRaphson()
    return NonlinearSolveCache(prob, alg, **kwargs)
