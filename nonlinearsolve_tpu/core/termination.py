"""Termination conditions.

Functional port of the reference's nine termination modes with safe-mode
stall/divergence protection and best-solution retention
(/root/reference/lib/NonlinearSolveBase/src/termination_conditions.jl — the
semantics there gate every test in the suite, so they are replicated exactly;
mode defaults from public.jl:344-371).

Design: a static ``TerminationCondition`` config selects the code path at
trace time; a ``TermState`` pytree rides in the ``lax.while_loop`` carry.
In the reference the residual ``fu`` is passed as the termination ``du``
argument (check_and_update!, termination_conditions.jl:367-379) — same here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.norms import apply_norm, get_norm, l2_norm, tree_size
from ..utils.pytree import pytree_dataclass, static_config
from .returncode import ReturnCode

SAFE_MODES = ("rel_norm_safe", "abs_norm_safe", "rel_norm_safe_best",
              "abs_norm_safe_best")
BEST_MODES = ("rel_norm_safe_best", "abs_norm_safe_best")
REL_NORM_MODES = ("rel_norm", "rel_norm_safe", "rel_norm_safe_best")
ABS_NORM_MODES = ("abs_norm", "abs_norm_safe", "abs_norm_safe_best")
ALL_MODES = ("rel", "abs", "norm") + REL_NORM_MODES + ABS_NORM_MODES


@static_config
class TerminationCondition:
    """Static termination config.

    ``mode`` ∈ {rel, abs, norm, rel_norm, abs_norm, rel_norm_safe,
    abs_norm_safe, rel_norm_safe_best, abs_norm_safe_best}; ``norm`` is the
    internalnorm ('linf' ≡ maximum∘abs, 'l2' ≡ norm(·,2)).  Defaults mirror
    public.jl:344-346 (protective_threshold=nothing, patience_steps=100,
    patience_objective_multiplier=3, min_max_factor=1.3).
    """

    mode: str = "abs_norm_safe_best"
    norm: str = "linf"
    protective_threshold: Optional[float] = None
    patience_steps: int = 100
    patience_objective_multiplier: float = 3.0
    min_max_factor: float = 1.3
    max_stalled_steps: Optional[int] = None

    def __post_init__(self):
        if self.mode not in ALL_MODES:
            raise ValueError(f"unknown termination mode {self.mode!r}")

    @property
    def is_safe(self) -> bool:
        return self.mode in SAFE_MODES

    @property
    def keeps_best(self) -> bool:
        return self.mode in BEST_MODES


# Constructors named after the reference's public mode types.
def RelTerminationMode(**kw):
    return TerminationCondition(mode="rel", **kw)


def AbsTerminationMode(**kw):
    return TerminationCondition(mode="abs", **kw)


def NormTerminationMode(norm="l2", **kw):
    return TerminationCondition(mode="norm", norm=norm, **kw)


def RelNormTerminationMode(norm="l2", **kw):
    return TerminationCondition(mode="rel_norm", norm=norm, **kw)


def AbsNormTerminationMode(norm="l2", **kw):
    return TerminationCondition(mode="abs_norm", norm=norm, **kw)


def RelNormSafeTerminationMode(norm="l2", **kw):
    return TerminationCondition(mode="rel_norm_safe", norm=norm, **kw)


def AbsNormSafeTerminationMode(norm="l2", **kw):
    return TerminationCondition(mode="abs_norm_safe", norm=norm, **kw)


def RelNormSafeBestTerminationMode(norm="l2", **kw):
    return TerminationCondition(mode="rel_norm_safe_best", norm=norm, **kw)


def AbsNormSafeBestTerminationMode(norm="l2", **kw):
    return TerminationCondition(mode="abs_norm_safe_best", norm=norm, **kw)


def default_termination_mode(is_least_squares: bool, callee: str = "regular"):
    """termination_conditions.jl:329-346: simple → AbsNorm; regular →
    AbsNormSafeBest(max_stalled_steps=32); Linf for rootfinding, L2 for NLLS."""
    norm = "l2" if is_least_squares else "linf"
    if callee == "simple":
        return AbsNormTerminationMode(norm=norm)
    return AbsNormSafeBestTerminationMode(norm=norm, max_stalled_steps=32)


@pytree_dataclass
class TermState:
    """Runtime termination state (the reference's
    ``NonlinearTerminationModeCache`` fields, made functional)."""

    retcode: Any                 # int32 — retcode chosen by the last check
    nsteps: Any                  # int32
    best_objective: Any          # scalar
    initial_objective: Any       # scalar (None for non-safe modes)
    best_u: Any                  # pytree like u (None unless safe_best)
    objectives_trace: Any        # (patience_steps,) ring (None unless safe)
    u0_norm: Any                 # scalar (None unless rel-safe w/ stall check)
    step_norm_trace: Any         # (max_stalled_steps,) ring (None if disabled)


def _objective(cfg: TerminationCondition, fu, u, reltol):
    nrm = apply_norm(cfg.norm, fu)
    if cfg.mode in REL_NORM_MODES:
        # Denominator guard is eps(reltol) — the ulp AT the reltol value
        # (termination_conditions.jl:258: `+ eps(reltol)`), i.e.
        # eps(T)·reltol, NOT machine epsilon: for problems whose root sits
        # near the origin the guard must stay far below the scale reltol
        # compares against.
        reltol = jnp.asarray(reltol, nrm.dtype)
        eps_at = jnp.finfo(nrm.dtype).eps * reltol
        return nrm / (apply_norm(cfg.norm, fu, u) + eps_at)
    return nrm


def init_termination(cfg: TerminationCondition, fu, u, reltol) -> TermState:
    """termination_conditions.jl:82-134 (CommonSolve.init)."""
    dtype = jnp.result_type(*[jnp.asarray(l).dtype
                              for l in jax.tree_util.tree_leaves(u)])
    # Objectives/norm rings are always real scalars, also for complex states.
    dtype = jnp.zeros((), dtype).real.dtype
    zero = jnp.zeros((), dtype)
    if cfg.is_safe:
        initial_objective = _objective(cfg, fu, u, jnp.asarray(reltol, dtype))
        best = initial_objective
        objectives_trace = jnp.zeros((cfg.patience_steps,), dtype)
        if cfg.mode in REL_NORM_MODES and cfg.max_stalled_steps is not None:
            u0_norm = l2_norm(u)
        else:
            u0_norm = None
        if cfg.max_stalled_steps is not None:
            step_norm_trace = jnp.zeros((cfg.max_stalled_steps,), dtype)
        else:
            step_norm_trace = None
    else:
        initial_objective = None
        objectives_trace = None
        u0_norm = None
        step_norm_trace = None
        best = jnp.asarray(jnp.inf, dtype)
    best_u = jax.tree_util.tree_map(jnp.asarray, u) if cfg.keeps_best else None
    return TermState(
        retcode=jnp.int32(ReturnCode.Default), nsteps=jnp.int32(0),
        best_objective=best, initial_objective=initial_objective,
        best_u=best_u, objectives_trace=objectives_trace,
        u0_norm=u0_norm, step_norm_trace=step_norm_trace,
    )


def _tree_all(pred_tree):
    flags = [jnp.all(l) for l in jax.tree_util.tree_leaves(pred_tree)]
    out = flags[0]
    for fl in flags[1:]:
        out = out & fl
    return out


def _check_convergence_plain(cfg, fu, u, abstol, reltol):
    """check_convergence for the non-safe modes
    (termination_conditions.jl:292-325); pytree-native, no flattening."""
    if cfg.mode == "rel":
        return _tree_all(jax.tree_util.tree_map(
            lambda fuf, uf: jnp.abs(fuf) <= reltol * jnp.abs(uf + fuf),
            fu, u))
    if cfg.mode == "abs":
        return _tree_all(jax.tree_util.tree_map(
            lambda fuf: jnp.abs(fuf) <= abstol, fu))
    nrm = get_norm(cfg.norm)
    fu_norm = nrm(fu)
    fu_plus_u = jax.tree_util.tree_map(lambda a, b: a + b, fu, u)
    if cfg.mode == "norm":
        return (fu_norm <= abstol) | (fu_norm <= reltol * nrm(fu_plus_u))
    if cfg.mode == "rel_norm":
        return fu_norm <= reltol * nrm(fu_plus_u)
    if cfg.mode == "abs_norm":
        return fu_norm <= abstol
    raise AssertionError(cfg.mode)


def check_termination(cfg: TerminationCondition, state: TermState, fu, u, uprev,
                      abstol, reltol, *, is_least_squares: bool = False):
    """One termination check.  Returns ``(stop, new_state)``.

    Safe-mode logic replicates termination_conditions.jl:196-289 in order:
    non-finite → Unstable; protective threshold → Unstable; best retention;
    main criteria → Success; patience (objectives ring) → Stalled /
    StalledSuccess; step-norm stall → Stalled / StalledSuccess.
    """
    if not cfg.is_safe:
        converged = _check_convergence_plain(cfg, fu, u, abstol, reltol)
        retcode = jnp.where(converged, jnp.int32(ReturnCode.Success),
                            state.retcode)
        return converged, state.replace(retcode=retcode)

    dtype = state.best_objective.dtype
    abstol = jnp.asarray(abstol, dtype)
    reltol = jnp.asarray(reltol, dtype)
    objective = _objective(cfg, fu, u, reltol)
    criteria = reltol if cfg.mode in REL_NORM_MODES else abstol

    stop = jnp.bool_(False)
    retcode = jnp.int32(ReturnCode.Failure)

    # 1. Protective break on non-finite objective.
    nonfinite = ~jnp.isfinite(objective)
    stop = stop | nonfinite
    retcode = jnp.where(nonfinite, jnp.int32(ReturnCode.Unstable), retcode)

    # 2. Divergence guard (off by default).
    if cfg.protective_threshold is not None:
        n = tree_size(fu)
        diverged = objective > (state.initial_objective
                                * cfg.protective_threshold * n)
        diverged = diverged & ~stop
        stop = stop | diverged
        retcode = jnp.where(diverged, jnp.int32(ReturnCode.Unstable), retcode)

    # 3. Best-solution retention (safe_best only).
    if cfg.keeps_best:
        is_best = (objective < state.best_objective) & ~stop
        best_objective = jnp.where(is_best, objective, state.best_objective)
        best_u = jax.tree_util.tree_map(
            lambda new, old: jnp.where(is_best, new, old), u, state.best_u)
    else:
        best_objective = state.best_objective
        best_u = state.best_u

    # 4. Main criteria.
    converged = (objective <= criteria) & ~stop
    stop = stop | converged
    retcode = jnp.where(converged, jnp.int32(ReturnCode.Success), retcode)

    # 5. Patience: ring-buffer of objectives; only counted on non-stopping
    #    checks (the reference increments nsteps after the main criteria).
    live = ~stop
    nsteps = state.nsteps + jnp.where(live, jnp.int32(1), jnp.int32(0))
    initial_objective = jnp.where(
        live & (nsteps == 1), objective,
        state.initial_objective if state.initial_objective is not None else objective)
    slot = jnp.mod(nsteps - 1, cfg.patience_steps)
    objectives_trace = jnp.where(
        live,
        state.objectives_trace.at[slot].set(objective),
        state.objectives_trace)

    patience_eligible = live & (objective <= cfg.patience_objective_multiplier
                                * criteria) & (nsteps > cfg.patience_steps)
    idx = jnp.arange(cfg.patience_steps)
    filled = idx < jnp.minimum(nsteps, cfg.patience_steps)
    min_obj = jnp.min(jnp.where(filled, objectives_trace, jnp.inf))
    max_obj = jnp.max(jnp.where(filled, objectives_trace, -jnp.inf))
    stalled_code = jnp.int32(ReturnCode.StalledSuccess if is_least_squares
                             else ReturnCode.Stalled)
    patience_hit = patience_eligible & (min_obj < cfg.min_max_factor * max_obj)
    stop = stop | patience_hit
    retcode = jnp.where(patience_hit, stalled_code, retcode)

    # 6. Step-norm stall detection.
    if state.step_norm_trace is not None:
        live2 = live & ~patience_hit
        du_norm = l2_norm(jax.tree_util.tree_map(
            lambda a, b: a - b, u, uprev))
        sslot = jnp.mod(nsteps - 1, cfg.max_stalled_steps)
        step_norm_trace = jnp.where(
            live,
            state.step_norm_trace.at[sslot].set(du_norm),
            state.step_norm_trace)
        check_ok = live2 & (nsteps > cfg.max_stalled_steps)
        max_step_norm = jnp.max(step_norm_trace)
        if cfg.mode in ABS_NORM_MODES:
            stalled_step = max_step_norm <= abstol
        else:
            stalled_step = max_step_norm <= reltol * (max_step_norm
                                                      + state.u0_norm)
        stall_hit = check_ok & stalled_step
        stop = stop | stall_hit
        retcode = jnp.where(stall_hit, stalled_code, retcode)
    else:
        step_norm_trace = None

    new_state = TermState(
        retcode=retcode, nsteps=nsteps, best_objective=best_objective,
        initial_objective=initial_objective, best_u=best_u,
        objectives_trace=objectives_trace, u0_norm=state.u0_norm,
        step_norm_trace=step_norm_trace,
    )
    return stop, new_state


def termination_result(cfg: TerminationCondition, state: TermState,
                       fallback_u):
    """Pick the solution iterate after the loop: safe-best modes return the
    retained best u (termination_condition_result,
    termination_conditions.jl:56-70)."""
    if cfg.keeps_best and state.best_u is not None:
        return state.best_u
    return fallback_u
