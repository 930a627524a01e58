"""GeneralizedFirstOrderAlgorithm — the Newton-family engine.

TPU-native redesign of
/root/reference/lib/NonlinearSolveFirstOrder/src/solve.jl: the mutable
cache + ``step!`` protocol becomes a pure ``carry -> carry`` step function
driven by ``lax.while_loop``; concrete algorithms (NewtonRaphson, TrustRegion,
LevenbergMarquardt, GaussNewton, PseudoTransient) are just constructors wiring
policy configs together, exactly as in the reference (raphson.jl:30-43,
trust_region.jl:25-43, levenberg_marquardt.jl:35-62, pseudo_transient.jl:36-55).

step! structure (solve.jl:298-426): jacobian → descent → globalization
(linesearch | trustregion | none) → termination check → post-step hooks.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core import descent as dsc
from ..core import linesearch as lsr
from ..core import termination as trm
from ..core import trust_region as trg
from ..core.autodiff import JacobianPolicy
from ..core.jacobian import construct_jacobian
from ..core.returncode import ReturnCode
from ..core.solution import NLStats
from ..utils import tree_where
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class EisenstatWalkerForcing:
    """Inexact-Newton forcing, Eisenstat–Walker (1996) algorithm 2 / formula
    (2.6): ηₖ = γ(‖rₖ‖/‖rₖ₋₁‖)^α with the over-solving safeguard
    (/root/reference/lib/NonlinearSolveFirstOrder/src/eisenstat_walker.jl)."""

    eta_0: float = 0.5
    eta_max: float = 0.9
    gamma: float = 0.9
    alpha: float = 2.0
    safeguard: bool = True
    safeguard_threshold: float = 0.1


# Backwards-compatible alias matching the reference's exported name.
EisenstatWalkerForcing2 = EisenstatWalkerForcing


@pytree_dataclass
class ForcingState:
    eta: Any
    rnorm: Any
    rnorm_prev: Any


@static_config
class GeneralizedFirstOrderAlgorithm:
    descent: Any = dsc.NewtonDescent()
    linesearch: Any = None
    trustregion: Any = None
    jacobian: JacobianPolicy = JacobianPolicy()
    forcing: Any = None
    concrete_jac: Any = None
    max_shrink_times: int = 32
    name: str = "GeneralizedFirstOrder"

    def get_linsolve(self):
        d = self.descent
        while isinstance(d, (dsc.GeodesicAcceleration,)):
            d = d.descent
        if isinstance(d, dsc.Dogleg):
            d = d.newton
        return getattr(d, "linsolve", None)

    def __post_init__(self):
        if self.linesearch is not None and self.trustregion is not None:
            raise ValueError("cannot combine linesearch and trustregion "
                             "globalization")

    @property
    def globalization(self) -> str:
        if self.linesearch is not None:
            return "linesearch"
        if self.trustregion is not None:
            return "trustregion"
        return "none"


# ---------------------------------------------------------------------------
# Concrete algorithm constructors (reference: just constructors, SURVEY §1)
# ---------------------------------------------------------------------------

def NewtonRaphson(*, linsolve=None, linesearch=None, autodiff=None,
                  forcing=None, concrete_jac=None):
    """raphson.jl:30-43."""
    from ..ops.linear_solve import LinearSolver
    ls = linsolve if linsolve is not None else LinearSolver()
    return GeneralizedFirstOrderAlgorithm(
        descent=dsc.NewtonDescent(linsolve=ls),
        linesearch=linesearch,
        jacobian=autodiff or JacobianPolicy(),
        forcing=forcing, concrete_jac=concrete_jac,
        name="NewtonRaphson",
    )


def GaussNewton(*, linsolve=None, linesearch=None, autodiff=None):
    """gauss_newton.jl:11 — Newton descent on the NLLS problem."""
    from ..ops.linear_solve import LinearSolver
    ls = linsolve if linsolve is not None else LinearSolver()
    return GeneralizedFirstOrderAlgorithm(
        descent=dsc.NewtonDescent(linsolve=ls),
        linesearch=linesearch,
        jacobian=autodiff or JacobianPolicy(),
        name="GaussNewton",
    )


def TrustRegion(*, radius_update_scheme: str = "simple", max_trust_radius=None,
                initial_trust_radius=None, step_threshold=None,
                shrink_threshold=None, expand_threshold=None,
                shrink_factor=None, expand_factor=None, max_shrink_times=32,
                autodiff=None, linsolve=None):
    """trust_region.jl:25-43 — Dogleg descent + GenericTrustRegionScheme."""
    from ..ops.linear_solve import LinearSolver
    ls = linsolve if linsolve is not None else LinearSolver()
    return GeneralizedFirstOrderAlgorithm(
        descent=dsc.Dogleg(newton=dsc.NewtonDescent(linsolve=ls)),
        trustregion=trg.GenericTrustRegionScheme(
            method=radius_update_scheme,
            max_trust_radius=max_trust_radius,
            initial_trust_radius=initial_trust_radius,
            step_threshold=step_threshold, shrink_threshold=shrink_threshold,
            expand_threshold=expand_threshold, shrink_factor=shrink_factor,
            expand_factor=expand_factor),
        jacobian=autodiff or JacobianPolicy(),
        max_shrink_times=max_shrink_times,
        name="TrustRegion",
    )


def LevenbergMarquardt(*, damping_initial: float = 1.0,
                       alpha_geodesic: float = 0.75,
                       disable_geodesic: bool = False,
                       damping_increase_factor: float = 2.0,
                       damping_decrease_factor: float = 3.0,
                       finite_diff_step_geodesic: float = 0.1,
                       b_uphill: float = 1.0, min_damping_D: float = 1e-8,
                       autodiff=None, linsolve=None):
    """levenberg_marquardt.jl:35-62 — DampedNewton(LM damping) wrapped in
    GeodesicAcceleration + LevenbergMarquardtTrustRegion."""
    from ..core.damping import LevenbergMarquardtDamping
    from ..ops.linear_solve import LinearSolver
    ls = linsolve if linsolve is not None else LinearSolver()
    descent = dsc.DampedNewtonDescent(
        initial_damping=damping_initial,
        damping=LevenbergMarquardtDamping(
            increase_factor=damping_increase_factor,
            decrease_factor=damping_decrease_factor,
            min_damping=min_damping_D),
        linsolve=ls,
    )
    if not disable_geodesic:
        descent = dsc.GeodesicAcceleration(
            descent=descent, finite_diff_step=finite_diff_step_geodesic,
            alpha=alpha_geodesic)
    return GeneralizedFirstOrderAlgorithm(
        descent=descent,
        trustregion=trg.LevenbergMarquardtTrustRegion(b_uphill=b_uphill),
        jacobian=autodiff or JacobianPolicy(),
        concrete_jac=True,
        name="LevenbergMarquardt",
    )


def PseudoTransient(*, alpha_initial: float = 1e-3, autodiff=None,
                    linsolve=None, mass_matrix=None):
    """pseudo_transient.jl:36-55 — DampedNewton(SER damping); optional mass
    matrix generalizes to ``(J + (1/α)M) δu = -F``."""
    from ..core.damping import SwitchedEvolutionRelaxation
    from ..ops.linear_solve import LinearSolver
    ls = linsolve if linsolve is not None else LinearSolver()
    return GeneralizedFirstOrderAlgorithm(
        descent=dsc.DampedNewtonDescent(
            initial_damping=alpha_initial,
            damping=SwitchedEvolutionRelaxation(mass_matrix=mass_matrix),
            linsolve=ls),
        jacobian=autodiff or JacobianPolicy(),
        name="PseudoTransient",
    )


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

@pytree_dataclass
class FOCarry:
    u: Any
    u_prev: Any
    fu: Any
    du: Any
    nsteps: Any
    force_stop: Any
    retcode: Any
    stats: Any
    term: Any
    descent_state: Any
    tr_state: Any
    ls_state: Any
    forcing_state: Any
    trace_state: Any = None


def init_first_order(alg: GeneralizedFirstOrderAlgorithm, ctx: dsc.DescentCtx,
                     term_cfg: trm.TerminationCondition, u0_flat, reltol):
    fu0 = ctx.f_flat(u0_flat)
    term = trm.init_termination(term_cfg, fu0, u0_flat, reltol)
    # Descent/damping states need an initial J shape only; avoid an extra
    # jacobian evaluation by passing None (states are shape-based).
    descent_state = dsc.descent_init(alg.descent, ctx, None, fu0, u0_flat)
    tr_state = (trg.tr_init(alg.trustregion, ctx, fu0, u0_flat)
                if alg.trustregion is not None else None)
    ls_state = (lsr.ls_init(alg.linesearch, ctx, fu0, u0_flat)
                if alg.linesearch is not None else None)
    if alg.forcing is not None:
        from ..utils.norms import l2_norm
        rn = l2_norm(fu0)
        forcing_state = ForcingState(
            eta=jnp.asarray(alg.forcing.eta_0, u0_flat.dtype),
            rnorm=rn, rnorm_prev=rn)
    else:
        forcing_state = None
    from ..core.tracing import init_trace
    trace_state = init_trace(ctx.trace, u0_flat, u0_flat.dtype)
    return FOCarry(
        u=u0_flat, u_prev=u0_flat, fu=fu0, du=jnp.zeros_like(u0_flat),
        nsteps=jnp.int32(0), force_stop=jnp.bool_(False),
        retcode=jnp.int32(ReturnCode.Default),
        stats=NLStats.zeros().incr(nf=1),
        term=term, descent_state=descent_state, tr_state=tr_state,
        ls_state=ls_state, forcing_state=forcing_state,
        trace_state=trace_state,
    )


def step_first_order(alg: GeneralizedFirstOrderAlgorithm, ctx: dsc.DescentCtx,
                     term_cfg: trm.TerminationCondition, jac_fn, carry: FOCarry,
                     abstol, reltol) -> FOCarry:
    """One iteration (solve.jl:298-426)."""
    u, fu = carry.u, carry.fu
    # Phase annotations (the reference's @static_timeit regions,
    # timer_outputs.jl) — visible in jax.profiler traces at zero runtime
    # cost.
    ctx.mark("jacobian")
    with jax.named_scope("nls.jacobian"):
        J = jac_fn(u)
    stats = carry.stats.incr(njacs=1, nsteps=1)

    # Eisenstat–Walker pre-step (eisenstat_walker.jl:44-85): adapt the
    # Krylov relative tolerance from the residual contraction rate.
    krylov_rtol = None
    forcing_state = carry.forcing_state
    if alg.forcing is not None:
        fcfg = alg.forcing
        eta_prev = forcing_state.eta
        eta_new = fcfg.gamma * (forcing_state.rnorm
                                / forcing_state.rnorm_prev) ** fcfg.alpha
        if fcfg.safeguard:
            eta_sg = fcfg.gamma * eta_prev ** fcfg.alpha
            eta_new = jnp.where(
                (eta_sg > fcfg.safeguard_threshold) & (eta_sg > eta_new),
                eta_sg, eta_new)
        eta_new = jnp.clip(eta_new, 0.0, fcfg.eta_max)
        eta = jnp.where(carry.nsteps == 0,
                        jnp.asarray(fcfg.eta_0, u.dtype), eta_new)
        forcing_state = forcing_state.replace(eta=eta)
        krylov_rtol = eta
        from ..core.verbosity import traced_emit
        traced_emit(ctx.verbosity, "forcing", jnp.bool_(True),
                    "Eisenstat-Walker forcing eta = {eta} "
                    "(eisenstat_walker.jl:44)", eta=eta)

    tr_radius = (carry.tr_state.trust_region
                 if isinstance(carry.tr_state, trg.TRState) else None)
    ctx.mark("descent")
    with jax.named_scope("nls.descent"):
        result, descent_state = dsc.descent_solve(
            alg.descent, carry.descent_state, ctx, J, fu, u,
            trust_region=tr_radius, krylov_rtol=krylov_rtol)
    stats = stats.incr(nf=result.nf, nsolve=result.nsolve,
                       nfactors=result.nfactors)
    du = result.du
    linsolve_ok = result.linsolve_success
    descent_ok = result.success & linsolve_ok

    ls_failed = jnp.bool_(False)
    shrink_exceeded = jnp.bool_(False)
    accepted = jnp.bool_(True)
    tr_state, ls_state = carry.tr_state, carry.ls_state

    glob = alg.globalization
    ctx.mark("linesearch" if glob in ("linesearch", "trustregion")
             else "other")
    if glob == "linesearch":
        ls_res = lsr.ls_solve(alg.linesearch, ls_state, ctx, u, du, fu, J,
                              carry.nsteps)
        ls_failed = ~ls_res.success
        alpha = ls_res.alpha
        u_new = u + alpha * du
        fu_new = ctx.f_flat(u_new)
        stats = stats.incr(nf=ls_res.nf + 1)
        ls_state = lsr.ls_post_step(alg.linesearch, ls_res.state, fu_new)
    elif glob == "trustregion":
        accepted, u_cand, fu_cand, tr_state = trg.tr_solve(
            alg.trustregion, tr_state, ctx, J, fu, u, du, result)
        stats = stats.incr(nf=1)
        u_new = jnp.where(accepted, u_cand, u)
        fu_new = jnp.where(accepted, fu_cand, fu)
        counter = trg.tr_shrink_counter(tr_state)
        if counter is not None:
            shrink_exceeded = counter > alg.max_shrink_times
    else:
        u_new = u + du
        fu_new = ctx.f_flat(u_new)
        stats = stats.incr(nf=1)

    # Postcondition at the commit point (conditioning.jl; FirstOrder
    # solve.jl:369-407): skipped when a trust region rejected the step.
    if ctx.postcondition is not None:
        committed = accepted if glob == "trustregion" else jnp.bool_(True)
        u_pc = ctx.postcondition(u_new, u)
        fu_pc = ctx.f_flat(u_pc)
        u_new = jnp.where(committed, u_pc, u_new)
        fu_new = jnp.where(committed, fu_pc, fu_new)
        stats = stats.incr(nf=1)

    # Keep the old iterate when the descent itself was rejected
    # (geodesic-acceleration reject: solve.jl:416-419).
    u_new = jnp.where(descent_ok, u_new, u)
    fu_new = jnp.where(descent_ok, fu_new, fu)

    # Termination check (only counted when the descent succeeded,
    # solve.jl:410 under `descent_result.success`).
    ctx.mark("other")
    stop, term_checked = trm.check_termination(
        term_cfg, carry.term, fu_new, u_new, u, abstol, reltol,
        is_least_squares=ctx.is_least_squares)
    term = tree_where(descent_ok, term_checked, carry.term)
    stop = stop & descent_ok
    from ..core.verbosity import traced_emit
    traced_emit(ctx.verbosity, "termination_condition", stop,
                "termination condition met at step {n} (retcode {rc})",
                n=carry.nsteps + 1, rc=term.retcode)

    # Post-step hooks: LM λ update keyed on TR+descent acceptance
    # (levenberg_marquardt.jl:169-175).
    step_accepted = accepted & result.success
    descent_state = dsc.descent_post_step(alg.descent, descent_state,
                                          step_accepted)

    # Retcode priority (see solve.jl:332-347, 364-367, 395-399 + the
    # trailing check_and_update!): termination wins over linesearch/shrink;
    # a linsolve failure short-circuits before the check entirely.
    retcode = jnp.int32(ReturnCode.Default)
    retcode = jnp.where(shrink_exceeded,
                        jnp.int32(ReturnCode.ShrinkThresholdExceeded), retcode)
    retcode = jnp.where(ls_failed,
                        jnp.int32(ReturnCode.InternalLineSearchFailed), retcode)
    retcode = jnp.where(stop, term.retcode, retcode)
    retcode = jnp.where(~linsolve_ok,
                        jnp.int32(ReturnCode.InternalLinearSolveFailed),
                        retcode)
    force_stop = (stop | ls_failed | shrink_exceeded | ~linsolve_ok)

    if alg.forcing is not None:
        from ..utils.norms import l2_norm
        forcing_state = ForcingState(
            eta=forcing_state.eta, rnorm=l2_norm(fu_new),
            rnorm_prev=forcing_state.rnorm)

    from ..core.tracing import record_trace
    trace_state = record_trace(ctx.trace, carry.trace_state,
                               carry.nsteps + 1, fu_new, du, J, u_new)

    return FOCarry(
        u=u_new, u_prev=u, fu=fu_new, du=du, nsteps=carry.nsteps + 1,
        force_stop=carry.force_stop | force_stop,
        retcode=jnp.where(carry.force_stop, carry.retcode, retcode),
        stats=stats, term=term, descent_state=descent_state,
        tr_state=tr_state, ls_state=ls_state, forcing_state=forcing_state,
        trace_state=trace_state,
    )


def run_first_order(alg: GeneralizedFirstOrderAlgorithm, ctx: dsc.DescentCtx,
                    term_cfg: trm.TerminationCondition, jac_spec, u0_flat,
                    abstol, reltol, maxiters):
    """init + while_loop to completion.  Returns the final carry."""
    jac_fn, _kind = construct_jacobian(alg.jacobian, alg.get_linsolve(), ctx,
                                       jac_spec, alg.concrete_jac)
    carry0 = init_first_order(alg, ctx, term_cfg, u0_flat, reltol)

    def cond(carry):
        return (~carry.force_stop) & (carry.nsteps < maxiters)

    def body(carry):
        return step_first_order(alg, ctx, term_cfg, jac_fn, carry, abstol,
                                reltol)

    final = jax.lax.while_loop(cond, body, carry0)

    # _run_cache_to_completion! (solve.jl:360-384): Default → MaxIters/Success,
    # then pull the safe-best iterate and re-evaluate f at it.
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
