"""QuasiNewtonAlgorithm — Broyden / Klement / LimitedMemoryBroyden engine.

TPU-native redesign of /root/reference/lib/NonlinearSolveQuasiNewton/:
``step!`` (solve.jl:293-482) becomes a pure carry→carry function with
``lax.cond`` for the dynamic jacobian reset; the policy split
(initialization × update rule × reset condition × descent) is preserved:

* initializations (initialization.jl:70-140): ``identity`` (αI with
  α = max(‖u‖,1)/(2‖fu‖) by default) and ``true_jacobian``; structures
  ``full`` | ``diagonal`` (structure.jl:6-49).
* update rules: Good/Bad Broyden on the inverse Jacobian
  (broyden.jl:104-162), Klement on the direct Jacobian (klement.jl:100-141),
  diagonal variants of each.
* reset conditions: ``NoChangeInStateReset`` (nsteps=3, tol=eps^(3/4);
  reset_conditions.jl:18-88) and ``IllConditionedJacobianReset``
  (cond(J) ≥ eps^(-1/2); reset_conditions.jl:95-120).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core import descent as dsc
from ..core import linesearch as lsr
from ..core import termination as trm
from ..core import trust_region as trg
from ..core.tracing import init_trace, record_trace
from ..core.autodiff import JacobianPolicy, construct_dense_jacobian_fn
from ..core.returncode import ReturnCode
from ..core.solution import NLStats
from ..ops.linear_solve import solve_dense, LinearSolver
from ..utils import tree_where
from ..utils.norms import l2_norm
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class NoChangeInStateReset:
    nsteps: int = 3
    reset_tolerance: Optional[float] = None
    check_du: bool = True
    check_dfu: bool = True


@static_config
class IllConditionedJacobianReset:
    pass


@static_config
class QuasiNewtonAlgorithm:
    """The engine (solve.jl:27-53).  ``trustregion`` takes a
    ``GenericTrustRegionScheme`` and globalizes with a Dogleg step on the
    approximate Jacobian (the reference's ``QuasiNewtonAlgorithm(;
    trustregion, descent = Dogleg())`` combination, gated on
    ``supports_trust_region``, solve.jl:247-249); it forces direct (not
    inverse) Jacobian storage, so the Broyden update switches to its
    direct-space rank-1 form."""

    update_rule: str = "good_broyden"   # good_broyden|bad_broyden|klement
    structure: str = "full"             # full | diagonal | low_rank
    threshold: int = 27                 # low_rank history depth η
    init_jacobian: str = "identity"     # identity | true_jacobian
    alpha: Optional[float] = None
    linesearch: Any = None
    trustregion: Any = None             # GenericTrustRegionScheme
    # TR-aware reset: this many CONSECUTIVE trust-region rejections mark
    # the approximate-Jacobian model as stale and force a reinit (the
    # reference never exercises QN×TR, so this policy is ours; it pairs
    # with the secant-from-trial-residual update — see step below).
    tr_reset_rejects: int = 3
    max_shrink_times: int = 2**31 - 2   # reference default: typemax(Int)
    reinit_rule: Any = NoChangeInStateReset()
    max_resets: int = 100
    linsolve: LinearSolver = LinearSolver()
    jacobian: JacobianPolicy = JacobianPolicy()  # for true_jacobian init
    name: str = "QuasiNewton"

    def __post_init__(self):
        if self.trustregion is None:
            return
        from ..core.trust_region import GenericTrustRegionScheme
        if self.linesearch is not None:
            raise ValueError("cannot combine linesearch and trustregion "
                             "globalization (solve.jl:239-243)")
        if not isinstance(self.trustregion, GenericTrustRegionScheme):
            raise ValueError("QuasiNewton trustregion must be a "
                             "GenericTrustRegionScheme")
        if self.structure != "full":
            raise ValueError("trust-region globalization needs the full "
                             "direct Jacobian structure (Dogleg needs J, "
                             "not J⁻¹ or a diagonal)")
        if self.update_rule == "bad_broyden":
            raise ValueError("bad_broyden is an inverse-Jacobian update "
                             "rule; use good_broyden or klement with "
                             "trustregion")

    @property
    def store_inverse(self) -> bool:
        # Broyden rules store J⁻¹ (broyden.jl store_inverse_jacobian=true);
        # Klement stores J directly; trust-region globalization forces
        # direct storage (the Dogleg/TR ratio model needs J).
        if self.trustregion is not None:
            return False
        return self.update_rule in ("good_broyden", "bad_broyden")


def Broyden(*, max_resets: int = 100, linesearch=None, reset_tolerance=None,
            init_jacobian: str = "identity", autodiff=None, alpha=None,
            update_rule: str = "good_broyden"):
    """broyden.jl:35-50."""
    structure = "diagonal" if update_rule == "diagonal" else "full"
    rule = "good_broyden" if update_rule == "diagonal" else update_rule
    return QuasiNewtonAlgorithm(
        update_rule=rule, structure=structure, init_jacobian=init_jacobian,
        alpha=alpha, linesearch=linesearch,
        reinit_rule=NoChangeInStateReset(reset_tolerance=reset_tolerance),
        max_resets=max_resets, jacobian=autodiff or JacobianPolicy(),
        name="Broyden",
    )


def LimitedMemoryBroyden(*, max_resets: int = 3, threshold: int = 27,
                         linesearch=None, reset_tolerance=None, alpha=None):
    """lbroyden.jl:21-36 — limited-memory Broyden: the inverse Jacobian is
    the low-rank ``-αI + UᵀV`` with an η-deep update ring (the full-tier
    engine variant of SimpleLimitedMemoryBroyden, with resets/termination)."""
    return QuasiNewtonAlgorithm(
        update_rule="good_broyden", structure="low_rank",
        init_jacobian="identity", alpha=alpha, linesearch=linesearch,
        reinit_rule=NoChangeInStateReset(reset_tolerance=reset_tolerance),
        max_resets=max_resets, threshold=threshold,
        name="LimitedMemoryBroyden",
    )


def Klement(*, max_resets: int = 100, linsolve=None, linesearch=None,
            alpha=None, init_jacobian: str = "identity", autodiff=None):
    """klement.jl:30-49 — diagonal Klement by default."""
    structure = "diagonal" if init_jacobian == "identity" else "full"
    if init_jacobian == "true_jacobian_diagonal":
        structure, init_jacobian = "diagonal", "true_jacobian"
    return QuasiNewtonAlgorithm(
        update_rule="klement", structure=structure,
        init_jacobian=init_jacobian, alpha=alpha, linesearch=linesearch,
        reinit_rule=IllConditionedJacobianReset(), max_resets=max_resets,
        linsolve=linsolve if linsolve is not None else LinearSolver(),
        jacobian=autodiff or JacobianPolicy(), name="Klement",
    )


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

@pytree_dataclass
class ResetRuleState:
    steps_since_change_du: Any
    steps_since_change_dfu: Any
    dfu_prev: Any


@pytree_dataclass
class QNCarry:
    u: Any
    u_prev: Any
    fu: Any
    du: Any
    J: Any                      # (n,n) matrix or (n,) diagonal
    nsteps: Any
    nresets: Any
    steps_since_last_reset: Any
    force_stop: Any
    force_reinit: Any
    retcode: Any
    stats: Any
    term: Any
    ls_state: Any
    update_fu_prev: Any         # fu at the last update (Broyden dfu / Klement fu_cache)
    reset_state: Any
    tr_state: Any = None        # trust-region globalization state
    tr_rejects: Any = None      # consecutive TR rejections (reset trigger)
    trace_state: Any = None


def _alpha_scaling(alpha, u, fu):
    """initial_jacobian_scaling_alpha (NonlinearSolveBase utils.jl:307-314):
    α = 2‖fu‖₂ / max(‖u‖₂, 1) when unspecified, falling back to 1 for tiny
    residuals.  (The Broyden docstring states the reciprocal; the code is
    authoritative — J = αI so J⁻¹ = I/α = max(‖u‖,1)/(2‖fu‖)·I, matching the
    SimpleBroyden initialization.)"""
    if alpha is not None:
        return jnp.asarray(alpha, u.dtype)
    fu_norm = l2_norm(fu)
    return jnp.where(fu_norm < 1e-5, jnp.ones((), u.dtype),
                     2.0 * fu_norm / jnp.maximum(l2_norm(u), 1.0))


def _init_J(alg: QuasiNewtonAlgorithm, jac_fn, u, fu):
    """Build the stored Jacobian representation at (re)initialization."""
    n = u.shape[0]
    if alg.structure == "low_rank":
        # (U, V, count, alpha): J⁻¹ ≈ -αI + Σ_k U[k]⊗V[k] (lbroyden.jl:271-305)
        eta = min(alg.threshold, n)
        fx_norm = l2_norm(fu)
        alpha = jnp.where(fx_norm >= 1e-5,
                          jnp.maximum(l2_norm(u), 1.0) / (2.0 * fx_norm),
                          jnp.ones((), u.dtype))
        return (jnp.zeros((eta, n), u.dtype), jnp.zeros((eta, n), u.dtype),
                jnp.int32(0), alpha)
    if alg.init_jacobian == "identity":
        alpha = _alpha_scaling(alg.alpha, u, fu)
        scale = 1.0 / alpha if alg.store_inverse else alpha
        if alg.structure == "diagonal":
            return jnp.full((n,), scale, u.dtype) * jnp.ones_like(u)
        return scale * jnp.eye(n, dtype=u.dtype)
    # true_jacobian
    J = jac_fn(u)
    if alg.structure == "diagonal":
        d = jnp.diagonal(J)
        return 1.0 / d if alg.store_inverse else d
    if alg.store_inverse:
        Jinv, _ = solve_dense(J, jnp.eye(n, dtype=u.dtype), alg.linsolve)
        return Jinv
    return J


def _lr_matvec(J, v):
    U, V, count, alpha = J
    eta = U.shape[0]
    mask = (jnp.arange(eta) < count)[:, None]
    return (U * mask).T @ ((V * mask) @ v) - alpha * v


def _lr_rmatvec(J, v):
    U, V, count, alpha = J
    eta = U.shape[0]
    mask = (jnp.arange(eta) < count)[:, None]
    return (V * mask).T @ ((U * mask) @ v) - alpha * v


def _qn_descent(alg: QuasiNewtonAlgorithm, J, fu):
    """δu = -J⁻¹fu (pre-inverted) or solve Jδu = -fu."""
    if alg.structure == "low_rank":
        U, V, count, alpha = J
        # Empty history: the reference seeds δx₀ = -α·f explicitly
        # (lbroyden.jl:100-103); -matvec would give +α·f.
        du = jnp.where(count == 0, -alpha * fu, -_lr_matvec(J, fu))
        return du, jnp.all(jnp.isfinite(du))
    if alg.structure == "diagonal":
        if alg.store_inverse:
            return -(J * fu), jnp.bool_(True)
        safe = jnp.where(J == 0, jnp.ones_like(J), J)
        du = -(fu / safe)
        return du, jnp.all(J != 0) & jnp.all(jnp.isfinite(du))
    if alg.store_inverse:
        du = -(J @ fu)
        return du, jnp.all(jnp.isfinite(du))
    x, ok = solve_dense(J, fu, alg.linsolve)
    return -x, ok


def _reset_check(alg: QuasiNewtonAlgorithm, rule, state: ResetRuleState, J, fu,
                 u, du):
    """Returns (reset?, new_state)."""
    if isinstance(rule, IllConditionedJacobianReset):
        if alg.structure == "diagonal":
            return jnp.any(J == 0), state
        threshold = 1.0 / jnp.sqrt(jnp.finfo(J.dtype).eps)
        sv = jnp.linalg.svd(J, compute_uv=False)
        condJ = sv[0] / jnp.where(sv[-1] == 0, jnp.finfo(J.dtype).tiny, sv[-1])
        return (condJ >= threshold) | (sv[-1] == 0), state

    cfg: NoChangeInStateReset = rule
    tol = (jnp.finfo(u.dtype).eps ** 0.75 if cfg.reset_tolerance is None
           else cfg.reset_tolerance)
    reset = jnp.bool_(False)
    s_du, s_dfu = state.steps_since_change_du, state.steps_since_change_dfu
    if cfg.check_du:
        small = jnp.any(jnp.abs(du) <= tol)
        s_du = jnp.where(small, s_du + 1, jnp.int32(0))
        hit_du = small & (s_du >= cfg.nsteps)
        s_dfu = jnp.where(small, s_dfu, jnp.int32(0))
        reset = reset | hit_du
    if cfg.check_dfu:
        dfu = fu - state.dfu_prev
        small_f = jnp.any(jnp.abs(dfu) <= tol)
        s_dfu = jnp.where(small_f, s_dfu + 1, jnp.int32(0))
        s_du = jnp.where(small_f, s_du, jnp.where(reset, s_du, jnp.int32(0)))
        hit_dfu = small_f & (s_dfu >= cfg.nsteps)
        reset = reset | hit_dfu
    s_du = jnp.where(reset, jnp.int32(0), s_du)
    s_dfu = jnp.where(reset, jnp.int32(0), s_dfu)
    new_state = ResetRuleState(steps_since_change_du=s_du,
                               steps_since_change_dfu=s_dfu, dfu_prev=fu)
    return reset, new_state


def _update_jacobian(alg: QuasiNewtonAlgorithm, J, fu, fu_prev, u, du):
    """Apply the quasi-Newton update rule (broyden.jl:126-162,
    klement.jl:100-141).  ``J`` is J⁻¹ for Broyden rules."""
    eps_guard = 1e-5
    if alg.structure == "low_rank":
        # lbroyden.jl:126-143: vᵀ = J⁻ᵀδx, u = (δx - J⁻¹δf)/⟨vᵀ, δf⟩,
        # ring-write (u, vᵀ) into the history.
        U, V, count, alpha = J
        eta = U.shape[0]
        dfu = fu - fu_prev
        vT = _lr_rmatvec(J, du)
        mvec = _lr_matvec(J, dfu)
        d = jnp.dot(vT, dfu)
        d = jnp.where(d == 0, eps_guard, d)
        u_new = (du - mvec) / d
        slot = jnp.mod(count, eta)
        return (U.at[slot].set(u_new), V.at[slot].set(vT), count + 1, alpha)
    if alg.update_rule in ("good_broyden", "bad_broyden"):
        dfu = fu - fu_prev
        if not alg.store_inverse:
            # Direct-space good Broyden (TR-globalized path):
            # J += (Δf − JΔu) Δuᵀ / ⟨Δu, Δu⟩ — the Sherman–Morrison
            # preimage of the inverse update at broyden.jl:126-143.
            denom = jnp.dot(du, du)
            denom = jnp.where(denom == 0, eps_guard, denom)
            return J + jnp.outer((dfu - J @ du) / denom, du)
        if alg.structure == "diagonal":
            d = J
            if alg.update_rule == "good_broyden":
                Jdfu = d * dfu * du
                denom = jnp.sum(Jdfu)
                denom = jnp.where(denom == 0, eps_guard, denom)
                return d + (du - Jdfu) * du * d / denom
            denom = l2_norm(dfu) ** 2
            denom = jnp.where(denom == 0, eps_guard, denom)
            return d + (du - d * dfu) * dfu / denom
        Jdfu = J @ dfu
        if alg.update_rule == "good_broyden":
            denom = jnp.dot(du, Jdfu)
            row = du @ J          # duᵀ J⁻¹
        else:
            denom = l2_norm(dfu) ** 2
            row = dfu
        denom = jnp.where(denom == 0, eps_guard, denom)
        return J + jnp.outer((du - Jdfu) / denom, row)

    # Klement
    if alg.structure == "diagonal":
        d = J
        Jdu = d * d * du * du
        Jdu = jnp.where(Jdu == 0, eps_guard, Jdu)
        return d + ((fu - fu_prev - d * du) / Jdu) * du * d * d
    denom_vec = (J * J).T @ (du * du)      # Σ_j J[j,i]² du[j]²
    denom_vec = jnp.where(denom_vec == 0, eps_guard, denom_vec)
    Jdu = J @ du
    resid = (fu - fu_prev - Jdu) / denom_vec
    corr = (jnp.outer(resid, du) * J) @ J
    return J + corr


def resolve_low_rank(alg: QuasiNewtonAlgorithm, n: int):
    """When the low-rank history is at least as deep as the state, the ring
    approximation IS a full inverse — run as plain (full) good Broyden.
    The reference's Simple tier does exactly this ("If the threshold is
    larger than the problem size, then this method will use SimpleBroyden",
    SimpleNonlinearSolve/src/lbroyden.jl:9, 81-84); its full tier merely
    warns that such thresholds "may cause numerical instability"
    (initialization.jl:181-184) and indeed destabilizes — we adopt the
    Simple tier's semantics for both."""
    import dataclasses
    if alg.structure == "low_rank" and n <= alg.threshold:
        return dataclasses.replace(alg, structure="full")
    return alg


def init_quasi_newton(alg: QuasiNewtonAlgorithm, ctx, term_cfg, jac_fn,
                      u0_flat, reltol):
    alg = resolve_low_rank(alg, int(u0_flat.size))
    fu0 = ctx.f_flat(u0_flat)
    J0 = _init_J(alg, jac_fn, u0_flat, fu0)
    term = trm.init_termination(term_cfg, fu0, u0_flat, reltol)
    ls_state = (lsr.ls_init(alg.linesearch, ctx, fu0, u0_flat)
                if alg.linesearch is not None else None)
    tr_state = (trg.tr_init(alg.trustregion, ctx, fu0, u0_flat)
                if alg.trustregion is not None else None)
    reset_state = ResetRuleState(
        steps_since_change_du=jnp.int32(0),
        steps_since_change_dfu=jnp.int32(0), dfu_prev=fu0)
    njacs = 1 if alg.init_jacobian == "true_jacobian" else 0
    return QNCarry(
        u=u0_flat, u_prev=u0_flat, fu=fu0, du=jnp.zeros_like(u0_flat), J=J0,
        nsteps=jnp.int32(0), nresets=jnp.int32(0),
        steps_since_last_reset=jnp.int32(1),
        force_stop=jnp.bool_(False), force_reinit=jnp.bool_(False),
        retcode=jnp.int32(ReturnCode.Default),
        stats=NLStats.zeros().incr(nf=1, njacs=njacs),
        term=term, ls_state=ls_state, update_fu_prev=fu0,
        reset_state=reset_state, tr_state=tr_state,
        tr_rejects=jnp.int32(0),
        trace_state=init_trace(ctx.trace, u0_flat, u0_flat.dtype),
    )


def step_quasi_newton(alg: QuasiNewtonAlgorithm, ctx, term_cfg, jac_fn,
                      carry: QNCarry, abstol, reltol) -> QNCarry:
    """One iteration (solve.jl:293-482)."""
    alg = resolve_low_rank(alg, int(carry.u.size))
    u, fu = carry.u, carry.fu

    # --- reinit decision --------------------------------------------------
    rule_reset, reset_state = _reset_check(
        alg, alg.reinit_rule, carry.reset_state, carry.J, fu, u, carry.du)
    reinit = carry.force_reinit | rule_reset
    nresets = carry.nresets + jnp.where(reinit, jnp.int32(1), jnp.int32(0))
    resets_exhausted = reinit & (nresets >= alg.max_resets)
    from ..core.verbosity import traced_emit
    traced_emit(ctx.verbosity, "threshold_state", reinit,
                "approximate-Jacobian reset #{n} (structure "
                f"{alg.structure}, threshold {alg.threshold})", n=nresets)

    J = jax.lax.cond(
        reinit,
        lambda: _init_J(alg, jac_fn, u, fu),
        lambda: carry.J,
    )
    steps_since_last_reset = jnp.where(reinit, jnp.int32(0),
                                       carry.steps_since_last_reset + 1)
    # Broyden's update keys off fu at the last update; a reset clears it too.
    update_fu_prev = tree_where(reinit, fu, carry.update_fu_prev)

    # --- descent ----------------------------------------------------------
    tr_result = None
    if alg.trustregion is not None:
        # Dogleg on the (direct-stored) approximate Jacobian — the
        # supports_trust_region descent the reference requires
        # (solve.jl:247-249, abstract_types.jl:146).
        tr_radius = carry.tr_state.trust_region
        dogleg = dsc.Dogleg(newton=dsc.NewtonDescent(linsolve=alg.linsolve))
        tr_result, _ = dsc.descent_solve(dogleg, None, ctx, J, fu, u,
                                         trust_region=tr_radius)
        du, linsolve_ok = tr_result.du, tr_result.linsolve_success
    else:
        du, linsolve_ok = _qn_descent(alg, J, fu)
    stats = carry.stats.incr(nsteps=1, nsolve=1,
                             njacs=jnp.where(
                                 reinit & (alg.init_jacobian == "true_jacobian"),
                                 jnp.int32(1), jnp.int32(0)))

    # --- globalization ----------------------------------------------------
    force_reinit_next = jnp.bool_(False)
    ls_state = carry.ls_state
    tr_state = carry.tr_state
    # A reinit (any trigger) starts a fresh model: clear the rejection
    # streak so the TR-aware reset gives the new J its full allowance.
    tr_rejects = jnp.where(reinit, jnp.int32(0), carry.tr_rejects)
    tr_accepted = jnp.bool_(True)
    shrink_exceeded = jnp.bool_(False)
    fu_secant = None
    du_taken = du        # secant Δu: the step actually applied to u
    if alg.trustregion is not None:
        tr_accepted, u_cand, fu_cand, tr_state = trg.tr_solve(
            alg.trustregion, tr_state, ctx, J, fu, u, du, tr_result)
        stats = stats.incr(nf=1)
        u_new = jnp.where(tr_accepted, u_cand, u)
        fu_new = jnp.where(tr_accepted, fu_cand, fu)
        # The TRIAL residual f(u+du) is valid secant data even when the
        # step is rejected (u_new = u, fu_new = fu): updating with
        # (du, fu_new − fu_prev) = (du, 0) would force J·du → 0 and make
        # the stored Jacobian numerically singular.  Use the candidate
        # pair instead; the secant base point stays at u (see the
        # update_fu_prev handling below).
        fu_secant = fu_cand
        counter = trg.tr_shrink_counter(tr_state)
        if counter is not None:
            shrink_exceeded = counter > alg.max_shrink_times
        # TR-aware reset: a streak of rejections means the secant model
        # mispredicts the residual over every radius the scheme tried —
        # rebuild J instead of shrinking further (a fresh model usually
        # restores full dogleg steps along curved valleys).
        tr_rejects = jnp.where(tr_accepted, jnp.int32(0), tr_rejects + 1)
        streak = (~tr_accepted) & (tr_rejects >= alg.tr_reset_rejects) \
            & (steps_since_last_reset > 0)
        force_reinit_next = force_reinit_next | streak
        tr_rejects = jnp.where(streak, jnp.int32(0), tr_rejects)
    elif alg.linesearch is not None:
        ls_res = lsr.ls_solve(alg.linesearch, ls_state, ctx, u, du, fu, None,
                              carry.nsteps)
        ls_failed = ~ls_res.success
        # Reset after a burn-in period (solve.jl:404-408); otherwise step
        # with the α the line search last produced.
        ls_reset = ls_failed & (steps_since_last_reset > 5)
        alpha = jnp.where(ls_reset, jnp.zeros_like(ls_res.alpha), ls_res.alpha)
        u_new = u + alpha * du
        # Secant step for Broyden-family (inverse-stored / low-rank)
        # updates = the step actually taken.  The reference feeds the RAW
        # direction δu to the update rule while dfu is measured from the
        # α-scaled step (QN solve.jl:475-478 with :409 axpy!(α, δu, u)) —
        # for α ≪ 1 that mismatched pair makes good-Broyden satisfy
        # J⁻¹(αAδu) = δu, inflating J⁻¹ by 1/α every backtracked step
        # until ‖δu‖ → ∞ and the reset ladder exhausts (observed on a 4×4
        # LINEAR system: ‖δu‖ ×10³/step).  Using α·δu restores the exact
        # secant equation; identical when α = 1.  Klement keeps the
        # reference's raw-δu semantics: its DIRECT-stored J has no
        # inversion blow-up mechanism (the α-bias only shortens J, and
        # the line search absorbs the longer directions) and the raw
        # form measurably converges deeper on tridiagonal fixtures.
        # Documented deviation (NOTES_ROUND2.md).
        if alg.update_rule != "klement":
            du_taken = alpha * du
        fu_new = ctx.f_flat(u_new)
        stats = stats.incr(nf=ls_res.nf + 1)
        ls_state = lsr.ls_post_step(alg.linesearch, ls_res.state, fu_new)
        force_reinit_next = ls_reset
    else:
        u_new = u + du
        fu_new = ctx.f_flat(u_new)
        stats = stats.incr(nf=1)

    if ctx.postcondition is not None:
        # Skipped when the trust region rejected the step (reference QN
        # step!, solve.jl:424-436: postcondition only inside tr_accepted).
        u_pc = ctx.postcondition(u_new, u)
        fu_pc = ctx.f_flat(u_pc)
        u_new = jnp.where(tr_accepted, u_pc, u_new)
        fu_new = jnp.where(tr_accepted, fu_pc, fu_new)
        stats = stats.incr(nf=1)
    u_new = jnp.where(linsolve_ok, u_new, u)
    fu_new = jnp.where(linsolve_ok, fu_new, fu)
    # Linear solve failed right after a reset → hard failure; otherwise
    # force a reinit on the next step (solve.jl:377-397).
    hard_lin_fail = (~linsolve_ok) & (steps_since_last_reset == 0)
    stale_lin_fail = (~linsolve_ok) & (steps_since_last_reset > 0)
    force_reinit_next = force_reinit_next | stale_lin_fail
    from ..core.verbosity import traced_emit
    traced_emit(ctx.verbosity, "linsolve_failed_noncurrent", stale_lin_fail,
                "linear solve failed with a stale approximate Jacobian; "
                "retrying with a reinitialized Jacobian (QN solve.jl:385)")

    # --- termination ------------------------------------------------------
    stop, term_checked = trm.check_termination(
        term_cfg, carry.term, fu_new, u_new, u, abstol, reltol,
        is_least_squares=ctx.is_least_squares)
    term = tree_where(linsolve_ok, term_checked, carry.term)
    stop = stop & linsolve_ok

    # --- jacobian update (skipped on force_stop / pending reinit) --------
    do_update = ((~stop) & (~force_reinit_next) & linsolve_ok
                 & (~resets_exhausted) & (~shrink_exceeded))
    J_updated = _update_jacobian(
        alg, J, fu_new if fu_secant is None else fu_secant,
        update_fu_prev, u_new, du_taken)
    J_next = tree_where(do_update, J_updated, J)
    # Secant base residual: advances to fu_new only when the iterate
    # actually moved (TR rejection keeps the base at fu == update_fu_prev).
    committed = tr_accepted if alg.trustregion is not None else jnp.bool_(True)
    update_fu_prev = tree_where(do_update & committed, fu_new,
                                update_fu_prev)

    retcode = jnp.int32(ReturnCode.Default)
    retcode = jnp.where(shrink_exceeded,
                        jnp.int32(ReturnCode.ShrinkThresholdExceeded),
                        retcode)
    retcode = jnp.where(stop, term.retcode, retcode)
    retcode = jnp.where(hard_lin_fail,
                        jnp.int32(ReturnCode.InternalLinearSolveFailed),
                        retcode)
    retcode = jnp.where(resets_exhausted,
                        jnp.int32(ReturnCode.ConvergenceFailure), retcode)
    force_stop = stop | hard_lin_fail | resets_exhausted | shrink_exceeded

    return QNCarry(
        u=u_new, u_prev=u, fu=fu_new, du=du, J=J_next,
        nsteps=carry.nsteps + 1, nresets=nresets,
        steps_since_last_reset=steps_since_last_reset,
        force_stop=carry.force_stop | force_stop,
        force_reinit=force_reinit_next,
        retcode=jnp.where(carry.force_stop, carry.retcode, retcode),
        stats=stats, term=term, ls_state=ls_state,
        update_fu_prev=update_fu_prev, reset_state=reset_state,
        tr_state=tr_state, tr_rejects=tr_rejects,
        trace_state=record_trace(ctx.trace, carry.trace_state,
                                 carry.nsteps + 1, fu_new, du, J_next,
                                 u_new),
    )


def run_quasi_newton(alg: QuasiNewtonAlgorithm, ctx, term_cfg, analytic_jac,
                     u0_flat, abstol, reltol, maxiters):
    alg = resolve_low_rank(alg, int(u0_flat.size))
    jac_fn = construct_dense_jacobian_fn(ctx.f_flat, alg.jacobian, ctx.n_in,
                                         ctx.n_out, analytic_jac)
    carry0 = init_quasi_newton(alg, ctx, term_cfg, jac_fn, u0_flat, reltol)

    def cond(carry):
        return (~carry.force_stop) & (carry.nsteps < maxiters)

    def body(carry):
        return step_quasi_newton(alg, ctx, term_cfg, jac_fn, carry, abstol,
                                 reltol)

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
