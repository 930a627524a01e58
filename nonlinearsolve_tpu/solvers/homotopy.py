"""Homotopy continuation drivers.

TPU-native redesign of the reference's continuation stack:

* ``HomotopySweep`` — natural-parameter continuation
  (/root/reference/lib/NonlinearSolveBase/src/homotopy_sweep.jl:151-905):
  cold anchor solve at λspan[0], secant/constant predictor with
  trust-hysteresis quality gating (θ < 1/2 earns trust, 2 consecutive good
  steps arm the secant), adaptive dλ with success-streak growth gated by
  prediction quality + AUTO-07p effort bands, bisection-halving on
  rejection down to min_dλ, tracking iteration/tolerance caps with exempt
  anchor and landing solves.
* ``KantorovichHomotopy`` — Deuflhard Newton–Kantorovich step control from
  the measured first-iteration contraction ratio Θ
  (kantorovich_homotopy.jl:104-130; here Θ is measured by an explicit
  one-Newton-step probe at the predictor point rather than instrumenting
  the inner iteration).
* ``ArcLengthContinuation`` — Keller pseudo-arclength in the packed
  (u, λ) variable (arclength.jl:82-260): θ-weighted metric
  ``⟨x,y⟩_θ = (θ/n)⟨x_u,y_u⟩ + (1-θ)x_λy_λ``, secant/tangent predictors,
  bordered-system corrector solved by the ordinary first-order engine on
  the augmented flat problem, bend-angle step control, fold rounding,
  final λ-fixed landing solve.
* ``HomotopyPolyAlgorithm`` — staged (sweep → arclength) with warm
  handoff: a failed sweep hands its last accepted point (backed off 5% of
  the span) + shrunk λspan to the next stage, retried cold if warm fails
  (homotopy_polyalg.jl:106-180); step caps rescaled to preserve absolute
  step sizes (homotopy_polyalg.jl:129-146).

Each driver jits as a single ``lax.while_loop`` whose body contains a full
inner nonlinear solve (itself a while_loop) — continuation is compiled
end-to-end with zero host round-trips per step.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..core.descent import DescentCtx
from ..core.jacobian import JacobianSpec
from ..core.returncode import ReturnCode
from ..core.solution import NLStats, NonlinearSolution
from ..core.termination import default_termination_mode
from ..utils.norms import get_tolerance, l2_norm
from ..utils.pytree import pytree_dataclass, static_config


def _default_inner():
    from .polyalg import FastShortcutNonlinearPolyalg
    return FastShortcutNonlinearPolyalg()


@static_config
class HomotopySweep:
    inner: Any = None
    nsteps: Optional[int] = None
    adaptive: bool = True
    initial_step_factor: float = 0.1
    min_dlam: Optional[float] = None
    max_step_factor: float = 1.0
    expand_factor: float = 2.0
    expand_threshold: int = 2
    expand_quality: float = 0.25
    predictor: str = "secant"
    tracking_maxiters: Optional[int] = 10
    tracking_abstol: Optional[float] = None
    maxsteps: int = 10000
    name: str = "HomotopySweep"

    def __post_init__(self):
        if not self.adaptive and self.nsteps is None:
            raise ValueError("non-adaptive HomotopySweep requires nsteps")
        if self.predictor not in ("secant", "constant"):
            raise ValueError("predictor must be 'secant' or 'constant'")
        # construction-time option validation (reference homotopy_sweep.jl
        # constructor checks, exercised by homotopy_sweep_tests items 1/18)
        if self.nsteps is not None and self.nsteps < 1:
            raise ValueError("nsteps must be >= 1")
        if not 0.0 < self.initial_step_factor <= 1.0:
            raise ValueError("initial_step_factor must be in (0, 1]")
        if self.min_dlam is not None and not self.min_dlam > 0.0:
            raise ValueError("min_dlam must be > 0")
        if not 0.0 < self.max_step_factor <= 1.0:
            raise ValueError("max_step_factor must be in (0, 1]")
        if not self.expand_factor >= 1.0:
            raise ValueError("expand_factor must be >= 1")
        if self.expand_threshold < 1:
            raise ValueError("expand_threshold must be >= 1")
        if not self.expand_quality > 0.0:
            raise ValueError("expand_quality must be > 0")
        if self.maxsteps < 1:
            raise ValueError("maxsteps must be >= 1")
        if self.tracking_maxiters is not None and self.tracking_maxiters < 1:
            raise ValueError("tracking_maxiters must be >= 1")
        if self.tracking_abstol is not None and not self.tracking_abstol > 0:
            raise ValueError("tracking_abstol must be > 0")


@static_config
class KantorovichHomotopy:
    inner: Any = None
    nsteps: Optional[int] = None
    initial_step_factor: float = 0.1
    min_dlam: Optional[float] = None
    max_step_factor: float = 1.0
    qmin: float = 0.2
    qmax: float = 5.0
    theta_min: float = 0.125
    theta_reject: float = 0.95
    theta_bar: float = 0.5
    gamma: float = 0.95
    strict: bool = True
    predictor: str = "constant"
    predictor_order: Optional[int] = None  # resolved: 1 constant, 2 secant
    expand_quality: float = 0.25
    tracking_maxiters: Optional[int] = 10
    maxsteps: int = 10000
    name: str = "KantorovichHomotopy"
    # shared-driver fields (unused growth path)
    adaptive: bool = True
    expand_factor: float = 1.0
    expand_threshold: int = 2
    tracking_abstol: Optional[float] = None

    def __post_init__(self):
        # kantorovich_homotopy_tests__item1.jl construction validation
        if self.nsteps is not None and self.nsteps < 1:
            raise ValueError("nsteps must be >= 1")
        if not self.initial_step_factor > 0.0:
            raise ValueError("initial_step_factor must be > 0")
        if self.min_dlam is not None and not self.min_dlam > 0.0:
            raise ValueError("min_dlam must be > 0")
        if not 0.0 < self.max_step_factor <= 1.0:
            raise ValueError("max_step_factor must be in (0, 1]")
        if not self.qmin < 1.0:
            raise ValueError("qmin must be < 1")
        if not self.qmax >= 1.0:
            raise ValueError("qmax must be >= 1")
        if not self.theta_min < self.theta_bar:
            raise ValueError("theta_min must be < theta_bar")
        if not self.theta_bar < self.theta_reject:
            raise ValueError("theta_bar must be < theta_reject")
        if not 0.0 < self.gamma < 1.0:
            raise ValueError("gamma must be in (0, 1)")
        if self.predictor not in ("constant", "secant"):
            raise ValueError("predictor must be 'constant' or 'secant'")
        if self.predictor_order is None:
            object.__setattr__(self, "predictor_order",
                               2 if self.predictor == "secant" else 1)
        if self.predictor_order < 1:
            raise ValueError("predictor_order must be >= 1")
        if not self.expand_quality > 0.0:
            raise ValueError("expand_quality must be > 0")
        if self.tracking_maxiters is not None and self.tracking_maxiters < 1:
            raise ValueError("tracking_maxiters must be >= 1")
        if self.tracking_abstol is not None and not self.tracking_abstol > 0:
            raise ValueError("tracking_abstol must be > 0")
        if self.maxsteps < 1:
            raise ValueError("maxsteps must be >= 1")


@static_config
class ArcLengthContinuation:
    inner: Any = None
    initial_step_factor: float = 0.1
    adaptive: bool = True
    min_ds: Optional[float] = None
    max_step_factor: float = 1.0
    expand_factor: float = 2.0
    expand_threshold: int = 2
    max_angle: float = math.pi / 6
    predictor: str = "secant"
    tracking_maxiters: Optional[int] = 10
    maxsteps: int = 10000
    theta: float = 0.5
    name: str = "ArcLengthContinuation"

    def __post_init__(self):
        # arclength_tests__item{1,6,7}.jl construction validation
        if not 0.0 < self.initial_step_factor <= 1.0:
            raise ValueError("initial_step_factor must be in (0, 1]")
        if self.min_ds is not None and not self.min_ds > 0.0:
            raise ValueError("min_ds must be > 0")
        if not 0.0 < self.max_step_factor <= 1.0:
            raise ValueError("max_step_factor must be in (0, 1]")
        if not self.expand_factor >= 1.0:
            raise ValueError("expand_factor must be >= 1")
        if self.expand_threshold < 1:
            raise ValueError("expand_threshold must be >= 1")
        if not 0.0 < self.max_angle < math.pi:
            raise ValueError("max_angle must be in (0, pi)")
        if self.predictor not in ("secant", "tangent"):
            # 'constant' is rejected: the augmented corrector needs a
            # direction (arclength_tests__item6.jl)
            raise ValueError("predictor must be 'secant' or 'tangent'")
        if self.maxsteps < 1:
            raise ValueError("maxsteps must be >= 1")
        if not 0.0 < self.theta < 1.0:
            raise ValueError("theta must be in (0, 1) — either endpoint "
                             "degenerates the arclength metric")
        if self.tracking_maxiters is not None and self.tracking_maxiters < 1:
            raise ValueError("tracking_maxiters must be >= 1")


@static_config
class HomotopyPolyAlgorithm:
    stages: Tuple[Any, ...] = ()
    warm_handoff: bool = True
    name: str = "HomotopyPolyAlgorithm"

    def __post_init__(self):
        if not self.stages:
            object.__setattr__(
                self, "stages", (HomotopySweep(), ArcLengthContinuation()))


def FastShortcutHomotopyPolyalg(*, autodiff=None, warm_handoff=True):
    """src/poly_algs.jl:128-138 — sweep → arclength with a FastShortcut
    inner corrector."""
    from .polyalg import FastShortcutNonlinearPolyalg
    inner = FastShortcutNonlinearPolyalg(autodiff=autodiff)
    return HomotopyPolyAlgorithm(
        stages=(HomotopySweep(inner=inner),
                ArcLengthContinuation(inner=inner)),
        warm_handoff=warm_handoff)


def SimpleHomotopySweep(**kw):
    """Simple-tier sweep (reference simple_homotopy_sweep.jl:58): the same
    driver with a SimpleNewtonRaphson corrector."""
    from .simple import SimpleNewtonRaphson
    kw.setdefault("inner", SimpleNewtonRaphson())
    return HomotopySweep(**kw)


# ---------------------------------------------------------------------------
# Natural-parameter sweep driver (shared by HomotopySweep / Kantorovich)
# ---------------------------------------------------------------------------

@pytree_dataclass
class SweepCarry:
    u: Any
    u_prev: Any
    lam: Any
    lam_prev: Any
    dlam: Any
    streak: Any
    trust: Any
    disp_prev: Any
    attempts: Any
    fu: Any            # residual from the most recent inner solve
    retcode: Any
    done: Any
    stats: Any
    alg_hint: Any      # retained winning polyalg rung (int32; 0 = ladder start)


def _effort_growth_factor(nit, budget, expand_factor):
    """AUTO-07p effort bands (homotopy_sweep.jl:386-395)."""
    band1 = jnp.maximum(3, budget // 20)
    band2 = jnp.maximum(6, budget // 4)
    return jnp.where(nit < 0, expand_factor,
                     jnp.where(nit <= band1, expand_factor,
                               jnp.where(nit <= band2,
                                         1.0 + (expand_factor - 1.0) / 2.0,
                                         1.0)))


def _effort_wants_shrink(nit, budget):
    """homotopy_sweep.jl:399-407."""
    return (nit >= 0) & (nit <= budget) & (4 * nit >= 3 * budget)


def _kantorovich_q(alg: KantorovichHomotopy, theta, has_theta, dtype):
    """_kantorovich_step_factor (homotopy_sweep.jl:450-459)."""
    def g(x):
        return jnp.sqrt(1.0 + 4.0 * x) - 1.0

    theta_eff = jnp.where(has_theta,
                          jnp.maximum(theta, alg.theta_min), alg.theta_min)
    q = alg.gamma * (g(jnp.asarray(alg.theta_bar, dtype)) / g(theta_eff)) \
        ** (1.0 / alg.predictor_order)
    q = jnp.clip(q, alg.qmin, alg.qmax)
    bad = has_theta & (~jnp.isfinite(theta) | (theta < 0))
    return jnp.where(bad, jnp.asarray(alg.qmin, dtype), q)


def _run_sweep(alg, inner, ctx_maker, run_inner, u0_flat, lam0, lam1,
               abstol, reltol, maxiters, kantorovich: bool,
               user_tol: bool = False, user_maxiters: bool = False):
    """Shared natural-parameter driver (homotopy_sweep.jl:637-890).

    ``user_tol`` / ``user_maxiters``: explicit user-passed solve options
    always win over the loose interior-tracking tolerance/budget
    (_tracking_tolerance / _tracking_budget, homotopy_sweep.jl:355-377) —
    splicing a loose abstol next to a user reltol would let the loose
    criterion fire first in OR-combined termination modes."""
    dtype = u0_flat.dtype
    lam0 = jnp.asarray(lam0, dtype)
    lam1 = jnp.asarray(lam1, dtype)
    span = lam1 - lam0
    if alg.nsteps is not None:
        dlam0 = span / alg.nsteps
    else:
        dlam0 = alg.initial_step_factor * span
    min_dlam = (jnp.sqrt(jnp.finfo(dtype).eps) if alg.min_dlam is None
                else jnp.asarray(alg.min_dlam, dtype))
    max_dlam = alg.max_step_factor * span
    dlam0 = jnp.where(jnp.abs(dlam0) > jnp.abs(max_dlam), max_dlam, dlam0)

    track_budget = (maxiters if (user_maxiters
                                 or alg.tracking_maxiters is None)
                    else jnp.int32(alg.tracking_maxiters))
    track_abstol = (abstol if (user_tol or alg.tracking_abstol is None)
                    else jnp.asarray(alg.tracking_abstol, dtype))

    # --- anchor solve at λ0 (full budget/tolerance; homotopy_sweep.jl:694).
    # The anchor's full-ladder run discovers the winning subalgorithm,
    # which warm-started tracking steps then resume from (retaining
    # reinit!, homotopy_sweep.jl:780-785).
    anchor = run_inner(u0_flat, lam0, maxiters, abstol, jnp.int32(0))
    anchor_ok = ReturnCode.successful(anchor.retcode)
    anchor_hint = jnp.maximum(getattr(anchor, "winner", jnp.int32(-1)),
                              jnp.int32(0))

    zero = jnp.zeros((), dtype)
    # Anchor-failure contract (homotopy_sweep_tests__item16.jl): when the
    # λ0 system is unsolvable from u0, the homotopy premise is broken —
    # return u0 itself (with its residual), not the anchor's diverged
    # iterate, carrying the inner failure retcode.
    u_anchor = jnp.where(anchor_ok, anchor.u, u0_flat)
    fu_anchor = jnp.where(anchor_ok, anchor.fu,
                          ctx_maker(lam0)(u0_flat))
    carry0 = SweepCarry(
        u=u_anchor, u_prev=u_anchor, lam=lam0, lam_prev=lam0, dlam=dlam0,
        streak=jnp.int32(0), trust=jnp.int32(2), disp_prev=zero,
        attempts=jnp.int32(0), fu=fu_anchor,
        retcode=jnp.int32(ReturnCode.Default),
        done=(~anchor_ok) | (lam0 == lam1), stats=anchor.stats,
        alg_hint=anchor_hint)

    def cond(c):
        return ~c.done

    def body(c: SweepCarry) -> SweepCarry:
        attempts = c.attempts + 1
        hit_cap = attempts > alg.maxsteps
        next_lam = jnp.where(jnp.abs(lam1 - c.lam) <= jnp.abs(c.dlam), lam1,
                             c.lam + c.dlam)
        underflow = (next_lam == c.lam) & (next_lam != lam1)
        landing = next_lam == lam1

        use_secant = (jnp.bool_(alg.predictor == "secant")
                      & (c.trust >= 2) & (c.lam_prev != c.lam))
        denom = jnp.where(c.lam == c.lam_prev, jnp.ones_like(c.lam),
                          c.lam - c.lam_prev)
        s = (next_lam - c.lam) / denom
        guess = jnp.where(use_secant, c.u + s * (c.u - c.u_prev), c.u)

        # Interior tracking runs under the loose cap/tolerance; the landing
        # gets the full budget + tolerance (exemption, homotopy_sweep.jl).
        budget = jnp.where(landing, maxiters, track_budget)
        tol = jnp.where(landing, abstol, track_abstol)
        inner_sol = run_inner(guess, next_lam, budget, tol, c.alg_hint)
        ok = ReturnCode.successful(inner_sol.retcode)
        alg_hint = jnp.where(
            ok, jnp.maximum(getattr(inner_sol, "winner", jnp.int32(-1)),
                            jnp.int32(0)), c.alg_hint)

        if kantorovich:
            # Θ from a one-Newton-step probe at the predictor point
            # (contraction of the first corrector iteration).
            theta_c, ok_probe = _contraction_probe(ctx_maker, guess,
                                                   next_lam)
            has_theta = ok_probe
            contraction_rejected = has_theta & (theta_c > alg.theta_reject)
        else:
            theta_c = zero
            has_theta = jnp.bool_(False)
            contraction_rejected = jnp.bool_(False)

        strict_reject = (jnp.bool_(kantorovich and alg.strict)
                         & contraction_rejected)
        accepted = ok & ~strict_reject

        # --- secant quality θ (homotopy_sweep.jl:820-846) ----------------
        have_hist = c.lam_prev != c.lam
        virtual = c.u + s * (c.u - c.u_prev)
        correction = l2_norm(inner_sol.u - virtual)
        disp = l2_norm(inner_sol.u - c.u)
        scale = jnp.maximum(jnp.maximum(disp, c.disp_prev),
                            jnp.sqrt(jnp.finfo(dtype).eps)
                            * (1.0 + l2_norm(inner_sol.u)))
        theta_q = correction / scale
        trust = jnp.where(accepted & have_hist,
                          jnp.where(theta_q < 0.5, c.trust + 1,
                                    jnp.int32(0)),
                          c.trust)
        disp_prev = jnp.where(accepted, disp, c.disp_prev)

        # --- accepted step size --------------------------------------------
        nit = inner_sol.stats.nsteps
        if kantorovich:
            q = _kantorovich_q(alg, theta_c, has_theta, dtype)
            corrector_cheap = (nit >= 0) & (nit <= 2)
            good_quality = (~have_hist) | (theta_q <= alg.expand_quality) \
                | corrector_cheap
            q = jnp.where((q > 1.0) & ~good_quality, 1.0, q)
            proposed = q * c.dlam
            proposed = jnp.where(jnp.abs(proposed) > jnp.abs(max_dlam),
                                 max_dlam, proposed)
            proposed = jnp.where(jnp.abs(proposed) < min_dlam,
                                 jnp.sign(c.dlam) * min_dlam, proposed)
            dlam_acc, streak_acc = proposed, jnp.int32(0)
        else:
            shrink = _effort_wants_shrink(nit, budget)
            halved = jnp.where(jnp.abs(c.dlam) / 2 >= min_dlam, c.dlam / 2,
                               c.dlam)
            streak1 = c.streak + 1
            corrector_cheap = (nit >= 0) & (nit <= 2)
            good_quality = (~have_hist) | (theta_q <= alg.expand_quality) \
                | corrector_cheap
            growth = _effort_growth_factor(nit, budget,
                                           jnp.asarray(alg.expand_factor,
                                                       dtype))
            can_grow = (streak1 >= alg.expand_threshold) & good_quality \
                & (growth > 1.0)
            grown = growth * c.dlam
            grown = jnp.where(jnp.abs(grown) > jnp.abs(max_dlam), max_dlam,
                              grown)
            dlam_acc = jnp.where(shrink, halved,
                                 jnp.where(can_grow, grown, c.dlam))
            streak_acc = jnp.where(shrink | can_grow, jnp.int32(0), streak1)
            if not alg.adaptive:
                dlam_acc, streak_acc = c.dlam, c.streak

        # --- rejected step size --------------------------------------------
        if kantorovich:
            q_rej = jnp.where(
                ok & contraction_rejected & jnp.isfinite(theta_c)
                & (theta_c >= 0),
                _kantorovich_q(alg, theta_c, jnp.bool_(True), dtype),
                jnp.asarray(alg.qmin, dtype))
            dlam_rej = q_rej * (next_lam - c.lam)
            can_retry = (jnp.abs(dlam_rej) >= min_dlam) & (dlam_rej != 0)
        else:
            dlam_rej = c.dlam / 2
            can_retry = jnp.abs(dlam_rej) >= min_dlam
            if not alg.adaptive:
                can_retry = jnp.bool_(False)

        # --- state update ---------------------------------------------------
        u_new = jnp.where(accepted, inner_sol.u, c.u)
        u_prev_new = jnp.where(accepted, c.u, c.u_prev)
        lam_new = jnp.where(accepted, next_lam, c.lam)
        lam_prev_new = jnp.where(accepted, c.lam, c.lam_prev)
        dlam_new = jnp.where(accepted, dlam_acc,
                             jnp.where(can_retry, dlam_rej, c.dlam))
        streak_new = jnp.where(accepted, streak_acc, jnp.int32(0))
        trust_new = jnp.where(accepted, trust,
                              jnp.where(can_retry, jnp.int32(0), c.trust))

        finished = accepted & landing
        failed = (~accepted) & ~can_retry
        retcode = jnp.int32(ReturnCode.Default)
        retcode = jnp.where(
            failed,
            jnp.where(strict_reject,
                      jnp.int32(ReturnCode.ConvergenceFailure),
                      inner_sol.retcode),
            retcode)
        retcode = jnp.where(underflow, jnp.int32(ReturnCode.Stalled),
                            retcode)
        retcode = jnp.where(hit_cap, jnp.int32(ReturnCode.MaxIters), retcode)
        retcode = jnp.where(finished, jnp.int32(ReturnCode.Success), retcode)
        done = finished | failed | underflow | hit_cap

        stats = NLStats(
            nf=c.stats.nf + inner_sol.stats.nf,
            njacs=c.stats.njacs + inner_sol.stats.njacs,
            nfactors=c.stats.nfactors + inner_sol.stats.nfactors,
            nsolve=c.stats.nsolve + inner_sol.stats.nsolve,
            nsteps=c.stats.nsteps + inner_sol.stats.nsteps)

        return SweepCarry(
            u=u_new, u_prev=u_prev_new, lam=lam_new, lam_prev=lam_prev_new,
            dlam=dlam_new, streak=streak_new, trust=trust_new,
            disp_prev=disp_prev, attempts=attempts, fu=inner_sol.fu,
            retcode=retcode, done=done, stats=stats, alg_hint=alg_hint)

    final = jax.lax.while_loop(cond, body, carry0)

    # anchor failure / zero-width span retcodes
    retcode = jnp.where(
        ~anchor_ok, anchor.retcode,
        jnp.where((lam0 == lam1), jnp.int32(ReturnCode.Success),
                  final.retcode))
    return final.replace(retcode=retcode)


def _contraction_probe(ctx_maker, guess, lam):
    """One Newton step at (guess, λ): Θ = ‖f(u₁)‖/‖f(guess)‖."""
    f_flat = ctx_maker(lam)
    fu0 = f_flat(guess)
    J = jax.jacfwd(f_flat)(guess)
    du = jnp.linalg.solve(J, fu0)
    ok = jnp.all(jnp.isfinite(du))
    u1 = guess - jnp.where(ok, du, jnp.zeros_like(du))
    n0 = l2_norm(fu0)
    theta = l2_norm(f_flat(u1)) / jnp.where(n0 == 0, jnp.ones_like(n0), n0)
    return theta, ok & jnp.isfinite(theta)


# ---------------------------------------------------------------------------
# Arclength driver
# ---------------------------------------------------------------------------

@pytree_dataclass
class ArcCarry:
    x: Any            # packed [u; λ] current accepted point
    x_prev: Any
    tau: Any          # θ-unit predictor direction
    ds: Any
    streak: Any
    attempts: Any
    have_hist: Any
    fu: Any
    retcode: Any
    done: Any
    stats: Any


def _run_arclength(alg: ArcLengthContinuation, run_inner_fixed, run_corrector,
                   f_of, u0_flat, lam0, lam1, abstol, reltol, maxiters,
                   user_maxiters: bool = False):
    """Keller pseudo-arclength (arclength.jl).  ``run_corrector(tau, xcur,
    ds, guess, budget, tol) -> carry on the augmented system``."""
    dtype = u0_flat.dtype
    n = u0_flat.shape[0]
    lam0 = jnp.asarray(lam0, dtype)
    lam1 = jnp.asarray(lam1, dtype)
    span = lam1 - lam0
    wu = alg.theta / n
    wl = 1.0 - alg.theta

    def tdot(a, b):
        return wu * jnp.dot(a[:n], b[:n]) + wl * a[n] * b[n]

    def tnorm(a):
        return jnp.sqrt(tdot(a, a))

    ds0 = jnp.abs(alg.initial_step_factor * span)
    min_ds = (jnp.sqrt(jnp.finfo(dtype).eps) if alg.min_ds is None
              else jnp.asarray(alg.min_ds, dtype))
    max_ds = jnp.abs(alg.max_step_factor * span)
    track_budget = (maxiters if (user_maxiters
                                 or alg.tracking_maxiters is None)
                    else jnp.int32(alg.tracking_maxiters))

    # anchor at λ0
    anchor = run_inner_fixed(u0_flat, lam0, maxiters, abstol)
    anchor_ok = ReturnCode.successful(anchor.retcode)
    x0 = jnp.concatenate([anchor.u, lam0[None]])
    fu0_pad = jnp.concatenate([anchor.fu, jnp.zeros((1,), dtype)])

    # bootstrap direction: pure-λ step, oriented toward λ1
    tau0 = jnp.zeros((n + 1,), dtype).at[n].set(jnp.sign(span) / jnp.sqrt(wl))

    carry0 = ArcCarry(
        x=x0, x_prev=x0, tau=tau0, ds=ds0, streak=jnp.int32(0),
        attempts=jnp.int32(0), have_hist=jnp.bool_(False), fu=fu0_pad,
        retcode=jnp.int32(ReturnCode.Default),
        done=(~anchor_ok) | (lam0 == lam1), stats=anchor.stats)

    def cond(c):
        return ~c.done

    def body(c: ArcCarry) -> ArcCarry:
        attempts = c.attempts + 1
        hit_cap = attempts > alg.maxsteps

        # Predictor direction: secant through the last two accepted points,
        # or the true path tangent from the bordered solve
        # ``[∂H/∂u | ∂H/∂λ ; τ_prevᵀ·W] t = e_{n+1}`` (arclength.jl
        # :tangent — well-defined at folds where dλ/ds = 0).
        if alg.predictor == "tangent":
            def path_resid(xv):
                return f_of(xv[n])(xv[:n])

            P = jax.jacfwd(path_resid)(c.x)            # (n, n+1)
            wrow = jnp.concatenate([jnp.full((n,), wu) * c.tau[:n],
                                    (wl * c.tau[n])[None]])
            B = jnp.concatenate([P, wrow[None, :]], axis=0)
            e = jnp.zeros((n + 1,), dtype).at[n].set(1.0)
            t_raw = jnp.linalg.solve(B, e)
            t_norm = tnorm(t_raw)
            t_ok = jnp.all(jnp.isfinite(t_raw)) & (t_norm > 0)
            t_unit = t_raw / jnp.where(t_norm == 0, 1.0, t_norm)
            # orient along the previous direction
            t_unit = t_unit * jnp.sign(
                jnp.where(tdot(t_unit, c.tau) == 0, 1.0,
                          tdot(t_unit, c.tau)))
            tau = jnp.where(t_ok, t_unit, c.tau)
        else:
            sec = c.x - c.x_prev
            sec_norm = tnorm(sec)
            tau = jnp.where(c.have_hist & (sec_norm > 0),
                            sec / jnp.where(sec_norm == 0, 1.0, sec_norm),
                            c.tau)

        guess = c.x + c.ds * tau
        corr = run_corrector(tau, c.x, c.ds, guess, track_budget, abstol)
        ok = ReturnCode.successful(corr.retcode)
        x_new = corr.u

        # bend-angle control (arclength.jl max_angle)
        seg = x_new - c.x
        seg_norm = tnorm(seg)
        cosang = jnp.where(
            c.have_hist & (seg_norm > 0),
            tdot(seg, c.tau) / jnp.where(seg_norm == 0, 1.0, seg_norm), 1.0)
        cosang = jnp.clip(cosang, -1.0, 1.0)
        angle = jnp.arccos(cosang)
        too_bent = c.have_hist & (angle > alg.max_angle)
        accepted = ok & ~too_bent

        lam_new = x_new[n]
        crossed = accepted & ((lam_new - lam1) * jnp.sign(span) >= 0)

        # step adaptation
        streak1 = c.streak + 1
        can_grow = (streak1 >= alg.expand_threshold) \
            & (angle < alg.max_angle / 3.0)
        ds_grown = jnp.minimum(alg.expand_factor * c.ds, max_ds)
        ds_acc = jnp.where(can_grow, ds_grown, c.ds)
        streak_acc = jnp.where(can_grow, jnp.int32(0), streak1)
        ds_rej = c.ds / 2
        can_retry = ds_rej >= min_ds
        if not alg.adaptive:
            ds_acc, streak_acc = c.ds, c.streak
            can_retry = jnp.bool_(False)

        x_acc = jnp.where(accepted, x_new, c.x)
        x_prev_acc = jnp.where(accepted, c.x, c.x_prev)
        # The stored direction is the accepted *segment* (the realized path
        # direction), not the prediction: the bend-angle gate compares
        # consecutive accepted segments (arclength.jl max_angle doc), and the
        # bootstrap pseudo-tangent must not linger once real history exists.
        seg_dir = seg / jnp.where(seg_norm == 0, 1.0, seg_norm)
        tau_new = jnp.where(accepted & (seg_norm > 0), seg_dir, c.tau)
        ds_new = jnp.where(accepted, ds_acc,
                           jnp.where(can_retry, ds_rej, c.ds))
        streak_new = jnp.where(accepted, streak_acc, jnp.int32(0))

        failed = (~accepted) & ~can_retry
        retcode = jnp.int32(ReturnCode.Default)
        retcode = jnp.where(failed, corr.retcode, retcode)
        retcode = jnp.where(failed & too_bent & ok,
                            jnp.int32(ReturnCode.ConvergenceFailure), retcode)
        retcode = jnp.where(hit_cap, jnp.int32(ReturnCode.MaxIters), retcode)
        retcode = jnp.where(crossed, jnp.int32(ReturnCode.Terminated),
                            retcode)
        done = crossed | failed | hit_cap

        stats = NLStats(
            nf=c.stats.nf + corr.stats.nf,
            njacs=c.stats.njacs + corr.stats.njacs,
            nfactors=c.stats.nfactors + corr.stats.nfactors,
            nsolve=c.stats.nsolve + corr.stats.nsolve,
            nsteps=c.stats.nsteps + corr.stats.nsteps)

        return ArcCarry(
            x=x_acc, x_prev=x_prev_acc, tau=tau_new, ds=ds_new,
            streak=streak_new, attempts=attempts,
            have_hist=c.have_hist | accepted, fu=corr.fu, retcode=retcode,
            done=done, stats=stats)

    final = jax.lax.while_loop(cond, body, carry0)

    # Final λ-fixed landing solve warm-started from the crossing point
    # (arclength.jl: the crossing iterate is near but not at λ1).
    landed = run_inner_fixed(final.x[:n], lam1, maxiters, abstol)
    landing_ok = ReturnCode.successful(landed.retcode)
    was_crossed = final.retcode == ReturnCode.Terminated
    u_final = jnp.where(was_crossed & landing_ok, landed.u, final.x[:n])
    fu_final = jnp.where(was_crossed & landing_ok, landed.fu, final.fu[:n])
    retcode = jnp.where(
        ~anchor_ok, anchor.retcode,
        jnp.where(lam0 == lam1, jnp.int32(ReturnCode.Success),
                  jnp.where(was_crossed,
                            jnp.where(landing_ok,
                                      jnp.int32(ReturnCode.Success),
                                      landed.retcode),
                            final.retcode)))
    stats = NLStats(
        nf=final.stats.nf + landed.stats.nf,
        njacs=final.stats.njacs + landed.stats.njacs,
        nfactors=final.stats.nfactors + landed.stats.nfactors,
        nsolve=final.stats.nsolve + landed.stats.nsolve,
        nsteps=final.stats.nsteps + landed.stats.nsteps)
    lam_last = final.x[n]
    return u_final, fu_final, retcode, stats, lam_last


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _jitted_homotopy(plan, u0, p, lam0, lam1, abstol, reltol, maxiters):
    f, alg, is_kant, user_tol, user_maxiters = plan
    f_raw = f.f  # the 3-argument homotopy residual f(u, p, λ)
    u0_flat, unravel_u = ravel_pytree(u0)

    def make_f_flat(lam):
        def f_flat(u_vec):
            out, _ = ravel_pytree(f_raw(unravel_u(u_vec), p, lam))
            return out
        return f_flat

    inner = alg.inner if alg.inner is not None else _default_inner()
    term_cfg = default_termination_mode(False)

    def run_inner(guess, lam, budget, tol, hint=None):
        from .dispatch import run_algorithm
        from .polyalg import NonlinearSolvePolyAlgorithm, run_polyalg
        ctx = DescentCtx(f_flat=make_f_flat(lam), n_in=u0_flat.size,
                         n_out=u0_flat.size, is_least_squares=False)
        if isinstance(inner, NonlinearSolvePolyAlgorithm):
            return run_polyalg(inner, ctx, term_cfg, JacobianSpec(), guess,
                               tol, reltol, budget, start_hint=hint)
        carry = run_algorithm(inner, ctx, term_cfg, JacobianSpec(), guess,
                              tol, reltol, budget)
        return carry

    if isinstance(alg, ArcLengthContinuation):
        n = u0_flat.size
        wu = alg.theta / n
        wl = 1.0 - alg.theta

        def run_corrector(tau, xcur, ds, guess, budget, tol):
            def aug_flat(x_vec):
                u = x_vec[:n]
                lam = x_vec[n]
                Hval = make_f_flat(lam)(u)
                cons = (wu * jnp.dot(tau[:n], x_vec[:n] - xcur[:n])
                        + wl * tau[n] * (x_vec[n] - xcur[n]) - ds)
                return jnp.concatenate([Hval, cons[None]])

            from .dispatch import run_algorithm
            ctx = DescentCtx(f_flat=aug_flat, n_in=n + 1, n_out=n + 1,
                             is_least_squares=False)
            return run_algorithm(inner, ctx, term_cfg, JacobianSpec(), guess,
                                 tol, reltol, budget)

        u_f, fu_f, retcode, stats, lam_last = _run_arclength(
            alg, run_inner, run_corrector, make_f_flat, u0_flat, lam0, lam1,
            abstol, reltol, maxiters, user_maxiters=user_maxiters)
        return unravel_u(u_f), fu_f, retcode, stats, lam_last

    final = _run_sweep(alg, inner, make_f_flat, run_inner, u0_flat, lam0,
                       lam1, abstol, reltol, maxiters, kantorovich=is_kant,
                       user_tol=user_tol, user_maxiters=user_maxiters)
    return (unravel_u(final.u), final.fu, final.retcode, final.stats,
            final.lam)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _homotopy_root(plan, u0, p, lam0, lam1, abstol, reltol, maxiters):
    return _jitted_homotopy(plan, u0, p, lam0, lam1, abstol, reltol,
                            maxiters)


@_homotopy_root.defjvp
def _homotopy_root_jvp(plan, primals, tangents):
    """IFT through a continuation solve: the tracker's while_loops are not
    reverse-differentiable, so the sweep runs on primals and the
    sensitivity ``J_u u̇ = −(∂f/∂p)ṗ`` is attached at the landing point
    (λ_last, which equals λ₁ on success).  Mirrors how the reference's
    HomotopyContinuation extension handles dual numbers."""
    u0, p, lam0, lam1, abstol, reltol, maxiters = primals
    _, p_dot, *_ = tangents
    out = _homotopy_root(plan, u0, p, lam0, lam1, abstol, reltol, maxiters)
    u, fu, retcode, stats, lam_last = out
    f_raw = plan[0].f

    # On success the driver has LANDED at λ₁ exactly (arclength's
    # ``lam_last`` is its continuation variable, which can overshoot);
    # only a failed sweep leaves the root at an intermediate λ.
    from ..core.returncode import ReturnCode as _RC
    lam_ift = jnp.where(retcode == jnp.int32(_RC.Success), lam1,
                        jnp.clip(lam_last, jnp.minimum(lam0, lam1),
                                 jnp.maximum(lam0, lam1)))

    u_flat, unravel_u = ravel_pytree(u)

    def g(u_vec, pp):
        vec, _ = ravel_pytree(f_raw(unravel_u(u_vec), pp, lam_ift))
        return vec

    J = jax.jacfwd(lambda uv: g(uv, p))(u_flat)
    _, b = jax.jvp(lambda pp: g(u_flat, pp), (p,), (p_dot,))
    n = u_flat.size
    u_dot_flat = -jnp.linalg.solve(J.reshape(n, n), b.reshape(n))
    u_dot = unravel_u(u_dot_flat)

    def zeros_like_leaf(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros_like(x)
        return jnp.zeros(x.shape, dtype=jax.dtypes.float0)

    out_dot = jax.tree_util.tree_map(zeros_like_leaf, out)
    return out, (u_dot, out_dot[1], out_dot[2], out_dot[3], out_dot[4])


def _solve_homotopy_single(prob, alg, *, abstol=None, reltol=None,
                           maxiters=None, **_ignored):
    u0_flat, _ = ravel_pytree(prob.u0)
    dtype = u0_flat.dtype
    # Explicit user tolerances / iteration budgets shadow the loose
    # interior-tracking settings (homotopy_sweep.jl:355-377); solve()
    # merges problem kwargs below call kwargs, so both tiers land here.
    user_tol = abstol is not None or reltol is not None
    user_maxiters = maxiters is not None
    if maxiters is None:
        maxiters = 1000
    abstol_v = jnp.asarray(get_tolerance(abstol, dtype), dtype)
    reltol_v = jnp.asarray(get_tolerance(reltol, dtype), dtype)
    lam0, lam1 = prob.lambdaspan
    is_kant = isinstance(alg, KantorovichHomotopy)
    plan = (prob.f, alg, is_kant, user_tol, user_maxiters)
    u, fu, retcode, stats, lam_last = _homotopy_root(
        plan, prob.u0, prob.p, jnp.asarray(lam0, dtype),
        jnp.asarray(lam1, dtype), abstol_v, reltol_v, jnp.int32(maxiters))
    sol = NonlinearSolution(u=u, resid=fu, retcode=retcode, stats=stats,
                            original=lam_last)
    return sol


def solve_homotopy(prob, alg=None, **kwargs) -> NonlinearSolution:
    """Entry point for HomotopyProblem (default: HomotopyPolyAlgorithm,
    mirroring solve(::HomotopyProblem, ::Nothing))."""
    if alg is None:
        alg = HomotopyPolyAlgorithm()
    if isinstance(alg, (HomotopySweep, KantorovichHomotopy,
                        ArcLengthContinuation)):
        return _solve_homotopy_single(prob, alg, **kwargs)
    if not isinstance(alg, HomotopyPolyAlgorithm):
        raise ValueError(f"cannot dispatch homotopy algorithm {alg!r}")

    # Staged driver with warm handoff (homotopy_polyalg.jl:106-180).
    lam0, lam1 = prob.lambdaspan
    span = lam1 - lam0
    best_sol = None
    for i, stage in enumerate(alg.stages):
        sol = _solve_homotopy_single(prob, stage, **kwargs)
        if bool(sol.success):
            return sol
        best_sol = sol
        if not alg.warm_handoff or i + 1 >= len(alg.stages):
            continue
        lam_last = float(sol.original) if sol.original is not None else None
        if lam_last is None or lam_last == lam0:
            continue
        # Warm handoff: back off 5% of the span from the last accepted
        # point, rescale the next stage's step caps to the remaining width.
        lam_h = lam_last - 0.05 * span
        if (span > 0 and lam_h <= lam0) or (span < 0 and lam_h >= lam0):
            lam_h = lam0
        remaining = lam1 - lam_h
        next_stage = alg.stages[i + 1]
        rescaled = next_stage.replace(
            max_step_factor=min(
                1.0, next_stage.max_step_factor * abs(span / remaining))
        ) if remaining != 0 else next_stage
        from ..core.problems import HomotopyProblem
        warm_prob = HomotopyProblem(prob.f, sol.u, prob.p,
                                    lambdaspan=(lam_h, lam1), **prob.kwargs)
        warm_sol = _solve_homotopy_single(warm_prob, rescaled, **kwargs)
        if bool(warm_sol.success):
            return warm_sol
        best_sol = warm_sol
    return best_sol
