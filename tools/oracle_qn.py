"""Reference-formula quasi-Newton oracles (VERDICT r4 next#3).

Line-faithful NumPy f64 transcriptions of the reference's Good-Broyden
and Klement engines — update rules, init scaling, reset conditions, and
the AbsNormSafeBest(maximum∘abs, max_stalled_steps=32) termination that
gates the 23-problem suite:

* Good Broyden update + αI⁻¹ init + NoChangeInStateReset:
  /root/reference/lib/NonlinearSolveQuasiNewton/src/broyden.jl:77-162,
  reset_conditions.jl:18-88
* Klement diagonal update + IllConditionedJacobianReset:
  klement.jl:100-141, reset_conditions.jl:90-120
* init α = 2‖fu‖₂ / max(‖u‖₂, 1) (α=1 when ‖fu‖₂ < 1e-5):
  NonlinearSolveBase/src/utils.jl:307-314
* QN step ordering (reset check → descent → step → termination →
  update): NonlinearSolveQuasiNewton/src/solve.jl:295-482
* safe-best termination (best-iterate retention, stall windows):
  NonlinearSolveBase/src/termination_conditions.jl:196-289 with the
  regular defaults (abstol f64 = 3.0e-13, patience_steps=100,
  patience_objective_multiplier=3, min_max_factor=1.3,
  max_stalled_steps=32; common_defaults.jl:44-48, public.jl:344-346).

Purpose: run the REFERENCE's exact arithmetic on THIS repo's fixtures so
broken-set differences decompose into (a) fixture drift vs the
NonlinearProblemLibrary variants (oracle fails here too) and (b) engine
deviations (oracle converges, engine doesn't).  See
tests/test_qn_oracle.py for the recorded outcomes.
"""

from __future__ import annotations

import numpy as np

ABSTOL_F64 = 3.0e-13          # common_defaults.jl:44-48
RESET_TOL = np.finfo(np.float64).eps ** 0.75   # reset_conditions.jl:33
PATIENCE_STEPS = 100
PATIENCE_MULT = 3.0
MIN_MAX_FACTOR = 1.3
MAX_STALLED = 32


def _alpha(u, fu):
    """utils.jl:307-314: α for J = αI (Broyden stores J⁻¹ = I/α)."""
    fu_norm = float(np.linalg.norm(fu))
    if fu_norm < 1.0e-5:
        return 1.0
    return (2.0 * fu_norm) / max(float(np.linalg.norm(u)), 1.0)


class _SafeBest:
    """AbsNormSafeBest(maximum∘abs; max_stalled_steps=32) — the regular
    default mode (termination_conditions.jl:196-289, 329-346)."""

    def __init__(self, u0, fu0, abstol=ABSTOL_F64):
        self.abstol = abstol
        self.best = float(np.max(np.abs(fu0)))
        self.u_best = np.array(u0, np.float64)
        self.nsteps = 0
        self.obj_trace = np.zeros(PATIENCE_STEPS)
        self.step_trace = np.zeros(MAX_STALLED)
        self.retcode = None

    def check(self, fu, u, uprev) -> bool:
        objective = float(np.max(np.abs(fu)))
        if not np.isfinite(objective):
            self.retcode = "Unstable"
            return True
        # protective_threshold defaults to nothing -> off
        if objective < self.best:
            self.best = objective
            self.u_best = np.array(u, np.float64)
        if objective <= self.abstol:
            self.retcode = "Success"
            return True
        self.nsteps += 1
        self.obj_trace[(self.nsteps - 1) % PATIENCE_STEPS] = objective
        if (objective <= PATIENCE_MULT * self.abstol
                and self.nsteps > PATIENCE_STEPS):
            window = (self.obj_trace[:self.nsteps]
                      if self.nsteps < PATIENCE_STEPS else self.obj_trace)
            if window.min() < MIN_MAX_FACTOR * window.max():
                self.retcode = "Stalled"
                return True
        du_norm = float(np.linalg.norm(u - uprev))
        self.step_trace[(self.nsteps - 1) % MAX_STALLED] = du_norm
        if self.nsteps > MAX_STALLED and self.step_trace.max() <= self.abstol:
            self.retcode = "Stalled"
            return True
        return False


class _NoChangeReset:
    """reset_conditions.jl:18-88 (nsteps=3, check_du & check_dfu)."""

    def __init__(self, fu0):
        self.dfu = np.array(fu0, np.float64)
        self.ssc_du = 0
        self.ssc_dfu = 0

    def check(self, fu, du) -> bool:
        small = lambda v: bool(np.any(np.abs(v) <= RESET_TOL))
        if small(du):
            self.ssc_du += 1
            if self.ssc_du >= 3:
                self.ssc_du = self.ssc_dfu = 0
                return True          # dfu cache NOT updated on this exit
        else:
            self.ssc_du = self.ssc_dfu = 0
        dfu = fu - self.dfu
        if small(dfu):
            self.ssc_dfu += 1
            if self.ssc_dfu >= 3:
                self.ssc_dfu = self.ssc_du = 0
                self.dfu = np.array(fu)
                return True
        else:
            self.ssc_dfu = self.ssc_du = 0
        self.dfu = np.array(fu)
        return False


def reference_broyden(f, x0, *, maxiters=10000, max_resets=100,
                      update_rule="good", abstol=ABSTOL_F64,
                      record=None):
    """The reference's default ``Broyden()`` (globalization None).

    ``f`` maps np.float64 (n,) -> (n,).  Returns a dict with the
    safe-best iterate, its ∞-norm residual, retcode, and step count.
    ``record`` (optional list) collects (u, |fu|∞) per accepted step for
    trajectory comparison.
    """
    u = np.array(x0, np.float64)
    fu = np.asarray(f(u), np.float64)
    n = len(u)
    Jinv = np.eye(n) / _alpha(u, fu)
    term = _SafeBest(u, fu, abstol)
    reset = _NoChangeReset(fu)
    dfu_cache = np.array(fu)          # update-rule secant cache
    du = np.zeros(n)
    nresets = 0
    retcode = "MaxIters"
    for nsteps in range(maxiters):
        if nsteps > 0 and reset.check(fu, du):
            nresets += 1
            if nresets >= max_resets:
                retcode = "ConvergenceFailure"
                break
            Jinv = np.eye(n) / _alpha(u, fu)
        du = -(Jinv @ fu)
        uprev = u
        u = u + du
        fu = np.asarray(f(u), np.float64)
        if record is not None:
            record.append((u.copy(), float(np.max(np.abs(fu)))))
        if term.check(fu, u, uprev):
            retcode = term.retcode
            break
        # broyden.jl:126-147 (good): J⁻¹ += ((du − J⁻¹dfu)/⟨du, J⁻¹dfu⟩)
        #                                   ⊗ (J⁻¹ᵀ du)
        dfu = fu - dfu_cache
        Jinv_dfu = Jinv @ dfu
        if update_rule == "good":
            w = Jinv.T @ du
            denom = float(du @ Jinv_dfu)
        else:                          # bad broyden
            w = dfu
            denom = float(np.linalg.norm(dfu)) ** 2
        if denom == 0.0:
            denom = 1.0e-5
        Jinv = Jinv + np.outer((du - Jinv_dfu) / denom, w)
        dfu_cache = np.array(fu)
    return {"u": term.u_best, "best": term.best, "retcode": retcode,
            "nresets": nresets}


def reference_lbroyden(f, x0, *, threshold=10, maxiters=10000,
                       max_resets=3, abstol=ABSTOL_F64, record=None):
    """The reference's ``LimitedMemoryBroyden()`` (lbroyden.jl:21-36 +
    BroydenLowRankInitialization/BroydenLowRankJacobian,
    initialization.jl:139-296): J⁻¹ ≐ U Vᵀ − αI with α = 1/α_scale,
    ring-buffered (U, V) columns (newest overwrites oldest beyond
    ``threshold``), Good-Broyden append
    U₊ = (du − J⁻¹dfu)/⟨du, J⁻¹dfu⟩, V₊ = J⁻¹ᵀ du,
    NoChangeInStateReset with max_resets = 3 (the lbroyden default)."""
    u = np.array(x0, np.float64)
    fu = np.asarray(f(u), np.float64)
    n = len(u)
    U = np.zeros((n, threshold))
    V = np.zeros((n, threshold))
    idx = 0
    alpha = 1.0 / _alpha(u, fu)

    def jinv_mul(x):          # J⁻¹ x = U(Vᵀx) − αx  (mul! semantics)
        if idx == 0:
            return -alpha * x
        k = min(idx, threshold)
        return U[:, :k] @ (V[:, :k].T @ x) - alpha * x

    def jinv_tmul(x):         # J⁻ᵀ x = V(Uᵀx) − αx
        if idx == 0:
            return -alpha * x
        k = min(idx, threshold)
        return V[:, :k] @ (U[:, :k].T @ x) - alpha * x

    term = _SafeBest(u, fu, abstol)
    reset = _NoChangeReset(fu)
    dfu_cache = np.array(fu)
    du = np.zeros(n)
    nresets = 0
    retcode = "MaxIters"
    for nsteps in range(maxiters):
        if nsteps > 0 and reset.check(fu, du):
            nresets += 1
            if nresets >= max_resets:
                retcode = "ConvergenceFailure"
                break
            idx = 0
            alpha = 1.0 / _alpha(u, fu)
        du = -jinv_mul(fu)
        uprev = u
        u = u + du
        fu = np.asarray(f(u), np.float64)
        if record is not None:
            record.append((u.copy(), float(np.max(np.abs(fu)))))
        if term.check(fu, u, uprev):
            retcode = term.retcode
            break
        dfu = fu - dfu_cache
        Jinv_dfu = jinv_mul(dfu)
        w = jinv_tmul(du)
        denom = float(du @ Jinv_dfu)
        if denom == 0.0:
            denom = 1.0e-5
        slot = idx % threshold        # mod1(idx+1, threshold) in 0-based
        U[:, slot] = (du - Jinv_dfu) / denom
        V[:, slot] = w
        idx += 1
        dfu_cache = np.array(fu)
    return {"u": term.u_best, "best": term.best, "retcode": retcode,
            "nresets": nresets}


def reference_klement(f, x0, *, maxiters=10000, max_resets=100,
                      abstol=ABSTOL_F64, record=None):
    """The reference's default ``Klement()`` — diagonal structure,
    IllConditionedJacobianReset (klement.jl:29-49, 100-120)."""
    u = np.array(x0, np.float64)
    fu = np.asarray(f(u), np.float64)
    n = len(u)
    J = np.full(n, _alpha(u, fu))     # diagonal of J (not inverse)
    term = _SafeBest(u, fu, abstol)
    fu_cache = np.array(fu)
    nresets = 0
    retcode = "MaxIters"
    for nsteps in range(maxiters):
        if nsteps > 0 and bool(np.any(J == 0.0)):
            nresets += 1
            if nresets >= max_resets:
                retcode = "ConvergenceFailure"
                break
            J = np.full(n, _alpha(u, fu))
        du = -fu / J
        uprev = u
        u = u + du
        fu = np.asarray(f(u), np.float64)
        if record is not None:
            record.append((u.copy(), float(np.max(np.abs(fu)))))
        if term.check(fu, u, uprev):
            retcode = term.retcode
            break
        # klement.jl:110-120 (Diagonal): Jdu = J²du²;
        # J += ((fu − fu_cache − J·du)/Jdu) · du · J²
        Jdu = (J ** 2) * (du ** 2)
        denom = np.where(Jdu == 0.0, 1.0e-5, Jdu)
        J = J + ((fu - fu_cache - J * du) / denom) * du * (J ** 2)
        fu_cache = np.array(fu)
    return {"u": term.u_best, "best": term.best, "retcode": retcode,
            "nresets": nresets}
