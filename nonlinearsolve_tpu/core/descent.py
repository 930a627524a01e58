"""Descent directions.

Functional ports of the reference descent layer
(/root/reference/lib/NonlinearSolveBase/src/descent/*.jl):

* ``NewtonDescent``  — ``J δu = -fu`` (newton.jl:95-139; NLLS via
  least-squares QR or normal form)
* ``SteepestDescent`` — ``δu = -Jᵀ fu`` (steepest.jl:9-30)
* ``DampedNewtonDescent`` — ``(JᵀJ + λDᵀD) δu = -Jᵀfu`` with the four modes
  simple / least_squares / normal_form / minimum_norm (damped_newton.jl:40-340)
* ``Dogleg`` — trust-region switch Newton ↔ Cauchy (dogleg.jl:95-160)
* ``GeodesicAcceleration`` — LM second-order correction with accept test
  ``2‖a‖ ≤ α‖v‖`` (geodesic_acceleration.jl:100-136)

Protocol: static config; ``descent_init(cfg, ctx, J, fu, u) -> state``;
``descent_solve(cfg, state, ctx, J, fu, u, trust_region=None) -> (DescentResult, state)``;
``descent_post_step(cfg, state, accepted) -> state`` (LM λ update hook).
``ctx`` is a ``DescentCtx`` with the flat residual fn and problem traits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.linear_solve import LinearSolver, solve_dense, solve_spd
from ..ops.operators import StatefulJacobianOperator, mv, rmv
from ..utils.norms import l2_norm, tree_dot
from ..utils.pytree import pytree_dataclass, static_config
from . import damping as dmp


@dataclasses.dataclass(frozen=True)
class DescentCtx:
    """Trace-time context handed to descent policies."""

    f_flat: Callable            # f(u_vec) -> fu_vec
    n_in: int
    n_out: int
    is_least_squares: bool
    # Iterate corrector H(u_proposed, u_prev) -> u, applied at every commit
    # point (the reference's `postcondition` option, conditioning.jl:46-66).
    postcondition: Callable = None
    # Iteration tracing config (core.tracing.TraceConfig) or None.
    trace: Any = None
    # NonlinearVerbosity (core.verbosity) or None — gates @SciMLMessage-
    # style emissions at traced engine sites.
    verbosity: Any = None
    # core.timer.PhaseTimer or None — opt-in per-phase timing callbacks
    # (the reference's @static_timeit regions, timer_outputs.jl:3-55).
    timer: Any = None

    def mark(self, phase: str) -> None:
        if self.timer is not None:
            self.timer.mark(phase)

    @property
    def square(self) -> bool:
        return self.n_in == self.n_out

    def apply_postcondition(self, u_new, u_prev):
        if self.postcondition is None:
            return u_new, False
        return self.postcondition(u_new, u_prev), True


@pytree_dataclass
class DescentResult:
    du: Any
    success: Any                # bool scalar
    linsolve_success: Any       # bool scalar
    duJtJdu: Any                # ‖J δu‖² when cheaply available, else NaN
    v: Any = None               # geodesic velocity (None otherwise)
    nf: Any = 0                 # extra residual evaluations performed
    nsolve: Any = 1
    nfactors: Any = 1


def _ok_result(du, duJtJdu=None, **kw):
    if duJtJdu is None:
        duJtJdu = jnp.asarray(jnp.nan, du.dtype)
    return DescentResult(du=du, success=jnp.bool_(True),
                         linsolve_success=jnp.bool_(True), duJtJdu=duJtJdu, **kw)


# ---------------------------------------------------------------------------
# Newton
# ---------------------------------------------------------------------------

@static_config
class NewtonDescent:
    linsolve: LinearSolver = LinearSolver()


@static_config
class SteepestDescent:
    pass


@static_config
class DampedNewtonDescent:
    initial_damping: float = 1.0
    damping: Any = None          # LevenbergMarquardtDamping | SwitchedEvolutionRelaxation
    linsolve: LinearSolver = LinearSolver()
    mode: str = "auto"           # 'auto'|'simple'|'least_squares'|'normal_form'|'minimum_norm'

    def resolve_mode(self, ctx: DescentCtx) -> str:
        """damped_newton.jl:108-138 mode selection, adapted: the default dense
        linear solver handles non-square systems (QR/lstsq), i.e.
        ``needs_square_A == False`` → normal-form damping picks the stacked
        least-squares formulation; SER's scalar damping picks 'simple';
        underdetermined NLLS with normal-form damping picks 'minimum_norm'."""
        if self.mode != "auto":
            return self.mode
        nf_damping = self.damping.returns_norm_form_damping
        if ctx.is_least_squares and ctx.n_out < ctx.n_in and nf_damping:
            return "minimum_norm"
        if not nf_damping:
            return "simple"
        if self.linsolve.method in ("cholesky",):
            return "normal_form"
        return "least_squares"


@static_config
class Dogleg:
    newton: Any = None           # NewtonDescent | DampedNewtonDescent
    steepest: SteepestDescent = SteepestDescent()

    def __post_init__(self):
        if self.newton is None:
            object.__setattr__(self, "newton", NewtonDescent())


@static_config
class GeodesicAcceleration:
    descent: Any = None          # inner descent (DampedNewtonDescent for LM)
    finite_diff_step: float = 0.1
    alpha: float = 0.75


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

@pytree_dataclass
class DampedNewtonState:
    damping: Any                 # LM / SER damping state
    last_D: Any                  # damping term used to build the current A


def descent_init(cfg, ctx: DescentCtx, J, fu, u):
    if isinstance(cfg, NewtonDescent) or isinstance(cfg, SteepestDescent):
        return None
    if isinstance(cfg, DampedNewtonDescent):
        dtype = u.dtype
        mode = cfg.resolve_mode(ctx)
        if isinstance(cfg.damping, dmp.LevenbergMarquardtDamping):
            n = ctx.n_out if mode == "minimum_norm" else ctx.n_in
            dstate = dmp.lm_damping_init(cfg.damping, cfg.initial_damping, n,
                                         dtype)
            last_D = jnp.zeros((n,), dtype)
        elif isinstance(cfg.damping, dmp.SwitchedEvolutionRelaxation):
            dstate = dmp.ser_damping_init(cfg.damping, cfg.initial_damping, fu,
                                          dtype)
            last_D = jnp.zeros((), dtype)
        else:
            raise ValueError(f"unknown damping {cfg.damping!r}")
        return DampedNewtonState(damping=dstate, last_D=last_D)
    if isinstance(cfg, Dogleg):
        return descent_init(cfg.newton, ctx, J, fu, u)
    if isinstance(cfg, GeodesicAcceleration):
        return descent_init(cfg.descent, ctx, J, fu, u)
    raise ValueError(f"unknown descent {cfg!r}")


# ---------------------------------------------------------------------------
# solve
# ---------------------------------------------------------------------------

def _matrix_precond(cfg: LinearSolver, J, verbosity=None):
    """Built-in preconditioners for materialized operators.

    'jacobi': diagonal scaling.  'device_lu': the exact host-factored /
    device-applied sparse LU (ops/device_lu.py — the KLU-preconditioned
    Krylov role of the reference's large_systems tutorial): ONE host
    callback per Newton linearization (the numeric refactorization),
    then every Krylov iteration applies the factors on device.  An
    unavailable 'device_lu' (non-CSR J, no native lib, unsupported
    schedule) degrades to no preconditioner — visibly, via the linear
    'precond_unavailable' verbosity class (plan availability is static,
    so the message is emitted host-side at trace time)."""
    if cfg.precond == "device_lu":
        from ..ops.sparse import CSR
        from .verbosity import NonlinearVerbosity

        def _notify(why):
            lin = (getattr(verbosity, "linear", None)
                   if isinstance(verbosity, NonlinearVerbosity)
                   else verbosity)
            if lin is not None and hasattr(lin, "emit"):
                lin.emit("precond_unavailable",
                         f"precond='device_lu' requested but {why}; "
                         "proceeding unpreconditioned")

        if isinstance(J, CSR):
            from ..ops.device_lu import device_lu_for
            import numpy as np
            lu = device_lu_for(np.asarray(J.indptr), np.asarray(J.indices),
                               J.shape[0], dtype=J.data.dtype)
            if lu is not None:
                state = lu.refresh(J.data)

                def apply(x, lu=lu, state=state):
                    # a re-pivot ships the zeroed placeholder state with
                    # ok=False: degrade to the identity preconditioner
                    # rather than a singular one
                    out, ok = lu.solve(state, x)
                    return jnp.where(ok, out, x)

                return apply
            _notify("no device-LU plan applies to this pattern "
                    "(native lib missing or schedule unsupported)")
        else:
            _notify(f"the operator is {type(J).__name__}, not CSR")
        return None
    if cfg.precond != "jacobi":
        return None
    diag = None
    if hasattr(J, "diagonal") and not isinstance(J, StatefulJacobianOperator):
        diag = J.diagonal() if callable(getattr(J, "diagonal")) else None
    if diag is None and isinstance(J, jnp.ndarray):
        diag = jnp.diagonal(J)
    if diag is None:
        return None
    safe = jnp.where(diag == 0, jnp.ones_like(diag), diag)
    return lambda x: x / safe


def _newton_solve(cfg: NewtonDescent, ctx: DescentCtx, J, fu,
                  krylov_rtol=None, u=None):
    from ..ops.krylov import solve_krylov
    from ..ops.operators import as_matvec
    from ..ops.sparse import CSR, DIA, ELL

    is_operator = isinstance(J, StatefulJacobianOperator)
    if cfg.linsolve.is_krylov or is_operator:
        method = cfg.linsolve.method if cfg.linsolve.is_krylov else "gmres"
        if ctx.is_least_squares and not ctx.square:
            # Normal-form Krylov NLLS: JᵀJ δu = Jᵀfu via lazy vjp∘jvp
            # (StatefulJacobianNormalFormOperator role).
            matvec = lambda v: rmv(J, mv(J, v))
            b = rmv(J, fu)
        else:
            if is_operator:
                matvec = J
            elif isinstance(J, CSR):
                # staged closure: the Pallas packing runs once per Newton
                # step here, not inside every Krylov iteration (this path
                # is forward-only — the while_loop body is never
                # differentiated; AD rides the IFT rule at solve level)
                matvec = J.matvec_fn()
            else:
                matvec = as_matvec(J)
            b = fu
        import numpy as np
        rtol = (krylov_rtol if krylov_rtol is not None
                else float(np.sqrt(np.finfo(np.dtype(fu.dtype)).eps)))
        if cfg.linsolve.precond_fn is not None:
            # Contract: precond_fn(u) -> (v -> M⁻¹v); a plain v -> M⁻¹v
            # callable (u-independent preconditioner) is also accepted.
            # A factory marked ``wants_residual = True`` is staged as
            # precond_fn(u, fu) — the residual lets it gate precision or
            # strength on solve progress (e.g. the hybrid mixed-precision
            # spectral preconditioner in ops/preconditioners.py).
            if getattr(cfg.linsolve.precond_fn, "wants_residual", False):
                M = cfg.linsolve.precond_fn(u, fu)
                if not callable(M):
                    raise TypeError(
                        "a wants_residual preconditioner factory must "
                        "return a v -> M⁻¹v callable from prep(u, fu); "
                        f"got {type(M).__name__}")
            else:
                M = cfg.linsolve.precond_fn(u)
                if not callable(M):
                    # plain v -> M⁻¹v callable (u-independent): calling it
                    # with u returned an array, so use the fn itself.
                    M = cfg.linsolve.precond_fn
        else:
            M = _matrix_precond(cfg.linsolve, J, ctx.verbosity)
        kw = {}
        if method == "gmres" and cfg.linsolve.krylov_basis_dtype:
            kw["basis_dtype"] = {"bf16": jnp.bfloat16,
                                 "bfloat16": jnp.bfloat16,
                                 "f16": jnp.float16,
                                 }[cfg.linsolve.krylov_basis_dtype]
        res = solve_krylov(
            method, matvec, b, restart=cfg.linsolve.restart,
            maxiter=cfg.linsolve.krylov_maxiter, rtol=rtol, M=M, **kw)
        from .verbosity import traced_emit_linear
        traced_emit_linear(
            ctx.verbosity, "krylov_unconverged", ~res.success,
            "Krylov solve did not reach rtol (|r| = {rn} after {it} "
            "iterations)", rn=res.residual_norm, it=res.iterations)
        traced_emit_linear(
            ctx.verbosity, "krylov_breakdown",
            ~jnp.all(jnp.isfinite(res.x)),
            "Krylov breakdown: non-finite iterate (|r| = {rn})",
            rn=res.residual_norm)
        return -res.x, jnp.all(jnp.isfinite(res.x))

    if isinstance(J, (CSR, DIA, ELL)):
        # Sparse-direct path (ops/direct_sparse.py — the KLU role):
        # tridiagonal → log-depth PCR; banded (bw ≤ 64, directly or after
        # RCM) → block cyclic reduction on-device; general patterns →
        # AMD-ordered native host LU via pure_callback; dense LU only for
        # tiny systems.  Krylov remains the intended large-N path.
        #
        # method='sparse_lu_device' opts into the DEVICE-applied factor
        # (ops/device_lu.py): the per-step host callback carries only the
        # refactorization — the triangular sweeps run on-chip, so b/x
        # never round-trip and factor-reusing variants (jac_reuse, IFT
        # second solves) pay no callback at all.  A re-pivot (ok=False)
        # falls back to the exact host path for that step.
        if (ctx.square and isinstance(J, CSR)
                and cfg.linsolve.method == "sparse_lu_device"):
            from ..ops.device_lu import device_lu_for
            import numpy as np
            lu = device_lu_for(np.asarray(J.indptr), np.asarray(J.indices),
                               J.shape[0], dtype=J.data.dtype)
            if lu is not None:
                state = lu.refresh(J.data)
                x, ok = lu.solve(state, jnp.ravel(fu))
                from ..ops.direct_sparse import solve_sparse_direct as _ssd

                def _keep(_):
                    return x, ok

                def _host(_):
                    return _ssd(J, jnp.ravel(fu))

                x, ok = jax.lax.cond(ok, _keep, _host, operand=None)
                du = -x
                if u is not None and jnp.ndim(u) != 1:
                    du = du.reshape(jnp.shape(u))
                return du, ok
        from ..ops.direct_sparse import solve_sparse_direct
        if ctx.square and not isinstance(J, ELL):
            x, ok = solve_sparse_direct(J, jnp.ravel(fu))
            du = -x
            if u is not None and jnp.ndim(u) != 1:
                du = du.reshape(jnp.shape(u))
            return du, ok
        J = J.todense()
    fu_flat = jnp.ravel(fu)
    if ctx.square:
        x, ok = solve_dense(J, fu_flat, cfg.linsolve,
                            verbosity=ctx.verbosity)
    else:
        x, _, _, _ = jnp.linalg.lstsq(J, fu_flat, rcond=None)
        ok = jnp.all(jnp.isfinite(x))
    du = -x
    if u is not None and jnp.ndim(u) != 1:
        du = du.reshape(jnp.shape(u))
    return du, ok


def _damped_system(cfg: DampedNewtonDescent, state: DampedNewtonState,
                   ctx: DescentCtx, J, fu, recompute_damping: bool):
    """Build the damping term D for the resolved mode; returns (D, state)."""
    mode = cfg.resolve_mode(ctx)
    if not recompute_damping:
        return state.last_D, state, mode
    if isinstance(cfg.damping, dmp.LevenbergMarquardtDamping):
        if mode == "minimum_norm":
            JJt = J @ J.T
            D, dstate = dmp.lm_damping_update(cfg.damping, state.damping, JJt,
                                              is_normal_form=True)
        elif mode == "normal_form":
            JtJ = J.T @ J
            D, dstate = dmp.lm_damping_update(cfg.damping, state.damping, JtJ,
                                              is_normal_form=True)
        else:  # least_squares: damping from J directly
            D, dstate = dmp.lm_damping_update(cfg.damping, state.damping, J,
                                              is_normal_form=False)
    else:  # SER
        D, dstate = dmp.ser_damping_update(cfg.damping, state.damping, fu)
    return D, DampedNewtonState(damping=dstate, last_D=D), mode


def _damped_solve(cfg: DampedNewtonDescent, mode: str, J, fu, D):
    """Solve the damped system for δu (sign already negated). Returns
    (δu, ok, δuJᵀJδu-or-None)."""
    if mode == "simple":
        M = getattr(cfg.damping, "mass_matrix", None)
        if M is None:
            A = J + D * jnp.eye(J.shape[0], J.shape[1], dtype=J.dtype)
        else:
            M = jnp.asarray(M, J.dtype)
            # diagonal vector or full matrix mass term: (J + D·M) δu = -F
            A = J + D * (jnp.diag(M) if M.ndim == 1 else M)
        x, ok = solve_dense(A, fu, cfg.linsolve)
        return -x, ok, None
    if mode == "least_squares":
        # [J; √D] δu ≈ [-fu; 0]  (damped_newton.jl least_squares branch)
        sqrtD = jnp.sqrt(jnp.maximum(D, 0.0))
        A = jnp.vstack([J, jnp.diag(sqrtD)])
        b = jnp.concatenate([fu, jnp.zeros((J.shape[1],), fu.dtype)])
        x, _, _, _ = jnp.linalg.lstsq(A, b, rcond=None)
        ok = jnp.all(jnp.isfinite(x))
        return -x, ok, None
    if mode == "normal_form":
        JtJ = J.T @ J
        A = JtJ + jnp.diag(D)
        b = J.T @ fu
        x, ok = solve_spd(A, b)
        return -x, ok, None
    if mode == "minimum_norm":
        # (JJᵀ + λD̃) z = -fu; δu = Jᵀ z (damped_newton.jl minimum_norm)
        JJt = J @ J.T
        A = JJt + jnp.diag(D)
        z, ok = solve_spd(A, fu)
        return -(J.T @ z), ok, None
    raise AssertionError(mode)


def descent_solve(cfg, state, ctx: DescentCtx, J, fu, u, trust_region=None,
                  recompute_damping: bool = True, krylov_rtol=None):
    """Compute δu.  Returns (DescentResult, new_state)."""
    if isinstance(cfg, NewtonDescent):
        du, ok = _newton_solve(cfg, ctx, J, fu, krylov_rtol, u)
        return DescentResult(du=du, success=ok, linsolve_success=ok,
                             duJtJdu=jnp.asarray(jnp.nan, du.dtype)), state

    if isinstance(cfg, SteepestDescent):
        du = -rmv(J, fu)
        return _ok_result(du, nsolve=0, nfactors=0), state

    if isinstance(cfg, DampedNewtonDescent):
        from ..ops.sparse import CSR, DIA, ELL
        if isinstance(J, (CSR, DIA, ELL)):
            J = J.todense()
        shaped = jnp.ndim(u) != 1
        fu_l, u_l = (jnp.ravel(fu), jnp.ravel(u)) if shaped else (fu, u)
        D, state, mode = _damped_system(cfg, state, ctx, J, fu_l,
                                        recompute_damping)
        du, ok, duJtJdu = _damped_solve(cfg, mode, J, fu_l, D)
        if shaped:
            du = du.reshape(jnp.shape(u))
        return DescentResult(du=du, success=ok, linsolve_success=ok,
                             duJtJdu=(jnp.asarray(jnp.nan, du.dtype)
                                      if duJtJdu is None else duJtJdu)), state

    if isinstance(cfg, Dogleg):
        return _dogleg_solve(cfg, state, ctx, J, fu, u, trust_region)

    if isinstance(cfg, GeodesicAcceleration):
        return _geodesic_solve(cfg, state, ctx, J, fu, u, trust_region)

    raise ValueError(f"unknown descent {cfg!r}")


def _dogleg_solve(cfg: Dogleg, state, ctx: DescentCtx, J, fu, u, trust_region):
    """dogleg.jl:95-160.  ``trust_region`` must be provided."""
    assert trust_region is not None, "Dogleg requires a trust region radius"
    res_newton, state = descent_solve(cfg.newton, state, ctx, J, fu, u)
    du_newton = res_newton.du
    nan = jnp.asarray(jnp.nan, du_newton.dtype)

    # Cauchy (steepest-descent) point
    du_cauchy = -rmv(J, fu)
    l_grad = l2_norm(du_cauchy)
    J_dc = mv(J, du_cauchy)
    duJtJdu = tree_dot(J_dc, J_dc)
    d_cauchy = (l_grad ** 3) / duJtJdu

    # Branch 1: Newton inside the trust region.
    newton_inside = l2_norm(du_newton) <= trust_region

    # Branch 2: Cauchy point outside — clip steepest direction to the radius.
    lam = trust_region / l_grad
    du_clipped = lam * du_cauchy

    # Branch 3: dogleg interpolation between Cauchy point and Newton step.
    du1 = (d_cauchy / l_grad) * du_cauchy
    du2 = du_newton - du1
    a = tree_dot(du2, du2)
    b = 2.0 * tree_dot(du1, du2)
    c = d_cauchy ** 2 - trust_region ** 2
    aux = jnp.maximum(0.0, b * b - 4.0 * a * c)
    tau = (-b + jnp.sqrt(aux)) / (2.0 * a)
    du_interp = du1 + tau * du2

    du = jnp.where(newton_inside, du_newton,
                   jnp.where(d_cauchy >= trust_region, du_clipped, du_interp))
    extra = jnp.where(newton_inside, nan,
                      jnp.where(d_cauchy >= trust_region,
                                lam * lam * duJtJdu, nan))
    ok = res_newton.linsolve_success
    return DescentResult(du=du, success=ok, linsolve_success=ok,
                         duJtJdu=extra, nsolve=res_newton.nsolve,
                         nfactors=res_newton.nfactors), state


def _geodesic_solve(cfg: GeodesicAcceleration, state, ctx: DescentCtx, J, fu,
                    u, trust_region):
    """geodesic_acceleration.jl:100-136."""
    h = cfg.finite_diff_step
    res_v, state = descent_solve(cfg.descent, state, ctx, J, fu, u,
                                 trust_region=trust_region,
                                 recompute_damping=True)
    v = res_v.du
    fu2 = ctx.f_flat(u + h * v)
    Jv = mv(J, v)
    rhs = (2.0 / h) * ((fu2 - fu) / h - Jv)
    # Second solve reuses the same damped system (reference passes
    # reuse_A_if_factorization and a shared-cache idx).
    res_a, state = descent_solve(cfg.descent, state, ctx, J, rhs, u,
                                 trust_region=trust_region,
                                 recompute_damping=False)
    a = res_a.du
    norm_v = l2_norm(v)
    norm_a = l2_norm(a)
    accepted = 2.0 * norm_a <= cfg.alpha * norm_v
    du = jnp.where(accepted, v + a / 2.0, v)
    ok = res_v.linsolve_success & res_a.linsolve_success
    return DescentResult(du=du, success=accepted & ok, linsolve_success=ok,
                         duJtJdu=jnp.asarray(jnp.nan, du.dtype), v=v,
                         nf=res_v.nf + res_a.nf + 1,
                         nsolve=res_v.nsolve + res_a.nsolve,
                         nfactors=res_v.nfactors), state


def descent_post_step(cfg, state, accepted):
    """End-of-step hook: LM's λ update (callback_into_cache!,
    levenberg_marquardt.jl:169-175)."""
    if isinstance(cfg, DampedNewtonDescent):
        if isinstance(cfg.damping, dmp.LevenbergMarquardtDamping):
            dstate = dmp.lm_damping_post_step(cfg.damping, state.damping,
                                              accepted)
            return state.replace(damping=dstate)
        return state
    if isinstance(cfg, GeodesicAcceleration):
        return descent_post_step(cfg.descent, state, accepted)
    if isinstance(cfg, Dogleg):
        return descent_post_step(cfg.newton, state, accepted)
    return state
