"""Jacobian construction — the policy router.

TPU-native port of construct_jacobian_cache
(/root/reference/lib/NonlinearSolveBase/src/jacobian.jl:33-130): decides
between a concrete dense AD jacobian, an analytic ``f.jac``, a colored
sparse-AD jacobian (CSR, when a sparsity pattern is available), or a
matrix-free ``JacobianOperator`` (when the linear solver is Krylov and no
concrete jacobian was requested — mirroring ``concrete_jac(alg)`` ×
``needs_concrete_A(linsolve)``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax

from ..ops.operators import JacobianOperator
from ..ops.sparse_jac import plan_sparse_jacobian
from .autodiff import JacobianPolicy, construct_dense_jacobian_fn

# test hook: route dia-eligible Krylov Jacobians through the
# assembly-direct DIA path off-TPU too, so the end-to-end solve with a
# DIA-typed J (as_matvec routing, jacobi precond on DIA, densify paths)
# is exercisable by the CPU suite (the gate is TPU-only in production
# because the XLA-take selection fallback makes DIA assembly a wash on
# CPU while the dia matvec chain still wins on chip)
_FORCE_DIA_JAC = False


@dataclasses.dataclass(frozen=True)
class JacobianSpec:
    """Problem-level derivative info (from NonlinearFunction)."""

    analytic: Optional[Callable] = None       # u_vec -> (m, n) dense
    analytic_jvp: Optional[Callable] = None   # (v, u_vec) -> J@v
    analytic_vjp: Optional[Callable] = None   # (v, u_vec) -> Jᵀ@v
    sparsity: Any = None                      # CSR pattern / dense mask
    colorvec: Any = None
    sparse_plan: Any = None                   # host-built ColoredJacobian

    def __hash__(self):
        return hash((self.analytic, self.analytic_jvp, self.analytic_vjp,
                     id(self.sparsity), id(self.colorvec),
                     id(self.sparse_plan)))


def wants_sparse(alg, spec: "JacobianSpec") -> bool:
    """True when any algorithm in ``alg`` (possibly a polyalgorithm) will
    take the colored sparse-AD path — used to build the host-side plan
    before entering jit (the pattern/coloring are trace-time static, like
    the reference's symbolic sparsity-detection pass)."""
    from ..solvers.polyalg import NonlinearSolvePolyAlgorithm
    if isinstance(alg, NonlinearSolvePolyAlgorithm):
        return any(wants_sparse(a, spec) for a in alg.algs)
    policy = getattr(alg, "jacobian", None)
    if policy is None:
        return False
    if policy.mode == "sparse":
        return True
    return policy.mode == "auto" and spec.sparsity is not None


def construct_jacobian(policy: JacobianPolicy, linsolve, ctx,
                       spec: Optional[JacobianSpec],
                       concrete_jac: Optional[bool] = None):
    """Returns ``(jac_fn, kind)`` with kind ∈ {'dense', 'sparse',
    'operator'}; ``jac_fn(u)`` produces the J handed to descent policies."""
    spec = spec or JacobianSpec()
    is_krylov = linsolve is not None and getattr(linsolve, "is_krylov", False)

    if policy.mode == "operator" or (
            is_krylov and policy.mode == "auto" and concrete_jac is not True):
        op = JacobianOperator(ctx.f_flat, spec.analytic_jvp,
                              spec.analytic_vjp)
        return (lambda u: op.at(u)), "operator"

    if policy.mode == "sparse" or (
            policy.mode == "auto" and spec.sparsity is not None):
        plan = spec.sparse_plan
        if plan is None:
            # Only reachable when the pattern is user-specified (host data):
            # probe-based detection needs concrete values and is done
            # pre-jit by the solve driver (see core/solve.py).
            if spec.sparsity is None:
                raise ValueError(
                    "sparse jacobian requested but no sparsity pattern is "
                    "available at trace time; pass `sparsity` or "
                    "`jac_prototype` on the NonlinearFunction, or call "
                    "through nonlinearsolve_tpu.solve which probes the "
                    "pattern on host")
            plan = plan_sparse_jacobian(
                ctx.f_flat, ctx.n_in, ctx.n_out, sparsity=spec.sparsity,
                colorvec=spec.colorvec)
        # Assembly-direct DIA (r5): Krylov consumers of a stencil-born
        # (dia-tier) pattern get the Jacobian assembled STRAIGHT into
        # the (ndiag, n) streaming layout — one selection pass instead
        # of decompress-to-CSR + per-step CSR→DIA repack.  Concrete-CSR
        # consumers (sparse direct methods, the device-LU
        # preconditioner) keep the CSR path.
        if (is_krylov and getattr(linsolve, "precond", None) != "device_lu"
                and (jax.default_backend() == "tpu" or _FORCE_DIA_JAC)
                and plan.dia_plan is not None):
            return (lambda u: plan.dia(ctx.f_flat, u)), "sparse"
        return (lambda u: plan(ctx.f_flat, u)), "sparse"

    jac_fn = construct_dense_jacobian_fn(ctx.f_flat, policy, ctx.n_in,
                                         ctx.n_out, spec.analytic)

    # Shaped mode: jacfwd of a multi-dim residual yields an
    # (out_shape + in_shape) tensor; the linear-algebra layer wants 2D.
    def jac_2d(u):
        J = jac_fn(u)
        if J.ndim != 2:
            return J.reshape(ctx.n_out, ctx.n_in)
        return J

    return jac_2d, "dense"
