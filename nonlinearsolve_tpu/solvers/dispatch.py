"""Uniform "run one algorithm" dispatch shared by the top-level solve and the
polyalgorithm engine (the analogue of the reference's ``__solve`` dispatch,
/root/reference/lib/NonlinearSolveBase/src/solve.jl:336-353)."""

from __future__ import annotations

from typing import Any

def run_algorithm(alg, ctx, term_cfg, jac_spec, u0_flat, abstol, reltol,
                  maxiters):
    """Run ``alg`` to completion on the flat problem; returns the final engine
    carry (fields: u, fu, retcode, stats).  ``jac_spec`` is a
    core.jacobian.JacobianSpec (or None)."""
    from .first_order import GeneralizedFirstOrderAlgorithm, run_first_order
    from .quasi_newton import QuasiNewtonAlgorithm, run_quasi_newton
    from .spectral import GeneralizedDFSane, run_dfsane

    analytic_jac = jac_spec.analytic if jac_spec is not None else None
    if isinstance(alg, GeneralizedFirstOrderAlgorithm):
        return run_first_order(alg, ctx, term_cfg, jac_spec, u0_flat, abstol,
                               reltol, maxiters)
    if isinstance(alg, QuasiNewtonAlgorithm):
        return run_quasi_newton(alg, ctx, term_cfg, analytic_jac, u0_flat,
                                abstol, reltol, maxiters)
    if isinstance(alg, GeneralizedDFSane):
        return run_dfsane(alg, ctx, term_cfg, u0_flat, abstol, reltol,
                          maxiters)
    from .anderson import AndersonAcceleration, run_anderson
    if isinstance(alg, AndersonAcceleration):
        return run_anderson(alg, ctx, term_cfg, u0_flat, abstol, reltol,
                            maxiters)
    from .polyalg import NonlinearSolvePolyAlgorithm, run_polyalg
    if isinstance(alg, NonlinearSolvePolyAlgorithm):
        return run_polyalg(alg, ctx, term_cfg, jac_spec, u0_flat, abstol,
                           reltol, maxiters)
    from .steady_state import DynamicSS, run_dynamic_ss
    if isinstance(alg, DynamicSS):
        return run_dynamic_ss(alg, ctx, term_cfg, u0_flat, abstol, reltol,
                              maxiters)
    from .simple import is_simple_alg, run_simple
    if is_simple_alg(alg):
        return run_simple(alg, ctx, term_cfg, analytic_jac, u0_flat, abstol,
                          reltol, maxiters)
    # Extension hook: any (hashable) object exposing ``run_flat`` is a
    # user-defined algorithm (the AbstractNonlinearSolveAlgorithm
    # extension point).  It must return a carry pytree with at least
    # u / fu / retcode / stats / nsteps / term fields — reuse
    # solvers.custom.make_custom_carry for the boilerplate.
    if hasattr(alg, "run_flat"):
        return alg.run_flat(ctx, term_cfg, u0_flat, abstol, reltol,
                            maxiters)
    raise ValueError(f"cannot dispatch algorithm {alg!r}")
