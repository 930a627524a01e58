"""Uniform "run one algorithm" dispatch shared by the top-level solve and the
polyalgorithm engine (the analogue of the reference's ``__solve`` dispatch,
/root/reference/lib/NonlinearSolveBase/src/solve.jl:336-353)."""

from __future__ import annotations

from typing import Any

from ..core.autodiff import construct_dense_jacobian_fn


def run_algorithm(alg, ctx, term_cfg, analytic_jac, u0_flat, abstol, reltol,
                  maxiters):
    """Run ``alg`` to completion on the flat problem; returns the final engine
    carry (fields: u, fu, retcode, stats)."""
    from .first_order import GeneralizedFirstOrderAlgorithm, run_first_order
    from .quasi_newton import QuasiNewtonAlgorithm, run_quasi_newton
    from .spectral import GeneralizedDFSane, run_dfsane

    if isinstance(alg, GeneralizedFirstOrderAlgorithm):
        jac_fn = construct_dense_jacobian_fn(ctx.f_flat, alg.jacobian,
                                             ctx.n_in, ctx.n_out, analytic_jac)
        return run_first_order(alg, ctx, term_cfg, jac_fn, u0_flat, abstol,
                               reltol, maxiters)
    if isinstance(alg, QuasiNewtonAlgorithm):
        return run_quasi_newton(alg, ctx, term_cfg, analytic_jac, u0_flat,
                                abstol, reltol, maxiters)
    if isinstance(alg, GeneralizedDFSane):
        return run_dfsane(alg, ctx, term_cfg, u0_flat, abstol, reltol,
                          maxiters)
    from .polyalg import NonlinearSolvePolyAlgorithm, run_polyalg
    if isinstance(alg, NonlinearSolvePolyAlgorithm):
        return run_polyalg(alg, ctx, term_cfg, analytic_jac, u0_flat, abstol,
                           reltol, maxiters)
    raise ValueError(f"cannot dispatch algorithm {alg!r}")
