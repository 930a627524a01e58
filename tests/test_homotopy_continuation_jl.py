"""HomotopyContinuationJL / TaylorHomotopyContinuationJL conformance — the
native replacement for the reference's HomotopyContinuation.jl bridge
(/root/reference/lib/NonlinearSolveHomotopyContinuation/src/solve.jl,
taylor_polynomialize.jl).  Mirrors its test themes: all-roots vs nearest
single-root modes, denominator filtering for rational systems,
unpolynomialize branch expansion, and Taylor-surrogate + polish on smooth
residuals."""

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.solvers.homotopy_continuation import (
    measure_polynomial_degrees)


def test_all_roots_quadratic():
    prob = nls.NonlinearProblem(lambda u, p: u ** 2 - 5 * u + 6,
                                jnp.array([0.0]))
    sol = nls.solve(prob, nls.HomotopyContinuationJL(all_roots=True))
    roots = np.sort(np.asarray(sol.u).ravel())
    assert bool(sol.success)
    np.testing.assert_allclose(roots, [2.0, 3.0], atol=1e-8)


def test_nearest_root_mode():
    prob = nls.NonlinearProblem(lambda u, p: u ** 2 - 5 * u + 6,
                                jnp.array([0.0]))
    sol = nls.solve(prob, nls.HomotopyContinuationJL())
    np.testing.assert_allclose(np.asarray(sol.u), [2.0], atol=1e-8)
    prob5 = nls.NonlinearProblem(lambda u, p: u ** 2 - 5 * u + 6,
                                 jnp.array([5.0]))
    sol5 = nls.solve(prob5, nls.HomotopyContinuationJL())
    np.testing.assert_allclose(np.asarray(sol5.u), [3.0], atol=1e-8)


def test_degree_measurement():
    f = lambda x: np.array([x[0] ** 3 - x[1], x[0] * x[1] - 1.0])
    assert measure_polynomial_degrees(f, 2) == (3, 2)
    with pytest.raises(ValueError, match="not polynomial"):
        measure_polynomial_degrees(lambda x: np.array([np.sin(x[0])]), 1)


def test_explicit_degrees_and_system():
    # x^2 + y^2 = 5, x*y = 2 → (±1, ±2), (±2, ±1)
    def f(u, p):
        return jnp.array([u[0] ** 2 + u[1] ** 2 - 5.0, u[0] * u[1] - 2.0])

    prob = nls.NonlinearProblem(f, jnp.array([1.0, 1.0]))
    sol = nls.solve(prob, nls.HomotopyContinuationJL(all_roots=True,
                                                     degrees=(2, 2)))
    roots = np.asarray(sol.u)
    assert roots.shape == (4, 2)
    expected = {(1, 2), (2, 1), (-1, -2), (-2, -1)}
    found = {tuple(np.round(r).astype(int)) for r in roots}
    assert found == expected
    np.testing.assert_allclose(np.asarray(sol.resid), 0.0, atol=1e-7)


def test_denominator_filters_spurious_roots():
    # rational residual (u-3)(u-1)/(u-3): numerator root 3 is spurious
    hf = nls.HomotopyNonlinearFunction(
        f=lambda u, p: u ** 2 - 4 * u + 3.0,
        denominator=lambda u, p: u - 3.0)
    prob = nls.NonlinearProblem(hf, jnp.array([0.0]))
    sol = nls.solve(prob, nls.HomotopyContinuationJL(all_roots=True))
    roots = np.asarray(sol.u).ravel()
    np.testing.assert_allclose(roots, [1.0], atol=1e-8)


def test_all_roots_filtered_out_is_infeasible():
    hf = nls.HomotopyNonlinearFunction(
        f=lambda u, p: u ** 2 - 7 * u + 10.0,        # roots 2 and 5...
        denominator=lambda u, p: (u - 2.0) * (u - 5.0))   # ...both spurious
    prob = nls.NonlinearProblem(hf, jnp.array([0.0]))
    sol = nls.solve(prob, nls.HomotopyContinuationJL(all_roots=True))
    assert int(sol.retcode) == int(nls.ReturnCode.Infeasible)


def test_unpolynomialize_branches():
    # solve in v = u²: v - 4 = 0; preimages u = ±√v  → roots ±2
    hf = nls.HomotopyNonlinearFunction(
        f=lambda v, p: v - 4.0,
        polynomialize=lambda u, p: u ** 2,
        unpolynomialize=lambda v, p: [jnp.sqrt(v), -jnp.sqrt(v)])
    prob = nls.NonlinearProblem(hf, jnp.array([1.0]))
    sol = nls.solve(prob, nls.HomotopyContinuationJL(all_roots=True))
    roots = np.sort(np.asarray(sol.u).ravel())
    np.testing.assert_allclose(roots, [-2.0, 2.0], atol=1e-8)
    # nearest mode picks the branch near u0
    near = nls.solve(prob, nls.HomotopyContinuationJL())
    np.testing.assert_allclose(np.asarray(near.u), [2.0], atol=1e-8)


def test_taylor_variant_smooth_residual():
    prob = nls.NonlinearProblem(lambda u, p: jnp.sin(u) - 0.5,
                                jnp.array([0.3]))
    sol = nls.solve(prob, nls.TaylorHomotopyContinuationJL(degree=3,
                                                           all_roots=True))
    roots = np.sort(np.asarray(sol.u).ravel())
    # polished against the TRUE residual: each root satisfies sin(u) = 1/2
    assert bool(sol.success)
    np.testing.assert_allclose(np.sin(roots), 0.5, atol=1e-10)
    assert np.any(np.abs(roots - np.pi / 6) < 1e-8)


def test_taylor_nearest_mode():
    prob = nls.NonlinearProblem(lambda u, p: jnp.sin(u) - 0.5,
                                jnp.array([0.3]))
    sol = nls.solve(prob, nls.TaylorHomotopyContinuationJL(degree=3))
    np.testing.assert_allclose(np.asarray(sol.u), [np.pi / 6], atol=1e-8)
