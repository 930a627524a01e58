"""Polynomial all-roots homotopy tests (NonlinearSolveHomotopyContinuation
analogue)."""

import jax.numpy as jnp
import numpy as np

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.solvers.poly_homotopy import (PolynomialHomotopy,
                                                      solve_polynomial)


def test_cubic_all_complex_roots():
    prob = nls.NonlinearProblem(lambda x, p: jnp.array([x[0] ** 3 - 1.0]),
                                jnp.array([1.0]))
    sol = solve_polynomial(prob, PolynomialHomotopy(degrees=(3,)))
    roots = np.sort_complex(np.asarray(sol.u).ravel())
    expected = np.sort_complex(np.exp(2j * np.pi * np.arange(3) / 3))
    np.testing.assert_allclose(roots, expected, atol=1e-8)


def test_2x2_system_all_real_roots():
    def f(x, p):
        return jnp.array([x[0] ** 2 + x[1] ** 2 - 5.0, x[0] * x[1] - 2.0])

    prob = nls.NonlinearProblem(f, jnp.array([1.0, 1.0]))
    sol = solve_polynomial(prob, PolynomialHomotopy(degrees=(2, 2)),
                           real_only=True)
    roots = sorted(tuple(np.round(r, 6)) for r in np.asarray(sol.u))
    assert roots == [(-2.0, -1.0), (-1.0, -2.0), (1.0, 2.0), (2.0, 1.0)]


def test_nearest_root_selection():
    def f(x, p):
        return jnp.array([x[0] ** 2 + x[1] ** 2 - 5.0, x[0] * x[1] - 2.0])

    prob = nls.NonlinearProblem(f, jnp.array([0.9, 2.2]))
    sol = solve_polynomial(prob, PolynomialHomotopy(degrees=(2, 2)),
                           all_roots=False, real_only=True)
    np.testing.assert_allclose(np.asarray(sol.u), [1.0, 2.0], atol=1e-8)


def test_wilkinson6_multi_gamma_recovers_all():
    """Clustered-root stress case: path jumping under one γ is recovered by
    the multi-γ union."""
    prob = nls.NonlinearProblem(
        lambda x, p: jnp.array([(x[0] - 1) * (x[0] - 2) * (x[0] - 3)
                                * (x[0] - 4) * (x[0] - 5) * (x[0] - 6)]),
        jnp.array([0.0]))
    sol = solve_polynomial(prob, PolynomialHomotopy(degrees=(6,),
                                                    dt_initial=0.01),
                           real_only=True)
    np.testing.assert_allclose(np.sort(np.asarray(sol.u).ravel()),
                               [1, 2, 3, 4, 5, 6], atol=1e-6)


def test_parametrized_polynomial():
    prob = nls.NonlinearProblem(lambda x, p: jnp.array([x[0] ** 2 - p]),
                                jnp.array([1.0]), 9.0)
    sol = solve_polynomial(prob, PolynomialHomotopy(degrees=(2,)),
                           real_only=True)
    np.testing.assert_allclose(np.sort(np.asarray(sol.u).ravel()),
                               [-3.0, 3.0], atol=1e-8)
