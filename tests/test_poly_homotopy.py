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


class TestMultistart:
    """Taylor polynomialization + multistart (solvers/multistart.py)."""

    def test_scalar_sin(self):
        prob = nls.NonlinearProblem(lambda u, p: jnp.sin(u),
                                    jnp.array([1.0]), None)
        roots = np.sort(np.asarray(nls.solve_multistart(prob,
                                                        order=3)).ravel())
        np.testing.assert_allclose(roots, [0.0, np.pi], atol=1e-9)

    def test_polynomial_system_all_roots(self):
        def f2(u, p):
            return jnp.array([u[0] ** 2 + u[1] ** 2 - 4.0,
                              u[0] * u[1] - 1.0])
        prob = nls.NonlinearProblem(f2, jnp.array([1.0, 1.0]), None)
        roots = np.asarray(nls.solve_multistart(prob, order=2))
        assert roots.shape[0] == 4
        for r in roots:
            assert abs(r[0] ** 2 + r[1] ** 2 - 4) < 1e-8
            assert abs(r[0] * r[1] - 1) < 1e-8

    def test_transcendental_equilibria(self):
        def f3(u, p):
            return jnp.array([u[0] - u[0] ** 3 - 0.2 * u[1],
                              u[1] - jnp.tanh(u[0])])
        prob = nls.NonlinearProblem(f3, jnp.array([0.5, 0.5]), None)
        roots = np.asarray(nls.solve_multistart(prob, order=3))
        assert roots.shape[0] == 3   # +/- branch and the origin
        for r in roots:
            assert np.abs(np.asarray(f3(jnp.asarray(r), None))).max() < 1e-8

    def test_polynomialize_exactness(self):
        """A degree-2 residual is reproduced exactly by its order-2 model."""
        def f(u, p):
            return jnp.array([u[0] ** 2 - u[1], u[0] + u[1] ** 2 - 3.0])
        poly_f, degrees = nls.polynomialize(f, jnp.array([0.3, -0.7]), None,
                                            order=2)
        assert degrees == (2, 2)
        for pt in [[1.0, 2.0], [-3.0, 0.5]]:
            np.testing.assert_allclose(
                np.asarray(poly_f(jnp.asarray(pt))),
                np.asarray(f(jnp.asarray(pt), None)), atol=1e-10)
