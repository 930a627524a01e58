"""Bracketing tier tests — mirror of the reference's
BracketingNonlinearSolve test coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.solvers import bracketing as brk

ALGS = [brk.Bisection(), brk.Falsi(), brk.Ridder(), brk.Brent(), brk.ITP(),
        brk.Alefeld(), brk.Muller(), brk.ModAB()]


@pytest.mark.parametrize("alg", ALGS, ids=lambda a: a.name)
def test_sqrt2(alg):
    prob = nls.IntervalNonlinearProblem(lambda u, p: u * u - p, (1.0, 2.0),
                                        2.0)
    sol = nls.solve(prob, alg)
    assert bool(sol.success), int(sol.retcode)
    np.testing.assert_allclose(float(sol.u), np.sqrt(2.0), atol=1e-8)


@pytest.mark.parametrize("alg", ALGS, ids=lambda a: a.name)
def test_cosine(alg):
    prob = nls.IntervalNonlinearProblem(lambda u, p: jnp.cos(u), (1.0, 2.0))
    sol = nls.solve(prob, alg)
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u), np.pi / 2, atol=1e-8)


def test_default_is_modab():
    prob = nls.IntervalNonlinearProblem(lambda u, p: u ** 3 - 2.0, (0.0, 2.0))
    sol = nls.solve(prob)
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u), 2 ** (1 / 3), atol=1e-8)


def test_exact_endpoints():
    prob = nls.IntervalNonlinearProblem(lambda u, p: u, (0.0, 2.0))
    sol = nls.solve(prob, brk.Bisection())
    assert int(sol.retcode) == int(nls.ReturnCode.ExactSolutionLeft)
    assert float(sol.u) == 0.0


def test_non_enclosing_interval():
    prob = nls.IntervalNonlinearProblem(lambda u, p: u * u + 1.0, (0.0, 1.0))
    sol = nls.solve(prob, brk.Bisection())
    assert int(sol.retcode) == int(nls.ReturnCode.InitialFailure)
    assert not bool(sol.success)


@pytest.mark.parametrize("alg", ALGS, ids=lambda a: a.name)
def test_flipped_interval(alg):
    if isinstance(alg, brk.Muller):
        pytest.skip("Muller keeps the user ordering")
    prob = nls.IntervalNonlinearProblem(lambda u, p: u * u - p, (2.0, 1.0),
                                        2.0)
    sol = nls.solve(prob, alg)
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u), np.sqrt(2.0), atol=1e-8)


def test_vmap_bracketing():
    from nonlinearsolve_tpu.solvers.bracketing import _jitted_bracket

    def solve_one(p):
        prob = nls.IntervalNonlinearProblem(lambda u, q: u * u - q,
                                            (0.0, 10.0), p)
        return nls.solve(prob, brk.ITP()).u

    roots = jax.vmap(solve_one)(jnp.array([1.0, 4.0, 9.0, 16.0]))
    np.testing.assert_allclose(np.asarray(roots), [1.0, 2.0, 3.0, 4.0],
                               atol=1e-8)


def test_gradients_through_bracketing():
    """Scalar IFT custom-jvp: grad/jacfwd/hessian through bracketing
    solves (the reference's ForwardDiff bracketing extension role)."""
    import jax

    def root_of(p, alg=None):
        prob = nls.IntervalNonlinearProblem(lambda u, q: u ** 2 - q,
                                            (0.1, 5.0), p)
        return nls.solve(prob, alg).u

    expected = 1 / (2 * np.sqrt(2))
    for alg in [nls.ITP(), nls.Bisection(), nls.Brent(), None]:
        g = jax.grad(lambda p: root_of(p, alg))(2.0)
        np.testing.assert_allclose(float(g), expected, rtol=1e-8)
    h = jax.grad(jax.grad(root_of))(2.0)
    np.testing.assert_allclose(float(h), -1 / (4 * 2 ** 1.5), rtol=1e-8)
