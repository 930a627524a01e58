"""IFT sensitivities (forward/reverse, the reference's ForwardDiff ext +
ChainRules adjoint analogue) + bounds transform + pre/postconditioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.core.conditioning import PostconditionSpecifier


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """grad/hessian-of-solve tests compile whole engines repeatedly; under
    pytest-xdist the accumulated XLA CPU executables can segfault the
    worker (same failure mode as the 23-problem sweep — see
    tests/test_23_problems.py).  Drop them between tests."""
    yield
    jax.clear_caches()


def sqrt_root(alg=None):
    def g(p):
        prob = nls.NonlinearProblem(lambda u, q: u * u - q, jnp.array([1.0]),
                                    p)
        return nls.solve(prob, alg or nls.NewtonRaphson()).u[0]
    return g


def test_forward_sensitivity():
    g = sqrt_root()
    np.testing.assert_allclose(float(jax.jacfwd(g)(2.0)),
                               1 / (2 * np.sqrt(2.0)), rtol=1e-10)


def test_reverse_sensitivity():
    g = sqrt_root()
    np.testing.assert_allclose(float(jax.grad(g)(2.0)),
                               1 / (2 * np.sqrt(2.0)), rtol=1e-10)


@pytest.mark.parametrize("alg", [nls.TrustRegion(), nls.Broyden(),
                                 nls.DFSane(), None],
                         ids=["TR", "Broyden", "DFSane", "polyalg"])
def test_sensitivity_algorithm_independent(alg):
    """The IFT rule only needs the root, so gradients agree across solvers."""
    g = sqrt_root(alg)
    np.testing.assert_allclose(float(jax.grad(g)(2.0)),
                               1 / (2 * np.sqrt(2.0)), rtol=1e-7)


def test_pytree_parameter_gradient():
    def g(p):
        prob = nls.NonlinearProblem(
            lambda u, q: u ** 3 - q["a"] * u - q["b"], jnp.array([2.0]), p)
        return nls.solve(prob, nls.NewtonRaphson()).u[0]

    p = {"a": 1.0, "b": 2.0}
    got = jax.grad(g)(p)
    u = float(g(p))
    denom = 3 * u * u - p["a"]
    np.testing.assert_allclose(float(got["a"]), u / denom, rtol=1e-8)
    np.testing.assert_allclose(float(got["b"]), 1 / denom, rtol=1e-8)


def test_vmap_of_grad():
    gv = jax.vmap(jax.grad(sqrt_root()))
    got = gv(jnp.array([1.0, 4.0, 9.0]))
    np.testing.assert_allclose(np.asarray(got),
                               1 / (2 * np.sqrt([1.0, 4.0, 9.0])), rtol=1e-8)


def test_bounds_two_sided():
    prob = nls.NonlinearProblem(lambda u, p: u * u - p, jnp.array([-1.0]),
                                2.0, lb=-2.0, ub=0.0)
    sol = nls.solve(prob, nls.NewtonRaphson())
    np.testing.assert_allclose(float(sol.u[0]), -np.sqrt(2.0), rtol=1e-8)


def test_bounds_one_sided():
    prob = nls.NonlinearProblem(lambda u, p: u * u - p, jnp.array([0.5]),
                                2.0, lb=0.0)
    sol = nls.solve(prob, nls.NewtonRaphson())
    np.testing.assert_allclose(float(sol.u[0]), np.sqrt(2.0), rtol=1e-8)


@pytest.mark.parametrize("alg", [nls.Broyden(), nls.DFSane(),
                                 nls.TrustRegion()],
                         ids=["Broyden", "DFSane", "TR"])
def test_bounds_quasi_newton_and_spectral(alg):
    """one-sided/two-sided bounds across engines (reference Core bounds
    tests cover NR/QN/DFSane)."""
    prob = nls.NonlinearProblem(lambda u, p: u * u - p, jnp.array([-1.0]),
                                2.0, lb=-2.0, ub=0.0)
    sol = nls.solve(prob, alg)
    np.testing.assert_allclose(float(sol.u[0]), -np.sqrt(2.0), rtol=1e-6)


def test_gradient_through_bounded_solve():
    def gb(p):
        prob = nls.NonlinearProblem(lambda u, q: u * u - q,
                                    jnp.array([-1.0]), p, lb=-3.0, ub=0.0)
        return nls.solve(prob, nls.NewtonRaphson()).u[0]

    np.testing.assert_allclose(float(jax.grad(gb)(2.0)),
                               -1 / (2 * np.sqrt(2.0)), rtol=1e-8)


def test_precondition_left_transform():
    prob = nls.NonlinearProblem(lambda u, p: u * u - p,
                                jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(),
                    precondition=lambda fu, u, p: 2.0 * fu)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-8)
    # the reported residual is the composed (preconditioned) one
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-8


def test_postcondition_corrector():
    calls = {"applied": False}

    def H(u_prop, u_prev, p):
        return jnp.clip(u_prop, -10.0, 10.0)

    prob = nls.NonlinearProblem(lambda u, p: u * u - p,
                                jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(), postcondition=H)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-8)


def test_postcondition_specifier_with_bounds():
    prob = nls.NonlinearProblem(lambda u, p: u * u - p, jnp.array([0.5]),
                                2.0, lb=0.0, ub=10.0)
    sol = nls.solve(
        prob, nls.NewtonRaphson(),
        postcondition=PostconditionSpecifier(
            lambda up, upr, p: jnp.clip(up, 0.1, 5.0), space="original"))
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), np.sqrt(2.0), rtol=1e-8)


class TestNLLSSensitivity:
    """IFT through least-squares solves: the stationarity system
    g = J'F = 0 (exact second-order terms via vjp-of-vjp)."""

    ts = jnp.linspace(0.0, 1.0, 12)

    def _fit(self, theta, alg, noise=0.0, abstol=None):
        target = theta[0] * jnp.exp(theta[1] * self.ts) + noise
        def resid(u, p):
            return u[0] * jnp.exp(u[1] * self.ts) - p
        prob = nls.NonlinearLeastSquaresProblem(resid, jnp.array([1.0, -1.0]),
                                                target)
        kw = {} if abstol is None else {"abstol": abstol}
        return nls.solve(prob, alg, **kw).u

    def test_jacrev_exact_fit(self):
        for alg in [nls.GaussNewton(), nls.LevenbergMarquardt()]:
            g = jax.jacrev(lambda th: self._fit(th, alg))(
                jnp.array([2.0, -1.5]))
            np.testing.assert_allclose(np.asarray(g), np.eye(2), atol=1e-5)

    def test_jacfwd_nonzero_residual_matches_fd(self):
        noise = jnp.asarray(np.random.default_rng(0).standard_normal(12) * 0.1)
        f = lambda th: self._fit(th, nls.GaussNewton(), noise, abstol=1e-12)
        th = jnp.array([2.0, -1.5])
        g = jax.jacfwd(f)(th)
        eps = 1e-6
        fd = np.column_stack([
            (np.asarray(f(th + eps * jnp.eye(2)[i]))
             - np.asarray(f(th - eps * jnp.eye(2)[i]))) / (2 * eps)
            for i in range(2)])
        np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-4)


def test_gradients_through_dfsane_anderson_scc():
    """The IFT wrapper covers every algorithm dispatched through solve,
    including derivative-free engines and the SCC driver."""
    import jax
    expected = 1 / (2 * np.sqrt(2))

    for alg in [nls.DFSane(), nls.AndersonAcceleration(beta=-0.5)]:
        def root(p, alg=alg):
            prob = nls.NonlinearProblem(lambda u, q: u * u - q,
                                        jnp.array([1.0]), p)
            return nls.solve(prob, alg).u[0]
        np.testing.assert_allclose(float(jax.grad(root)(2.0)), expected,
                                   rtol=1e-6)

    def scc_root(p):
        p1 = nls.NonlinearProblem(lambda u, q: u * u - q,
                                  jnp.array([1.0]), p)
        p2 = nls.NonlinearProblem(lambda u, q: u - q, jnp.array([0.0]), None)
        prob = nls.SCCNonlinearProblem(
            (p1, p2), explicitfuns=(None, lambda pp, sols: sols[0].u[0]))
        return nls.solve(prob).u[1]
    np.testing.assert_allclose(float(jax.grad(scc_root)(2.0)), expected,
                               rtol=1e-6)
