"""Steady-state solvers (solvers/steady_state.py): DynamicSS + SSRootfind.

Reference surface: /root/reference/docs/src/solvers/steady_state_solvers.md
(SSRootfind conversion wrapper; DynamicSS = ODE integration with the
TerminateSteadyState derivative test, converging only to STABLE equilibria).
"""

import jax
import jax.numpy as jnp
import pytest

import nonlinearsolve_tpu as nls


def logistic(u, p):
    # du/dt = u(p-u): stable equilibrium at p, unstable at 0.
    return u * (p - u)


@pytest.mark.parametrize("method", ["tsit5", "rosenbrock23"])
def test_dynamic_ss_finds_stable_equilibrium(method):
    prob = nls.SteadyStateProblem(logistic, jnp.array([0.1, 0.5]), 1.0)
    sol = nls.solve(prob, nls.DynamicSS(method=method))
    assert int(sol.retcode) == int(nls.ReturnCode.Success)
    assert float(jnp.max(jnp.abs(sol.u - 1.0))) < 1e-5
    # |du/dt| at the returned point satisfies the termination test
    assert float(jnp.max(jnp.abs(sol.resid))) <= 1e-6 * float(
        jnp.max(jnp.abs(sol.u)))


def test_dynamic_ss_avoids_unstable_equilibrium_rootfind_can_hit():
    # From u0 = 0.004 a rootfinder jumps to the nearby unstable root 0;
    # the flow contracts to the stable equilibrium 1 instead.
    prob = nls.SteadyStateProblem(logistic, jnp.array([0.004]), 1.0)
    rf = nls.solve(prob, nls.SSRootfind(nls.NewtonRaphson()))
    assert float(jnp.abs(rf.u[0])) < 1e-8          # unstable root 0
    dyn = nls.solve(prob, nls.DynamicSS())
    assert int(dyn.retcode) == int(nls.ReturnCode.Success)
    assert float(jnp.abs(dyn.u[0] - 1.0)) < 1e-5   # stable root 1


def test_ssrootfind_unwraps_to_default_polyalg():
    prob = nls.SteadyStateProblem(logistic, jnp.array([0.7, 0.7]), 1.0)
    sol = nls.solve(prob, nls.SSRootfind())
    assert int(sol.retcode) == int(nls.ReturnCode.Success)


def test_dynamic_ss_rosenbrock_handles_stiffness_cheaply():
    A = jnp.array([[-1000.0, 0.0], [1.0, -0.5]])
    b = jnp.array([3.0, 1.0])
    prob = nls.SteadyStateProblem(lambda u, p: A @ u + b, jnp.zeros(2), None)
    sol = nls.solve(prob, nls.DynamicSS(method="rosenbrock23"))
    assert int(sol.retcode) == int(nls.ReturnCode.Success)
    assert jnp.allclose(sol.u, jnp.linalg.solve(A, -b), atol=1e-5)
    # L-stable method: stiffness ratio 2000 must not force small steps.
    assert int(sol.stats.nsteps) < 100


def test_dynamic_ss_explicit_stability_cap_terminates():
    # Without the h·|λ| cap, error-controlled Tsit5 hovers at the stability
    # boundary near the equilibrium and never meets the derivative test.
    prob = nls.SteadyStateProblem(logistic, jnp.array([0.1]), 1.0)
    sol = nls.solve(prob, nls.DynamicSS(method="tsit5"), maxiters=500)
    assert int(sol.retcode) == int(nls.ReturnCode.Success)
    assert int(sol.stats.nsteps) < 100


def test_dynamic_ss_oscillatory_focus():
    # Brusselator ODE with a < 1 + a² damping: stable focus (complex pair).
    a, b = 1.0, 1.5

    def f(u, p):
        return jnp.array([a - (b + 1.0) * u[0] + u[0] ** 2 * u[1],
                          b * u[0] - u[0] ** 2 * u[1]])

    prob = nls.SteadyStateProblem(f, jnp.array([1.5, 2.0]), None)
    sol = nls.solve(prob, nls.DynamicSS())
    assert int(sol.retcode) == int(nls.ReturnCode.Success)
    assert jnp.allclose(sol.u, jnp.array([a, b / a]), atol=1e-4)


def test_dynamic_ss_tspan_exhaustion_is_maxtime():
    prob = nls.SteadyStateProblem(lambda u, p: -0.01 * u, jnp.array([1.0]),
                                  None)
    sol = nls.solve(prob, nls.DynamicSS(tspan=10.0))
    assert int(sol.retcode) == int(nls.ReturnCode.MaxTime)
    # The integration itself must still be accurate: u(10) = e^{-0.1}.
    assert abs(float(sol.u[0]) - float(jnp.exp(-0.1))) < 1e-4


def test_dynamic_ss_divergent_flow_is_unstable():
    prob = nls.SteadyStateProblem(logistic, jnp.array([-0.01]), 1.0)
    sol = nls.solve(prob, nls.DynamicSS(tspan=50.0))
    assert int(sol.retcode) in (int(nls.ReturnCode.Unstable),
                                int(nls.ReturnCode.MaxTime))
    assert int(sol.retcode) != int(nls.ReturnCode.Success)


def test_dynamic_ss_vmap_and_jit():
    @jax.jit
    def solve_one(p):
        prob = nls.SteadyStateProblem(logistic, jnp.array([0.2]), p)
        return nls.solve(prob, nls.DynamicSS()).u[0]

    ps = jnp.array([1.0, 2.0, 3.0])
    assert jnp.allclose(jax.vmap(solve_one)(ps), ps, atol=1e-4)


def test_dynamic_ss_on_plain_nonlinear_problem():
    # DynamicSS composes as a regular algorithm on NonlinearProblem too.
    prob = nls.NonlinearProblem(logistic, jnp.array([0.3]), 1.0)
    sol = nls.solve(prob, nls.DynamicSS())
    assert int(sol.retcode) == int(nls.ReturnCode.Success)
    assert float(jnp.abs(sol.u[0] - 1.0)) < 1e-5
