"""Core rootfinding tests — the analogue of the reference's
test/Core quickstart + termination-condition sweeps
(common/common_rootfind_testing.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls

ALGS = [
    nls.NewtonRaphson(),
    nls.TrustRegion(),
    nls.TrustRegion(radius_update_scheme="nlsolve"),
    nls.TrustRegion(radius_update_scheme="nocedalwright"),
    nls.TrustRegion(radius_update_scheme="hei"),
    nls.TrustRegion(radius_update_scheme="yuan"),
    nls.TrustRegion(radius_update_scheme="fan"),
    nls.TrustRegion(radius_update_scheme="bastin"),
    nls.LevenbergMarquardt(),
    nls.LevenbergMarquardt(disable_geodesic=True),
    nls.PseudoTransient(),
    nls.Broyden(),
    nls.Broyden(init_jacobian="true_jacobian"),
    nls.Broyden(update_rule="bad_broyden"),
    nls.Klement(),
    nls.DFSane(),
    nls.NewtonRaphson(linesearch=nls.BackTracking()),
]


def quadratic(u, p):
    return u * u - p


@pytest.mark.parametrize("alg", ALGS, ids=lambda a: getattr(a, "name", str(a)))
def test_quickstart_quadratic(alg):
    """README quickstart: f(u,p) = u² - 2 (BASELINE config 1)."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]),
                                jnp.array(2.0))
    sol = nls.solve(prob, alg, maxiters=1000)
    assert int(sol.retcode) in (1, 7), f"retcode={int(sol.retcode)}"
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-6)


def test_default_polyalgorithm():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]),
                                jnp.array(2.0))
    sol = nls.solve(prob)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-8)


def test_scalar_problem():
    prob = nls.NonlinearProblem(lambda u, p: u * u - p, 1.0, 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson())
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u), np.sqrt(2.0), rtol=1e-10)


def test_pytree_state():
    def f(u, p):
        return {"a": u["a"] ** 2 - p, "b": u["b"] ** 3 - p}

    prob = nls.NonlinearProblem(f, {"a": jnp.array([1.0]),
                                    "b": jnp.array([1.0])}, 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson())
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u["a"][0]), 2 ** 0.5, rtol=1e-8)
    np.testing.assert_allclose(float(sol.u["b"][0]), 2 ** (1 / 3), rtol=1e-8)


TERMINATION_CONDITIONS = [
    nls.RelTerminationMode(), nls.AbsTerminationMode(),
    nls.NormTerminationMode(), nls.RelNormTerminationMode(),
    nls.AbsNormTerminationMode(), nls.RelNormSafeTerminationMode(),
    nls.AbsNormSafeTerminationMode(), nls.RelNormSafeBestTerminationMode(),
    nls.AbsNormSafeBestTerminationMode(),
]


@pytest.mark.parametrize("tc", TERMINATION_CONDITIONS,
                         ids=lambda t: t.mode)
def test_termination_conditions(tc):
    """All nine termination modes converge NewtonRaphson on the quadratic
    (common_rootfind_testing.jl:3-13)."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]),
                                jnp.array(2.0))
    sol = nls.solve(prob, nls.NewtonRaphson(), termination_condition=tc,
                    abstol=1e-9, reltol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-5)


def test_newton_fails_polyalg_rescues():
    """The reference's `newton_fails` fixture
    (common_rootfind_testing.jl): NR diverges, robust methods succeed."""

    def newton_fails(u, p):
        return (0.010000000000000002
                + 10.000000000000002 / (1 + (0.21640425613334457
                                             + 216.40425613334457 / (1 + (0.21640425613334457
                                                                          + 216.40425613334457 / (1 + 0.0006250000000000001 * u ** 2)) ** 2)) ** 2)
                - 0.0011552453009332421 * u - p)

    u0 = jnp.full((1,), -1.0)
    prob = nls.NonlinearProblem(newton_fails, u0, jnp.array(0.0))
    sol = nls.solve(prob, nls.RobustMultiNewton())
    assert bool(sol.success)
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-9


def test_nlls_gauss_newton():
    """Overdetermined least-squares (4 residuals, 2 unknowns)."""
    ts = jnp.linspace(0.0, 1.0, 8)
    target = 2.0 * jnp.exp(-1.5 * ts)

    def resid(u, p):
        return u[0] * jnp.exp(u[1] * ts) - target

    prob = nls.NonlinearLeastSquaresProblem(resid, jnp.array([1.0, -1.0]))
    for alg in [nls.GaussNewton(), nls.LevenbergMarquardt(), None]:
        sol = nls.solve(prob, alg)
        np.testing.assert_allclose(np.asarray(sol.u), [2.0, -1.5], rtol=1e-5)


def test_nlls_underdetermined():
    """Underdetermined NLLS hits the minimum-norm LM path."""

    def resid(u, p):
        return jnp.array([u[0] + u[1] + u[2] - 3.0])

    prob = nls.NonlinearLeastSquaresProblem(resid, jnp.array([0.0, 0.0, 0.0]))
    sol = nls.solve(prob, nls.LevenbergMarquardt())
    assert float(jnp.abs(sol.resid[0])) < 1e-8


def test_analytic_jacobian():
    f = nls.NonlinearFunction(
        f=lambda u, p: u * u - p,
        jac=lambda u, p: jnp.diag(2.0 * u))
    prob = nls.NonlinearProblem(f, jnp.array([1.0, 2.0]), jnp.array(2.0))
    sol = nls.solve(prob, nls.NewtonRaphson())
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-10)


def test_stats_counters():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]),
                                jnp.array(2.0))
    sol = nls.solve(prob, nls.NewtonRaphson())
    assert int(sol.stats.nsteps) > 0
    assert int(sol.stats.njacs) == int(sol.stats.nsteps)
    assert int(sol.stats.nf) >= int(sol.stats.nsteps)


def test_maxiters_retcode():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]),
                                jnp.array(2.0))
    sol = nls.solve(prob, nls.NewtonRaphson(), maxiters=1)
    assert int(sol.retcode) == int(nls.ReturnCode.MaxIters)


def test_vmap_over_solves():
    """Whole-solve batching (EnsembleProblem analogue, SURVEY §2.10)."""
    import jax

    def solve_one(p):
        prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), p)
        return nls.solve(prob, nls.NewtonRaphson()).u

    ps = jnp.array([1.0, 2.0, 3.0, 4.0])
    roots = jax.vmap(solve_one)(ps)
    expected = np.broadcast_to(np.sqrt(np.asarray(ps))[:, None], (4, 2))
    np.testing.assert_allclose(np.asarray(roots), expected, rtol=1e-8)


def test_float32():
    import jax
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0], jnp.float32),
                                jnp.float32(2.0))
    sol = nls.solve(prob, nls.NewtonRaphson())
    assert sol.u.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-5)


def test_limited_memory_broyden():
    """Full-tier L-Broyden (low-rank -aI + U^T V inverse with reset
    ladder).  Like the reference's, it is only expected on well-behaved
    problems (its 23-problem broken list is extensive)."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]),
                                jnp.array(2.0))
    sol = nls.solve(prob, nls.LimitedMemoryBroyden())
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-6)
    # n > threshold exercises the genuine ring-buffer low-rank path
    def mildly_nonlinear(u, p):
        return u + 0.1 * jnp.tanh(u) - p
    prob = nls.NonlinearProblem(mildly_nonlinear, jnp.zeros(40),
                                0.5 * jnp.ones(40))
    sol = nls.solve(prob, nls.LimitedMemoryBroyden(threshold=10))
    assert bool(sol.success)
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-9


def test_complex_eltype():
    """Complex state support (reference poly_algs.jl Complex branches):
    holomorphic jacobians, real termination scalars, reduced complex
    polyalgorithm ladder (Broyden -> Klement -> NR)."""
    prob = nls.NonlinearProblem(lambda u, p: u ** 3 - p,
                                jnp.array([-0.8 + 1.5j], jnp.complex128),
                                8.0 + 0j)
    expected = 2 * np.exp(2j * np.pi / 3)
    for alg in [nls.NewtonRaphson(), nls.Broyden(), nls.Klement(), None]:
        sol = nls.solve(prob, alg)
        assert bool(sol.success)
        np.testing.assert_allclose(complex(sol.u[0]), expected, rtol=1e-8)


def test_anderson_acceleration():
    """TPU-native Anderson (Walker-Ni type II) — the role the reference's
    FixedPointAcceleration/SpeedMapping wrappers play."""
    import nonlinearsolve_tpu as nls
    # Root finding through the damped fixed-point map
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.AndersonAcceleration(beta=-0.5))
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-8)

    # Genuine fixed point u = cos(u): Anderson should beat plain Picard
    # (Picard needs ~52 iterations at 1e-9)
    prob2 = nls.NonlinearProblem(lambda u, p: jnp.cos(u) - u,
                                 jnp.array([0.0]), None)
    sol2 = nls.solve(prob2, nls.AndersonAcceleration())
    assert bool(sol2.success)
    np.testing.assert_allclose(float(sol2.u[0]), 0.7390851332151607,
                               rtol=1e-8)
    assert int(sol2.stats.nsteps) < 40

    # 100-d near-singular smoothing map (rho ~ 0.96): converges to the
    # conditioning-limited accuracy
    n = 100
    A = jnp.asarray(np.eye(n) * 0.4 + np.diag(np.ones(n - 1) * 0.28, 1)
                    + np.diag(np.ones(n - 1) * 0.28, -1))
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    prob3 = nls.NonlinearProblem(
        lambda u, p: A @ u + 0.05 * jnp.tanh(u) + p - u, jnp.zeros(n), b)
    sol3 = nls.solve(prob3, nls.AndersonAcceleration(m=8), abstol=1e-8,
                     maxiters=500)
    # Near-singular (rho ~ 0.96): safe-mode stall detection may classify
    # the tail plateau as Stalled; the best iterate must still be accurate.
    assert int(sol3.retcode) in (int(nls.ReturnCode.Success),
                                 int(nls.ReturnCode.Stalled))
    assert float(jnp.max(jnp.abs(sol3.resid))) < 1e-7


def test_nlls_analytic_jacobian():
    """NLLS with a user-supplied analytic Jacobian (reference
    nlls_tests.jl analytic-jac case)."""
    ts = jnp.linspace(0.0, 1.0, 8)
    target = 2.0 * jnp.exp(-1.5 * ts)

    def resid(u, p):
        return u[0] * jnp.exp(u[1] * ts) - target

    def jac(u, p):
        e = jnp.exp(u[1] * ts)
        return jnp.stack([e, u[0] * ts * e], axis=1)

    f = nls.NonlinearFunction(f=resid, jac=jac)
    prob = nls.NonlinearLeastSquaresProblem(f, jnp.array([1.0, -1.0]))
    for alg in [nls.GaussNewton(), nls.LevenbergMarquardt()]:
        sol = nls.solve(prob, alg)
        np.testing.assert_allclose(np.asarray(sol.u), [2.0, -1.5], rtol=1e-5)


def test_singular_jacobian_lstsq_fallback():
    """A Jacobian that is exactly singular at an iterate must not produce
    NaNs: the dense solve falls back to least-squares (the reference's
    QR-pivoted auto-switch, linear_solve.jl)."""
    # J(u0) singular at u0 = [1, 1]: rows become linearly dependent
    def f(u, p):
        return jnp.array([u[0] * u[1] - 1.0, u[0] * u[1] - 1.0 + (u[0] - u[1]) ** 2])

    prob = nls.NonlinearProblem(f, jnp.array([2.0, 0.5]), None)
    sol = nls.solve(prob, nls.NewtonRaphson(), maxiters=200)
    # root manifold: u0*u1 = 1 with u0 == u1 -> [1, 1] or [-1, -1]
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-8
    assert bool(jnp.all(jnp.isfinite(sol.u)))


def test_bounds_nlls():
    """Bounds transform composes with least-squares (reference bounds
    tests include the NLLS case)."""
    ts = jnp.linspace(0.0, 1.0, 8)
    target = 2.0 * jnp.exp(-1.5 * ts)

    def resid(u, p):
        return u[0] * jnp.exp(u[1] * ts) - target

    prob = nls.NonlinearLeastSquaresProblem(
        resid, jnp.array([1.0, -1.0]),
        lb=jnp.array([0.5, -3.0]), ub=jnp.array([5.0, -0.5]))
    sol = nls.solve(prob, nls.LevenbergMarquardt())
    np.testing.assert_allclose(np.asarray(sol.u), [2.0, -1.5], rtol=1e-4)
    assert bool(jnp.all(sol.u >= jnp.array([0.5, -3.0])))
    assert bool(jnp.all(sol.u <= jnp.array([5.0, -0.5])))


def test_complex_nlls():
    """Complex-valued least squares through the vjp stationarity system
    (conjugate-aware J^H F)."""
    ts = jnp.linspace(0.0, 1.0, 8)
    target = (2.0 + 1.0j) * jnp.exp(1j * 2 * jnp.pi * ts)

    def resid(u, p):
        return u[0] * jnp.exp(1j * 2 * jnp.pi * ts) - p

    prob = nls.NonlinearLeastSquaresProblem(
        resid, jnp.array([0.5 + 0.1j], jnp.complex128), target)
    sol = nls.solve(prob, nls.GaussNewton())
    assert bool(sol.success)
    np.testing.assert_allclose(complex(sol.u[0]), 2.0 + 1.0j, rtol=1e-8)


@pytest.mark.parametrize("seed", [0, 1, 3])
def test_broyden_linesearch_secant_uses_actual_step(seed):
    """Regression: globalized Broyden must feed the α-scaled step (the step
    actually taken) to the secant update.  The reference passes the raw
    direction δu while dfu comes from the α-step (QN solve.jl:475-478 with
    :409) — on backtracked steps that inflates J⁻¹ by 1/α each iteration
    until ‖δu‖ → ∞ and the reset ladder exhausts (ConvergenceFailure on a
    4×4 LINEAR system).  With the exact secant pair the solve converges on
    every seed; mirrors the residual assertion of the reference's GPU test
    (test/gpu/cuda_tests__item1.jl:52-59)."""
    rng = np.random.RandomState(seed)
    A = jnp.asarray(rng.rand(4, 4), jnp.float32)
    u0 = jnp.asarray(rng.rand(4), jnp.float32)
    b = jnp.asarray(rng.rand(4), jnp.float32)
    prob = nls.NonlinearProblem(lambda u, p: A @ u + b, u0)
    sol = nls.solve(prob, nls.Broyden(linesearch=nls.LiFukushimaLineSearch()),
                    abstol=1e-5, reltol=1e-5)
    assert float(jnp.linalg.norm(A @ sol.u + b)) < 1e-4


def test_simple_tier_linesearch_paths():
    """SimpleBroyden/SimpleLimitedMemoryBroyden with the Li-Fukushima line
    search enabled (reference: SimpleNonlinearSolve broyden.jl / lbroyden.jl
    linesearch=Val(true) variants).  Previously uncovered — the call sites
    dropped the line search's ``nsteps`` argument (TypeError) and fed the
    raw direction to the secant update; both fixed."""
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.rand(4, 4), jnp.float32)
    u0 = jnp.asarray(rng.rand(4), jnp.float32)
    b = jnp.asarray(rng.rand(4), jnp.float32)
    prob = nls.NonlinearProblem(lambda u, p: A @ u + b, u0)
    for alg in (nls.SimpleBroyden(linesearch=True),
                nls.SimpleLimitedMemoryBroyden(linesearch=True)):
        sol = nls.solve(prob, alg, abstol=1e-5, reltol=1e-5, maxiters=1000)
        assert float(jnp.linalg.norm(A @ sol.u + b)) < 1e-4
