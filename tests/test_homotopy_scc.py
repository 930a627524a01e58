"""Homotopy continuation + SCC driver tests (reference: ~40
homotopy/arclength behavior tests in test/Core + SCCNonlinearSolve tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls


def H_cubic(u, p, lam):
    return lam * (u ** 3 + 2.0 * u - p) + (1 - lam) * (u - 0.5)


ALGS = [nls.HomotopySweep(), nls.KantorovichHomotopy(),
        nls.ArcLengthContinuation(), nls.HomotopyPolyAlgorithm(), None]
IDS = ["sweep", "kantorovich", "arclength", "polyalg", "default"]


@pytest.mark.parametrize("alg", ALGS, ids=IDS)
def test_homotopy_cubic(alg):
    prob = nls.HomotopyProblem(H_cubic, jnp.array([0.0]), jnp.array(3.0),
                               lambdaspan=(0.0, 1.0))
    sol = nls.solve(prob, alg)
    assert bool(sol.success), int(sol.retcode)
    np.testing.assert_allclose(float(sol.u[0]), 1.0, atol=1e-8)


def test_homotopy_multidim():
    def H(u, p, lam):
        target = jnp.array([u[0] ** 2 + u[1] ** 2 - 2.0,
                            jnp.exp(u[0] - 1.0) + u[1] ** 3 - 2.0])
        simple = u - jnp.array([0.8, 0.8])
        return lam * target + (1 - lam) * simple

    prob = nls.HomotopyProblem(H, jnp.array([0.0, 0.0]), None)
    sol = nls.solve(prob)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), [1.0, 1.0], atol=1e-6)


def test_homotopy_zero_width_span():
    prob = nls.HomotopyProblem(H_cubic, jnp.array([0.4]), jnp.array(3.0),
                               lambdaspan=(1.0, 1.0))
    sol = nls.solve(prob, nls.HomotopySweep())
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), 1.0, atol=1e-8)


def test_homotopy_anchor_failure():
    def H(u, p, lam):
        # λ=0 system has no root: u² + 1 = 0
        return lam * (u - 1.0) + (1 - lam) * (u ** 2 + 1.0)

    prob = nls.HomotopyProblem(H, jnp.array([0.0]), None)
    sol = nls.solve(prob, nls.HomotopySweep())
    assert not bool(sol.success)


def test_homotopy_fold_polyalg_recovers():
    """Cubic S-curve whose natural-parameter branch folds; the staged
    polyalgorithm still lands a valid root at λ=1."""

    def Hf(u, p, lam):
        return u ** 3 - u - 2.0 * lam + 0.3

    prob = nls.HomotopyProblem(Hf, jnp.array([0.3]), None)
    sol = nls.solve(prob)
    assert bool(sol.success)
    assert abs(float(Hf(sol.u, None, 1.0)[0])) < 1e-8


def test_simple_homotopy_sweep():
    prob = nls.HomotopyProblem(H_cubic, jnp.array([0.0]), jnp.array(3.0))
    sol = nls.solve(prob, nls.SimpleHomotopySweep())
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), 1.0, atol=1e-6)


def test_scc_sequential_blocks():
    """Two nonlinear blocks + one linear block, later blocks consuming
    earlier solutions via explicitfuns (SCCNonlinearSolve.jl:24-207)."""
    b1 = nls.NonlinearProblem(lambda u, p: u * u - p, jnp.array([1.0]), 4.0)
    # block 2's parameter = solution of block 1
    b2 = nls.NonlinearProblem(lambda u, p: u ** 3 - p, jnp.array([1.0]))
    # linear block: 2x = u1 + u2
    lin = nls.LinearSCCBlock(
        A=lambda p: jnp.array([[2.0]]),
        b=lambda p: jnp.array([p]))

    def ef2(p, sols):
        return sols[0].u[0]          # p2 = u1 = 2

    def ef3(p, sols):
        return sols[0].u[0] + sols[1].u[0]

    prob = nls.SCCNonlinearProblem([b1, b2, lin],
                                   explicitfuns=[None, ef2, ef3])
    sol = nls.solve(prob)
    assert bool(sol.success)
    u = np.asarray(sol.u)
    np.testing.assert_allclose(u[0], 2.0, rtol=1e-8)
    np.testing.assert_allclose(u[1], 2.0 ** (1 / 3), rtol=1e-8)
    np.testing.assert_allclose(u[2], (2.0 + 2.0 ** (1 / 3)) / 2.0, rtol=1e-8)


def test_scc_homotopy_block():
    """A HomotopyProblem block inside an SCC sequence is swept by
    continuation, threading the previous block's solution and honoring the
    SCC's inner algorithm (SCCNonlinearSolve.jl:96-107)."""
    # block 1 (nonlinear): x^2 = 4  -> x = 2
    b1 = nls.NonlinearProblem(lambda u, p: u ** 2 - 4.0, jnp.array([1.0]))
    # block 2 (homotopy): needs continuation — at lambda=1, u^3+2u = x_prev
    Hb = lambda u, q, lam: lam * (u ** 3 + 2.0 * u - q) + (1 - lam) * (u - 0.5)
    b2 = nls.HomotopyProblem(Hb, jnp.array([0.0]), None)
    prob = nls.SCCNonlinearProblem(
        [b1, b2],
        explicitfuns=[None, lambda p, sols: float(sols[0].u[0])])
    sol = nls.solve(prob)
    assert bool(sol.success), int(sol.retcode)
    x, y = float(sol.u[0]), float(sol.u[1])
    np.testing.assert_allclose(x, 2.0, rtol=1e-10)
    np.testing.assert_allclose(y ** 3 + 2.0 * y, x, rtol=1e-8)


def test_scc_failure_propagates():
    b1 = nls.NonlinearProblem(lambda u, p: u * u + 1.0, jnp.array([1.0]))
    b2 = nls.NonlinearProblem(lambda u, p: u - 1.0, jnp.array([0.0]))
    prob = nls.SCCNonlinearProblem([b1, b2])
    sol = nls.solve(prob, nls.NewtonRaphson(), maxiters=50)
    assert not bool(sol.success)


def test_gradients_through_homotopy():
    """IFT at the landing lambda through all three continuation drivers
    (the HomotopyContinuation dual-number role)."""
    import jax
    expected = 1 / (2 * np.sqrt(2))
    for alg in [nls.HomotopySweep(), nls.KantorovichHomotopy(),
                nls.ArcLengthContinuation()]:
        def root(p):
            prob = nls.HomotopyProblem(
                lambda u, q, lam: u * u - (1 - lam) * 1.0 - lam * q,
                jnp.array([1.0]), p)
            return nls.solve(prob, alg).u[0]
        g = float(jax.grad(root)(2.0))
        np.testing.assert_allclose(g, expected, rtol=1e-5)


@pytest.mark.parametrize("abstol", [1e-6, 1e-9, 1e-12])
def test_landing_repolish_tolerance_sweep(abstol):
    """The landing corrector must hit the requested tolerance at lambda=1
    across drivers and tolerances (tracking_abstol parity)."""
    f = lambda u, q, lam: u ** 3 - u - lam * q
    for alg in [nls.HomotopySweep(), nls.KantorovichHomotopy()]:
        prob = nls.HomotopyProblem(f, jnp.array([1.2]), 1.5)
        sol = nls.solve(prob, alg, abstol=abstol)
        assert bool(sol.success), (alg.name, int(sol.retcode))
        assert float(jnp.max(jnp.abs(sol.resid))) < 10 * abstol, alg.name


@pytest.mark.parametrize("loose", [1e-2, 1e-4])
def test_loose_tracking_landing_exempt(loose):
    """Interior tracking at a loose tracking_abstol must NOT leak into the
    returned solution: the landing on lambda=1 is exempt and re-polished at
    the full tolerance (homotopy_sweep.jl:120-124, 788-812)."""
    f = lambda u, q, lam: u ** 3 - u - lam * q
    prob = nls.HomotopyProblem(f, jnp.array([1.2]), 1.5)
    for alg in [nls.HomotopySweep(tracking_abstol=loose),
                nls.KantorovichHomotopy(tracking_abstol=loose)]:
        sol = nls.solve(prob, alg)
        assert bool(sol.success), (alg.name, int(sol.retcode))
        # full default tolerance (~eps^0.8), far below the loose cap
        assert float(jnp.max(jnp.abs(sol.resid))) < 1e-10, alg.name


def test_user_tolerance_shadows_loose_tracking():
    """An explicit user abstol disables the loose interior tolerance
    entirely (_tracking_tolerance, homotopy_sweep.jl:366-377): with the
    loosening suppressed, interior correctors converge tighter, so the
    tight-user run must do at least as many residual evaluations as the
    loose run, and both land within tolerance."""
    f = lambda u, q, lam: u ** 3 - u - lam * q
    prob = nls.HomotopyProblem(f, jnp.array([1.2]), 1.5,
                               lambdaspan=(0.0, 1.0))
    alg = nls.HomotopySweep(tracking_abstol=1e-2, nsteps=8)
    sol_loose = nls.solve(prob, alg)                 # loosening active
    sol_user = nls.solve(prob, alg, abstol=1e-12)    # user tol wins
    assert bool(sol_loose.success) and bool(sol_user.success)
    assert int(sol_user.stats.nf) >= int(sol_loose.stats.nf)
    assert float(jnp.max(jnp.abs(sol_user.resid))) < 1e-11


def test_user_maxiters_shadows_tracking_budget():
    """An explicit user maxiters replaces the loose per-step tracking cap
    (_tracking_budget, homotopy_sweep.jl:355-363): a tracking_maxiters too
    small for the problem is rescued by the user budget."""
    # stiff enough that a 1-iteration tracking cap fails interior steps
    f = lambda u, q, lam: jnp.tanh(3.0 * u) - u + lam * q
    prob = nls.HomotopyProblem(f, jnp.array([0.1]), 0.4)
    alg = nls.HomotopySweep(tracking_maxiters=1, nsteps=4)
    sol_user = nls.solve(prob, alg, maxiters=200)
    assert bool(sol_user.success), int(sol_user.retcode)
    assert float(jnp.max(jnp.abs(sol_user.resid))) < 1e-9
