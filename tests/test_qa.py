"""QA tests — the analogue of the reference's Aqua hygiene suite
(test/qa/qa.jl): public API surface, jit-cache stability (the
no-recompile/AutoSpecialize analogue), dtype preservation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls

PUBLIC_API = [
    # problems / results
    "NonlinearProblem", "NonlinearLeastSquaresProblem",
    "IntervalNonlinearProblem", "SteadyStateProblem", "HomotopyProblem",
    "SCCNonlinearProblem", "NonlinearFunction", "NonlinearSolution",
    "NLStats", "ReturnCode", "solve", "init", "NonlinearSolveCache",
    # solvers
    "NewtonRaphson", "GaussNewton", "TrustRegion", "LevenbergMarquardt",
    "PseudoTransient", "Broyden", "Klement", "DFSane",
    "SimpleNewtonRaphson", "SimpleBroyden", "SimpleKlement", "SimpleDFSane",
    "SimpleHalley", "SimpleTrustRegion", "SimpleLimitedMemoryBroyden",
    "Bisection", "Falsi", "Ridder", "Brent", "ITP", "Alefeld", "Muller",
    "ModAB",
    "HomotopySweep", "KantorovichHomotopy", "ArcLengthContinuation",
    "HomotopyPolyAlgorithm", "FastShortcutHomotopyPolyalg",
    "SimpleHomotopySweep", "LinearSCCBlock", "SCCAlg", "scc_solve_up",
    "refine_root", "auto_refine", "RefineResult",
    "NonlinearSolvePolyAlgorithm", "FastShortcutNonlinearPolyalg",
    "FastShortcutNLLSPolyalg", "RobustMultiNewton",
    # policies / options
    "LinearSolver", "JacobianPolicy", "BackTracking",
    "LiFukushimaLineSearch", "RobustNonMonotoneLineSearch",
    "EisenstatWalkerForcing", "PostconditionSpecifier",
    "TraceMinimal", "TraceWithJacobianConditionNumber", "TraceAll",
    # termination modes
    "RelTerminationMode", "AbsTerminationMode", "NormTerminationMode",
    "RelNormTerminationMode", "AbsNormTerminationMode",
    "RelNormSafeTerminationMode", "AbsNormSafeTerminationMode",
    "RelNormSafeBestTerminationMode", "AbsNormSafeBestTerminationMode",
    # bridges
    "SciPyRoot", "SciPyRootScalar", "SciPyLeastSquares",
    "SciPyLeastSquaresTRF", "SciPyLeastSquaresDogbox",
    "NLsolveJL", "NLSolversJL", "LeastSquaresOptimJL",
    "FastLevenbergMarquardtJL", "SIAMFANLEquationsJL", "SpeedMappingJL",
    "FixedPointAccelerationJL", "PETScSNES", "CMINPACK", "KINSOL",
    # descent / scheme / operator surface (reference exports)
    "NewtonDescent", "SteepestDescent", "DampedNewtonDescent", "Dogleg",
    "GeodesicAcceleration", "DescentResult", "RadiusUpdateSchemes",
    "GenericTrustRegionScheme", "LevenbergMarquardtTrustRegion",
    "PostconditionSpace", "NonlinearVerbosity",
    "JacobianOperator", "JacVecOperator", "VecJacOperator",
    "StatefulJacobianOperator", "StatefulJacobianNormalFormOperator",
    # polynomial/rational all-roots tier
    "HomotopyContinuationJL", "TaylorHomotopyContinuationJL",
    "HomotopyNonlinearFunction",
]


def test_public_api_complete():
    missing = [name for name in PUBLIC_API if not hasattr(nls, name)]
    assert not missing, f"missing public API: {missing}"


def test_jit_cache_stability():
    """Repeated solves with new data must reuse the compiled executable
    (the AutoSpecialize/no-recompile analogue, SURVEY §2.1)."""

    def f(u, p):
        return u * u - p

    alg = nls.NewtonRaphson()
    nls.solve(nls.NonlinearProblem(f, jnp.array([1.0]), 2.0), alg)
    from nonlinearsolve_tpu.core.solve import _jitted_solve
    misses_before = _jitted_solve._cache_size()
    for pv in [3.0, 4.0, 5.0]:
        nls.solve(nls.NonlinearProblem(f, jnp.array([1.0]), pv), alg)
    assert _jitted_solve._cache_size() == misses_before


def test_float32_not_promoted():
    """Float32 non-promotion (reference Core test class)."""
    prob = nls.NonlinearProblem(lambda u, p: u ** 3 - p,
                                jnp.array([1.0], jnp.float32),
                                jnp.float32(8.0))
    for alg in [nls.NewtonRaphson(), nls.Broyden(), nls.DFSane()]:
        sol = nls.solve(prob, alg)
        assert sol.u.dtype == jnp.float32
        assert sol.resid.dtype == jnp.float32


def test_solution_repr_and_success():
    prob = nls.NonlinearProblem(lambda u, p: u - 1.0, jnp.array([0.0]))
    sol = nls.solve(prob, nls.NewtonRaphson())
    assert "Success" in repr(sol)
    assert bool(sol.success)


def test_retcode_names():
    from nonlinearsolve_tpu.core.returncode import retcode_name
    assert retcode_name(1) == "Success"
    assert retcode_name(3) == "MaxIters"


def test_trace_all_engines():
    """store_trace works for every engine family (the reference traces
    all solvers via update_trace!)."""
    prob = nls.NonlinearProblem(lambda u, p: u * u - p,
                                jnp.array([1.0, 1.0]), 2.0)
    for alg in [nls.NewtonRaphson(), nls.Broyden(), nls.Klement(),
                nls.DFSane(), nls.AndersonAcceleration(beta=-0.5)]:
        sol = nls.solve(prob, alg, store_trace=True)
        tr = sol.trace
        assert tr is not None, alg.name
        n = int(tr.n)
        assert n == int(sol.stats.nsteps), alg.name
        fn = np.asarray(tr.fnorm[:n])
        assert fn[-1] < fn[0], alg.name   # residual actually decreased


def test_show_trace_prints(capfd):
    """show_trace emits per-iteration lines via jax.debug.print."""
    prob = nls.NonlinearProblem(lambda u, p: u * u - p,
                                jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(), show_trace=True)
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "iter" in out and "‖f‖" in out
    assert bool(sol.success)


def test_public_api_surface():
    """Every public export resolves and the core callables are intact."""
    expected = [
        "solve", "init", "NonlinearProblem", "NonlinearLeastSquaresProblem",
        "IntervalNonlinearProblem", "SteadyStateProblem", "HomotopyProblem",
        "SCCNonlinearProblem", "NonlinearFunction", "NonlinearSolution",
        "ReturnCode", "NewtonRaphson", "GaussNewton", "TrustRegion",
        "LevenbergMarquardt", "PseudoTransient", "Broyden", "Klement",
        "LimitedMemoryBroyden", "DFSane", "AndersonAcceleration",
        "RobustMultiNewton", "FastShortcutNonlinearPolyalg",
        "SimpleNewtonRaphson", "SimpleHalley", "Bisection", "ITP", "Brent",
        "HomotopySweep", "KantorovichHomotopy", "ArcLengthContinuation",
        "PolynomialHomotopy", "solve_polynomial", "solve_multistart",
        "polynomialize", "LinearSolver", "JacobianPolicy",
        "InitializationData", "BackTracking", "solve_ensemble",
        "SciPyRoot", "SciPyLeastSquares", "PostconditionSpecifier",
        "TraceConfig", "EisenstatWalkerForcing",
    ]
    missing = [n for n in expected if not hasattr(nls, n)]
    assert not missing, missing


def test_pickchunksize_and_chunked_jacfwd():
    """Chunked forward-mode jacobian (the ForwardDiff pickchunksize role):
    identical to jacfwd for every chunk size, and usable through solve."""
    from nonlinearsolve_tpu.core.autodiff import (JacobianPolicy,
                                                  construct_dense_jacobian_fn,
                                                  pickchunksize)
    assert pickchunksize(5) == 5
    assert pickchunksize(13) == 7
    assert pickchunksize(100) == 12

    f = lambda v: jnp.array([v[0] ** 2 + v[1], jnp.sin(v[2]) * v[0],
                             v[1] * v[2], v[0] + v[1] + v[2], v[2] ** 3])
    u = jnp.array([0.3, -1.2, 2.0])
    ref = jax.jacfwd(f)(u)
    for chunk in (1, 2, 3, 7):
        jf = construct_dense_jacobian_fn(
            f, JacobianPolicy(mode="forward", chunk_size=chunk), 3, 5)
        np.testing.assert_allclose(np.asarray(jf(u)), np.asarray(ref),
                                   atol=1e-14)

    prob = nls.NonlinearProblem(lambda u, p: u ** 2 - p,
                                jnp.array([1.0, 1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(
        autodiff=nls.JacobianPolicy(mode="forward", chunk_size=2)))
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-10)


def test_randomized_wellposed_systems():
    """Property sweep: random diagonally-dominant nonlinear systems all
    solve through the default polyalgorithm."""
    # Each trial compiles a fresh full-polyalg program (fresh closure +
    # fresh n); at the tail of a long xdist worker the accumulated
    # compiler state has segfaulted XLA's CPU backend here.  Clear the
    # jit caches first, as the 23-problem sweep does per case.
    jax.clear_caches()
    rng = np.random.default_rng(42)
    for trial in range(10):
        n = int(rng.integers(2, 12))
        A = rng.standard_normal((n, n)) * 0.3
        A += np.diag(np.abs(A).sum(1) + 1.0)
        Aj = jnp.asarray(A)
        b = jnp.asarray(rng.standard_normal(n))
        scale = float(rng.uniform(0.05, 0.5))

        def f(u, p):
            return Aj @ u + scale * jnp.tanh(u) - p

        sol = nls.solve(nls.NonlinearProblem(f, jnp.zeros(n), b))
        assert bool(sol.success), trial
        assert float(jnp.max(jnp.abs(sol.resid))) < 1e-8, trial
