"""Iterator interface, tracing, verbosity, wrapper conformance tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls


def quadratic(u, p):
    return u * u - p


def test_iterator_step_solve():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    cache = nls.init(prob, nls.NewtonRaphson())
    cache.step()
    assert cache.nsteps == 1
    np.testing.assert_allclose(np.asarray(cache.u), 1.5)
    sol = cache.solve()
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-10)


def test_iterator_warm_restart_sweep():
    """nlprob_iterator_interface analogue
    (common/common_rootfind_testing.jl:46-57)."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0]), 2.0)
    cache = nls.init(prob, nls.NewtonRaphson())
    roots = []
    for pval in [1.0, 2.0, 3.0, 4.0]:
        cache.reinit(p=jnp.asarray(pval))
        roots.append(float(cache.solve().u[0]))
    np.testing.assert_allclose(roots, np.sqrt([1.0, 2.0, 3.0, 4.0]),
                               rtol=1e-10)


def test_iterator_quasi_newton():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    cache = nls.init(prob, nls.Broyden())
    sol = cache.solve()
    assert bool(sol.success)


def test_iterator_polyalg_winner_retention():
    """Warm polyalgorithm cache: the winning subalgorithm is retained
    across reinit/solve cycles (polyalg.jl:30-64) and re-probed every
    8th solve."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0]), 2.0)
    cache = nls.init(prob, nls.FastShortcutNonlinearPolyalg())
    roots = []
    for pval in [1.0, 2.0, 3.0, 4.0, 5.0]:
        cache.reinit(p=jnp.asarray(pval))
        sol = cache.solve()
        assert bool(sol.success)
        roots.append(float(sol.u[0]))
        assert cache.best_subalgorithm is not None
    np.testing.assert_allclose(roots, np.sqrt([1.0, 2.0, 3.0, 4.0, 5.0]),
                               rtol=1e-9)
    with pytest.raises(NotImplementedError, match="polyalgorithm"):
        cache.step()


def test_iterator_dfsane():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    cache = nls.init(prob, nls.DFSane())
    cache.step()
    assert cache.nsteps == 1
    sol = cache.solve()
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-8)
    # warm restart (integrator-style reuse)
    cache.reinit(p=jnp.asarray(9.0))
    np.testing.assert_allclose(np.asarray(cache.solve().u), 3.0, rtol=1e-8)


def test_iterator_anderson():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    cache = nls.init(prob, nls.AndersonAcceleration(beta=-0.5))
    cache.step(2)
    assert cache.nsteps == 2
    sol = cache.solve()
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-8)
    cache.reinit(p=jnp.asarray(4.0))
    np.testing.assert_allclose(np.asarray(cache.solve().u), 2.0, rtol=1e-8)


def test_store_trace():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(), store_trace=True)
    assert sol.trace is not None
    n = int(sol.trace.n)
    assert n == int(sol.stats.nsteps)
    fnorms = np.asarray(sol.trace.fnorm[:n])
    assert np.all(np.diff(fnorms) < 0)      # Newton: strictly decreasing


def test_trace_condition_level():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 2.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(), store_trace=True,
                    trace_level="condition")
    n = int(sol.trace.n)
    assert sol.trace.condJ is not None
    assert np.all(np.asarray(sol.trace.condJ[:n]) >= 1.0)


def test_trace_all_level_stores_iterates():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(), store_trace=True,
                    trace_level="all")
    n = int(sol.trace.n)
    np.testing.assert_allclose(np.asarray(sol.trace.u_history[n - 1]),
                               np.sqrt(2.0), rtol=1e-6)


def test_verbose_forcing_emission(capfd):
    """verbose='all' emits the Eisenstat-Walker forcing message at the
    traced site via jax.debug.print; verbose=None stays silent."""
    import jax
    from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    alg = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres"),
        forcing=EisenstatWalkerForcing())
    nls.solve(prob, alg)
    jax.effects_barrier()
    capfd.readouterr()
    nls.solve(prob, alg, verbose="all")
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "forcing eta" in out.out + out.err
    nls.solve(prob, alg)
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "forcing eta" not in out.out + out.err


def test_verbose_non_enclosing_interval(capfd):
    prob = nls.IntervalNonlinearProblem(lambda u, p: u * u + 1.0,
                                        (0.0, 1.0))
    sol = nls.solve(prob, nls.Bisection(), verbose="all")
    assert int(sol.retcode) == int(nls.ReturnCode.InitialFailure)
    out = capfd.readouterr()
    assert "non_enclosing_interval" in out.err


def test_verbosity_toggles():
    from nonlinearsolve_tpu.core.verbosity import NonlinearVerbosity
    v = NonlinearVerbosity("standard")
    assert v.enabled("non_enclosing_interval")
    assert not v.enabled("forcing")
    v2 = NonlinearVerbosity("none", forcing=True)
    assert v2.enabled("forcing")
    assert not v2.enabled("termination_condition")
    with pytest.raises(ValueError):
        NonlinearVerbosity("bogus")


def test_verbosity_full_matrix():
    """Every message class is individually toggleable on top of every
    preset (the reference's full matrix, verbosity.jl:1-90)."""
    from nonlinearsolve_tpu.core.verbosity import (_CLASSES,
                                                   NonlinearVerbosity)
    for preset in ("none", "minimal", "standard", "detailed", "all"):
        for cls in _CLASSES:
            on = NonlinearVerbosity(preset, **{cls: True})
            off = NonlinearVerbosity(preset, **{cls: False})
            assert on.enabled(cls)
            assert not off.enabled(cls)
    assert set(_CLASSES) == {
        "non_enclosing_interval", "alias_u0_immutable",
        "linsolve_failed_noncurrent", "termination_condition",
        "threshold_state", "forcing", "sensitivity_vjp_choice",
        "unsupported_postcondition", "dropped_extension_kwarg"}


def test_verbosity_group_control():
    """Group-level settings (error_control/numerical/sensitivity), with
    individual classes overriding groups (verbosity.jl constructor)."""
    from nonlinearsolve_tpu.core.verbosity import NonlinearVerbosity
    v = NonlinearVerbosity("none", numerical=True)
    assert v.enabled("forcing") and v.enabled("threshold_state")
    assert not v.enabled("termination_condition")
    v2 = NonlinearVerbosity("all", error_control=False,
                            termination_condition=True)
    assert v2.enabled("termination_condition")   # class beats group
    assert not v2.enabled("non_enclosing_interval")
    assert v2.enabled("forcing")                 # untouched by the group


def test_verbosity_nested_linear(capfd):
    """The nested linear_verbosity sub-specifier reaches the Krylov
    emission sites (the LinearSolve verbosity slot)."""
    from nonlinearsolve_tpu.core.verbosity import (LinearVerbosity,
                                                   NonlinearVerbosity)
    lv = LinearVerbosity("none", krylov_unconverged=True)
    v = NonlinearVerbosity("none", linear_verbosity=lv)
    assert v.linear.enabled("krylov_unconverged")
    assert not v.linear.enabled("krylov_breakdown")
    # starve GMRES so the unconverged message fires (a non-normal Jacobian:
    # the quadratic's J = 2uI is solved exactly by one Krylov dim)
    def skewed(u, p):
        return jnp.array([4.0 * u[0] + u[1] ** 2 - p,
                          u[0] ** 3 + 0.5 * u[1] - p])

    prob = nls.NonlinearProblem(skewed, jnp.array([1.0, 2.0]), 2.0)
    alg = nls.NewtonRaphson(linsolve=nls.LinearSolver(
        method="gmres", restart=1, krylov_maxiter=1))
    nls.solve(prob, alg, verbose=v, maxiters=3)
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "krylov_unconverged" in out.out + out.err


def test_verbose_alias_u0_immutable(capfd):
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    nls.solve(prob, nls.NewtonRaphson(), alias_u0=True, verbose="all")
    out = capfd.readouterr()
    assert "alias_u0_immutable" in out.out + out.err
    # silent by default
    nls.solve(prob, nls.NewtonRaphson(), alias_u0=True)
    out = capfd.readouterr()
    assert "alias_u0_immutable" not in out.out + out.err


def test_time_phases():
    """solve(..., time_phases=True) -> per-phase timing table whose phases
    sum to the instrumented total (timer_outputs.jl:3-55 role)."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(), time_phases=True)
    assert bool(sol.success)
    t = sol.timer
    assert set(t) >= {"jacobian", "descent", "linesearch", "other",
                      "total"}
    phase_sum = t["jacobian"] + t["descent"] + t["linesearch"] + t["other"]
    assert phase_sum == pytest.approx(t["total"], rel=1e-6)
    assert t["total"] > 0 and t["jacobian"] > 0 and t["descent"] > 0
    # trust-region variant exercises the linesearch/globalization slot
    sol2 = nls.solve(prob, nls.TrustRegion(), time_phases=True)
    assert sol2.timer["linesearch"] > 0
    # default path carries no timer
    assert nls.solve(prob, nls.NewtonRaphson()).timer is None


@pytest.mark.parametrize("alg", [nls.SciPyRoot(method="hybr"),
                                 nls.SciPyRoot(method="lm"),
                                 nls.SciPyRoot(method="df-sane")],
                         ids=["hybr", "lm", "df-sane"])
def test_scipy_root_conformance(alg):
    """Wrapper conformance: identical roots through the extension wrapper
    (test/Wrappers analogue)."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, alg)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-6)


def test_scipy_least_squares():
    ts = jnp.linspace(0, 1, 8)
    data = 2.0 * jnp.exp(-1.5 * ts)
    prob = nls.NonlinearLeastSquaresProblem(
        lambda u, p: u[0] * jnp.exp(u[1] * ts) - data, jnp.array([1.0, -1.0]))
    sol = nls.solve(prob, nls.SciPyLeastSquares())
    np.testing.assert_allclose(np.asarray(sol.u), [2.0, -1.5], rtol=1e-6)


def test_scipy_root_scalar():
    prob = nls.IntervalNonlinearProblem(lambda u, p: u * u - 2.0, (1.0, 2.0))
    sol = nls.solve(prob, nls.SciPyRootScalar())
    np.testing.assert_allclose(float(sol.u), np.sqrt(2.0), rtol=1e-10)


def test_extension_alg_constructors_delegate_natively():
    """The reference's extension-algorithm constructors return the native
    algorithm implementing the requested method (extension_algs.jl parity —
    a reference user's solve(prob, NLsolveJL(...)) runs unchanged)."""
    from nonlinearsolve_tpu.solvers.anderson import AndersonAcceleration
    from nonlinearsolve_tpu.solvers.first_order import (
        GeneralizedFirstOrderAlgorithm)
    from nonlinearsolve_tpu.solvers.quasi_newton import QuasiNewtonAlgorithm

    assert isinstance(nls.CMINPACK(method=":lm"),
                      GeneralizedFirstOrderAlgorithm)
    assert nls.CMINPACK(method="hybr").trustregion is not None   # dogleg TR
    assert nls.NLsolveJL(method=":anderson", m=8).m == 8
    assert isinstance(nls.NLsolveJL(method="broyden"), QuasiNewtonAlgorithm)
    assert nls.NLsolveJL().trustregion.method == "nlsolve"
    assert isinstance(nls.KINSOL(globalization_strategy="fixedpoint", m=3),
                      AndersonAcceleration)
    assert isinstance(nls.SpeedMappingJL(), AndersonAcceleration)
    assert isinstance(nls.FixedPointAccelerationJL(algorithm=":Aitken"),
                      AndersonAcceleration)
    from nonlinearsolve_tpu.core.wolfe_linesearch import HagerZhang
    assert isinstance(nls.NLSolversJL("newton_hagerzhang").linesearch,
                      HagerZhang)

    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    for alg in [nls.PETScSNES(), nls.PETScSNES(snes_type="newtontr"),
                nls.KINSOL(), nls.CMINPACK(), nls.NLsolveJL(),
                nls.SIAMFANLEquationsJL(method=":pseudotransient"),
                nls.FastLevenbergMarquardtJL()]:
        sol = nls.solve(prob, alg)
        assert int(sol.retcode) == int(nls.ReturnCode.Success)
        np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0),
                                   rtol=1e-6)


def test_extension_constructor_dropped_kwarg_notice(capfd):
    """A delegating bridge constructor handed a reference kwarg it cannot
    honor emits a visible notice (VERDICT item 10: the reference forwards
    e.g. NLsolveJL(autoscale=...) to the external binary; silently
    swallowing it here would change behavior without a trace)."""
    nls.NLsolveJL(autoscale=False)
    err = capfd.readouterr().err
    assert "dropped_extension_kwarg" in err and "autoscale" in err

    nls.PETScSNES(snes_type="newtontr", snes_linesearch_type="l2")
    err = capfd.readouterr().err
    assert "snes_linesearch_type" in err

    # honored kwargs do NOT trigger the notice
    nls.CMINPACK(method="lm")
    nls.FastLevenbergMarquardtJL(factor=2.0)
    assert capfd.readouterr().err == ""

    # globally silenceable
    from nonlinearsolve_tpu.core.verbosity import NonlinearVerbosity
    from nonlinearsolve_tpu.solvers import wrappers
    old = wrappers.CONSTRUCTOR_VERBOSITY
    try:
        wrappers.CONSTRUCTOR_VERBOSITY = NonlinearVerbosity("none")
        nls.NLsolveJL(autoscale=False)
        assert capfd.readouterr().err == ""
    finally:
        wrappers.CONSTRUCTOR_VERBOSITY = old


def test_solve_rejects_unknown_kwargs():
    """Reference checkkwargs (solve.jl:174-179): a typo'd kwarg must raise,
    not silently solve at the default tolerance."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    with pytest.raises(TypeError, match="abstol"):
        nls.solve(prob, nls.NewtonRaphson(), abstoll=1e-8)
    with pytest.raises(TypeError, match="unrecognized"):
        nls.solve(prob, maxiter=10)
    # problem-level kwargs are validated too (they merge into the call)
    bad_prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0,
                                    relto=1e-3)
    with pytest.raises(TypeError, match="relto"):
        nls.solve(bad_prob)


def test_solve_maxtime():
    """MaxTime budget on the main solve() path (reference MaxTime in the
    step loop, solve.jl:811-819), via the chunked-advance machinery."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(), maxtime=0.0, maxiters=100000)
    assert int(sol.retcode) == int(nls.ReturnCode.MaxTime)
    sol = nls.solve(prob, nls.NewtonRaphson(), maxtime=30.0)
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-6)


def test_iterator_maxtime():
    """MaxTime budget through the iterator interface (solve.jl:811-819)."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    cache = nls.init(prob, nls.NewtonRaphson(), maxiters=100000)
    sol = cache.solve(maxtime=0.0)
    assert int(sol.retcode) == int(nls.ReturnCode.MaxTime)
    cache.reinit()
    sol = cache.solve(maxtime=30.0)
    assert bool(sol.success)


@pytest.mark.parametrize("method", ["lu", "qr", "svd", "cholesky"])
def test_linear_solver_methods(method):
    def spd_newton(u, p):
        return u + 0.1 * u ** 3 - p

    prob = nls.NonlinearProblem(spd_newton, jnp.array([1.0, 2.0]),
                                jnp.array([0.5, 1.0]))
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method=method)))
    assert bool(sol.success)
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-9


@pytest.mark.parametrize("mode", ["forward", "reverse", "finite"])
def test_jacobian_modes(mode):
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, nls.NewtonRaphson(
        autodiff=nls.JacobianPolicy(mode=mode)))
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-5)


def test_iterator_maxtime_chunking():
    """A solve needing more than one 16-step chunk must not pick up a
    spurious MaxIters retcode at chunk boundaries."""

    # Newton on u^3 contracts linearly (rate 2/3): ~30 steps from u0=5.
    prob = nls.NonlinearProblem(lambda u, p: u ** 3, jnp.array([5.0]), 0.0)
    cache = nls.init(prob, nls.NewtonRaphson(), maxiters=500, abstol=1e-13)
    sol = cache.solve(maxtime=60.0)
    assert bool(sol.success), int(sol.retcode)
    assert cache.nsteps > 16  # actually crossed a chunk boundary


class TestInitializationHook:
    """DAE-style initialization (reference initialization.jl:3-38)."""

    def _main_f(self, u, p):
        return jnp.array([u[0] + u[1] - p, u[1] ** 2 - u[0]])

    def test_consistent_init_runs_first(self):
        init_prob = nls.NonlinearProblem(lambda z, q: z ** 2 - q,
                                         jnp.array([0.5]), 1.0)
        idata = nls.InitializationData(
            initializeprob=init_prob,
            initializeprobmap=lambda sol: jnp.concatenate(
                [jnp.array([1.0]), sol.u]))
        fn = nls.NonlinearFunction(f=self._main_f,
                                   initialization_data=idata)
        sol = nls.solve(nls.NonlinearProblem(fn, jnp.array([9.0, 9.0]), 2.0),
                        nls.NewtonRaphson())
        assert bool(sol.success)
        np.testing.assert_allclose(np.asarray(sol.u), [1.0, 1.0], atol=1e-9)

    def test_failed_init_aborts_with_initial_failure(self):
        bad = nls.NonlinearProblem(lambda z, q: z ** 2 + 1.0,
                                   jnp.array([0.5]), None)
        fn = nls.NonlinearFunction(
            f=self._main_f,
            initialization_data=nls.InitializationData(initializeprob=bad))
        sol = nls.solve(nls.NonlinearProblem(fn, jnp.array([9.0, 9.0]), 2.0),
                        nls.NewtonRaphson())
        assert int(sol.retcode) == int(nls.ReturnCode.InitialFailure)
        assert sol.original is not None  # init sub-solution provenance

    def test_pmap_updates_parameters(self):
        init_prob = nls.NonlinearProblem(lambda z, q: z ** 2 - q,
                                         jnp.array([0.5]), 1.0)
        idata = nls.InitializationData(
            initializeprob=init_prob,
            initializeprobpmap=lambda sol, p: float(sol.u[0]) + 1.0)
        fn = nls.NonlinearFunction(f=lambda u, p: u - p,
                                   initialization_data=idata)
        sol = nls.solve(nls.NonlinearProblem(fn, jnp.array([0.0]), 99.0),
                        nls.NewtonRaphson())
        np.testing.assert_allclose(float(sol.u[0]), 2.0, atol=1e-10)


def test_implicit_euler_consumes_iterator():
    """Downstream-integrator pattern (how OrdinaryDiffEq consumes the
    cache): one NonlinearSolveCache reused across timesteps via reinit,
    warm-started from the previous step's solution."""
    # du/dt = -50 (u - cos(t)): stiff relaxation onto cos(t)
    dt = 0.01

    def be_residual(u, p):
        u_prev, t_next = p
        return u - u_prev + dt * 50.0 * (u - jnp.cos(t_next))

    u = jnp.array([1.0])
    cache = nls.init(
        nls.NonlinearProblem(be_residual, u, (u, jnp.array(0.0))),
        nls.NewtonRaphson())
    ts = np.arange(1, 51) * dt
    total_steps = 0
    for t in ts:
        cache.reinit(u0=u, p=(u, jnp.array(t)))
        sol = cache.solve()
        assert bool(sol.success)
        u = sol.u
        total_steps += cache.nsteps
    # stiff relaxation: solution hugs cos(t) after the transient
    assert abs(float(u[0]) - np.cos(ts[-1])) < 2e-2
    # warm-started Newton should need very few iterations per step
    assert total_steps / len(ts) < 4


def test_custom_algorithm_extension():
    """User-defined algorithm via the run_flat protocol dispatches through
    solve() and inherits IFT differentiability."""
    from nonlinearsolve_tpu.solvers.custom import run_fixed_point_loop

    class Richardson:
        name = "Richardson"

        def __init__(self, omega=0.3):
            self.omega = omega

        def __hash__(self):
            return hash(("Richardson", self.omega))

        def __eq__(self, o):
            return isinstance(o, Richardson) and o.omega == self.omega

        def run_flat(self, ctx, term_cfg, u0_flat, abstol, reltol,
                     maxiters):
            def step(u, fu, state):
                return u - self.omega * fu, state
            return run_fixed_point_loop(step, ctx, term_cfg, u0_flat,
                                        abstol, reltol, maxiters)

    prob = nls.NonlinearProblem(lambda u, p: u + 0.3 * jnp.tanh(u) - p,
                                jnp.zeros(5), 0.7 * jnp.ones(5))
    sol = nls.solve(prob, Richardson(), maxiters=500)
    assert bool(sol.success)
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-10

    import jax as _jax
    g = _jax.grad(lambda p: nls.solve(
        nls.NonlinearProblem(lambda u, q: u + 0.3 * jnp.tanh(u) - q,
                             jnp.zeros(1), p),
        Richardson(), maxiters=500).u[0])(jnp.array([0.7]))
    assert np.isfinite(float(g[0])) and 0.7 < float(g[0]) < 0.9


@pytest.mark.parametrize("method", ["hybr", "lm", "df-sane", "broyden1"])
def test_scipy_root_method_conformance(method):
    """Wrapper conformance (reference test/Wrappers/rootfind): SciPy
    bridge methods land on the same root as the native solvers."""
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    native = nls.solve(prob, nls.NewtonRaphson())
    wrapped = nls.solve(prob, nls.SciPyRoot(method=method))
    assert bool(wrapped.success), method
    np.testing.assert_allclose(np.asarray(wrapped.u), np.asarray(native.u),
                               rtol=1e-6)


def test_null_u0_solutions():
    """Empty-state problems return a null solution without running a solver
    (reference solve.jl:202-203 + build_null_solution :1028-1063)."""
    prob = nls.NonlinearProblem(lambda u, p: u * u - p, jnp.zeros((0,)), 2.0)
    s = nls.solve(prob)
    assert int(s.retcode) == int(nls.ReturnCode.Success)
    assert s.u.shape == (0,)

    s = nls.solve(nls.NonlinearProblem(lambda u, p: u * u - p, None, 2.0))
    assert int(s.retcode) == int(nls.ReturnCode.Success)

    # NLLS: residual at the empty point decides (reference abstol 1e-6)
    big = nls.NonlinearLeastSquaresProblem(
        lambda u, p: jnp.array([3.0]), jnp.zeros((0,)), None)
    assert int(nls.solve(big).retcode) == int(nls.ReturnCode.Failure)
    tiny = nls.NonlinearLeastSquaresProblem(
        lambda u, p: jnp.array([1e-9]), jnp.zeros((0,)), None)
    assert int(nls.solve(tiny).retcode) == int(nls.ReturnCode.Success)


def test_solve_nonlinear_kwarg_hygiene():
    """Direct solve_nonlinear callers get the same typo protection as the
    solve() front door, and front-door-only names are redirected rather
    than silently dropped (VERDICT r2 weak#6 / next#8)."""
    from nonlinearsolve_tpu.core.solve import solve_nonlinear
    prob = nls.NonlinearProblem(lambda u, p: u ** 2 - 2.0, jnp.array([1.0]))
    with pytest.raises(TypeError, match="abstol"):
        solve_nonlinear(prob, nls.NewtonRaphson(), abstoll=1e-6)
    with pytest.raises(TypeError, match="front door"):
        solve_nonlinear(prob, nls.NewtonRaphson(), maxtime=1.0)


def test_scc_alg_constructor():
    """nls.SCCAlg — the reference's SCC entry point
    (SCCNonlinearSolve.jl:24-50): nlalg for nonlinear blocks, linalg for
    linear blocks, store_original controls sol.original."""
    probs = (
        nls.NonlinearProblem(lambda u, p: u ** 2 - p, jnp.array([1.0]), 4.0),
        nls.NonlinearProblem(lambda u, p: u - p, jnp.array([0.0]), 3.0),
    )
    prob = nls.SCCNonlinearProblem(probs=probs)
    alg = nls.SCCAlg(nlalg=nls.NewtonRaphson(),
                     linalg=nls.LinearSolver(method="lu"))
    sol = nls.solve(prob, alg, abstol=1e-10)
    assert bool(nls.ReturnCode.successful(sol.retcode))
    np.testing.assert_allclose(np.asarray(sol.u), [2.0, 3.0], atol=1e-8)
    assert sol.original is not None and len(sol.original) == 2
    sol2 = nls.solve(prob, nls.SCCAlg(store_original=False), abstol=1e-10)
    assert sol2.original is None


def test_dropped_kwarg_reports_explicit_none(capfd):
    """An explicitly passed reference kwarg must be reported even when its
    value is None (ADVICE r2: the None filter swallowed user intent)."""
    from nonlinearsolve_tpu.solvers import wrappers
    wrappers.KINSOL(krylov_dim=None)
    out = capfd.readouterr().err + capfd.readouterr().out
    assert "krylov_dim" in out


def test_homotopy_cache_iteration_messages():
    """HomotopySolveCache explains whole-solve granularity instead of
    failing with NoneType errors (ADVICE r2)."""
    prob = nls.HomotopyProblem(lambda u, lam, p: u ** 3 - u - lam,
                               jnp.array([1.0]), None)
    cache = nls.init(prob)
    with pytest.raises(NotImplementedError, match="whole-solve"):
        cache.step()
    with pytest.raises(NotImplementedError, match="whole-solve"):
        iter(cache)


def test_scc_and_ensemble_maxtime_paths():
    """Regression (r3 review): solve(scc_prob, ..., maxtime=...) must not
    raise — the budget applies per block through the front door; ensemble
    + maxtime raises a CLEAR NotImplementedError (not a kwargs typo
    message)."""
    probs = (
        nls.NonlinearProblem(lambda u, p: u ** 2 - p, jnp.array([1.0]), 4.0),
        nls.NonlinearProblem(lambda u, p: u - p, jnp.array([0.0]), 3.0),
    )
    scc = nls.SCCNonlinearProblem(probs=probs)
    sol = nls.solve(scc, nls.NewtonRaphson(), maxtime=30.0, abstol=1e-10)
    assert bool(nls.ReturnCode.successful(sol.retcode))
    np.testing.assert_allclose(np.asarray(sol.u), [2.0, 3.0], atol=1e-8)

    with pytest.raises(NotImplementedError, match="ensemble"):
        nls.solve_ensemble(
            nls.NonlinearProblem(lambda u, p: u ** 2 - p,
                                 jnp.array([1.0]), 2.0),
            nls.NewtonRaphson(), u0s=jnp.ones((3, 1)), maxtime=1.0)
