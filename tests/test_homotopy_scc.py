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


# ---------------------------------------------------------------------------
# Reference continuation behavior-test port (homotopy_sweep_tests items 1-23,
# arclength_tests items 1-8, kantorovich_homotopy_tests item 1).
# ---------------------------------------------------------------------------

def H_quad(u, p, lam):
    """(1-λ)(u - c) + λ(u² - c): λ=0 root c, λ=1 root √c (the reference's
    canonical sweep family, homotopy_sweep_tests__item2.jl)."""
    return (1 - lam) * (u - p) + lam * (u ** 2 - p)


def test_sweep_constructor_defaults_and_validation():
    """homotopy_sweep_tests items 1+18: defaults + construction errors."""
    alg = nls.HomotopySweep()
    assert alg.inner is None and alg.nsteps is None and alg.adaptive
    assert alg.initial_step_factor == pytest.approx(0.1)
    assert alg.min_dlam is None             # resolved to sqrt(eps) at solve
    assert alg.max_step_factor == pytest.approx(1.0)
    assert alg.expand_factor == pytest.approx(2.0)
    assert alg.expand_threshold == 2
    assert alg.expand_quality == pytest.approx(0.25)
    assert alg.predictor == "secant"

    alg2 = nls.HomotopySweep(inner=nls.SimpleNewtonRaphson(), nsteps=20,
                             adaptive=False, min_dlam=1e-4,
                             max_step_factor=0.25, expand_factor=1.5,
                             expand_threshold=3, predictor="constant")
    assert alg2.nsteps == 20 and not alg2.adaptive
    assert alg2.min_dlam == pytest.approx(1e-4)
    assert alg2.max_step_factor == pytest.approx(0.25)
    assert alg2.expand_factor == pytest.approx(1.5)
    assert alg2.expand_threshold == 3 and alg2.predictor == "constant"

    # boundary values that must be ACCEPTED
    assert nls.HomotopySweep(expand_factor=1).expand_factor == 1
    assert nls.HomotopySweep(expand_quality=float("inf")).expand_quality \
        == float("inf")

    for bad in [dict(adaptive=False), dict(nsteps=0),
                dict(max_step_factor=0.0), dict(max_step_factor=1.5),
                dict(expand_factor=0.5), dict(expand_threshold=0),
                dict(expand_quality=0.0), dict(expand_quality=-1.0),
                dict(predictor="tangent"), dict(initial_step_factor=0.0),
                dict(min_dlam=0.0), dict(maxsteps=0)]:
        with pytest.raises(ValueError):
            nls.HomotopySweep(**bad)


def test_sweep_p_needs_no_structure():
    """item4: λ is a separate argument, so p can be any pytree."""
    def H(u, p, lam):
        return (1 - lam) * (u - p["c"]) + lam * (u ** 2 - p["c"])

    prob = nls.HomotopyProblem(H, jnp.array([4.0]), {"c": jnp.asarray(4.0)})
    sol = nls.solve(prob, nls.HomotopySweep())
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), 2.0, atol=1e-6)


def test_sweep_saturating_atan_vs_cold_newton():
    """item5: continuation lands on u=3 where a cold Newton from u0=12
    overshoots the saturating atan residual."""
    def H(u, p, lam):
        return (1 - lam) * u + lam * jnp.arctan(u - 3.0)

    prob = nls.HomotopyProblem(H, jnp.array([12.0]))
    sol = nls.solve(prob, nls.HomotopySweep(nsteps=20))
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), 3.0, atol=1e-5)

    cold = nls.NonlinearProblem(lambda u, p: jnp.arctan(u - 3.0),
                                jnp.array([12.0]))
    csol = nls.solve(cold, nls.NewtonRaphson())
    assert not (bool(csol.success)
                and abs(float(csol.u[0]) - 3.0) < 1e-3)


def test_sweep_fold_fails_finite():
    """item6: no real root past λ=1/3 — must FAIL (not silently succeed)
    and return the last converged iterate, not a diverged buffer."""
    def H(u, p, lam):
        return (1 - lam) * u + lam * (u ** 2 + 1.0)

    prob = nls.HomotopyProblem(H, jnp.array([0.0]))
    sol = nls.solve(prob, nls.HomotopySweep(min_dlam=1e-2))
    assert not bool(sol.success)
    assert int(sol.retcode) != int(nls.ReturnCode.Success)
    assert np.all(np.isfinite(np.asarray(sol.u)))


def test_sweep_prob_kwargs_reach_inner_solves():
    """item8: maxiters=1 stored on the problem must reach the inner solves
    and wreck them (pre-fix it was silently ignored and succeeded)."""
    prob = nls.HomotopyProblem(H_quad, jnp.array([4.0]), jnp.asarray(4.0),
                               maxiters=1)
    sol = nls.solve(prob, nls.HomotopySweep(inner=nls.NewtonRaphson(),
                                            min_dlam=1e-2))
    assert not bool(sol.success)


def test_sweep_fixed_step_fold_fails():
    """item9: non-adaptive sweep across a fold fails."""
    def H(u, p, lam):
        return (1 - lam) * u + lam * (u ** 2 + 1.0)

    prob = nls.HomotopyProblem(H, jnp.array([0.0]))
    sol = nls.solve(prob, nls.HomotopySweep(adaptive=False, nsteps=10))
    assert not bool(sol.success)


def test_sweep_stall_guard_large_span():
    """item10: bisection must stop (Stalled), not hang, when dλ underflows
    on a large-magnitude span; resid stays finite."""
    def H(u, p, lam):
        return u ** 2 + (lam - 1.0e9)

    prob = nls.HomotopyProblem(H, jnp.array([0.0]),
                               lambdaspan=(1.0e9, 2.0e9))
    sol = nls.solve(prob, nls.HomotopySweep(inner=nls.NewtonRaphson()),
                    maxiters=5)
    assert int(sol.retcode) == int(nls.ReturnCode.Stalled)
    assert not bool(sol.success)
    assert np.all(np.isfinite(np.asarray(sol.resid)))


def test_sweep_decreasing_span():
    """item11: λspan swept 1 → 0; target is the λ=0 root u=c."""
    prob = nls.HomotopyProblem(H_quad, jnp.array([2.0]), jnp.asarray(4.0),
                               lambdaspan=(1.0, 0.0))
    sol = nls.solve(prob, nls.HomotopySweep())
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), 4.0, atol=1e-6)


def test_sweep_float32_no_promotion():
    """item12: Float32 problems stay Float32 and still land."""
    prob = nls.HomotopyProblem(H_quad, jnp.array([4.0], jnp.float32),
                               jnp.float32(4.0),
                               lambdaspan=(np.float32(0), np.float32(1)))
    sol = nls.solve(prob, nls.HomotopySweep())
    assert bool(sol.success)
    assert sol.u.dtype == jnp.float32
    np.testing.assert_allclose(float(sol.u[0]), 2.0, atol=1e-3)


def test_sweep_inner_variants():
    """item13: default inner (polyalgorithm), NewtonRaphson, and
    SimpleNewtonRaphson all land — no hardcoded inner dependency."""
    for inner in [None, nls.NewtonRaphson(), nls.SimpleNewtonRaphson()]:
        prob = nls.HomotopyProblem(H_quad, jnp.array([4.0]),
                                   jnp.asarray(4.0))
        sol = nls.solve(prob, nls.HomotopySweep(inner=inner))
        assert bool(sol.success), repr(inner)
        np.testing.assert_allclose(float(sol.u[0]), 2.0, atol=1e-6)


def test_sweep_anchor_selects_branch():
    """item15: the λ=λ0 anchor solve must run FIRST.  From u0=-10 the
    simplified linear system u-4 pulls into the POSITIVE root's basin, so
    the sweep lands on +2; skipping the anchor tracks the negative branch
    to -2 with a bogus success."""
    def H(u, p, lam):
        return (1 - lam) * (u - 4.0) + lam * (u ** 2 - 4.0)

    prob = nls.HomotopyProblem(H, jnp.array([-10.0]))
    sol = nls.solve(prob, nls.HomotopySweep())
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), 2.0, atol=1e-5)


def test_sweep_anchor_failure_not_stalled():
    """item16: an unsolvable anchor fails FAST with the inner failure
    retcode (not Stalled), finite resid, and u left at u0."""
    def H(u, p, lam):
        return u ** 2 + 1.0

    prob = nls.HomotopyProblem(H, jnp.array([0.5]))
    sol = nls.solve(prob, nls.HomotopySweep(inner=nls.NewtonRaphson()),
                    maxiters=25)
    assert not bool(sol.success)
    assert int(sol.retcode) != int(nls.ReturnCode.Stalled)
    assert np.all(np.isfinite(np.asarray(sol.resid)))
    np.testing.assert_allclose(float(sol.u[0]), 0.5)


def test_sweep_expansion_step_economy():
    """item19 (jit-idiomatic port): on a linear-in-u homotopy every
    corrector succeeds, so expansion (×2 every 2 successes) must spend
    strictly fewer residual evaluations than expand_factor=1, which walks
    the span at the fixed initial increment."""
    H = lambda u, p, lam: u - lam
    prob = nls.HomotopyProblem(H, jnp.array([0.0]))
    inner = nls.NewtonRaphson()
    nf_grow = int(nls.solve(
        prob, nls.HomotopySweep(inner=inner)).stats.nf)
    nf_nogrow = int(nls.solve(
        prob, nls.HomotopySweep(inner=inner, expand_factor=1)).stats.nf)
    assert nf_grow < nf_nogrow


def test_sweep_predictor_secant_beats_constant():
    """item20: on the linear path u*(λ) = 1+λ the secant prediction is
    exact, so it must spend strictly fewer residual evaluations than the
    constant (lagging) warm start across the identical sweep."""
    H = lambda u, p, lam: u ** 3 - (1 + lam) ** 3
    inner = nls.NewtonRaphson()
    sols = {}
    for pred in ("secant", "constant"):
        prob = nls.HomotopyProblem(H, jnp.array([1.0]))
        sols[pred] = nls.solve(
            prob, nls.HomotopySweep(inner=inner, predictor=pred))
        assert bool(sols[pred].success)
        np.testing.assert_allclose(float(sols[pred].u[0]), 2.0, atol=1e-6)
    assert int(sols["secant"].stats.nf) < int(sols["constant"].stats.nf)


def test_sweep_sharp_turn_bisect_then_regrow():
    """item21: the path 3·tanh(20(λ-½)) turns sharply at λ=½ and the
    residual x+2sin(x) traps oversized correctors; the sweep must bisect
    through the turn, then regrow — so with regrowth disabled
    (expand_factor=1) the run pays strictly more residual evaluations."""
    def H(u, p, lam):
        x = u - 3.0 * jnp.tanh(20.0 * (lam - 0.5))
        return x + 2.0 * jnp.sin(x)

    target = 3.0 * np.tanh(10.0)
    inner = nls.NewtonRaphson()
    sols = {}
    for ef, key in [(2.0, "grow"), (1.0, "nogrow")]:
        prob = nls.HomotopyProblem(H, jnp.array([-target]))
        sols[key] = nls.solve(
            prob, nls.HomotopySweep(inner=inner, initial_step_factor=0.25,
                                    expand_factor=ef), maxiters=100)
        assert bool(sols[key].success), key
        np.testing.assert_allclose(float(sols[key].u[0]), target, atol=1e-6)
    assert int(sols["grow"].stats.nf) < int(sols["nogrow"].stats.nf)


def test_kantorovich_defaults_and_validation():
    """kantorovich_homotopy_tests__item1.jl constructor part."""
    alg = nls.KantorovichHomotopy()
    assert alg.predictor == "constant" and alg.predictor_order == 1
    assert alg.strict
    assert alg.qmin == pytest.approx(0.2)
    assert alg.qmax == pytest.approx(5.0)
    assert nls.KantorovichHomotopy(predictor="secant").predictor_order == 2
    assert nls.KantorovichHomotopy(predictor="secant",
                                   predictor_order=3).predictor_order == 3

    for bad in [dict(nsteps=0), dict(initial_step_factor=0),
                dict(min_dlam=0), dict(max_step_factor=2), dict(qmin=1),
                dict(qmax=0.9), dict(theta_min=0.6, theta_bar=0.5),
                dict(theta_bar=0.96), dict(gamma=1),
                dict(predictor="quadratic"), dict(predictor_order=0),
                dict(expand_quality=0), dict(tracking_maxiters=0),
                dict(tracking_abstol=0), dict(maxsteps=0)]:
        with pytest.raises(ValueError):
            nls.KantorovichHomotopy(**bad)


def test_kantorovich_solves_and_variants():
    """kantorovich item1 solve part: cbrt(2) with explicit/default/simple
    inners; decreasing span; Float32 non-promotion."""
    H = lambda u, p, lam: u ** 3 - (1 + lam)
    for inner in [nls.NewtonRaphson(), None, nls.SimpleNewtonRaphson()]:
        prob = nls.HomotopyProblem(H, jnp.array([1.0]))
        sol = nls.solve(prob, nls.KantorovichHomotopy(inner=inner))
        assert bool(sol.success), repr(inner)
        np.testing.assert_allclose(float(sol.u[0]), 2.0 ** (1 / 3),
                                   atol=1e-9)

    probd = nls.HomotopyProblem(lambda u, p, lam: u - (1 + lam),
                                jnp.array([2.0]), lambdaspan=(1.0, 0.0))
    sold = nls.solve(probd, nls.KantorovichHomotopy(inner=nls.NewtonRaphson()))
    assert bool(sold.success)
    np.testing.assert_allclose(float(sold.u[0]), 1.0, atol=1e-10)

    prob32 = nls.HomotopyProblem(lambda u, p, lam: u ** 2 - (1 + lam),
                                 jnp.array([1.0], jnp.float32),
                                 lambdaspan=(np.float32(0), np.float32(1)))
    sol32 = nls.solve(prob32,
                      nls.KantorovichHomotopy(inner=nls.NewtonRaphson()))
    assert bool(sol32.success)
    assert sol32.u.dtype == jnp.float32
    np.testing.assert_allclose(float(sol32.u[0]), np.sqrt(2.0), atol=2e-5)


def test_arclength_defaults_and_validation():
    """arclength_tests items 1+6+7: defaults + construction errors
    (including theta's open-interval domain and the rejected 'constant'
    predictor)."""
    alg = nls.ArcLengthContinuation()
    assert alg.inner is None
    assert alg.initial_step_factor == pytest.approx(0.1)
    assert alg.adaptive and alg.min_ds is None
    assert alg.max_step_factor == pytest.approx(1.0)
    assert alg.expand_factor == pytest.approx(2.0)
    assert alg.expand_threshold == 2
    assert alg.max_angle == pytest.approx(np.pi / 6)
    assert alg.maxsteps == 10000
    assert alg.predictor == "secant"
    assert alg.theta == pytest.approx(0.5)

    alg2 = nls.ArcLengthContinuation(inner=nls.SimpleNewtonRaphson(),
                                     initial_step_factor=0.05,
                                     max_angle=np.pi / 4, maxsteps=500,
                                     theta=0.3)
    assert alg2.initial_step_factor == pytest.approx(0.05)
    assert alg2.max_angle == pytest.approx(np.pi / 4)
    assert alg2.maxsteps == 500 and alg2.theta == pytest.approx(0.3)

    for bad in [dict(initial_step_factor=0.0), dict(initial_step_factor=1.5),
                dict(min_ds=0.0), dict(max_step_factor=0.0),
                dict(max_step_factor=2.0), dict(expand_factor=0.5),
                dict(expand_threshold=0), dict(max_angle=0.0),
                dict(max_angle=4.0), dict(maxsteps=0),
                dict(predictor="bogus"), dict(predictor="constant"),
                dict(theta=0.0), dict(theta=1.0), dict(theta=-0.5),
                dict(theta=1.5)]:
        with pytest.raises(ValueError):
            nls.ArcLengthContinuation(**bad)


def test_arclength_monotone_matches_sweep():
    """arclength item2: fold-free case reproduces the sweep's answer; a
    decreasing λspan targets the λspan[1] end."""
    prob = nls.HomotopyProblem(H_quad, jnp.array([4.0]), jnp.asarray(4.0))
    sol = nls.solve(prob, nls.ArcLengthContinuation())
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), 2.0, atol=1e-6)
    assert abs(float(sol.u[0]) ** 2 - 4.0) < 1e-8      # on the target system
    ref = nls.solve(prob, nls.HomotopySweep())
    np.testing.assert_allclose(float(sol.u[0]), float(ref.u[0]), atol=1e-6)

    prob_dec = nls.HomotopyProblem(H_quad, jnp.array([1.0]),
                                   jnp.asarray(4.0), lambdaspan=(1.0, 0.0))
    sol_dec = nls.solve(prob_dec, nls.ArcLengthContinuation())
    assert bool(sol_dec.success)
    np.testing.assert_allclose(float(sol_dec.u[0]), 4.0, atol=1e-6)


TARGET_SFOLD = 2.1038034


def H_sfold(u, p, lam):
    """u³-3u = -3+6λ: folds at λ=5/6 and 1/6 — the connected branch from
    the λ=0 lower sheet reaches λ=1 only by rounding BOTH turning points
    (λ rises, reverses, rises again: non-monotone in λ)."""
    return u ** 3 - 3.0 * u - (-3.0 + 6.0 * lam)


@pytest.mark.parametrize("predictor", ["secant", "tangent"])
def test_arclength_s_fold_connected_branch(predictor):
    """arclength items 3+6: both predictors round the double fold to the
    connected upper-sheet root (natural marching cannot: λ must reverse)."""
    prob = nls.HomotopyProblem(H_sfold, jnp.array([-TARGET_SFOLD]))
    sol = nls.solve(prob, nls.ArcLengthContinuation(predictor=predictor))
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), TARGET_SFOLD, atol=1e-4)
    # genuine target-system residual at λ=1
    assert abs(float(sol.u[0]) ** 3 - 3 * float(sol.u[0]) - 3.0) < 1e-6


def test_arclength_tangent_matches_secant_and_theta():
    """arclength item7: tangent and secant land on the same root; a
    non-default theta still rounds the fold."""
    prob = nls.HomotopyProblem(H_sfold, jnp.array([-TARGET_SFOLD]))
    u_t = float(nls.solve(
        prob, nls.ArcLengthContinuation(predictor="tangent")).u[0])
    u_s = float(nls.solve(
        prob, nls.ArcLengthContinuation(predictor="secant")).u[0])
    np.testing.assert_allclose(u_t, u_s, atol=1e-4)
    sol_th = nls.solve(
        prob, nls.ArcLengthContinuation(predictor="tangent", theta=0.8))
    assert bool(sol_th.success)
    np.testing.assert_allclose(float(sol_th.u[0]), TARGET_SFOLD, atol=1e-4)


def test_arclength_tangent_2d_slaved_component():
    """arclength item6 (2D): u₂ = u₁² slaved to the folding u₁ — the
    tangent must live in the augmented (n+1)-dim null space; staying on
    the curve (no branch jump) proves it."""
    def H2(u, p, lam):
        return jnp.array([u[0] ** 3 - 3 * u[0] - (-3 + 6 * lam),
                          u[1] - u[0] ** 2])

    prob = nls.HomotopyProblem(
        H2, jnp.array([-TARGET_SFOLD, TARGET_SFOLD ** 2]))
    sol = nls.solve(prob, nls.ArcLengthContinuation(predictor="tangent"))
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.u[0]), TARGET_SFOLD, atol=1e-4)
    np.testing.assert_allclose(float(sol.u[1]), float(sol.u[0]) ** 2,
                               atol=1e-6)


def test_arclength_float32_and_multidim():
    """arclength item4: Float32 non-promotion; n=2 system tracks."""
    prob32 = nls.HomotopyProblem(H_quad, jnp.array([4.0], jnp.float32),
                                 jnp.float32(4.0),
                                 lambdaspan=(np.float32(0), np.float32(1)))
    sol32 = nls.solve(prob32, nls.ArcLengthContinuation())
    assert bool(sol32.success)
    assert sol32.u.dtype == jnp.float32
    np.testing.assert_allclose(float(sol32.u[0]), 2.0, atol=1e-4)

    def H2(u, p, lam):
        return jnp.array([
            (1 - lam) * (u[0] - 1.0) + lam * (u[0] ** 2 + u[1] ** 2 - 2.0),
            (1 - lam) * (u[1] - 1.0) + lam * (u[0] - u[1])])

    prob2 = nls.HomotopyProblem(H2, jnp.array([1.0, 1.0]))
    sol2 = nls.solve(prob2, nls.ArcLengthContinuation())
    assert bool(sol2.success)
    np.testing.assert_allclose(np.asarray(sol2.u), [1.0, 1.0], atol=1e-6)


def test_arclength_unreachable_target_fails_finite():
    """arclength item5: the circle u² + (λ-½)² = ¼ never reaches λ=2 —
    failure retcode, finite last-converged u, terminates via maxsteps;
    and maxsteps=2 cannot round the S-fold."""
    Hc = lambda u, p, lam: u ** 2 + (lam - 0.5) ** 2 - 0.25
    prob = nls.HomotopyProblem(Hc, jnp.array([0.0]), lambdaspan=(0.0, 2.0))
    sol = nls.solve(prob, nls.ArcLengthContinuation(maxsteps=200))
    assert not bool(sol.success)
    assert np.all(np.isfinite(np.asarray(sol.u)))

    probf = nls.HomotopyProblem(H_sfold, jnp.array([-TARGET_SFOLD]))
    sol_short = nls.solve(probf, nls.ArcLengthContinuation(maxsteps=2))
    assert not bool(sol_short.success)
    assert np.all(np.isfinite(np.asarray(sol_short.u)))


def test_sweep_tracking_cap_makes_rejections_cheap():
    """homotopy_effort_tests item1: on a fold the sweep must fail, and the
    interior tracking cap (default tracking_maxiters=10) keeps each
    bisection retry from burning the full inner budget."""
    H = lambda u, p, lam: u ** 2 + lam - 0.5
    prob = nls.HomotopyProblem(H, jnp.array([0.7]))
    inner = nls.NewtonRaphson()
    sols = {}
    for key, alg in [
        ("uncapped", nls.HomotopySweep(inner=inner, tracking_maxiters=None)),
        ("default", nls.HomotopySweep(inner=inner)),
        ("cap20", nls.HomotopySweep(inner=inner, tracking_maxiters=20)),
    ]:
        sols[key] = nls.solve(prob, alg)
        assert not bool(sols[key].success), key
    nf = {k: int(s.stats.nf) for k, s in sols.items()}
    assert nf["cap20"] < nf["uncapped"] / 4
    assert nf["default"] < nf["uncapped"] / 4


def test_sweep_maxsteps_cap_returns_maxiters():
    """homotopy_effort_tests item2: a creeping sweep (tiny fixed increment,
    growth disabled) exhausts maxsteps and returns MaxIters with the last
    converged finite iterate, not an endless loop."""
    H = lambda u, p, lam: u - lam
    prob = nls.HomotopyProblem(H, jnp.array([0.0]))
    sol = nls.solve(prob, nls.HomotopySweep(initial_step_factor=1e-4,
                                            expand_factor=1, maxsteps=50))
    assert int(sol.retcode) == int(nls.ReturnCode.MaxIters)
    assert not bool(sol.success)
    u = float(sol.u[0])
    assert np.isfinite(u) and 0.0 < u < 1.0

    sol_s = nls.solve(prob, nls.SimpleHomotopySweep(
        initial_step_factor=1e-4, expand_factor=1, maxsteps=50))
    assert int(sol_s.retcode) == int(nls.ReturnCode.MaxIters)
    assert 0.0 < float(sol_s.u[0]) < 1.0


def test_sweep_polyalg_inner_retention_economy():
    """homotopy_retention_tests item1: with best-subalgorithm retention the
    DEFAULT polyalgorithm inner stays within ~1.65x of a plain Newton
    inner's residual-call count on the n=50 coupled cubic (pre-retention
    it paid the full ladder every continuation step)."""
    n = 50
    c = jnp.asarray([2.0 + 0.25 * (i > 0) + 0.25 * (i < n - 1)
                     for i in range(n)])

    def H(u, p, lam):
        coup = (0.25 * jnp.roll(u, 1).at[0].set(0.0)
                + 0.25 * jnp.roll(u, -1).at[-1].set(0.0))
        return u + coup + lam * u ** 3 - c

    prob = nls.HomotopyProblem(H, jnp.ones(n))
    sol_d = nls.solve(prob, nls.HomotopySweep())
    sol_n = nls.solve(prob, nls.HomotopySweep(inner=nls.NewtonRaphson()))
    assert bool(sol_d.success) and bool(sol_n.success)
    np.testing.assert_allclose(np.asarray(sol_d.u), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol_n.u), 1.0, atol=1e-6)
    # Measured 93 vs 42 (2.2x): the winning rung is the quasi-Newton tier,
    # whose per-step nf exceeds Newton's — the guard catches the
    # pre-retention pathology (full-ladder reinit every continuation
    # step), which measures >> 3x.  (The reference's 1.65x bound is on a
    # different nf accounting.)
    assert int(sol_d.stats.nf) < 3.0 * int(sol_n.stats.nf)


def test_homotopy_cache_init_reinit_solve():
    """homotopy_sweep_tests item23: the init/reinit/solve cache interface
    works on HomotopyProblem for sweep + Kantorovich; reinit swaps
    (u0, p, abstol) and the next solve lands on the NEW problem's root at
    the tightened tolerance."""
    prob = nls.HomotopyProblem(H_quad, jnp.array([4.0]), jnp.asarray(4.0))
    algs = [nls.HomotopySweep(inner=nls.NewtonRaphson(), adaptive=False,
                              nsteps=10),
            nls.KantorovichHomotopy(inner=nls.NewtonRaphson(), nsteps=10,
                                    strict=False),
            nls.HomotopySweep(adaptive=False, nsteps=10)]
    for alg in algs:
        cache = nls.init(prob, alg, abstol=1e-3)
        assert cache.reinit(prob.u0, p=prob.p, abstol=1e-10) is cache
        sol = cache.solve()
        assert bool(sol.success)
        np.testing.assert_allclose(float(sol.u[0]), 2.0, atol=1e-10)

        # new u0/p: root moves to sqrt(9) = 3
        assert cache.reinit(jnp.array([9.0]), p=jnp.asarray(9.0),
                            abstol=1e-10) is cache
        sol = cache.solve()
        assert bool(sol.success)
        np.testing.assert_allclose(float(sol.u[0]), 3.0, atol=1e-10)
