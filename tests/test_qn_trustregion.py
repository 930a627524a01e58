"""Quasi-Newton × trust-region globalization combinations.

The reference's QuasiNewtonAlgorithm accepts a ``trustregion`` policy with a
``supports_trust_region`` descent (Dogleg)
(/root/reference/lib/NonlinearSolveQuasiNewton/src/solve.jl:237-260,
globalization branch :419-440); this exercises the TPU engine's equivalent:
direct-stored approximate Jacobians + Dogleg + GenericTrustRegionScheme."""

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.solvers.quasi_newton import (
    IllConditionedJacobianReset, NoChangeInStateReset, QuasiNewtonAlgorithm)


def rosenbrock_like(u, p):
    return jnp.array([10.0 * (u[1] - u[0] ** 2), 1.0 - u[0]])


def quadratic(u, p):
    return u ** 2 - p


TR_ALGS = [
    QuasiNewtonAlgorithm(update_rule="good_broyden", structure="full",
                         trustregion=nls.GenericTrustRegionScheme(),
                         name="BroydenTR"),
    QuasiNewtonAlgorithm(update_rule="good_broyden", structure="full",
                         init_jacobian="true_jacobian",
                         trustregion=nls.GenericTrustRegionScheme(),
                         name="BroydenTR-trueJ"),
    # Under TR globalization, rejected steps keep fu frozen, so the
    # dfu-stagnation branch of NoChangeInStateReset false-fires on every
    # rejection streak; the du-only variant pairs correctly with TR.
    QuasiNewtonAlgorithm(update_rule="klement", structure="full",
                         init_jacobian="true_jacobian",
                         reinit_rule=NoChangeInStateReset(check_dfu=False),
                         trustregion=nls.GenericTrustRegionScheme(),
                         name="KlementTR"),
]


@pytest.mark.parametrize("alg", TR_ALGS, ids=lambda a: a.name)
def test_qn_tr_quadratic(alg):
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, alg)
    assert bool(sol.success), int(sol.retcode)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-8)


@pytest.mark.parametrize("alg", TR_ALGS, ids=lambda a: a.name)
def test_qn_tr_rosenbrock(alg):
    prob = nls.NonlinearProblem(rosenbrock_like, jnp.array([-1.2, 1.0]))
    # KlementTR needs ~240 accepted+rejected steps along the valley (the
    # TR-aware reset — reinit J after tr_reset_rejects consecutive
    # rejections — brought this down from ~620)
    sol = nls.solve(prob, alg, maxiters=1000)
    assert bool(sol.success), int(sol.retcode)
    np.testing.assert_allclose(np.asarray(sol.u), [1.0, 1.0], atol=1e-7)


@pytest.mark.parametrize("scheme", ["simple", "nlsolve", "fan"])
def test_qn_tr_radius_schemes(scheme):
    alg = QuasiNewtonAlgorithm(
        update_rule="klement", structure="full",
        init_jacobian="true_jacobian",
        trustregion=nls.GenericTrustRegionScheme(method=scheme))
    prob = nls.NonlinearProblem(lambda u, p: jnp.tanh(u) - 0.5 * u - 0.1,
                                jnp.array([2.0, 2.0]))
    sol = nls.solve(prob, alg, maxiters=300)
    assert bool(sol.success), (scheme, int(sol.retcode))
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-8


def test_qn_tr_reject_streak_resets_jacobian():
    """TR-aware reset: 3 consecutive rejections reinitialize J.  On the
    Rosenbrock valley this cuts KlementTR from ~620 steps (radius
    shrinking alone) to ~240, with fewer jacobian rebuilds."""
    base = dict(update_rule="klement", structure="full",
                init_jacobian="true_jacobian",
                reinit_rule=NoChangeInStateReset(check_dfu=False),
                trustregion=nls.GenericTrustRegionScheme())
    prob = nls.NonlinearProblem(rosenbrock_like, jnp.array([-1.2, 1.0]))
    fast = nls.solve(prob, QuasiNewtonAlgorithm(**base), maxiters=2000)
    slow = nls.solve(prob, QuasiNewtonAlgorithm(tr_reset_rejects=10**6,
                                                **base), maxiters=2000)
    assert bool(fast.success)
    assert int(fast.stats.nsteps) < 350
    assert int(fast.stats.nsteps) < int(slow.stats.nsteps) // 2
    assert int(fast.stats.njacs) < int(slow.stats.njacs)


def test_qn_tr_rejection_keeps_iterate_monotone():
    """The TR accept gate must never commit an uphill step (ratio below
    step_threshold ⇒ iterate unchanged)."""
    alg = QuasiNewtonAlgorithm(update_rule="good_broyden", structure="full",
                               trustregion=nls.GenericTrustRegionScheme())
    prob = nls.NonlinearProblem(
        lambda u, p: jnp.array([jnp.exp(u[0]) - 2.0, u[1] ** 3 - u[0]]),
        jnp.array([3.0, 2.0]))
    sol = nls.solve(prob, alg, maxiters=500, store_trace=True)
    assert bool(sol.success), int(sol.retcode)
    tr = sol.trace
    n = int(tr.n)
    fn = np.asarray(tr.fnorm[:n])
    # overall decrease (individual rejected steps hold fnorm flat)
    assert fn[-1] < fn[0]


def test_qn_tr_invalid_combinations():
    with pytest.raises(ValueError, match="linesearch and trustregion"):
        QuasiNewtonAlgorithm(trustregion=nls.GenericTrustRegionScheme(),
                             linesearch=nls.BackTracking())
    with pytest.raises(ValueError, match="full"):
        QuasiNewtonAlgorithm(structure="diagonal",
                             trustregion=nls.GenericTrustRegionScheme())
    with pytest.raises(ValueError, match="bad_broyden"):
        QuasiNewtonAlgorithm(update_rule="bad_broyden",
                             trustregion=nls.GenericTrustRegionScheme())


def test_qn_tr_shrink_threshold_exceeded():
    """A hopeless problem with a tiny shrink cap must exit with
    ShrinkThresholdExceeded (the reference's max_shrink_times gate,
    solve.jl:437-440)."""
    alg = QuasiNewtonAlgorithm(
        update_rule="good_broyden", structure="full",
        trustregion=nls.GenericTrustRegionScheme(), max_shrink_times=3)
    # no real root; every step is eventually rejected and the radius shrinks
    prob = nls.NonlinearProblem(lambda u, p: u ** 2 + 1.0,
                                jnp.array([1.0]))
    sol = nls.solve(prob, alg, maxiters=200)
    assert int(sol.retcode) in (int(nls.ReturnCode.ShrinkThresholdExceeded),
                                int(nls.ReturnCode.Stalled))
    assert not bool(sol.success)
