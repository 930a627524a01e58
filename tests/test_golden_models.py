"""Golden-value cross-validation: our solvers vs scipy on the benchmark
model problems (SURVEY §4b: golden comparisons at reference tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import optimize

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.core.autodiff import JacobianPolicy
from nonlinearsolve_tpu.models import bratu, brusselator
from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing


def _scipy_root(prob):
    from jax.flatten_util import ravel_pytree
    u0, unravel = ravel_pytree(prob.u0)
    f = prob.f.f

    def fn(x):
        return np.asarray(
            ravel_pytree(f(unravel(jnp.asarray(x)), prob.p))[0])

    res = optimize.root(fn, np.asarray(u0), method="krylov",
                        options={"fatol": 1e-10})
    assert res.success, res.message
    return res.x


def test_bratu_16_matches_scipy():
    prob = bratu.make_problem(16, with_sparsity=False)
    sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-12)
    golden = _scipy_root(prob)
    np.testing.assert_allclose(np.asarray(sol.u).ravel(), golden, atol=1e-7)


def test_bratu_sparse_matches_dense():
    prob_s = bratu.make_problem(24, with_sparsity=True)
    prob_d = bratu.make_problem(24, with_sparsity=False)
    sol_s = nls.solve(prob_s, nls.NewtonRaphson(
        autodiff=JacobianPolicy(mode="sparse")), abstol=1e-12)
    sol_d = nls.solve(prob_d, nls.NewtonRaphson(), abstol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_s.u), np.asarray(sol_d.u),
                               atol=1e-10)


def test_brusselator_16_all_paths_agree():
    """Dense NR, sparse-AD NR, and matrix-free Newton-GMRES land on the same
    steady state (the reference's large-systems tutorial ladder)."""
    from nonlinearsolve_tpu.ops.preconditioners import (
        fft_poisson_preconditioner)
    N = 16
    dense = nls.solve(brusselator.make_problem(N), nls.NewtonRaphson(),
                      abstol=1e-10)
    sparse = nls.solve(brusselator.make_problem(N, with_sparsity=True),
                       nls.NewtonRaphson(), abstol=1e-10)
    pm = fft_poisson_preconditioner((N, N), alpha=10.0, h=1.0 / (N - 1),
                                    shift=3.0, n_components=2)
    krylov = nls.solve(
        brusselator.make_problem(N),
        nls.NewtonRaphson(linsolve=nls.LinearSolver(
            method="gmres", restart=30, precond_fn=pm)), abstol=1e-10)
    assert bool(dense.success) and bool(sparse.success) and \
        bool(krylov.success)
    np.testing.assert_allclose(np.asarray(sparse.u), np.asarray(dense.u),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(krylov.u), np.asarray(dense.u),
                               atol=1e-6)


def test_brusselator_matches_scipy():
    prob = brusselator.make_problem(12)
    sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-12)
    golden = _scipy_root(prob)
    np.testing.assert_allclose(np.asarray(sol.u).ravel(), golden, atol=1e-6)


def test_bratu_fold_sweep_stalls():
    """Bratu's λ-fold at λ* ≈ 6.808: natural continuation to λ=8 must fail
    short of the fold (classic benchmark behavior)."""
    N = 8

    def H(u, p, lam):
        return bratu.bratu_2d(u, lam)

    prob = nls.HomotopyProblem(H, jnp.zeros((N, N)), None,
                               lambdaspan=(0.5, 8.0))
    sweep = nls.solve(prob, nls.HomotopySweep(inner=nls.NewtonRaphson(),
                                              maxsteps=200))
    # the sweep cannot reach λ=8 (no solution exists past the fold)
    assert not bool(sweep.success)
    lam_last = float(sweep.original)
    assert 5.0 < lam_last < 8.0   # stalled near the fold


def test_snes_ex2_dense_vs_sparse():
    """PETSc SNES ex2 (reference docs/src/tutorials/snes_ex2.md): the
    dense-AD and sparse-AD (tridiagonal -> PCR direct) Newton solves
    agree to floating-point, like the tutorial's NR-vs-SNES check."""
    from nonlinearsolve_tpu.models import snes_ex2
    sol_d = nls.solve(snes_ex2.make_problem(128), nls.NewtonRaphson(),
                      abstol=1e-8)
    sol_s = nls.solve(snes_ex2.make_problem(128, sparse=True),
                      nls.NewtonRaphson(
                          autodiff=nls.JacobianPolicy(mode="sparse")),
                      abstol=1e-8)
    assert bool(sol_d.success) and bool(sol_s.success)
    np.testing.assert_allclose(np.asarray(sol_d.u), np.asarray(sol_s.u),
                               atol=1e-8)
    # boundary conditions enforced exactly
    assert abs(float(sol_d.u[0])) < 1e-10
    np.testing.assert_allclose(float(sol_d.u[-1]), 1.0, atol=1e-10)
    # scipy cross-validation
    from scipy.optimize import root as scipy_root
    import nonlinearsolve_tpu.models.snes_ex2 as m
    r = scipy_root(lambda x: np.asarray(m.residual(jnp.asarray(x))),
                   np.full(128, 0.5), tol=1e-10)
    np.testing.assert_allclose(np.asarray(sol_d.u), r.x, atol=1e-6)
