"""TPU-native sparse direct solvers (parallel cyclic reduction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.core.autodiff import JacobianPolicy
from nonlinearsolve_tpu.ops.direct_sparse import (is_tridiagonal,
                                                  solve_sparse_direct,
                                                  tridiagonal_solve_pcr)
from nonlinearsolve_tpu.ops.sparse import CSR, DIA


@pytest.mark.parametrize("n", [4, 17, 64, 257])
def test_pcr_matches_dense(n):
    rng = np.random.default_rng(n)
    d = 4.0 + rng.random(n)
    dl = rng.standard_normal(n)
    du = rng.standard_normal(n)
    A = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    b = rng.standard_normal(n)
    x = tridiagonal_solve_pcr(jnp.asarray(dl), jnp.asarray(d),
                              jnp.asarray(du), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-9, atol=1e-9)


def test_solve_sparse_direct_routing():
    n = 32
    rng = np.random.default_rng(0)
    A = (np.diag(3.0 + rng.random(n)) + np.diag(rng.random(n - 1), 1)
         + np.diag(rng.random(n - 1), -1))
    csr = CSR.from_dense(A)
    assert is_tridiagonal(csr)
    b = jnp.asarray(rng.standard_normal(n))
    x, ok = solve_sparse_direct(csr, b)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-8, atol=1e-9)


def test_newton_with_pcr_path():
    """Sparse-AD Newton on a tridiagonal problem goes through PCR (no
    densification) and converges identically."""

    def tri(x, p):
        xp = jnp.concatenate([jnp.zeros(1), x, jnp.zeros(1)])
        return ((3.0 - 2.0 * xp[1:-1]) * xp[1:-1] - xp[:-2]
                - 2.0 * xp[2:] + 1.0)

    n = 200
    prob = nls.NonlinearProblem(tri, -jnp.ones(n))
    sol = nls.solve(prob, nls.NewtonRaphson(
        autodiff=JacobianPolicy(mode="sparse")))
    assert bool(sol.success)
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-10
    dense_sol = nls.solve(prob, nls.NewtonRaphson())
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(dense_sol.u),
                               atol=1e-9)
