"""NLLS classics sweep — the reference's nlls test-suite role
(test/core/nlls_tests.jl × MGH least-squares fixtures)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.models.nlls_problems import NLLS_PROBLEMS


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """Every (problem, alg) pair compiles a full engine; under pytest-xdist
    the accumulated XLA CPU executables can segfault the worker (same
    failure mode as tests/test_sensitivities_bounds.py).  Drop them
    between tests."""
    yield
    jax.clear_caches()

ALGS = [
    ("gauss_newton", nls.GaussNewton()),
    ("lm", nls.LevenbergMarquardt()),
    ("lm_nogeo", nls.LevenbergMarquardt(disable_geodesic=True)),
    ("trustregion", nls.TrustRegion()),
    ("polyalg", None),
]

# (problem, alg) pairs that legitimately do not converge from the
# canonical start (hard MGH starts; mirrors the reference's broken lists)
BROKEN = {
    ("powell_badly_scaled", "gauss_newton"),
    ("freudenstein_roth", "gauss_newton"),
    ("box_3d", "gauss_newton"),
    ("box_3d", "trustregion"),
    ("freudenstein_roth", "trustregion"),
    ("freudenstein_roth", "lm"),
    ("freudenstein_roth", "lm_nogeo"),
    ("freudenstein_roth", "polyalg"),
}


@pytest.mark.parametrize("alg_name,alg", ALGS, ids=[a for a, _ in ALGS])
@pytest.mark.parametrize("case", NLLS_PROBLEMS, ids=[c[0] for c in
                                                     NLLS_PROBLEMS])
def test_nlls_classic(case, alg_name, alg):
    name, f, u0, expected_u, expected_ssq = case
    if (name, alg_name) in BROKEN:
        pytest.skip("known-hard (problem, alg) start")
    prob = nls.NonlinearLeastSquaresProblem(f, jnp.asarray(u0))
    sol = nls.solve(prob, alg, maxiters=1000)
    ssq = float(jnp.sum(jnp.square(sol.resid)))
    assert ssq < max(1e-9, expected_ssq * 1.01 + 1e-9), \
        f"{name}/{alg_name}: ssq={ssq}"
    if expected_u is not None and expected_ssq == 0.0:
        np.testing.assert_allclose(np.asarray(sol.u), expected_u, rtol=1e-4,
                                   atol=1e-6)
