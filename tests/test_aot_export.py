"""AOT export / serving round-trips (utils/aot.py).

The reference's deployment analogue is the precompile-workload subsystem
(/root/reference/src/NonlinearSolve.jl:49-181): solves run with no compile
latency in user processes.  Here the artifact itself crosses a serialization
boundary — the deserialized solver must reproduce the in-process solve
exactly and accept fresh runtime inputs."""

import jax
import jax.numpy as jnp
import numpy as np

import nonlinearsolve_tpu as nls


def quadratic(u, p):
    return u * u - p


def _roundtrip(data):
    assert isinstance(data, (bytes, bytearray)) and len(data) > 0
    return nls.deserialize_solver(bytes(data))


def test_export_newton_roundtrip_matches_solve():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    data = nls.export_solver(prob, nls.NewtonRaphson(), abstol=1e-10)
    f = _roundtrip(data)

    sol = f(jnp.array([1.0, 1.0]), jnp.asarray(2.0))
    ref = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-10)
    np.testing.assert_array_equal(np.asarray(sol.u), np.asarray(ref.u))
    assert int(sol.retcode) == int(ref.retcode) == 1
    assert int(sol.stats.nsteps) == int(ref.stats.nsteps) > 0

    # fresh runtime inputs through the same artifact (no retrace)
    sol3 = f(jnp.array([2.0, 2.0]), jnp.asarray(3.0))
    np.testing.assert_allclose(np.asarray(sol3.u), np.sqrt(3.0), rtol=1e-10)


def test_export_default_polyalg_and_p_none():
    prob = nls.NonlinearProblem(lambda u, p: jnp.cos(u) - u,
                                jnp.array([1.0]))
    data = nls.export_solver(prob, abstol=1e-10)  # p=None -> f(u0) only
    f = _roundtrip(data)
    sol = f(jnp.array([0.1]))
    np.testing.assert_allclose(np.asarray(jnp.cos(sol.u) - sol.u), 0.0,
                               atol=1e-10)
    assert int(sol.retcode) == 1


def test_deserialized_solver_is_jittable():
    # (vmap of an exported call has no batching rule in jax.export —
    # batching is served by exporting with batch="b" instead, below)
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0]), 2.0)
    f = _roundtrip(nls.export_solver(prob, nls.NewtonRaphson(),
                                     abstol=1e-10))
    sol = jax.jit(f)(jnp.array([1.0]), jnp.asarray(5.0))
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(5.0), rtol=1e-10)


def test_export_symbolic_batch_serves_any_size():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0]), 2.0)
    f = _roundtrip(nls.export_solver(prob, nls.NewtonRaphson(),
                                     batch="b", abstol=1e-10))
    for n in (2, 7):   # one artifact, two different batch sizes
        u0s = jnp.ones((n, 1))
        ps = jnp.arange(2.0, 2.0 + n)
        sols = f(u0s, ps)
        assert sols.u.shape == (n, 1)
        np.testing.assert_allclose(np.asarray(sols.u).ravel(),
                                   np.sqrt(np.asarray(ps)), rtol=1e-10)
        assert np.all(np.asarray(sols.retcode) == 1)
