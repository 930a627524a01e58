"""Ensemble batch solves (EnsembleProblem analogue) + checkpoint/resume of
the iterator carry (SURVEY §5.4: solver state is a pytree → orbax-ready)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls


def quadratic(u, p):
    return u * u - p


def test_solve_ensemble_over_ps():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0]), 2.0)
    ps = jnp.array([1.0, 2.0, 3.0, 4.0])
    sols = nls.solve_ensemble(prob, nls.NewtonRaphson(), ps=ps)
    np.testing.assert_allclose(np.asarray(sols.u).ravel(),
                               np.sqrt(np.asarray(ps)), rtol=1e-10)
    assert np.all(np.asarray(sols.retcode) == 1)


def test_solve_ensemble_over_u0s_and_ps():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0]), 2.0)
    u0s = jnp.array([[0.5], [1.0], [2.0]])
    ps = jnp.array([4.0, 9.0, 16.0])
    sols = nls.solve_ensemble(prob, nls.NewtonRaphson(), u0s=u0s, ps=ps)
    np.testing.assert_allclose(np.asarray(sols.u).ravel(), [2.0, 3.0, 4.0],
                               rtol=1e-10)


def test_ensemble_with_polyalg():
    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0]), 2.0)
    sols = nls.solve_ensemble(prob, ps=jnp.array([2.0, 5.0]))
    assert np.all(np.asarray(sols.retcode) == 1)


def test_checkpoint_resume_iterator(tmp_path):
    """Stop a solve mid-iteration, checkpoint the carry pytree with orbax,
    restore into a fresh cache, and finish — byte-identical trajectory."""
    import orbax.checkpoint as ocp

    prob = nls.NonlinearProblem(quadratic, jnp.array([1.0, 1.0]), 2.0)
    cache = nls.init(prob, nls.NewtonRaphson())
    cache.step(2)
    u_mid = np.asarray(cache.u)

    path = ocp.test_utils.erase_and_create_empty(str(tmp_path / "ckpt"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "carry", cache.carry)
    ckptr.wait_until_finished()

    # fresh cache, restore state, resume
    cache2 = nls.init(prob, nls.NewtonRaphson())
    restored = ckptr.restore(path / "carry", cache2.carry)
    cache2.carry = restored
    np.testing.assert_allclose(np.asarray(cache2.u), u_mid)
    sol = cache2.solve()
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.u), np.sqrt(2.0), rtol=1e-10)
    # resumed iteration count continues from the checkpoint
    assert int(sol.stats.nsteps) >= 2


def test_ensemble_problem_vmapped():
    """EnsembleProblem(prob, prob_func) + solve(trajectories=N) runs one
    vmapped solve when trajectories share the base structure."""
    base = nls.NonlinearProblem(lambda u, p: u ** 2 - p,
                                jnp.array([1.0]), 2.0)
    eprob = nls.EnsembleProblem(
        base, prob_func=lambda prob, i: prob.remake(p=jnp.asarray(i + 1.0)))
    sol = nls.solve(eprob, nls.NewtonRaphson(), trajectories=5)
    assert sol.u.shape == (5, 1)
    np.testing.assert_allclose(np.asarray(sol.u)[:, 0],
                               np.sqrt(np.arange(1.0, 6.0)), rtol=1e-10)
    assert np.all(np.asarray(sol.retcode) == 1)


def test_ensemble_problem_heterogeneous_falls_back():
    """Trajectories with different sizes solve sequentially and return a
    list of solutions."""
    base = nls.NonlinearProblem(lambda u, p: u ** 2 - p,
                                jnp.array([1.0]), 4.0)

    def pf(prob, i):
        return prob.remake(u0=jnp.ones(i + 1))

    sols = nls.solve(nls.EnsembleProblem(base, prob_func=pf),
                     nls.NewtonRaphson(), trajectories=3)
    assert isinstance(sols, list) and len(sols) == 3
    for i, s in enumerate(sols):
        assert s.u.shape == (i + 1,)
        np.testing.assert_allclose(np.asarray(s.u), 2.0, rtol=1e-10)


def test_ensemble_at_scale():
    """Kernels-in-kernels: thousands of Simple-tier solves in one vmapped
    executable (the reference's static-array GPU-kernel story, §2.6)."""
    import jax
    n_batch = 4096
    ps = jnp.linspace(0.5, 10.0, n_batch)

    def solve_one(p):
        prob = nls.NonlinearProblem(lambda u, q: u * u - q,
                                    jnp.array([1.0]), p)
        return nls.solve(prob, nls.SimpleNewtonRaphson()).u[0]

    roots = jax.jit(jax.vmap(solve_one))(ps)
    np.testing.assert_allclose(np.asarray(roots), np.sqrt(np.asarray(ps)),
                               rtol=1e-6)


def test_ensemble_sharded_over_mesh():
    """Ensemble data-parallelism: batch axis sharded over the device
    mesh (one vmapped executable, trajectories on different devices)."""
    import jax
    from jax.sharding import Mesh
    from nonlinearsolve_tpu.core.ensemble import solve_ensemble

    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    ps = jnp.linspace(1.0, 8.0, 64)
    prob = nls.NonlinearProblem(lambda u, p: u * u - p, jnp.array([1.0]), 1.0)
    sol = solve_ensemble(prob, nls.NewtonRaphson(), ps=ps, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sol.u[:, 0]),
                               np.sqrt(np.asarray(ps)), rtol=1e-8)
    assert bool(jnp.all(sol.retcode == 1))
