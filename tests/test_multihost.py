"""Fake-cluster test: 2 processes x 2 CPU devices running the SAME
distributed Newton-Krylov solve via jax.distributed + Gloo collectives —
the multi-host simulation the reference lacks (SURVEY §4: 'The TPU build
must do better')."""

import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """The 2-process fake cluster spikes memory on a 2-vCPU box; under
    pytest-xdist the spike on top of accumulated XLA CPU executables can
    kill the worker (same roaming crash mode as the sensitivity/NLLS
    files).  Drop the caches around each test."""
    jax.clear_caches()
    yield
    jax.clear_caches()


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed_solve_matches_single():
    worker = os.path.join(os.path.dirname(__file__), "multihost", "worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2",
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    results = []
    for out in outs:
        m = re.search(r"RESULT (\d+) retcode=(\d+) resid=([\d.e+-]+) "
                      r"fingerprint=([\d.e+-]+)", out)
        assert m, f"worker output missing RESULT line:\n{out[-2000:]}"
        results.append((int(m.group(2)), float(m.group(3)),
                        float(m.group(4))))
    # both processes converged and agree bitwise on the global solution
    assert all(r[0] == 1 for r in results), results
    assert results[0][2] == results[1][2]

    # single-process reference solve
    from nonlinearsolve_tpu.models import reaction_diffusion
    from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing
    import nonlinearsolve_tpu as nls
    prob = reaction_diffusion.make_problem(16, dtype=jnp.float32)
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=20),
        forcing=EisenstatWalkerForcing()), abstol=1e-4)
    fp_single = float(jnp.sum(sol.u * sol.u))
    np.testing.assert_allclose(results[0][2], fp_single, rtol=1e-4)


@pytest.mark.timeout(300)
def test_two_process_sharded_sparse_matches_single():
    """The row-sharded general-sparse operator (parallel/sparse_dist.py)
    across a 2-process fake cluster: ppermute halos cross the process
    boundary, both processes agree bitwise, and the root matches a
    single-process solve of the same system (the PETSc-MPI MatMult role,
    exercised multi-host — which the reference never does)."""
    worker = os.path.join(os.path.dirname(__file__), "multihost",
                          "worker_sparse.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, worker, str(i), "2",
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    results = []
    for out in outs:
        m = re.search(r"RESULT (\d+) retcode=(\d+) resid=([\d.e+-]+) "
                      r"fingerprint=([\d.e+-]+) mode=(\w+)", out)
        assert m, f"worker output missing RESULT line:\n{out[-2000:]}"
        results.append((int(m.group(2)), float(m.group(3)),
                        float(m.group(4)), m.group(5)))
    assert all(r[0] == 1 for r in results), results
    assert results[0][2] == results[1][2]          # bitwise agreement
    assert results[0][3] == "halo"                 # banded -> ring halos

    # single-process reference
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    Ng = 16
    n = Ng * Ng
    d = np.ones(n)
    A = sp.diags([d * 4, -d[:-1], -d[:-1], -d[:-Ng], -d[:-Ng]],
                 [0, 1, -1, Ng, -Ng], format="csr")
    A.data = A.data * (1 + 0.1 * rng.standard_normal(A.nnz))
    b = rng.standard_normal(n)
    import nonlinearsolve_tpu as nls
    from nonlinearsolve_tpu.ops.sparse import CSR
    # same f32 dtype as the workers (their processes run without x64)
    csr = CSR(jnp.asarray(A.data, jnp.float32),
              np.asarray(A.indices, np.int32),
              np.asarray(A.indptr, np.int32), (n, n))
    b_j = jnp.asarray(b, jnp.float32)
    prob = nls.NonlinearProblem(
        nls.NonlinearFunction(
            f=lambda u, p: csr.matvec_xla(u) + 0.1 * u ** 3 - b_j,
            jvp=lambda v, u, p: csr.matvec_xla(v) + 0.3 * u ** 2 * v),
        jnp.zeros(n, jnp.float32))
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=30,
                                  krylov_maxiter=400)),
        abstol=1e-5, maxiters=50)
    assert bool(sol.success)
    fp = float(jnp.sum(sol.u * sol.u))
    assert abs(fp - results[0][2]) / max(abs(fp), 1.0) < 1e-5
