"""Device-side triangular application of the host-persistent sparse LU
(ops/device_lu.py).

Reference role: KLU factors AND solves on host (fine on CPU); here the
numeric refactorization stays host-side but the triangular sweeps run
on device from a level schedule, so a Newton step costs at most ONE
host callback and factor reuse (preconditioning, second solves) costs
none (VERDICT r3 next#5; /root/reference/docs/src/tutorials/large_systems.md:211-244).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from nonlinearsolve_tpu.native import get_lib
from nonlinearsolve_tpu.ops.device_lu import (DeviceLU, device_lu_for,
                                              device_lu_preconditioner)
from nonlinearsolve_tpu.ops.sparse import CSR

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native sparsetools unavailable")


def _poisson_csr(N, seed=0):
    n = N * N
    d = np.ones(n)
    A = scipy_sparse.diags(
        [4 * d, -d[:-1], -d[:-1], -d[:-N], -d[:-N]],
        [0, 1, -1, N, -N], format="csr")
    rng = np.random.default_rng(seed)
    A.data = A.data * rng.uniform(0.9, 1.1, A.nnz)
    return A


def test_solve_matches_scipy_and_refactors():
    A = _poisson_csr(16)
    n = A.shape[0]
    lu = DeviceLU(A.indptr, A.indices, n, dtype=jnp.float64)
    assert lu.supported
    b = np.random.default_rng(1).standard_normal(n)
    state = lu.refresh(jnp.asarray(A.data))
    x, ok = lu.solve(state, jnp.asarray(b))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x),
                               scipy_sparse.linalg.spsolve(A.tocsc(), b),
                               rtol=1e-10, atol=1e-12)
    # numeric-only refactorization with new values, same pattern
    A2 = A.copy()
    A2.data = A.data * np.random.default_rng(2).uniform(0.95, 1.05, A.nnz)
    x2, ok2 = lu.solve(lu.refresh(jnp.asarray(A2.data)), jnp.asarray(b))
    assert bool(ok2)
    np.testing.assert_allclose(np.asarray(x2),
                               scipy_sparse.linalg.spsolve(A2.tocsc(), b),
                               rtol=1e-10, atol=1e-12)
    assert lu.fac.n_refactor >= 1


def test_one_callback_per_refresh_zero_per_solve():
    A = _poisson_csr(12, seed=3)
    n = A.shape[0]
    lu = DeviceLU(A.indptr, A.indices, n, dtype=jnp.float64)
    assert lu.supported
    calls = {"n": 0}
    orig = lu.fac.factorize

    def counted(data):
        calls["n"] += 1
        return orig(data)

    lu.fac.factorize = counted

    @jax.jit
    def newton_like(data, b):
        st = lu.refresh(data)        # ONE callback
        x1, ok1 = lu.solve(st, b)    # device only
        x2, ok2 = lu.solve(st, 2.0 * b)
        return x1, x2, ok1 & ok2

    b = jnp.asarray(np.random.default_rng(4).standard_normal(n))
    x1, x2, ok = newton_like(jnp.asarray(A.data), b)
    jax.block_until_ready(x1)
    assert calls["n"] == 1           # refresh only — solves are free
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x2), 2.0 * np.asarray(x1),
                               rtol=1e-12)


def test_schedule_guards(monkeypatch):
    import nonlinearsolve_tpu.ops.device_lu as mod
    # with tail absorption disabled, a deep schedule must be refused
    monkeypatch.setattr(mod, "MAX_LEVELS", 2)
    monkeypatch.setattr(mod, "DENSE_TAIL_MAX_LEVEL_ROWS", 0)
    A = _poisson_csr(8)
    lu = mod.DeviceLU(A.indptr, A.indices, A.shape[0])
    assert not lu.supported          # schedule too deep -> refuse


def test_dense_tail_collapses_levels():
    A = _poisson_csr(16)
    lu = DeviceLU(A.indptr, A.indices, A.shape[0], dtype=jnp.float64)
    assert lu.supported
    assert any(s[0] == "dense" for s in lu.Lstages)
    assert any(s[0] == "dense" for s in lu.Ustages)
    # the whole point: a handful of stages, not hundreds of levels
    assert len(lu.Lstages) + len(lu.Ustages) < 40


def test_preconditioner_collapses_krylov_iterations():
    # Newton–GMRES on a mildly nonlinear Poisson system: the exact-LU
    # device preconditioner must converge the inner solves in ~1
    # iteration, and the whole solve through the PUBLIC surface.
    import nonlinearsolve_tpu as nls
    from nonlinearsolve_tpu.ops.krylov import gmres

    A = _poisson_csr(12, seed=5)
    n = A.shape[0]
    csr = CSR(jnp.asarray(A.data), np.asarray(A.indices, np.int32),
              np.asarray(A.indptr, np.int32), (n, n))
    M = device_lu_preconditioner(csr)
    assert M is not None
    b = jnp.asarray(np.random.default_rng(6).standard_normal(n))
    res_pre = gmres(csr.matvec_fn(), b, M=M, rtol=1e-10, restart=20)
    res_raw = gmres(csr.matvec_fn(), b, rtol=1e-10, restart=20)
    assert bool(res_pre.success)
    assert int(res_pre.iterations) <= 3
    assert int(res_pre.iterations) < int(res_raw.iterations)

    Aj = jnp.asarray(A.toarray())

    def f(u, p):
        return Aj @ u + 0.05 * u ** 3 - p

    proto = CSR(jnp.asarray(A.data), np.asarray(A.indices, np.int32),
                np.asarray(A.indptr, np.int32), (n, n))
    fn = nls.NonlinearFunction(f, jac_prototype=proto)
    prob = nls.NonlinearProblem(fn, jnp.zeros(n), b)
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", precond="device_lu")),
        abstol=1e-10)
    assert int(sol.retcode) == 1
    assert float(jnp.max(jnp.abs(f(sol.u, b)))) < 1e-8


def test_device_lu_for_cache():
    A = _poisson_csr(8, seed=7)
    lu1 = device_lu_for(np.asarray(A.indptr), np.asarray(A.indices),
                        A.shape[0])
    lu2 = device_lu_for(np.asarray(A.indptr), np.asarray(A.indices),
                        A.shape[0])
    assert lu1 is lu2


def test_device_lu_for_cache_keyed_by_dtype():
    # ADVICE r4 (medium): an f64 request after an f32 one on the same
    # pattern must NOT reuse the f32 plan — the cached plan's dtype
    # decides the precision of every triangular sweep.
    A = _poisson_csr(8, seed=11)
    n = A.shape[0]
    lu32 = device_lu_for(np.asarray(A.indptr), np.asarray(A.indices), n,
                         dtype=jnp.float32)
    lu64 = device_lu_for(np.asarray(A.indptr), np.asarray(A.indices), n,
                         dtype=jnp.float64)
    assert lu32 is not lu64
    assert jnp.dtype(lu64.dtype) == jnp.dtype(jnp.float64)
    b = np.random.default_rng(12).standard_normal(n)
    x, ok = lu64.solve(lu64.refresh_host(A.data), jnp.asarray(b))
    assert bool(ok)
    ref = scipy_sparse.linalg.spsolve(A.tocsc(), b)
    assert np.abs(np.asarray(x) - ref).max() / np.abs(ref).max() < 1e-12


def test_device_lu_repivot_rebases_cached_plan():
    # After a refresh detects a pivot-order change the compiled program
    # stays degraded (ok=False), but the plan cache must hand future
    # traces a REBASED plan seeded with the offending data.
    A = _poisson_csr(8, seed=13)
    n = A.shape[0]
    lu = device_lu_for(np.asarray(A.indptr), np.asarray(A.indices), n,
                       dtype=jnp.float64)
    assert lu is not None
    lu.repivoted = True
    lu._repivot_data = np.asarray(A.data, np.float64)
    lu2 = device_lu_for(np.asarray(A.indptr), np.asarray(A.indices), n,
                        dtype=jnp.float64)
    assert lu2 is not lu and lu2 is not None and lu2.supported
    # the rebased plan solves correctly with the data that triggered it
    b = np.random.default_rng(14).standard_normal(n)
    x, ok = lu2.solve(lu2.refresh_host(A.data), jnp.asarray(b))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x),
                               scipy_sparse.linalg.spsolve(A.tocsc(), b),
                               rtol=1e-10, atol=1e-12)


def test_precond_unavailable_message(capsys):
    # ADVICE r4 (low): precond='device_lu' on a dense J must say so
    # through the linear 'precond_unavailable' verbosity class instead
    # of silently degrading to the unpreconditioned solve.
    import nonlinearsolve_tpu as nls

    rng = np.random.default_rng(15)
    Ad = jnp.asarray(np.eye(6) * 4.0 + 0.1 * rng.standard_normal((6, 6)))
    b = jnp.asarray(rng.standard_normal(6))

    def f(u, p):
        return Ad @ u - p

    prob = nls.NonlinearProblem(nls.NonlinearFunction(f), jnp.zeros(6), b)
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", precond="device_lu")),
        abstol=1e-10, verbose="detailed")
    assert int(sol.retcode) == 1
    err = capsys.readouterr().err
    assert "precond_unavailable" in err and "device_lu" in err


def test_sparse_lu_device_direct_method():
    # LinearSolver(method='sparse_lu_device'): per Newton step ONE host
    # callback (the refactorization) and device-side triangular sweeps —
    # b/x never round-trip; public surface end-to-end.
    import nonlinearsolve_tpu as nls

    A = _poisson_csr(12, seed=9)
    n = A.shape[0]
    Aj = jnp.asarray(A.toarray())
    b = jnp.asarray(np.random.default_rng(10).standard_normal(n))

    def f(u, p):
        return Aj @ u + 0.05 * u ** 3 - p

    proto = CSR(jnp.asarray(A.data), np.asarray(A.indices, np.int32),
                np.asarray(A.indptr, np.int32), (n, n))
    prob = nls.NonlinearProblem(
        nls.NonlinearFunction(f, jac_prototype=proto), jnp.zeros(n), b)
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="sparse_lu_device")),
        abstol=1e-10)
    assert int(sol.retcode) == 1
    assert float(jnp.max(jnp.abs(f(sol.u, b)))) < 1e-9
