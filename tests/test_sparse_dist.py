"""Row-partitioned general-sparse SpMV over the virtual 8-device mesh —
VERDICT r2 next#2 (the reference's PETSc distributed MatMult role,
ext/NonlinearSolvePETScExt.jl:123-142, SURVEY §2.10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.ops.sparse import CSR
from nonlinearsolve_tpu.parallel.sparse_dist import make_sharded_csr_matvec


def _mesh():
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return Mesh(np.array(devs[:8]), ("x",))


def _csr_of(A):
    n = A.shape[0]
    return CSR(jnp.asarray(A.data), np.asarray(A.indices, np.int32),
               np.asarray(A.indptr, np.int32), (n, n))


def _banded(rng, N=40):
    import scipy.sparse as sp
    n = N * N
    d = np.ones(n)
    A = sp.diags([d * 4, -d[:-1], -d[:-1], -d[:-N], -d[:-N]],
                 [0, 1, -1, N, -N], format="csr")
    A.data = A.data * (1 + 0.1 * rng.standard_normal(A.nnz))
    return A.tocsr()


def _scrambled(rng, N=40):
    A = _banded(rng, N)
    n = A.shape[0]
    sg = rng.permutation(n)
    return A[np.ix_(sg, sg)].tocsr()


class TestShardedMatvec:
    @pytest.mark.parametrize("pattern,want_mode", [
        ("banded", "halo"), ("scrambled", "allgather")])
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_matches_scipy(self, pattern, want_mode, use_pallas):
        mesh = _mesh()
        rng = np.random.default_rng(0)
        A = _banded(rng) if pattern == "banded" else _scrambled(rng)
        mv = make_sharded_csr_matvec(_csr_of(A), mesh, "x",
                                     use_pallas=use_pallas)
        assert mv.plan.mode == want_mode
        x = jnp.asarray(rng.standard_normal(A.shape[0]))
        y = jax.jit(mv)(x)
        np.testing.assert_allclose(np.asarray(y), A @ np.asarray(x),
                                   rtol=1e-12, atol=1e-12)

    def test_nondivisible_rows(self):
        mesh = _mesh()
        rng = np.random.default_rng(1)
        A = _banded(rng)
        n = A.shape[0] - 37
        A = A[:n, :n].tocsr()
        mv = make_sharded_csr_matvec(_csr_of(A), mesh, "x")
        x = jnp.asarray(rng.standard_normal(n))
        np.testing.assert_allclose(np.asarray(mv(x)), A @ np.asarray(x),
                                   rtol=1e-12, atol=1e-12)

    def test_fresh_data_same_plan(self):
        """Newton refreshes Jacobian values on a fixed pattern: matvec
        accepts traced replacement data without replanning."""
        mesh = _mesh()
        rng = np.random.default_rng(2)
        A = _scrambled(rng, N=24)
        csr = _csr_of(A)
        mv = make_sharded_csr_matvec(csr, mesh, "x")
        x = jnp.asarray(rng.standard_normal(A.shape[0]))
        d2 = jnp.asarray(A.data * 2.0)

        y = jax.jit(lambda xx, dd: mv(xx, data=dd))(x, d2)
        np.testing.assert_allclose(np.asarray(y), 2.0 * (A @ np.asarray(x)),
                                   rtol=1e-12, atol=1e-12)


class TestShardedNewtonKrylov:
    def test_row_sharded_newton_matches_single_device(self):
        """f(u) = A u + 0.1 u^3 - b with A scrambled (allgather path):
        the row-sharded Newton-GMRES root must match the single-device
        solve at 1e-6 (the VERDICT done-bar)."""
        mesh = _mesh()
        rng = np.random.default_rng(3)
        A = _scrambled(rng, N=24)
        n = A.shape[0]
        csr = _csr_of(A)
        b = jnp.asarray(rng.standard_normal(n))
        mv = make_sharded_csr_matvec(csr, mesh, "x")

        def f_dist(u, p):
            return mv(u) + 0.1 * u ** 3 - b

        def jvp_dist(v, u, p):
            return mv(v) + 0.3 * u ** 2 * v

        def f_single(u, p):
            return csr.matvec_xla(u) + 0.1 * u ** 3 - b

        def jvp_single(v, u, p):
            return csr.matvec_xla(v) + 0.3 * u ** 2 * v

        alg = nls.NewtonRaphson(
            linsolve=nls.LinearSolver(method="gmres", restart=30,
                                      krylov_maxiter=400))
        prob_d = nls.NonlinearProblem(
            nls.NonlinearFunction(f=f_dist, jvp=jvp_dist), jnp.zeros(n))
        prob_s = nls.NonlinearProblem(
            nls.NonlinearFunction(f=f_single, jvp=jvp_single), jnp.zeros(n))
        sol_d = nls.solve(prob_d, alg, abstol=1e-10, maxiters=50)
        sol_s = nls.solve(prob_s, alg, abstol=1e-10, maxiters=50)
        assert bool(sol_d.success) and bool(sol_s.success)
        du = float(jnp.max(jnp.abs(sol_d.u - sol_s.u)))
        assert du <= 1e-6, du
        resid = float(jnp.max(jnp.abs(
            np.asarray(A @ np.asarray(sol_d.u))
            + 0.1 * np.asarray(sol_d.u) ** 3 - np.asarray(b))))
        assert resid <= 1e-8

    def test_banded_halo_newton(self):
        """Same bar on the halo-exchange path (RCM-banded pattern)."""
        mesh = _mesh()
        rng = np.random.default_rng(4)
        A = _banded(rng, N=24)
        n = A.shape[0]
        csr = _csr_of(A)
        b = jnp.asarray(rng.standard_normal(n))
        mv = make_sharded_csr_matvec(csr, mesh, "x")
        assert mv.plan.mode == "halo"

        def f(u, p):
            return mv(u) + 0.1 * u ** 3 - b

        def jvp(v, u, p):
            return mv(v) + 0.3 * u ** 2 * v

        alg = nls.NewtonRaphson(
            linsolve=nls.LinearSolver(method="gmres", restart=30,
                                      krylov_maxiter=400))
        prob = nls.NonlinearProblem(
            nls.NonlinearFunction(f=f, jvp=jvp), jnp.zeros(n))
        sol = nls.solve(prob, alg, abstol=1e-10, maxiters=50)
        assert bool(sol.success)
        resid = np.abs(A @ np.asarray(sol.u)
                       + 0.1 * np.asarray(sol.u) ** 3
                       - np.asarray(b)).max()
        assert resid <= 1e-8


class TestMultiHopHalo:
    def test_wide_band_multi_hop(self):
        """Bandwidth ~1.5 chunks: the halo spans TWO neighbor chunks per
        side — multi-hop ppermute (r3), not all_gather."""
        import scipy.sparse as sp
        mesh = _mesh()
        rng = np.random.default_rng(7)
        n = 1024                          # chunk = 128 on the 8-mesh
        bw = 200                          # > chunk, < 2*chunk
        d = np.ones(n)
        A = sp.diags([d * 4, -d[:-1], -d[:-1], -d[:-bw], -d[:-bw]],
                     [0, 1, -1, bw, -bw], format="csr")
        A.data = A.data * (1 + 0.1 * rng.standard_normal(A.nnz))
        mv = make_sharded_csr_matvec(_csr_of(A), mesh, "x")
        assert mv.plan.mode == "halo"
        assert mv.plan.hl > mv.plan.chunk     # genuinely multi-hop
        x = jnp.asarray(rng.standard_normal(n))
        y = jax.jit(mv)(x)
        np.testing.assert_allclose(np.asarray(y), A @ np.asarray(x),
                                   rtol=1e-12, atol=1e-12)

    def test_newton_through_multi_hop(self):
        import scipy.sparse as sp
        mesh = _mesh()
        rng = np.random.default_rng(8)
        n = 1024
        bw = 200
        d = np.ones(n)
        A = sp.diags([d * 4, -d[:-1], -d[:-1], -d[:-bw], -d[:-bw]],
                     [0, 1, -1, bw, -bw], format="csr")
        A.data = A.data * (1 + 0.1 * rng.standard_normal(A.nnz))
        csr = _csr_of(A)
        b = jnp.asarray(rng.standard_normal(n))
        mv = make_sharded_csr_matvec(csr, mesh, "x")

        prob = nls.NonlinearProblem(
            nls.NonlinearFunction(
                f=lambda u, p: mv(u) + 0.1 * u ** 3 - b,
                jvp=lambda v, u, p: mv(v) + 0.3 * u ** 2 * v),
            jnp.zeros(n))
        sol = nls.solve(prob, nls.NewtonRaphson(
            linsolve=nls.LinearSolver(method="gmres", restart=30,
                                      krylov_maxiter=600)),
            abstol=1e-10, maxiters=50)
        assert bool(sol.success)
        resid = np.abs(A @ np.asarray(sol.u)
                       + 0.1 * np.asarray(sol.u) ** 3 - np.asarray(b)).max()
        assert resid <= 1e-8


class TestShardedPallasEndToEnd:
    def test_newton_through_sharded_pallas_halo(self):
        """VERDICT r3 next#3: Newton-GMRES driven end-to-end through
        make_sharded_csr_matvec(use_pallas=True) — the Pallas kernel (in
        interpret mode on the CPU mesh) inside the shard_map program, ring
        halos on, matching the single-device root at 1e-6."""
        mesh = _mesh()
        rng = np.random.default_rng(11)
        A = _banded(rng, N=24)
        n = A.shape[0]
        csr = _csr_of(A)
        b = jnp.asarray(rng.standard_normal(n))
        mv = make_sharded_csr_matvec(csr, mesh, "x", use_pallas=True)
        assert mv.tier == "pallas" and mv.plan.mode == "halo"

        alg = nls.NewtonRaphson(
            linsolve=nls.LinearSolver(method="gmres", restart=30,
                                      krylov_maxiter=400))
        prob = nls.NonlinearProblem(
            nls.NonlinearFunction(
                f=lambda u, p: mv(u) + 0.1 * u ** 3 - b,
                jvp=lambda v, u, p: mv(v) + 0.3 * u ** 2 * v),
            jnp.zeros(n))
        sol = nls.solve(prob, alg, abstol=1e-10, maxiters=50)
        assert bool(sol.success)
        prob_s = nls.NonlinearProblem(
            nls.NonlinearFunction(
                f=lambda u, p: csr.matvec_xla(u) + 0.1 * u ** 3 - b,
                jvp=lambda v, u, p: csr.matvec_xla(v) + 0.3 * u ** 2 * v),
            jnp.zeros(n))
        sol_s = nls.solve(prob_s, alg, abstol=1e-10, maxiters=50)
        du = float(jnp.max(jnp.abs(sol.u - sol_s.u)))
        assert du <= 1e-6, du


class TestCommunicationOptimality:
    """VERDICT r3 next#8: pin the collective structure of the compiled
    sharded matvec on HLO text — the premise of the >=80% weak-scaling
    story, checkable without multi-chip hardware."""

    def test_banded_halo_has_permute_no_allgather(self):
        mesh = _mesh()
        rng = np.random.default_rng(12)
        A = _banded(rng, N=24)
        csr = _csr_of(A)
        x = jnp.asarray(rng.standard_normal(A.shape[0]))
        for use_pallas in (False, True):
            mv = make_sharded_csr_matvec(csr, mesh, "x",
                                         use_pallas=use_pallas)
            assert mv.plan.mode == "halo"
            txt = jax.jit(mv).lower(x).compile().as_text()
            assert "collective-permute" in txt
            assert "all-gather" not in txt

    def test_scrambled_allgather_is_x_only(self):
        import re
        mesh = _mesh()
        rng = np.random.default_rng(13)
        A = _scrambled(rng, N=24)
        n = A.shape[0]
        csr = _csr_of(A)
        mv = make_sharded_csr_matvec(csr, mesh, "x")
        assert mv.plan.mode == "allgather"
        x = jnp.asarray(rng.standard_normal(n))
        txt = jax.jit(mv).lower(x).compile().as_text()
        ag = [l for l in txt.splitlines() if "all-gather(" in l]
        assert ag, "expected exactly the x assembly all_gather"
        for line in ag:
            shapes = [int(s.split(",")[0]) if "," not in s else
                      int(np.prod([int(t) for t in s.split(",")]))
                      for s in re.findall(r"f\d+\[([0-9,]+)\]", line)]
            # gathered operands are x-sized (<= padded n), never nnz-sized
            assert shapes and max(shapes) <= mv.plan.n_shards * mv.plan.chunk
            assert max(shapes) < A.nnz
