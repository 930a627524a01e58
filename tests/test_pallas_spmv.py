"""General Pallas SpMV/SpMM kernels (ops/pallas_spmv.py).

The VERDICT-r01 acceptance patterns: an RCM-scrambled Bratu Jacobian and a
random 8-colors (<= 8 nnz/row) pattern must run GMRES through the Pallas
kernel.  CPU CI runs the kernels in interpret mode (identical lowering
semantics); the real-chip throughput claim lives in the bench and
tests/test_tpu_conformance.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonlinearsolve_tpu.models import bratu
from nonlinearsolve_tpu.ops import pallas_spmv as ps
from nonlinearsolve_tpu.ops.krylov import gmres
from nonlinearsolve_tpu.ops.sparse import BSR, CSR


def _random_csr(rng, n, m, max_per_row):
    rows, cols = [], []
    for i in range(n):
        k = int(rng.integers(1, max_per_row + 1))
        cs = rng.choice(m, size=k, replace=False)
        rows += [i] * k
        cols += list(cs)
    data = rng.standard_normal(len(rows))
    return CSR.from_pattern(np.array(rows), np.array(cols), (n, m),
                            data=jnp.asarray(data))


@pytest.mark.parametrize("n,m,w", [(300, 300, 8), (3000, 2500, 8),
                                   (1025, 1025, 3), (8, 8, 2)])
def test_ell_spmv_matches_segment_sum(n, m, w):
    rng = np.random.default_rng(n)
    A = _random_csr(rng, n, m, w)
    x = jnp.asarray(rng.standard_normal(m))
    plan = ps.ell_plan_for(A.indptr, A.indices, n, m)
    y = ps.ell_spmv_pallas(plan, A.data, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(A.matvec_xla(x)),
                               rtol=1e-12, atol=1e-12)


def test_plan_cached_by_pattern():
    rng = np.random.default_rng(0)
    A = _random_csr(rng, 64, 64, 4)
    p1 = ps.ell_plan_for(A.indptr, A.indices, 64, 64)
    p2 = ps.ell_plan_for(A.indptr.copy(), A.indices.copy(), 64, 64)
    assert p1 is p2


def test_window_plan_is_tight_for_banded():
    """A banded pattern must get a small window (the whole point of the
    windowed layout): bandwidth 40 -> W stays at the 8-row minimum."""
    n = 4096
    rows, cols = [], []
    for i in range(n):
        for j in range(max(0, i - 20), min(n, i + 21), 7):
            rows.append(i)
            cols.append(j)
    A = CSR.from_pattern(np.array(rows), np.array(cols), (n, n))
    plan = ps.ell_plan_for(A.indptr, A.indices, n, n)
    assert plan.W <= 16
    assert plan.supported


def test_unsupported_patterns_fall_back(monkeypatch):
    # fully random at n far beyond the resident window cap, no band
    # structure: since r4 this routes through the two-pass SCATTER tier
    # instead of falling off the Pallas surface entirely.
    rng = np.random.default_rng(1)
    n = ps.MAX_WINDOW_ROWS * ps.LANES * 2
    w = 8
    cols = rng.integers(0, n, size=(256, w))
    cols.sort(axis=1)
    rows = np.repeat(np.arange(256), w)
    A = CSR.from_pattern(rows, cols.reshape(-1), (256, n))
    assert ps.pallas_spmv_supported(A)
    tier, *_ = ps.select_spmv_plan(A.indptr, A.indices, *A.shape)
    assert tier == "scatter"
    x = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(np.asarray(A.matvec(x)),
                               np.asarray(A.matvec_xla(x)), atol=1e-10)

    # a single column denser than the product-vector envelope cannot be
    # column-split: the scatter plan itself refuses (cap shrunk so the
    # test stays small) — the dispatch-level segment_sum fallback for
    # tier None is covered by CSR.matvec's supported() gate.
    import nonlinearsolve_tpu.ops.pallas_spmv_scatter as sc
    monkeypatch.setattr(ps, "MAX_X_ELEMS_VMEM", 256)
    rows_d = np.arange(2048)
    cols_d = np.zeros(2048, np.int64)
    indptr_d = np.arange(2049)
    plan = sc.ScatterPlan(indptr_d, cols_d, 2048, 2048)
    assert not plan.supported
    sc._SCATTER_PLAN_CACHE.clear()


def test_sparse_long_range_rows_now_streamed():
    # The r3 example of an unsupported pattern — a few rows touching
    # columns across a huge range — is exactly what the streamed band
    # tier (r4) covers: each distinct offset is its own band/window
    # group.  Must be supported AND exact now.
    rng = np.random.default_rng(1)
    n = ps.MAX_WINDOW_ROWS * ps.LANES * 2
    rows = np.arange(4)
    cols = np.array([0, n - 1, n // 2, n // 3])
    A = CSR.from_pattern(np.repeat(rows, 1), cols, (4, n))
    assert ps.pallas_spmv_supported(A)
    x = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(
        np.asarray(ps.csr_spmv_pallas(A, x, interpret=True)),
        np.asarray(A.matvec_xla(x)), rtol=1e-12, atol=1e-12)


def _scrambled_bratu_csr(N=32, seed=7):
    """Bratu Jacobian pattern under a random symmetric permutation — the
    'general sparse' acceptance pattern (no banded structure left)."""
    patt = bratu.sparsity_pattern(N)
    n = patt.shape[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    rows = np.repeat(np.arange(n), np.diff(patt.indptr))
    cols = np.asarray(patt.indices)
    vals = rng.standard_normal(len(cols)) * 0.1
    # strengthen the diagonal so GMRES converges without preconditioning
    vals = np.where(perm[rows] == perm[cols], 4.0 + vals, vals)
    return CSR.from_pattern(perm[rows], perm[cols], (n, n),
                            data=jnp.asarray(vals))


def test_gmres_through_pallas_kernel_scrambled_bratu():
    A = _scrambled_bratu_csr()
    n = A.shape[0]
    plan = ps.ell_plan_for(A.indptr, A.indices, n, n)
    assert plan.supported
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n))

    mv = lambda v: ps.ell_spmv_pallas(plan, A.data, v, interpret=True)
    res = gmres(mv, b, restart=30, maxiter=200, rtol=1e-10)
    resid = float(jnp.linalg.norm(A.matvec_xla(res.x) - b))
    assert resid < 1e-8 * float(jnp.linalg.norm(b))


def test_gmres_through_pallas_kernel_random_8color():
    """Random pattern with <= 8 nnz/row (an 8-colors sparse-AD Jacobian
    shape), diagonally dominant."""
    rng = np.random.default_rng(11)
    n = 2048
    A = _random_csr(rng, n, n, 7)
    # add a dominant diagonal
    rows = np.concatenate([A.row_ids, np.arange(n)])
    cols = np.concatenate([A.indices, np.arange(n)])
    vals = np.concatenate([0.05 * np.asarray(A.data), np.full(n, 3.0)])
    A = CSR.from_pattern(rows, cols, (n, n), data=jnp.asarray(vals))
    plan = ps.ell_plan_for(A.indptr, A.indices, n, n)
    assert plan.supported
    b = jnp.asarray(rng.standard_normal(n))
    mv = lambda v: ps.ell_spmv_pallas(plan, A.data, v, interpret=True)
    res = gmres(mv, b, restart=25, maxiter=100, rtol=1e-10)
    resid = float(jnp.linalg.norm(A.matvec_xla(res.x) - b))
    assert resid < 1e-8 * float(jnp.linalg.norm(b))


def test_bsr_spmv_and_spmm():
    rng = np.random.default_rng(5)
    b, nb = 4, 64
    dense = np.zeros((nb * b, nb * b))
    for i in range(nb):
        for j in rng.choice(nb, size=int(rng.integers(1, 5)),
                            replace=False):
            dense[i * b:(i + 1) * b, j * b:(j + 1) * b] = \
                rng.standard_normal((b, b))
    Ab = BSR.from_csr(CSR.from_dense(dense), b)
    x = jnp.asarray(rng.standard_normal(nb * b))
    np.testing.assert_allclose(
        np.asarray(ps.bsr_spmv_pallas(Ab, x, interpret=True)),
        dense @ np.asarray(x), rtol=1e-12, atol=1e-12)
    X = jnp.asarray(rng.standard_normal((nb * b, 37)))
    np.testing.assert_allclose(
        np.asarray(ps.bsr_spmm_pallas(Ab, X, interpret=True)),
        dense @ np.asarray(X), rtol=1e-12, atol=1e-12)


def test_data_refresh_reuses_plan():
    """Newton refreshes Jacobian values every step on a fixed pattern —
    with_data + matvec must hit the cached plan and stay exact."""
    rng = np.random.default_rng(9)
    A = _random_csr(rng, 500, 500, 5)
    plan1 = ps.ell_plan_for(A.indptr, A.indices, 500, 500)
    new_data = jnp.asarray(rng.standard_normal(A.nnz))
    A2 = A.with_data(new_data)
    plan2 = ps.ell_plan_for(A2.indptr, A2.indices, 500, 500)
    assert plan1 is plan2
    x = jnp.asarray(rng.standard_normal(500))
    np.testing.assert_allclose(
        np.asarray(ps.ell_spmv_pallas(plan2, A2.data, x, interpret=True)),
        np.asarray(A2.matvec_xla(x)), rtol=1e-12, atol=1e-12)


def test_jit_and_grad_through_pallas_spmv():
    """The kernel sits inside jitted Newton steps and under AD — data and
    x cotangents must flow (jvp of a linear map is the map itself)."""
    rng = np.random.default_rng(13)
    A = _random_csr(rng, 256, 256, 4)
    plan = ps.ell_plan_for(A.indptr, A.indices, 256, 256)
    x = jnp.asarray(rng.standard_normal(256))

    @jax.jit
    def loss(data, x):
        y = ps.ell_spmv_pallas(plan, data, x, interpret=True)
        return jnp.sum(y ** 2)

    g = jax.grad(loss, argnums=1)(A.data, x)
    # d/dx sum((Ax)^2) = 2 A^T A x
    expect = 2.0 * A.rmatvec(A.matvec_xla(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect),
                               rtol=1e-10, atol=1e-10)


def test_per_slot_windows_cover_periodic_pattern():
    """A PERIODIC stencil pattern at scale has wrap rows whose GROUP-level
    window spans the whole matrix; per-slot windows (r3) keep it directly
    in-envelope (one slot = 128 consecutive rows' s-th nonzero, whose
    columns are nearly co-located even on wrap rows) — this is what makes
    the 512^2 Brusselator CSR (3.1M nnz) Pallas-servable without even a
    reordering pass (VERDICT r2 weak#5/next#7)."""
    import scipy.sparse as sp
    from nonlinearsolve_tpu.models import brusselator
    N = 256
    patt = brusselator.sparsity_pattern(N)
    n = patt.shape[0]
    plan, perm, pinv, dperm = ps._plan_maybe_reordered(
        patt.indptr, patt.indices, n, n)
    assert perm is None           # raw plan fits directly
    assert plan.supported and plan.W <= 16
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal(len(patt.indices)), jnp.float32)
    csr = CSR(data, np.asarray(patt.indices, np.int32),
              np.asarray(patt.indptr, np.int32), (n, n))
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = ps.csr_spmv_pallas(csr, x, interpret=True)
    A = sp.csr_matrix((np.asarray(data, np.float64), patt.indices,
                       patt.indptr), shape=(n, n))
    err = np.abs(np.asarray(y, np.float64)
                 - A @ np.asarray(x, np.float64)).max()
    assert err < 1e-4             # f32 accumulation at 786k nnz


def test_rcm_reorder_tier_scrambled_band():
    """The transparent RCM reorder tier still serves patterns whose raw
    slot windows ARE global: a randomly symmetric-permuted band at
    n_cols > 64k (over the window cap) reorders back to banded."""
    import scipy.sparse as sp
    n = 102400                    # n_cols > MAX_WINDOW_ROWS * LANES
    d = np.ones(n)
    A = sp.diags([d * 4, -d[:-1], -d[:-1], -d[:-320], -d[:-320]],
                 [0, 1, -1, 320, -320], format="coo")
    rng = np.random.default_rng(1)
    sg = rng.permutation(n)
    # permute via COO relabeling (scipy's A[np.ix_] is minutes at this n)
    A = sp.csr_matrix((A.data, (sg[A.row], sg[A.col])), shape=(n, n))
    plan, perm, pinv, dperm = ps._plan_maybe_reordered(
        A.indptr, A.indices, n, n)
    assert perm is not None       # raw slot windows global -> reordered
    assert plan.supported
