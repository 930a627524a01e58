"""Two-pass static-routing SpMV tier (ops/pallas_spmv_scatter).

Reference role: SuiteSparse/PETSc MatMult runs unstructured patterns at
any scale (/root/reference/ext/NonlinearSolvePETScExt.jl:123-142); this
tier is the no-column-locality Pallas path that replaces the XLA
segment_sum cliff.  All kernel runs here are interpret-mode (CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from nonlinearsolve_tpu.ops.pallas_spmv import (select_spmv_plan,
                                                spmv_roofline,
                                                spmv_tier_cost)
from nonlinearsolve_tpu.ops.pallas_spmv_scatter import (ScatterPlan,
                                                        scatter_spmv_pallas,
                                                        scatter_spmv_staged)
from nonlinearsolve_tpu.ops.sparse import CSR


def _rand_csr(n_rows, n_cols, w, seed=0, dense_rows=0, dense_w=100):
    r = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n_rows), w)
    cols = r.integers(0, n_cols, size=rows.size)
    if dense_rows:
        rows = np.concatenate(
            [rows, np.repeat(np.arange(dense_rows), dense_w)])
        cols = np.concatenate(
            [cols, r.integers(0, n_cols, size=dense_rows * dense_w)])
    A = scipy_sparse.coo_matrix(
        (r.standard_normal(rows.size), (rows, cols)),
        shape=(n_rows, n_cols)).tocsr()
    A.sum_duplicates()
    return A


def _check_forward(A, atol=1e-11):
    plan = ScatterPlan(A.indptr, A.indices, A.shape[0], A.shape[1])
    assert plan.supported
    x = np.random.default_rng(1).standard_normal(A.shape[1])
    y = scatter_spmv_pallas(plan, jnp.asarray(A.data), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), A @ x, atol=atol)
    return plan


def test_random_square():
    _check_forward(_rand_csr(500, 500, 5, seed=2))


def test_random_rectangular():
    _check_forward(_rand_csr(300, 700, 4, seed=3))


def test_dense_rows_chain_reduction():
    # rows with ~100 nonzeros exceed the 32-slot kernel cap: the R pass
    # must chain (R2 . R1).
    A = _rand_csr(400, 400, 3, seed=4, dense_rows=5)
    assert int(np.diff(A.indptr).max()) > 32
    plan = _check_forward(A)
    assert any(len(p.r_plans) >= 2 for (_c0, _c1, _s, p) in plan.parts)


def test_column_split_parts(monkeypatch):
    # Force the VMEM-resident cap low enough that the plan must split
    # into column-range parts.
    import nonlinearsolve_tpu.ops.pallas_spmv as ps
    import nonlinearsolve_tpu.ops.pallas_spmv_scatter as mod
    mod._SCATTER_PLAN_CACHE.clear()
    monkeypatch.setattr(ps, "MAX_X_ELEMS_VMEM", 2048)
    A = _rand_csr(512, 4096, 3, seed=5)
    plan = _check_forward(A)
    assert len(plan.parts) >= 2
    mod._SCATTER_PLAN_CACHE.clear()


def test_staged_matches_and_vjp():
    A = _rand_csr(600, 600, 6, seed=6)
    plan = ScatterPlan(A.indptr, A.indices, *A.shape)
    x = np.random.default_rng(2).standard_normal(A.shape[1])
    mv = scatter_spmv_staged(plan, jnp.asarray(A.data))
    np.testing.assert_allclose(np.asarray(mv(jnp.asarray(x))), A @ x,
                               atol=1e-11)

    def f(d, xx):
        return jnp.sum(jnp.sin(scatter_spmv_pallas(plan, d, xx)))

    gd, gx = jax.grad(f, argnums=(0, 1))(jnp.asarray(A.data),
                                         jnp.asarray(x))
    # reference cotangents through the segment_sum formulation
    rows = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))

    def f_ref(d, xx):
        prod = d * jnp.take(xx, jnp.asarray(A.indices))
        y = jax.ops.segment_sum(prod, jnp.asarray(rows),
                                num_segments=A.shape[0])
        return jnp.sum(jnp.sin(y))

    gd_r, gx_r = jax.grad(f_ref, argnums=(0, 1))(jnp.asarray(A.data),
                                                 jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_r),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                               atol=1e-10)


def test_tier_selection_scrambled_vs_banded():
    # A banded stencil keeps its structured tier.  Its random symmetric
    # permutation stays on the resident masked walk — the in-envelope
    # case, measured FASTER than the two-pass tier once the window walk
    # is statically unrolled (v5e: 6.7 vs 2.6 Gnnz/s) — while the
    # scatter plan still builds and carries a multi-Gnnz/s roofline.
    n, N = 4096, 64
    dg = np.ones(n)
    Ab = scipy_sparse.diags(
        [dg * 4, -dg[:-1], -dg[:-1], -dg[:-N], -dg[:-N]],
        [0, 1, -1, N, -N], format="csr")
    s = np.random.default_rng(0).permutation(n)
    Asc = Ab[np.ix_(s, s)].tocsr()
    t_band, *_ = select_spmv_plan(Ab.indptr, Ab.indices, n, n)
    t_scr, plan_scr, *_ = select_spmv_plan(Asc.indptr, Asc.indices, n, n)
    assert t_band in ("dia", "resident", "stream")   # r5: banded -> dia
    assert t_scr in ("resident", "scatter")
    plan = ScatterPlan(Asc.indptr, Asc.indices, n, n)
    assert plan.supported
    rl = spmv_roofline("scatter", plan, Asc.nnz)
    assert rl["bound"] > 1e9  # multi-Gnnz/s modeled bound
    assert spmv_tier_cost("scatter", plan) > 0


def test_csr_matvec_dispatches_scatter():
    # public CSR surface: a random pattern genuinely beyond the resident
    # window envelope (131072 columns -> W = 1024 tile-rows > 512; no
    # band structure; rectangular, so no RCM retry) routes through the
    # scatter tier and agrees with scipy on matvec AND the staged
    # matvec_fn.
    A = _rand_csr(2048, 131072, 16, seed=7)
    t, *_ = select_spmv_plan(A.indptr, A.indices, *A.shape)
    assert t == "scatter"
    csr = CSR(jnp.asarray(A.data), np.asarray(A.indices, np.int32),
              np.asarray(A.indptr, np.int32), A.shape)
    x = np.random.default_rng(3).standard_normal(A.shape[1])
    np.testing.assert_allclose(np.asarray(csr.matvec(jnp.asarray(x))),
                               A @ x, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(csr.matvec_fn()(jnp.asarray(x))), A @ x, atol=1e-11)


def test_empty_rows_and_columns():
    # rows/cols with no nonzeros, plus a fully empty leading block
    r = np.random.default_rng(8)
    rows = r.integers(100, 400, size=900)
    cols = r.integers(50, 300, size=900)
    A = scipy_sparse.coo_matrix(
        (r.standard_normal(900), (rows, cols)), shape=(512, 512)).tocsr()
    A.sum_duplicates()
    _check_forward(A)
