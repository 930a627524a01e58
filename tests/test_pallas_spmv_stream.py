"""Streamed band-ELL SpMV tier (ops/pallas_spmv_stream.py).

Interpret-mode correctness vs scipy on stencil/banded/periodic/rect
patterns, tier selection (resident in-envelope, stream beyond, segsum for
no-structure), AD through the custom VJP, and the staged closure.
Reference role: PETSc/SuiteSparse MatMult at any scale
(/root/reference/ext/NonlinearSolvePETScExt.jl:123-142, SURVEY §2.9-2.10).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

scipy_sparse = pytest.importorskip("scipy.sparse")
sp = scipy_sparse

from nonlinearsolve_tpu.models import brusselator  # noqa: E402
from nonlinearsolve_tpu.ops.pallas_spmv import select_spmv_plan  # noqa: E402
from nonlinearsolve_tpu.ops.pallas_spmv_stream import (  # noqa: E402
    BandPlan, band_plan_for, band_spmv_pallas, band_spmv_staged)

RNG = np.random.default_rng(42)


def _rand_csr(A):
    A = A.tocsr()
    A.sum_duplicates()
    A.data = RNG.standard_normal(A.nnz)
    return A


def _check_exact(A):
    A = _rand_csr(A)
    n, m = A.shape
    plan = BandPlan(np.asarray(A.indptr, np.int64),
                    np.asarray(A.indices, np.int64), n, m)
    assert plan.ok
    x = RNG.standard_normal(m)
    y = band_spmv_pallas(plan, jnp.asarray(A.data), jnp.asarray(x),
                         interpret=True)
    ref = A @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=0, atol=0)
    return plan


def test_tridiagonal_exact():
    n = 3000
    A = sp.diags([np.ones(n - 1), np.ones(n), np.ones(n - 1)], [-1, 0, 1])
    plan = _check_exact(A)
    assert plan.w == 3 and len(plan.bands) == 1


def test_3d_7point_boundary_slots():
    """Boundary rows mix offset classes — band slotting must keep every
    window affine regardless (the resident tier's W blows up here)."""
    n1 = 24
    n = n1 ** 3
    offs = [0, 1, -1, n1, -n1, n1 * n1, -n1 * n1]
    A = sp.diags([np.ones(n)] + [np.ones(n - abs(o)) for o in offs[1:]],
                 offs)
    plan = _check_exact(A)
    assert plan.w == 7


def test_periodic_wraps_grouped_windows():
    """Periodic wrap diagonals sit ~n tiles from the main band — they
    must land in their own window group, not blow the global F."""
    patt = brusselator.sparsity_pattern(64)
    n = patt.shape[0]
    A = sp.csr_matrix((np.ones(len(patt.indices)),
                       np.asarray(patt.indices), np.asarray(patt.indptr)),
                      shape=(n, n))
    plan = _check_exact(A)
    assert plan.F <= 64


def test_rectangular():
    i = np.arange(2000)
    A = sp.coo_matrix((np.ones(4000),
                       (np.concatenate([i, i]),
                        np.concatenate([i * 2, i * 3]))),
                      shape=(2000, 7000))
    _check_exact(A)


def test_multiple_nnz_per_band_subslots():
    i = np.repeat(np.arange(1500), 4)
    c = np.clip(np.repeat(np.arange(1500), 4) + np.tile([0, 3, 7, 11],
                                                        1500), 0, 1499)
    A = sp.coo_matrix((np.ones(6000), (i, c)), shape=(1500, 1500))
    _check_exact(A)


def test_random_pattern_rejected():
    """No band structure -> plan refuses (caller picks another tier).

    n must be large enough that rejection is STRUCTURAL (offset range
    2n/1024 > MAX_BANDS): at small n a random pattern has only a handful
    of 1024-wide bands and acceptance hinges on the drawn per-band slot
    maximum — an RNG-state-dependent flake."""
    n = 65536
    cols = RNG.integers(0, n, size=(2048, 8))
    cols.sort(axis=1)
    indptr = np.arange(2049) * 8
    plan = BandPlan(indptr, cols.reshape(-1), 2048, n)
    assert not plan.ok


def test_tier_selection_resident_preferred():
    """A pure-banded pattern now routes to the dia tier (r5 — shifted
    streamed fmas beat every gather kernel on few-offset patterns);
    with dia knocked out, the in-envelope banded pattern keeps the
    resident tier (measured v5e r4, unrolled walks: tridiagonal
    resident 7.65 vs stream 7.80 Gnnz/s — a wash on hardware; the
    op-count model orders resident first)."""
    from nonlinearsolve_tpu.ops import pallas_spmv as mod
    n = 2000
    A = sp.diags([np.ones(n - 1), np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    tier, plan, perm, _, _ = select_spmv_plan(A.indptr, A.indices, n, n)
    assert tier == "dia"
    from nonlinearsolve_tpu.ops.pallas_spmv import EllPlan
    rplan, *_ = mod._plan_maybe_reordered(A.indptr, A.indices, n, n)
    assert rplan.supported           # resident still covers the pattern


def test_tier_selection_stream_beyond_envelope(monkeypatch):
    """Past the resident x-VMEM cap the non-dia dispatch must pick the
    streamed tier (dia knocked out via its offset cap; the resident cap
    shrunk so the test stays small)."""
    from nonlinearsolve_tpu.ops import pallas_spmv as mod
    from nonlinearsolve_tpu.ops import spmv_dia as dmod
    monkeypatch.setattr(mod, "MAX_X_ELEMS_VMEM", 1000)
    monkeypatch.setattr(dmod, "DIA_MAX_OFFSETS", 0)
    mod._TIER_CACHE.clear()
    mod._REORDER_CACHE.clear()
    dmod._DIA_PLAN_CACHE.clear()
    n = 5000
    A = sp.diags([np.ones(n - 1), np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    tier, plan, perm, _, _ = select_spmv_plan(A.indptr, A.indices, n, n)
    assert tier == "stream" and perm is None
    mod._TIER_CACHE.clear()
    mod._REORDER_CACHE.clear()
    dmod._DIA_PLAN_CACHE.clear()


def test_tier_selection_stream_after_rcm(monkeypatch):
    """A scrambled-but-bandable pattern beyond the resident envelope:
    RCM recovers bands, streamed tier takes it."""
    from nonlinearsolve_tpu.ops import pallas_spmv as mod
    monkeypatch.setattr(mod, "MAX_X_ELEMS_VMEM", 1000)
    mod._TIER_CACHE.clear()
    mod._REORDER_CACHE.clear()
    # n large enough that the SCRAMBLED offsets exceed the band-count cap
    # (n/1024 > MAX_BANDS) — the direct band plan must refuse and the RCM
    # tier recover the bands.
    n = 65536
    i = np.arange(n - 1)
    rows = np.concatenate([i, np.arange(n), i + 1])
    cols = np.concatenate([i + 1, np.arange(n), i])
    s = RNG.permutation(n)
    B = _rand_csr(sp.coo_matrix((np.ones(len(rows)), (s[rows], s[cols])),
                                shape=(n, n)))
    tier, plan, perm, pinv, dperm = select_spmv_plan(
        B.indptr, B.indices, n, n)
    assert tier == "stream" and perm is not None
    # full permuted application must equal B @ x
    x = RNG.standard_normal(n)
    y = band_spmv_pallas(plan, jnp.take(jnp.asarray(B.data),
                                        jnp.asarray(dperm)),
                         jnp.take(jnp.asarray(x), jnp.asarray(perm)),
                         interpret=True)
    y = jnp.take(y, jnp.asarray(pinv))
    np.testing.assert_allclose(np.asarray(y), B @ x, rtol=0, atol=1e-12)
    mod._TIER_CACHE.clear()
    mod._REORDER_CACHE.clear()


def test_staged_matches_unstaged():
    n1 = 16
    n = n1 ** 3
    offs = [0, 1, -1, n1, -n1, n1 * n1, -n1 * n1]
    A = _rand_csr(sp.diags([np.ones(n)] + [np.ones(n - abs(o))
                                           for o in offs[1:]], offs))
    plan = band_plan_for(A.indptr, A.indices, n, n)
    data = jnp.asarray(A.data)
    x = jnp.asarray(RNG.standard_normal(n))
    mv = band_spmv_staged(plan, data, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(mv(x)),
        np.asarray(band_spmv_pallas(plan, data, x, interpret=True)))


def test_reverse_mode_ad():
    """Custom VJP: d/dx rides the transpose-pattern plan, d/ddata is the
    outer-product rule — both against dense autodiff."""
    n = 640
    A = _rand_csr(sp.diags([np.ones(n - 1), np.ones(n), np.ones(n - 1)],
                           [-1, 0, 1]))
    plan = band_plan_for(A.indptr, A.indices, n, n)
    data = jnp.asarray(A.data)
    x = jnp.asarray(RNG.standard_normal(n))
    wvec = jnp.asarray(RNG.standard_normal(n))

    def f(d, xx):
        return jnp.vdot(wvec, band_spmv_pallas(plan, d, xx,
                                               interpret=True))

    gd, gx = jax.grad(f, argnums=(0, 1))(data, x)
    Ad = jnp.asarray(A.toarray())

    def fdense(d_unused, xx):
        return jnp.vdot(wvec, Ad @ xx)

    gx_ref = jax.grad(fdense, argnums=1)(data, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-12, atol=1e-12)
    # data cotangent: dbar_k = w[row_k] * x[col_k]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    dbar_ref = np.asarray(wvec)[rows] * np.asarray(x)[A.indices]
    np.testing.assert_allclose(np.asarray(gd), dbar_ref, rtol=1e-12,
                               atol=1e-12)


def test_csr_matvec_dispatch_correct():
    """Public CSR.matvec stays correct whatever tier the host picks."""
    from nonlinearsolve_tpu.ops.sparse import CSR
    patt = brusselator.sparsity_pattern(16)
    n = patt.shape[0]
    data = RNG.standard_normal(len(patt.indices))
    csr = CSR(jnp.asarray(data), np.asarray(patt.indices, np.int32),
              np.asarray(patt.indptr, np.int32), (n, n))
    x = RNG.standard_normal(n)
    A = sp.csr_matrix((data, np.asarray(patt.indices),
                       np.asarray(patt.indptr)), shape=(n, n))
    np.testing.assert_allclose(np.asarray(csr.matvec(jnp.asarray(x))),
                               A @ x, rtol=1e-12, atol=1e-12)


def test_unsorted_columns_within_rows_exact():
    """CSR permits unsorted per-row columns; the band plan canonicalizes
    to sorted order internally (r4 review: interleaved band entries used
    to restart the rank and silently collide in one slot — max error 6.2
    on a two-band pattern)."""
    n = 4096
    rows = np.repeat(np.arange(n - 2048), 3)
    cols = np.empty(rows.size, np.int64)
    cols[0::3] = np.arange(n - 2048)            # diagonal
    cols[1::3] = np.arange(n - 2048) + 2048     # far band FIRST
    cols[2::3] = np.arange(n - 2048) + 1        # then near band (unsorted!)
    import scipy.sparse as ssp
    data = RNG.standard_normal(rows.size)
    indptr = np.arange(n - 2048 + 1) * 3
    plan = BandPlan(indptr, cols, n - 2048, n)
    A = ssp.csr_matrix((data, cols, indptr), shape=(n - 2048, n))
    if plan.ok:
        from nonlinearsolve_tpu.ops.pallas_spmv_stream import \
            band_spmv_pallas
        x = RNG.standard_normal(n)
        y = band_spmv_pallas(plan, jnp.asarray(data), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), A @ x, atol=1e-10)
