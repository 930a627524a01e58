"""Native sparsetools (csrc/sparsetools.cpp) tests: correctness vs the
pure-Python fallbacks + validity properties."""

import numpy as np
import pytest

from nonlinearsolve_tpu import native
from nonlinearsolve_tpu.ops.sparse import CSR


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def random_pattern(n=50, density=0.12, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.random((n, n)) < density)
    np.fill_diagonal(A, True)
    return CSR.from_dense(A.astype(float)), A


def test_coloring_validity(lib):
    pat, A = random_pattern()
    colors = native.greedy_column_coloring(pat.indptr, pat.indices,
                                           *pat.shape)
    for r in range(A.shape[0]):
        cols = np.nonzero(A[r])[0]
        assert len(set(colors[cols])) == len(cols)


def test_coloring_matches_tridiagonal_optimum(lib):
    n = 40
    A = (np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= 1)
    pat = CSR.from_dense(A.astype(float))
    colors = native.greedy_column_coloring(pat.indptr, pat.indices, n, n)
    assert colors.max() + 1 == 3


def test_rcm_reduces_bandwidth(lib):
    pat, A = random_pattern(seed=3)
    n = A.shape[0]
    kl0, ku0 = native.bandwidths(pat.indptr, pat.indices, n)
    perm = native.rcm_ordering(pat.indptr, pat.indices, n)
    assert sorted(perm) == list(range(n))
    Ap = A[np.ix_(perm, perm)]
    patp = CSR.from_dense(Ap.astype(float))
    kl1, ku1 = native.bandwidths(patp.indptr, patp.indices, n)
    assert max(kl1, ku1) <= max(kl0, ku0)


def test_ell_plan_roundtrip(lib):
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    A = np.where(rng.random((30, 30)) < 0.2, rng.standard_normal((30, 30)),
                 0.0)
    csr = CSR.from_dense(A)
    ell = csr.to_ell()
    np.testing.assert_allclose(np.asarray(ell.todense()), A, atol=1e-14)
    x = jnp.asarray(rng.standard_normal(30))
    np.testing.assert_allclose(np.asarray(ell.matvec(x)), A @ np.asarray(x),
                               atol=1e-12)


def test_band_offsets(lib):
    n = 20
    A = np.diag(np.ones(n)) + np.diag(np.ones(n - 2), 2) \
        + np.diag(np.ones(n - 5), -5)
    pat = CSR.from_dense(A)
    offs = native.band_offsets(pat.indptr, pat.indices, n)
    assert set(offs.tolist()) == {-5, 0, 2}


def test_large_scale_coloring_speed(lib):
    """512² Brusselator pattern (3.1M nnz) colors in well under a second —
    the reason this pass is native (Python takes minutes)."""
    import time
    from nonlinearsolve_tpu.models import brusselator
    pat = brusselator.sparsity_pattern(512)
    t0 = time.time()
    colors = native.greedy_column_coloring(pat.indptr, pat.indices,
                                           *pat.shape)
    assert time.time() - t0 < 5.0
    assert colors.max() + 1 <= 12
