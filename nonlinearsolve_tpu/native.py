"""Loader for the native sparsetools library (csrc/sparsetools.cpp).

Compiles the C++ toolkit on first use into a cached shared object and binds
it via ctypes (no pybind11 in-image — see csrc/ for why these passes are
native).  Falls back to pure-Python implementations when the toolchain is
unavailable, so the package never hard-fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "csrc", "sparsetools.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "csrc", "build")
_SO_PATH = os.path.join(_BUILD_DIR, "libsparsetools.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC)):
        return _SO_PATH
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO_PATH
    except Exception as e:  # noqa: BLE001
        print(f"[nonlinearsolve_tpu] native sparsetools build failed "
              f"({e}); using Python fallbacks", file=sys.stderr)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _compile()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i8p = ctypes.POINTER(ctypes.c_int8)
        lib.greedy_column_coloring.restype = ctypes.c_int32
        lib.greedy_column_coloring.argtypes = [
            i32p, i32p, ctypes.c_int32, ctypes.c_int32, i32p]
        lib.rcm_ordering.restype = ctypes.c_int32
        lib.rcm_ordering.argtypes = [i32p, i32p, ctypes.c_int32, i32p]
        lib.ell_plan.restype = ctypes.c_int32
        lib.ell_plan.argtypes = [i32p, i32p, ctypes.c_int32, ctypes.c_int32,
                                 i32p, i64p, i8p]
        lib.band_offsets.restype = ctypes.c_int32
        lib.band_offsets.argtypes = [i32p, i32p, ctypes.c_int32, i32p,
                                     ctypes.c_int32]
        lib.bandwidths.restype = ctypes.c_int32
        lib.bandwidths.argtypes = [i32p, i32p, ctypes.c_int32]
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.amd_ordering.restype = ctypes.c_int32
        lib.amd_ordering.argtypes = [i32p, i32p, ctypes.c_int32, i32p]
        lib.sp_lu_solve.restype = ctypes.c_int64
        lib.sp_lu_solve.argtypes = [i32p, i32p, f64p, ctypes.c_int32, i32p,
                                    f64p, f64p, ctypes.c_double]
        lib.sp_lu_factor_create.restype = ctypes.c_void_p
        lib.sp_lu_factor_create.argtypes = [
            i32p, i32p, f64p, ctypes.c_int32, i32p, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64)]
        lib.sp_lu_refactor.restype = ctypes.c_int32
        lib.sp_lu_refactor.argtypes = [ctypes.c_void_p, f64p]
        lib.sp_lu_factor_solve.restype = ctypes.c_int32
        lib.sp_lu_factor_solve.argtypes = [ctypes.c_void_p, f64p, f64p]
        lib.sp_lu_factor_free.restype = None
        lib.sp_lu_factor_free.argtypes = [ctypes.c_void_p]
        lib.sp_lu_factor_sizes.restype = ctypes.c_int32
        lib.sp_lu_factor_sizes.argtypes = [ctypes.c_void_p, i64p, i64p]
        lib.sp_lu_factor_export.restype = ctypes.c_int32
        lib.sp_lu_factor_export.argtypes = [
            ctypes.c_void_p, i64p, i32p, f64p, i64p, i32p, f64p, f64p,
            i32p, i32p]
        _lib = lib
        return _lib


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def greedy_column_coloring(indptr, indices, n_rows, n_cols
                           ) -> Optional[np.ndarray]:
    """Native distance-2 coloring; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = _i32(indptr)
    indices = _i32(indices)
    # Malformed patterns must fail in Python, not scatter OOB in C.
    if indices.size and (indices.min() < 0 or indices.max() >= n_cols):
        raise ValueError(
            f"sparsity pattern column index out of range "
            f"[0, {n_cols}): min={indices.min()}, max={indices.max()}")
    colors = np.empty(n_cols, np.int32)
    n = lib.greedy_column_coloring(
        _ptr(indptr, ctypes.c_int32), _ptr(indices, ctypes.c_int32),
        np.int32(n_rows), np.int32(n_cols), _ptr(colors, ctypes.c_int32))
    if n < 0:
        return None
    return colors


def rcm_ordering(indptr, indices, n) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    indptr = _i32(indptr)
    indices = _i32(indices)
    perm = np.empty(n, np.int32)
    rc = lib.rcm_ordering(_ptr(indptr, ctypes.c_int32),
                          _ptr(indices, ctypes.c_int32), np.int32(n),
                          _ptr(perm, ctypes.c_int32))
    return perm if rc == 0 else None


def ell_plan(indptr, indices, n_rows):
    """Returns (width, cols, perm, valid) or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = _i32(indptr)
    indices = _i32(indices)
    null_i32 = ctypes.POINTER(ctypes.c_int32)()
    null_i64 = ctypes.POINTER(ctypes.c_int64)()
    null_i8 = ctypes.POINTER(ctypes.c_int8)()
    width = lib.ell_plan(_ptr(indptr, ctypes.c_int32),
                         _ptr(indices, ctypes.c_int32), np.int32(n_rows),
                         np.int32(0), null_i32, null_i64, null_i8)
    if width < 0:
        return None
    cols = np.zeros((n_rows, width), np.int32)
    perm = np.zeros((n_rows, width), np.int64)
    valid = np.zeros((n_rows, width), np.int8)
    rc = lib.ell_plan(_ptr(indptr, ctypes.c_int32),
                      _ptr(indices, ctypes.c_int32), np.int32(n_rows),
                      np.int32(width), _ptr(cols, ctypes.c_int32),
                      _ptr(perm, ctypes.c_int64), _ptr(valid, ctypes.c_int8))
    if rc < 0:
        return None
    return width, cols, perm, valid.astype(bool)


def band_offsets(indptr, indices, n, cap=4096) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    indptr = _i32(indptr)
    indices = _i32(indices)
    out = np.empty(cap, np.int32)
    count = lib.band_offsets(_ptr(indptr, ctypes.c_int32),
                             _ptr(indices, ctypes.c_int32), np.int32(n),
                             _ptr(out, ctypes.c_int32), np.int32(cap))
    if count < 0:
        return None
    return out[:count].copy()


def amd_ordering(indptr, indices, n) -> Optional[np.ndarray]:
    """Approximate-minimum-degree fill-reducing ordering (the AMD role in
    the reference's KLU path); None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = _i32(indptr)
    indices = _i32(indices)
    if indices.size and (indices.min() < 0 or indices.max() >= n):
        raise ValueError("pattern column index out of range")
    perm = np.empty(max(n, 1), np.int32)
    rc = lib.amd_ordering(_ptr(indptr, ctypes.c_int32),
                          _ptr(indices, ctypes.c_int32), np.int32(n),
                          _ptr(perm, ctypes.c_int32))
    return perm[:n] if rc == 0 else None


def sp_lu_solve(indptr, indices, data, b, perm=None, *,
                pivot_threshold=0.1):
    """One-shot sparse direct solve x = A⁻¹b via native Gilbert–Peierls LU
    with threshold partial pivoting on the symmetrically permuted pattern.

    Returns ``(x, fill_nnz)`` with ``fill_nnz = nnz(L)+nnz(U)`` (the fill
    diagnostic; -2 signals numerical singularity → caller falls back), or
    None if the native library is unavailable.  float64 host arithmetic.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = b.shape[0]
    indptr = _i32(indptr)
    indices = _i32(indices)
    data = np.ascontiguousarray(data, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    x = np.empty(n, np.float64)
    if perm is not None:
        perm = _i32(perm)
        perm_ptr = _ptr(perm, ctypes.c_int32)
    else:
        perm_ptr = ctypes.POINTER(ctypes.c_int32)()
    fill = lib.sp_lu_solve(
        _ptr(indptr, ctypes.c_int32), _ptr(indices, ctypes.c_int32),
        _ptr(data, ctypes.c_double), np.int32(n), perm_ptr,
        _ptr(b, ctypes.c_double), _ptr(x, ctypes.c_double),
        float(pivot_threshold))
    return x, int(fill)


class SpLuFactor:
    """Persistent native sparse-LU factor: symbolic analysis + pivot order
    computed once, numeric-only refactorization on later Newton steps (the
    ``reuse_A_if_factorization`` role of the reference's linear-solve cache,
    lib/NonlinearSolveBase/src/linear_solve.jl:91-115; KLU's symbolic/
    numeric split).  Thread-safe per-instance via an internal lock."""

    def __init__(self, indptr, indices, n, perm=None, *,
                 pivot_threshold=0.1):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native sparsetools library unavailable")
        self.n = int(n)
        self.indptr = _i32(indptr)
        self.indices = _i32(indices)
        self.perm = None if perm is None else _i32(perm)
        self.pivot_threshold = float(pivot_threshold)
        self.fill = None
        self._handle = None
        self._lock = threading.Lock()
        self.n_factor = 0          # full factorizations performed
        self.n_refactor = 0        # numeric-only refactorizations

    def _perm_ptr(self):
        if self.perm is None:
            return ctypes.POINTER(ctypes.c_int32)()
        return _ptr(self.perm, ctypes.c_int32)

    def _create(self, data):
        status = ctypes.c_int64(0)
        handle = self._lib.sp_lu_factor_create(
            _ptr(self.indptr, ctypes.c_int32),
            _ptr(self.indices, ctypes.c_int32),
            _ptr(data, ctypes.c_double), np.int32(self.n), self._perm_ptr(),
            self.pivot_threshold, ctypes.byref(status))
        if not handle:
            return int(status.value)       # -1 size error / -2 singular
        self._handle = handle
        self.fill = int(status.value)
        self.n_factor += 1
        return 0

    def factorize(self, data) -> int:
        """(Re)factorize with new numeric values on the fixed pattern.

        Numeric-only when a factor exists; falls back to a fresh pivoting
        factorization when the reused pivot order degrades (rc -3) or hits
        an exact zero (rc -2).  Returns 0 on success, -2 on singularity."""
        data = np.ascontiguousarray(data, np.float64)
        with self._lock:
            return self._factorize_locked(data)

    def solve(self, b):
        """x = A⁻¹ b with the current factors; None if unfactorized or
        numerically singular."""
        b = np.ascontiguousarray(b, np.float64)
        x = np.empty(self.n, np.float64)
        with self._lock:
            if self._handle is None:
                return None
            rc = int(self._lib.sp_lu_factor_solve(
                self._handle, _ptr(b, ctypes.c_double),
                _ptr(x, ctypes.c_double)))
        return x if rc == 0 else None

    def factorize_solve(self, data, b):
        """Atomic factorize + solve under ONE lock acquisition: host
        callbacks can run concurrently on XLA's thread pool, and separate
        factorize()/solve() calls on a shared cached factor could
        interleave two solves' values (solving with the other matrix's
        factors).  Returns x or None."""
        data = np.ascontiguousarray(data, np.float64)
        b = np.ascontiguousarray(b, np.float64)
        x = np.empty(self.n, np.float64)
        with self._lock:
            rc = self._factorize_locked(data)
            if rc != 0 or self._handle is None:
                return None
            rc = int(self._lib.sp_lu_factor_solve(
                self._handle, _ptr(b, ctypes.c_double),
                _ptr(x, ctypes.c_double)))
        return x if rc == 0 else None

    def _factorize_locked(self, data) -> int:
        if self._handle is not None:
            rc = int(self._lib.sp_lu_refactor(
                self._handle, _ptr(data, ctypes.c_double)))
            if rc == 0:
                self.n_refactor += 1
                return 0
            self._lib.sp_lu_factor_free(self._handle)
            self._handle = None
        return self._create(data)

    def export_factor(self):
        """Flat pivot-space export of the current factors for device-side
        triangular application (csrc sp_lu_factor_export contract):
        dict with Lp/Lrow/Lval (strict lower, unit diag implied),
        Up/Urow/Uval (strict upper), Ud (diagonal), in_perm/out_perm
        (b_hat = b[in_perm]; x[out_perm] = z).  None if unfactorized.
        The PATTERN parts stay valid across numeric-only refactorizations
        (frozen pivot order); compare ``n_factor`` to detect a re-pivot.
        """
        with self._lock:
            if self._handle is None:
                return None
            nl = ctypes.c_int64(0)
            nu = ctypes.c_int64(0)
            self._lib.sp_lu_factor_sizes(self._handle, ctypes.byref(nl),
                                         ctypes.byref(nu))
            nl, nu = int(nl.value), int(nu.value)
            out = {
                "Lp": np.empty(self.n + 1, np.int64),
                "Lrow": np.empty(nl, np.int32),
                "Lval": np.empty(nl, np.float64),
                "Up": np.empty(self.n + 1, np.int64),
                "Urow": np.empty(nu, np.int32),
                "Uval": np.empty(nu, np.float64),
                "Ud": np.empty(self.n, np.float64),
                "in_perm": np.empty(self.n, np.int32),
                "out_perm": np.empty(self.n, np.int32),
            }
            self._lib.sp_lu_factor_export(
                self._handle,
                _ptr(out["Lp"], ctypes.c_int64),
                _ptr(out["Lrow"], ctypes.c_int32),
                _ptr(out["Lval"], ctypes.c_double),
                _ptr(out["Up"], ctypes.c_int64),
                _ptr(out["Urow"], ctypes.c_int32),
                _ptr(out["Uval"], ctypes.c_double),
                _ptr(out["Ud"], ctypes.c_double),
                _ptr(out["in_perm"], ctypes.c_int32),
                _ptr(out["out_perm"], ctypes.c_int32))
            out["n_factor"] = self.n_factor
            return out

    def close(self):
        with self._lock:
            if self._handle is not None:
                self._lib.sp_lu_factor_free(self._handle)
                self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


def bandwidths(indptr, indices, n):
    """(kl, ku) of a square pattern, or None."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = _i32(indptr)
    indices = _i32(indices)
    packed = lib.bandwidths(_ptr(indptr, ctypes.c_int32),
                            _ptr(indices, ctypes.c_int32), np.int32(n))
    return packed >> 16, packed & 0xFFFF
