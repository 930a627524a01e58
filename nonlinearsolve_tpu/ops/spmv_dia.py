"""Generalized-diagonal (DIA) SpMV tier — the TPU-native layout for
stencil-born patterns.

Every PDE-discretization Jacobian this framework targets (the
reference's large_systems class: Brusselator, Bratu, reaction-diffusion
— docs/src/tutorials/large_systems.md) has a FIXED, SMALL set of
column−row offsets: the 512² two-component Brusselator has 11, a 3D
7-point stencil has 7.  On such patterns a gather kernel is the wrong
tool entirely: ``y = Σ_d data_d ⊙ shift(x, off_d)`` is a chain of
shifted elementwise multiply-adds — zero gathers, no index tables, pure
HBM-streamed VPU work that XLA fuses into ~1 pass per diagonal.

Measured (r5, tunnel chip): 512² Brusselator assembled CSR 15.9 →
111.7 Gnnz/s (the windowed-ELL resident tier sat at 39% of its
gather-issue roofline; this path runs at ~85% of its stream roofline);
3D 7-point 128³ 12 → 201 Gnnz/s.

The tier plugs into ``select_spmv_plan`` next to resident/stream/
scatter.  The hot loop needs data in (ndiag, n) diagonal-major layout;
the CSR→DIA repack is a static selection that rides the register-gather
kernels (ops/selection.py) ONCE per data refresh (staged closures,
``CSR.matvec_fn``), amortized over every Krylov iteration.

Convention (matches ops/sparse.DIA): ``data[d, i] = A[i, i + off_d]``;
out-of-range slots are zero.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Plan acceptance: diagonal count cap (each diagonal costs one streamed
# pass over x and data whether it is full or nearly empty) and a table
# budget (the repack selection table is ndiag * n entries).
DIA_MAX_OFFSETS = 48
DIA_MAX_TABLE = 32 * 1024 * 1024


class DiaPlan:
    """Host-side plan: offsets + the CSR→(ndiag, n) repack selection.

    The symbolic offset scan is cheap and runs at tier-selection time;
    the repack selection (a register-kernel plan over ndiag·n slots) is
    built LAZILY on first pack, so patterns where dia loses the cost
    comparison never pay for it."""

    def __init__(self, indptr, indices, n_rows, n_cols):
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)
        self.supported = False
        self._sel = None
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int64)
        nnz = int(indptr[-1])
        self.nnz = nnz
        if n_rows != n_cols or n_rows == 0 or nnz == 0:
            return
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64),
                            np.diff(indptr))
        offs = indices - row_ids
        uniq = np.unique(offs)
        if (len(uniq) > DIA_MAX_OFFSETS
                or len(uniq) * n_rows > DIA_MAX_TABLE):
            return
        self.offsets = tuple(int(o) for o in uniq)
        self.ndiag = len(uniq)
        self.occupancy = nnz / sum(n_rows - abs(o) for o in uniq)
        self._dpos = np.searchsorted(uniq, offs).astype(np.int32)
        self._row_ids = row_ids.astype(np.int32)
        # attrs shared with the other tiers' plans (roofline plumbing)
        self.n_pad = -(-n_rows // 128) * 128
        self.supported = True

    @property
    def sel(self):
        if self._sel is None:
            # DIAG-MAJOR slot order (d, i) <- csr position of
            # (i, i+off_d), pads empty: sources ascend WITHIN each
            # diagonal (csr row-major), so the selection is piecewise
            # monotone — StaticSelection's segmented chunking gives it
            # tiny-window w=1 EllPlans per run, and the output lands
            # directly in the (ndiag, n) streaming layout (an (n, ndiag)
            # row-major order would need an 11-minor-dim transpose —
            # measured 0.9 ms, pure relayout waste).
            src = np.full((self.ndiag, self.n_rows), self.nnz, np.int64)
            src[self._dpos, self._row_ids] = np.arange(self.nnz)
            from .selection import StaticSelection
            self._sel = StaticSelection(src.reshape(-1), self.nnz)
        return self._sel

    # -- staged application -------------------------------------------------

    def pack(self, data):
        """CSR-ordered data (nnz,) -> (ndiag, n) diagonal-major."""
        return self.sel.apply(data).reshape(self.ndiag, self.n_rows)

    def matvec_packed(self, dd, x):
        """y[i] = Σ_d dd[d, i] · x[i + off_d] — shifted fused fma chain
        (zero-fill shifts: concat of a slice and a zero pad, which XLA
        fuses with the multiply into one streamed pass per diagonal)."""
        n = self.n_rows
        y = None
        for d, off in enumerate(self.offsets):
            if off == 0:
                seg = dd[d] * x
            elif off > 0:
                seg = dd[d] * jnp.concatenate(
                    [x[off:], jnp.zeros((off,), x.dtype)])
            else:
                seg = dd[d] * jnp.concatenate(
                    [jnp.zeros((-off,), x.dtype), x[:off]])
            y = seg if y is None else y + seg
        return y

    def rmatvec_packed(self, dd, y):
        """x[j] = Σ_d dd[d, j − off_d] · y[j − off_d] (Aᵀ y): the same
        chain with data and vector shifted TOGETHER by −off."""
        n = self.n_rows
        out = None
        for d, off in enumerate(self.offsets):
            prod = dd[d] * y
            if off == 0:
                seg = prod
            elif off > 0:
                # contribution lands at j = i + off
                seg = jnp.concatenate(
                    [jnp.zeros((off,), y.dtype), prod[:n - off]])
            else:
                seg = jnp.concatenate(
                    [prod[-off:], jnp.zeros((-off,), y.dtype)])
            out = seg if out is None else out + seg
        return out


_DIA_PLAN_CACHE: dict = {}


def dia_plan_for(indptr, indices, n_rows, n_cols) -> DiaPlan:
    from .pallas_spmv import pattern_key
    key = pattern_key(indptr, indices, n_rows, n_cols)
    plan = _DIA_PLAN_CACHE.get(key)
    if plan is None:
        plan = DiaPlan(indptr, indices, int(n_rows), int(n_cols))
        _DIA_PLAN_CACHE[key] = plan
    return plan


def dia_spmv_staged(plan: DiaPlan, data, *, interpret=None):
    """Staged closure: repack once, stream per matvec."""
    dd = plan.pack(data)

    def mv(x):
        return plan.matvec_packed(dd, x)
    return mv


def dia_spmv_pallas(plan: DiaPlan, data, x, *, interpret=None):
    """One-shot matvec (repack + apply).  The repack is itself a
    register-kernel pass, so even unstaged this is at worst comparable
    to the resident tier; use the staged form in Krylov loops."""
    return plan.matvec_packed(plan.pack(data), x)
