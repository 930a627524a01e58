"""Sparse matrix containers and SpMV — the TPU-native sparse core.

The reference delegates sparse compute to SuiteSparse (KLU/UMFPACK, C) via
LinearSolve.jl (SURVEY.md §2.9).  A TPU has no scalar-gather-friendly sparse
engine; the performant layouts are structure-aware:

* ``CSR`` — general container (host-built pattern, device data); SpMV via
  XLA ``segment_sum`` (correctness path, CPU-friendly).
* ``ELL`` — padded rows (n_rows × max_nnz), the gather-based TPU layout;
  SpMV via ``take`` + masked reduction on CPU.  On TPU, ``CSR.matvec`` /
  ``BSR.matvec`` route through the slot-major windowed Pallas gather
  kernel in ``pallas_spmv.py`` whenever the pattern fits its envelope
  (x VMEM-resident, bounded per-row-group column window).
* ``DIA`` — banded/diagonal storage: SpMV is a sum of shifted elementwise
  products — zero gathers, pure VPU, bandwidth-bound at speed-of-light.
  The PDE stencil matrices of the benchmark set (Bratu, Brusselator,
  reaction-diffusion) are banded, so this is the hot path.

All containers are pytrees (data dynamic, structure static) so they pass
through jit/vmap/shard_map.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class CSR:
    """Compressed sparse row.  ``indices``/``indptr`` are static host arrays
    (the symbolic pattern is fixed at trace time, like the reference's
    ``jac_prototype``); ``data`` is a traced device array."""

    def __init__(self, data, indices, indptr, shape):
        self.data = data
        self.indices = np.asarray(indices, np.int32)
        self.indptr = np.asarray(indptr, np.int32)
        self.shape = tuple(shape)

    @property
    def nnz(self):
        return int(self.indices.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    @staticmethod
    def from_dense(A):
        A = np.asarray(A)
        mask = A != 0
        indptr = np.concatenate([[0], np.cumsum(mask.sum(axis=1))])
        indices = np.concatenate([np.nonzero(mask[i])[0]
                                  for i in range(A.shape[0])]) \
            if mask.any() else np.zeros((0,), np.int32)
        data = jnp.asarray(A[mask])
        return CSR(data, indices, indptr, A.shape)

    @staticmethod
    def from_pattern(rows, cols, shape, data=None):
        """Build from COO-style pattern (host); rows must be sorted."""
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        order = np.lexsort((cols, rows))
        rows, cols = rows[order], cols[order]
        counts = np.bincount(rows, minlength=shape[0])
        indptr = np.concatenate([[0], np.cumsum(counts)])
        if data is None:
            data = jnp.zeros((rows.shape[0],), jnp.float64
                             if jax.config.jax_enable_x64 else jnp.float32)
        else:
            data = jnp.asarray(data)[order]
        return CSR(data, cols, indptr, shape)

    def with_data(self, data):
        return CSR(data, self.indices, self.indptr, self.shape)

    @property
    def row_ids(self):
        """nnz-length row index per entry (host, static)."""
        return np.repeat(np.arange(self.shape[0], dtype=np.int32),
                         np.diff(self.indptr))

    def todense(self):
        out = jnp.zeros(self.shape, self.data.dtype)
        return out.at[self.row_ids, self.indices].set(self.data)

    def matvec(self, x):
        """SpMV.  On TPU dispatches to the Pallas gather kernel
        (``pallas_spmv.py``) when the pattern fits its envelope; the XLA
        ``segment_sum`` path is the portable fallback."""
        if jax.default_backend() == "tpu" and jnp.ndim(self.data) == 1:
            from .pallas_spmv import csr_spmv_pallas, pallas_spmv_supported
            if pallas_spmv_supported(self):
                return csr_spmv_pallas(self, x)
        prod = self.data * jnp.take(x, jnp.asarray(self.indices), axis=0)
        return jax.ops.segment_sum(prod, jnp.asarray(self.row_ids),
                                   num_segments=self.shape[0])

    def matvec_xla(self, x):
        """SpMV via segment_sum (XLA path; benchmark baseline)."""
        prod = self.data * jnp.take(x, jnp.asarray(self.indices), axis=0)
        return jax.ops.segment_sum(prod, jnp.asarray(self.row_ids),
                                   num_segments=self.shape[0])

    def matvec_fn(self):
        """Staged matvec closure for repeated application (Krylov loops):
        on TPU the slot-major packing runs once HERE instead of inside
        every iteration (csr_spmv_staged).  Forward-only — use
        ``matvec`` where AD through the product is needed."""
        if jax.default_backend() == "tpu" and jnp.ndim(self.data) == 1:
            from .pallas_spmv import csr_spmv_staged, pallas_spmv_supported
            if pallas_spmv_supported(self):
                return csr_spmv_staged(self)
        indices = jnp.asarray(self.indices)
        row_ids = jnp.asarray(self.row_ids)
        data = self.data
        n = self.shape[0]

        def mv(x):
            prod = data * jnp.take(x, indices, axis=0)
            return jax.ops.segment_sum(prod, row_ids, num_segments=n)
        return mv

    def rmatvec(self, y):
        """Transpose SpMV: Aᵀ y.  Stencil-born (few-generalized-
        diagonal) patterns ride the dia tier's shifted-fma chain — the
        transpose is the same chain with data and vector shifted
        together (ops/spmv_dia.py).  Consumers: the gradient/Cauchy
        rmv(J, fu) in trust-region, steepest-descent and dogleg steps
        (the dia tier is square-only, so the non-square NLLS normal
        form never routes here).  One repack per call — even unstaged
        the repack + zero-gather chain beats the gather-issue-bound
        segment_sum alternative per single application; use
        ``rmatvec_fn`` to hoist the repack across repeated calls."""
        if jax.default_backend() == "tpu" and jnp.ndim(self.data) == 1:
            from .pallas_spmv import select_spmv_plan
            tier, plan, perm, _, _ = select_spmv_plan(
                self.indptr, self.indices, *self.shape)
            if tier == "dia" and perm is None:
                return plan.rmatvec_packed(plan.pack(self.data), y)
        prod = self.data * jnp.take(y, jnp.asarray(self.row_ids), axis=0)
        return jax.ops.segment_sum(prod, jnp.asarray(self.indices),
                                   num_segments=self.shape[1])

    def rmatvec_fn(self):
        """Staged transpose-matvec closure (mirror of ``matvec_fn``):
        on the dia tier the CSR→(ndiag, n) repack runs once HERE
        instead of inside every application."""
        if jax.default_backend() == "tpu" and jnp.ndim(self.data) == 1:
            from .pallas_spmv import select_spmv_plan
            tier, plan, perm, _, _ = select_spmv_plan(
                self.indptr, self.indices, *self.shape)
            if tier == "dia" and perm is None:
                dd = plan.pack(self.data)
                return lambda y: plan.rmatvec_packed(dd, y)
        data = self.data
        row_ids = jnp.asarray(self.row_ids)
        indices = jnp.asarray(self.indices)
        m = self.shape[1]

        def rmv_(y):
            prod = data * jnp.take(y, row_ids, axis=0)
            return jax.ops.segment_sum(prod, indices, num_segments=m)
        return rmv_

    def diagonal(self):
        """Extract the main diagonal (for Jacobi preconditioning)."""
        row_ids = self.row_ids
        is_diag = self.indices == row_ids
        out = jnp.zeros((self.shape[0],), self.data.dtype)
        return out.at[row_ids[is_diag]].add(self.data[np.nonzero(is_diag)[0]])

    def to_ell(self):
        from ..native import ell_plan
        plan = ell_plan(self.indptr, self.indices, self.shape[0])
        if plan is not None:
            width, cols, perm, valid = plan
            import jax.numpy as _jnp
            data = _jnp.where(_jnp.asarray(valid),
                              self.data[_jnp.asarray(perm.reshape(-1))]
                              .reshape(self.shape[0], width), 0.0)
            return ELL(data, cols, valid, self.shape)
        counts = np.diff(self.indptr)
        width = int(counts.max()) if counts.size else 0
        n = self.shape[0]
        cols = np.zeros((n, width), np.int32)
        valid = np.zeros((n, width), bool)
        perm = np.zeros((n, width), np.int64)
        for i in range(n):
            k = counts[i]
            cols[i, :k] = self.indices[self.indptr[i]:self.indptr[i + 1]]
            valid[i, :k] = True
            perm[i, :k] = np.arange(self.indptr[i], self.indptr[i + 1])
        data = jnp.where(jnp.asarray(valid),
                         self.data[jnp.asarray(perm.reshape(-1))].reshape(
                             n, width),
                         0.0)
        return ELL(data, cols, valid, self.shape)

    def __repr__(self):
        return f"CSR(shape={self.shape}, nnz={self.nnz})"


jax.tree_util.register_pytree_node(
    CSR,
    lambda m: ((m.data,), (m.indices, m.indptr, m.shape)),
    lambda aux, children: CSR(children[0], aux[0], aux[1], aux[2]),
)


class ELL:
    """Padded-row (ELLPACK) layout: ``data``/``cols`` are (n_rows, width)."""

    def __init__(self, data, cols, valid, shape):
        self.data = data
        self.cols = np.asarray(cols, np.int32)
        self.valid = np.asarray(valid, bool)
        self.shape = tuple(shape)

    @property
    def width(self):
        return self.cols.shape[1]

    def with_data(self, data):
        return ELL(data, self.cols, self.valid, self.shape)

    def matvec(self, x):
        gathered = jnp.take(x, jnp.asarray(self.cols), axis=0)
        return jnp.sum(self.data * gathered, axis=1)

    def todense(self):
        out = jnp.zeros(self.shape, self.data.dtype)
        rows = np.repeat(np.arange(self.shape[0]), self.width)
        return out.at[rows, self.cols.reshape(-1)].add(
            jnp.where(jnp.asarray(self.valid), self.data, 0.0).reshape(-1))

    def __repr__(self):
        return f"ELL(shape={self.shape}, width={self.width})"


jax.tree_util.register_pytree_node(
    ELL,
    lambda m: ((m.data,), (m.cols, m.valid, m.shape)),
    lambda aux, children: ELL(children[0], aux[0], aux[1], aux[2]),
)


class DIA:
    """Banded (diagonal) storage: ``offsets`` static, ``data`` is
    (n_diags, n) with entry ``data[d, i] = A[i, i + offsets[d]]``.

    SpMV = Σ_d data[d] * shift(x, offsets[d]) — no gathers, pure VPU.
    """

    def __init__(self, data, offsets, shape):
        self.data = data
        self.offsets = tuple(int(o) for o in offsets)
        self.shape = tuple(shape)

    @staticmethod
    def from_csr(csr: CSR):
        n, m = csr.shape
        row_ids = csr.row_ids
        offs = csr.indices.astype(np.int64) - row_ids
        uniq = np.unique(offs)
        data = jnp.zeros((len(uniq), n), csr.data.dtype)
        for d, off in enumerate(uniq):
            sel = np.nonzero(offs == off)[0]
            rows = row_ids[offs == off]
            data = data.at[d, rows].set(csr.data[sel])
        return DIA(data, uniq, csr.shape)

    @property
    def nnz(self):
        n = self.shape[0]
        return sum(n - abs(o) for o in self.offsets)

    def with_data(self, data):
        return DIA(data, self.offsets, self.shape)

    def matvec(self, x):
        # zero-fill shifted fma chain: concat(slice-product, zeros)
        # fuses into ONE streamed pass per diagonal — measured 3.6x the
        # .at[slice].add form on the 512² Brusselator pattern
        # (31 -> 112 Gnnz/s, r5; in-place slice updates serialize).
        # The multiply runs on the VALID data region only: out-of-range
        # tail slots are never read, so uninitialized/non-finite pad
        # values can't poison the output through 0*inf = NaN.
        n = self.shape[0]
        out = None
        for d, off in enumerate(self.offsets):
            if off == 0:
                seg = self.data[d] * x
            elif off > 0:
                seg = jnp.concatenate(
                    [self.data[d, :n - off] * x[off:],
                     jnp.zeros((off,), x.dtype)])
            else:
                seg = jnp.concatenate(
                    [jnp.zeros((-off,), x.dtype),
                     self.data[d, -off:] * x[:off]])
            out = seg if out is None else out + seg
        return (jnp.zeros_like(x, shape=(n,)) if out is None else out)

    def rmatvec(self, y):
        """Aᵀ y: the same shifted chain with data and vector shifted
        together by −off (entry A[i, i+off] lands at output i+off)."""
        n = self.shape[0]
        out = None
        for d, off in enumerate(self.offsets):
            if off == 0:
                seg = self.data[d] * y
            elif off > 0:
                seg = jnp.concatenate(
                    [jnp.zeros((off,), y.dtype),
                     self.data[d, :n - off] * y[:n - off]])
            else:
                seg = jnp.concatenate(
                    [self.data[d, -off:] * y[-off:],
                     jnp.zeros((-off,), y.dtype)])
            out = seg if out is None else out + seg
        return (jnp.zeros_like(y, shape=(n,)) if out is None else out)

    def diagonal(self):
        try:
            d = self.offsets.index(0)
        except ValueError:
            return jnp.zeros((self.shape[0],), self.data.dtype)
        return self.data[d]

    def todense(self):
        n, m = self.shape
        out = jnp.zeros((n, m), self.data.dtype)
        for d, off in enumerate(self.offsets):
            if off >= 0:
                idx = jnp.arange(0, n - off)
                out = out.at[idx, idx + off].set(self.data[d, :n - off])
            else:
                k = -off
                idx = jnp.arange(k, n)
                out = out.at[idx, idx - k].set(self.data[d, k:])
        return out

    def __repr__(self):
        return f"DIA(shape={self.shape}, n_diags={len(self.offsets)})"


jax.tree_util.register_pytree_node(
    DIA,
    lambda m: ((m.data,), (m.offsets, m.shape)),
    lambda aux, children: DIA(children[0], aux[0], aux[1]),
)


class BSR:
    """Block compressed sparse row: dense b×b blocks on a sparse block
    graph — the layout for multi-component couplings (FEM, multi-species
    reaction networks) where each nonzero is a small dense block.

    ``data``: (nblocks, b, b) traced; ``indices``/``indptr``: static block
    pattern.  SpMV gathers the x blocks and runs ONE batched (nblocks,
    b, b)·(nblocks, b) contraction — MXU-shaped, no scalar gathers.
    """

    def __init__(self, data, indices, indptr, shape, blocksize):
        self.data = data
        self.indices = np.asarray(indices, np.int32)
        self.indptr = np.asarray(indptr, np.int32)
        self.shape = tuple(shape)
        self.blocksize = int(blocksize)

    @property
    def nnz(self):
        return int(self.indices.shape[0]) * self.blocksize ** 2

    def with_data(self, data):
        return BSR(data, self.indices, self.indptr, self.shape,
                   self.blocksize)

    @property
    def block_row_ids(self):
        n_brows = self.shape[0] // self.blocksize
        return np.repeat(np.arange(n_brows, dtype=np.int32),
                         np.diff(self.indptr))

    @staticmethod
    def from_csr(csr: "CSR", blocksize: int) -> "BSR":
        """Reblock a CSR matrix (host-side symbolic pass; data gathered
        with static indices, jit-safe)."""
        n, m = csr.shape
        b = blocksize
        if n % b or m % b:
            raise ValueError(f"shape {csr.shape} not divisible by "
                             f"blocksize {b}")
        row_ids = csr.row_ids
        brow = row_ids // b
        bcol = csr.indices // b
        keys = brow.astype(np.int64) * (m // b) + bcol
        uniq, inv = np.unique(keys, return_inverse=True)
        ubrow = (uniq // (m // b)).astype(np.int32)
        ubcol = (uniq % (m // b)).astype(np.int32)
        counts = np.bincount(ubrow, minlength=n // b)
        indptr = np.concatenate([[0], np.cumsum(counts)])
        # scatter csr entries into their block positions
        slot_r = (row_ids % b).astype(np.int64)
        slot_c = (csr.indices % b).astype(np.int64)
        data = jnp.zeros((len(uniq), b, b), csr.data.dtype)
        data = data.at[inv, slot_r, slot_c].set(csr.data)
        return BSR(data, ubcol, indptr, csr.shape, b)

    def matvec(self, x):
        if jax.default_backend() == "tpu" and jnp.ndim(self.data) == 3:
            from .pallas_spmv import (bsr_scalar_pattern, bsr_spmv_pallas,
                                      ell_plan_for)
            indptr, indices, _ = bsr_scalar_pattern(self)
            if ell_plan_for(indptr, indices, self.shape[0],
                            self.shape[1]).supported:
                return bsr_spmv_pallas(self, x)
        b = self.blocksize
        xb = x.reshape(-1, b)
        gathered = jnp.take(xb, jnp.asarray(self.indices), axis=0)
        prods = jnp.einsum("nij,nj->ni", self.data, gathered)
        out = jax.ops.segment_sum(prods, jnp.asarray(self.block_row_ids),
                                  num_segments=self.shape[0] // b)
        return out.reshape(self.shape[0])

    def rmatvec(self, y):
        b = self.blocksize
        yb = y.reshape(-1, b)
        gathered = jnp.take(yb, jnp.asarray(self.block_row_ids), axis=0)
        prods = jnp.einsum("nji,nj->ni", self.data, gathered)
        out = jax.ops.segment_sum(prods, jnp.asarray(self.indices),
                                  num_segments=self.shape[1] // b)
        return out.reshape(self.shape[1])

    def diagonal(self):
        b = self.blocksize
        brow = self.block_row_ids
        isdiag = self.indices == brow
        diag_blocks = self.data[np.nonzero(isdiag)[0]]
        return jnp.einsum("nii->ni", diag_blocks).reshape(-1)

    def diag_blocks(self):
        """(n_brows, b, b) diagonal blocks — feeds block-Jacobi."""
        brow = self.block_row_ids
        isdiag = self.indices == brow
        return self.data[np.nonzero(isdiag)[0]]

    def todense(self):
        b = self.blocksize
        out = jnp.zeros(self.shape, self.data.dtype)
        for k, (i, j) in enumerate(zip(self.block_row_ids, self.indices)):
            out = out.at[i * b:(i + 1) * b, j * b:(j + 1) * b].set(
                self.data[k])
        return out

    def __repr__(self):
        return (f"BSR(shape={self.shape}, blocksize={self.blocksize}, "
                f"nblocks={len(self.indices)})")


jax.tree_util.register_pytree_node(
    BSR,
    lambda m: ((m.data,), (m.indices, m.indptr, m.shape, m.blocksize)),
    lambda aux, children: BSR(children[0], aux[0], aux[1], aux[2], aux[3]),
)


def spmv(A, x):
    """Polymorphic SpMV."""
    if isinstance(A, (CSR, ELL, DIA, BSR)):
        return A.matvec(x)
    return A @ x
