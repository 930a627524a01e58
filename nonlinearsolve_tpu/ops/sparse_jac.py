"""Colored sparse-AD Jacobian assembly.

The single biggest net-new numerical component relative to plain JAX
(SURVEY.md §7): compute a sparse Jacobian in ``n_colors`` JVP passes instead
of ``n`` — the TPU equivalent of the reference's
``AutoSparse(ad; sparsity_detector, coloring_algorithm)`` path
(jacobian.jl:286-360).

Pipeline (pattern + coloring static, computed once at trace time):
  seeds[c] = Σ_{color(j)=c} e_j                      (n_colors, n)
  compressed = vmap(jvp(f, u, seed))                 (n_colors, m)
  data[k]   = compressed[color(col(k)), row(k)]      (nnz,) gather

The decompression gather is a STATIC selection — and XLA's TPU gather
runs at ~0.14 Gelem/s (docs/tpu_tuning.md §7d), ~22 ms/step on a 512²
Brusselator Jacobian — so on TPU it rides the windowed-ELL register
kernel instead: over the ROW-MAJOR transpose of ``compressed`` the k-th
nonzero reads flat index ``row(k)·C + color(col(k))``, which is
monotone in k up to a C-wide wiggle, i.e. a tiny gather window.  The
XLA take stays as the portable fallback (CPU, or patterns beyond the
kernel envelope).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .coloring import detect_sparsity, greedy_column_coloring, pattern_from
from .sparse import CSR

# test hook: exercise the Pallas decompression paths off-TPU (interpret)
_FORCE_PALLAS_DECOMPRESS = False


class ColoredJacobian:
    """Precomputed plan for sparse Jacobian assembly into CSR."""

    def __init__(self, pattern: CSR, colors: np.ndarray):
        self.pattern = pattern
        self.colors = np.asarray(colors, np.int32)
        self.n_colors = int(colors.max()) + 1 if colors.size else 0
        n_out, n_in = pattern.shape
        # Seed matrix (n_colors, n_in)
        seeds = np.zeros((self.n_colors, n_in))
        seeds[self.colors, np.arange(n_in)] = 1.0
        self._seeds = seeds
        # Gather plan: nnz entry k at (row r, col c) reads compressed
        # [color[c], r]  → flat index color[c] * n_out + r.
        row_ids = pattern.row_ids
        self._gather = (self.colors[pattern.indices].astype(np.int64) * n_out
                        + row_ids.astype(np.int64))
        # Pallas decompression plan (module docstring): a static
        # selection over the row-major layout, one source per nonzero —
        # rides the shared StaticSelection machinery (ops/selection.py:
        # windowed-ELL within the resident envelope, two-pass scatter
        # beyond it, XLA take as the portable fallback).
        self._select = None
        nnz = len(self._gather)
        if nnz and self.n_colors:
            from .selection import StaticSelection
            src = (row_ids.astype(np.int64) * self.n_colors
                   + self.colors[pattern.indices].astype(np.int64))
            sel = StaticSelection(src, n_out * self.n_colors)
            if sel.uses_kernel:
                self._select = sel

    # -- assembly-direct DIA (r5) -------------------------------------------

    @property
    def dia_plan(self):
        """The pattern's DiaPlan when the dia SpMV tier owns it, else
        None — decides whether :meth:`dia` is available."""
        if not hasattr(self, "_dia_plan"):
            from .pallas_spmv import select_spmv_plan
            n_out, n_in = self.pattern.shape
            tier, dplan, perm, _, _ = select_spmv_plan(
                self.pattern.indptr, self.pattern.indices, n_out, n_in)
            self._dia_plan = (dplan if tier == "dia" and perm is None
                              else None)
            self._dia_sel = None
        return self._dia_plan

    def dia(self, f_flat: Callable, u):
        """Assemble DIRECTLY into the dia tier's (ndiag, n) streaming
        layout: slot (d, i) reads compressed[color(i+off_d), i] — ONE
        static selection from the compressed JVP stack, skipping both
        the CSR decompression and the per-step CSR→DIA repack the
        staged matvec would pay (each ≈ a kernel pass).  Returns a DIA
        container (data convention data[d, i] = J[i, i+off_d])."""
        dplan = self.dia_plan
        if dplan is None:
            raise ValueError("pattern is not dia-tier eligible")
        if self._dia_sel is None:
            from .selection import StaticSelection
            n_out = self.pattern.shape[0]
            n_src = n_out * self.n_colors
            # row-major flat source (row*C + color) over the transposed
            # compressed stack; pattern-absent slots stay at the n_src
            # sentinel (-> 0)
            src = np.full((dplan.ndiag, n_out), n_src, np.int64)
            row_ids = self.pattern.row_ids.astype(np.int64)
            src[dplan._dpos, dplan._row_ids] = (
                row_ids * self.n_colors
                + self.colors[self.pattern.indices].astype(np.int64))
            self._dia_sel = StaticSelection(src.reshape(-1), n_src)
        compressed = self._compressed(f_flat, u)
        use_pallas = (jax.default_backend() == "tpu"
                      or _FORCE_PALLAS_DECOMPRESS)
        dd = self._dia_sel.apply(compressed.T.reshape(-1),
                                 force=use_pallas).reshape(
            dplan.ndiag, self.pattern.shape[0])
        from .sparse import DIA
        return DIA(dd, dplan.offsets, self.pattern.shape)

    def _compressed(self, f_flat: Callable, u):
        seeds = jnp.asarray(self._seeds, u.dtype)
        if jnp.ndim(u) != 1:
            seeds = seeds.reshape((seeds.shape[0],) + jnp.shape(u))

        def one_color(seed):
            return jnp.ravel(jax.jvp(f_flat, (u,), (seed,))[1])

        return jax.vmap(one_color)(seeds)            # (n_colors, n_out)

    def __call__(self, f_flat: Callable, u) -> CSR:
        compressed = self._compressed(f_flat, u)
        # The Pallas decompression only pays off on real hardware; on the
        # CPU backend interpret-mode grid execution would be far slower
        # than the one-line XLA gather (tests force the kernel paths via
        # _FORCE_PALLAS_DECOMPRESS).
        use_pallas = (jax.default_backend() == "tpu"
                      or _FORCE_PALLAS_DECOMPRESS)
        if use_pallas and self._select is not None:
            data = self._select.apply(compressed.T.reshape(-1),
                                      force=True)
        else:
            data = compressed.reshape(-1)[jnp.asarray(self._gather)]
        return self.pattern.with_data(data)


def plan_sparse_jacobian(f_flat: Callable, n_in: int, n_out: int, *,
                         sparsity=None, colorvec=None,
                         dtype=np.float64) -> ColoredJacobian:
    """Build the (pattern, coloring) plan.  ``sparsity`` may be a CSR
    pattern, dense mask, or None (probe-detected)."""
    if sparsity is None:
        pattern = detect_sparsity(f_flat, n_in, dtype=dtype)
    else:
        pattern = pattern_from(sparsity, n_out, n_in)
    colors = (np.asarray(colorvec, np.int32) if colorvec is not None
              else greedy_column_coloring(pattern))
    return ColoredJacobian(pattern, colors)
