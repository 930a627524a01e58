"""Static selection tables applied through the Pallas SpMV tiers.

A selection ``y[i] = values_ext[src[i]]`` with a STATIC ``src`` table is
a sparse matrix with one unit entry per row — and XLA's TPU gather runs
at ~0.14 Gelem/s (docs/tpu_tuning.md §7d), so any hot-path selection
must ride the register-gather kernels instead.  This is the machinery
behind the colored-Jacobian decompression (ops/sparse_jac.py, 26.2 →
2.90 ms/step on the 512² assembly) and the CSR→DIA repack
(ops/spmv_dia.py), factored out once (r5):

* within the resident envelope → the windowed-ELL kernel (w = 1 rows,
  thin-plan rt amortization);
* beyond it → the two-pass scatter tier (``stage_unit``: packed tables
  are static validity masks, zero device gathers);
* CPU / no plan → the one-line XLA take (portable fallback — interpret-
  mode grid execution would be slower than the take it replaces).

Entries equal to ``n_src`` are PAD: they read the zero appended to the
value vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# test hook: exercise the Pallas paths off-TPU (interpret mode)
_FORCE_PALLAS_SELECT = False


class StaticSelection:
    """Plan for ``apply(values) -> values_ext[src]`` with static src."""

    def __init__(self, src, n_src: int):
        self.src = np.asarray(src, np.int64)
        self.n_src = int(n_src)
        self.n_out = len(self.src)
        self._plan = None
        self._scatter = None
        self._chunks = None
        if self.n_out == 0:
            return
        # Pad slots (src == n_src) become EMPTY ROWS of the selection
        # CSR, not reads of a sentinel column: a sentinel concentrates
        # every pad on one mega-hub column, which breaks the scatter
        # tier's column-range balancing (observed on the 512² CSR→DIA
        # repack: 2.7M pads on one column > the per-part cap).
        valid = self.src < self.n_src
        indptr1 = np.concatenate(
            [[0], np.cumsum(valid.astype(np.int64))])
        indices1 = self.src[valid]
        from .pallas_spmv import EllPlan, _default_rt
        plan = EllPlan(indptr1, indices1, self.n_out, self.n_src,
                       rt=_default_rt(indptr1, self.n_out))
        if plan.supported:
            self._plan = plan
            return
        # A MONOTONE selection whose source space merely exceeds the
        # resident VMEM cap chunks cleanly: output rows split so each
        # chunk's source RANGE fits, per-chunk EllPlans in local column
        # spaces, values statically sliced per chunk.  (The generic
        # scatter tier's zone ordering degenerates to ~37-tile dynamic
        # walks on these — measured 85 ms vs sub-ms chunked — so the
        # structure-aware path matters.)
        self._chunks = None
        chunks = self._build_monotone_chunks(indptr1, indices1)
        if chunks is not None:
            self._chunks = chunks
            return
        from .pallas_spmv_scatter import scatter_plan_for
        splan = scatter_plan_for(indptr1, indices1, self.n_out,
                                 self.n_src)
        if splan.supported:
            self._scatter = splan

    _MAX_CHUNKS = 64

    def _build_monotone_chunks(self, indptr1, indices1):
        """Piecewise-monotone w ≤ 1 selections (e.g. the CSR→DIA repack:
        per-diagonal ascending runs) chunk into independent EllPlans
        whose LOCAL source ranges fit the VMEM cap: segment the output
        rows at source descents, cap-split each ascending segment."""
        if not len(indices1) or bool(np.any(np.diff(indptr1) > 1)):
            return None
        from .pallas_spmv import EllPlan, _default_rt
        from .pallas_spmv_scatter import _x_cap
        cap = max(int(0.8 * _x_cap()), 1)
        ent = indices1.astype(np.int64)
        # row of each entry (w <= 1: strictly one entry per nonempty row)
        row_of_entry = np.flatnonzero(np.diff(indptr1) == 1)
        # segment starts: first entry and every source descent
        seg_starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(ent) < 0) + 1])
        cut_rows = {0, self.n_out}
        for si, s0 in enumerate(seg_starts):
            s1 = (seg_starts[si + 1] if si + 1 < len(seg_starts)
                  else len(ent))
            cut_rows.add(int(row_of_entry[s0]))
            pos = int(s0)
            while pos < s1:
                e_hi = int(np.searchsorted(ent[pos:s1],
                                           ent[pos] + cap) + pos)
                if e_hi == pos:
                    return None
                if e_hi < s1:
                    cut_rows.add(int(row_of_entry[e_hi]))
                pos = e_hi
        cut_rows = sorted(cut_rows)
        if len(cut_rows) - 1 > self._MAX_CHUNKS:
            return None
        chunks = []
        for r0, r1 in zip(cut_rows[:-1], cut_rows[1:]):
            lo, hi = int(indptr1[r0]), int(indptr1[r1])
            sub_idx = ent[lo:hi]
            src_lo = int(sub_idx.min()) if len(sub_idx) else 0
            src_hi = int(sub_idx.max()) + 1 if len(sub_idx) else 1
            if src_hi - src_lo > _x_cap():
                return None
            sub_indptr = indptr1[r0:r1 + 1] - indptr1[r0]
            plan = EllPlan(sub_indptr, sub_idx - src_lo, r1 - r0,
                           src_hi - src_lo,
                           rt=_default_rt(sub_indptr, r1 - r0))
            if not plan.supported:
                return None
            chunks.append((r0, r1, src_lo, src_hi, plan))
        return chunks if chunks else None

    @property
    def uses_kernel(self) -> bool:
        return (self._plan is not None or self._scatter is not None
                or self._chunks is not None)

    def apply(self, values, *, force=False):
        """values (n_src,) traced -> (n_out,) selected (pad slots 0)."""
        use_pallas = (force or jax.default_backend() == "tpu"
                      or _FORCE_PALLAS_SELECT)
        # every static table rides _dev_table: a fresh jnp.asarray per
        # trace embeds a multi-MB HLO literal per trace (the 512² dia
        # repack's valid mask is ~5.8M slots) — the same remote-compile
        # body-size / per-execution-reshipping failure _dev_table exists
        # to prevent (pallas_spmv.py)
        from .pallas_spmv import _dev_table
        if use_pallas and self._plan is not None:
            from .pallas_spmv import _ell_spmv_packed, _use_interpret
            plan = self._plan
            ones = _dev_table(plan, "valid", values.dtype).reshape(
                plan.ntiles, 8, plan.w, 128)
            return _ell_spmv_packed(plan, ones, plan.pack_x(values),
                                    _use_interpret(None))[:self.n_out]
        if use_pallas and self._chunks is not None:
            from .pallas_spmv import _ell_spmv_packed, _use_interpret
            outs = []
            for (_r0, _r1, s0, s1, plan) in self._chunks:
                ones = _dev_table(plan, "valid", values.dtype).reshape(
                    plan.ntiles, 8, plan.w, 128)
                outs.append(_ell_spmv_packed(
                    plan, ones, plan.pack_x(
                        jax.lax.slice(values, (s0,), (s1,))),
                    _use_interpret(None))[:plan.n_rows])
            return jnp.concatenate(outs)
        if use_pallas and self._scatter is not None:
            from .pallas_spmv import _use_interpret
            sp = self._scatter
            return sp.apply_staged(sp.stage_unit(values.dtype), values,
                                   _use_interpret(None))
        ext = jnp.concatenate([values, jnp.zeros((1,), values.dtype)])
        return ext[_dev_table(self, "src")]
