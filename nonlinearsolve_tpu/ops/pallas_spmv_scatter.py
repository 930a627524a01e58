"""Two-pass static-routing SpMV: the tier for patterns with NO structure.

Role: the reference's SuiteSparse/PETSc MatMult runs unstructured
patterns at any scale (/root/reference/ext/NonlinearSolvePETScExt.jl:123-142);
our resident windowed-ELL kernel (pallas_spmv.py) degenerates on them —
a random slot's 128 columns span ~128 distinct x tiles, so the masked
walk retrieves ~1 useful element per ~12-op tile visit — and the XLA
segment_sum fallback measures 0.06 Gnnz/s.  This tier removes the
column-locality requirement entirely.

Design (TPU-first)
------------------
A scalar gather/scatter with a STATIC pattern is a sparse matrix with
0/1 entries — so factor the matvec itself:

    y = A x  =  R · (G ∘ data) x

* ``G`` (P × n_cols) is the **expansion** operator: one nonzero per row,
  row k holds A's k-th nonzero *in a host-chosen order σ* and carries
  A's data, so ``p = G x`` is the vector of products data·x[col].
* ``R`` (n_rows × P) is the **regrouping** operator: row i sums the
  positions of row i's products (unit data).

Both are ordinary sparse patterns, so both passes run through the
EXISTING resident windowed-ELL kernel — the trick is choosing σ so that
*both* patterns have bounded gather windows, which no single-pass layout
of a random pattern can have:

    σ = lexsort(row // B  major,  col  minor)

* G-locality: 128 consecutive σ entries lie in one row-block *zone*
  sorted by column, so their columns span ~128 · n_cols / (B·w) — a
  window that SHRINKS as B grows.
* R-locality: row i's products all live inside its zone, a span of
  ~B·w positions — a window that GROWS with B.

Balancing the two (B ≈ sqrt(128 · n_cols) / w, clipped to the kernel's
W ≤ 512-tile-row cap) gives ~0.5–1.5 weighted vector-ops per nonzero on
uniform random patterns — a modeled bound of several Gnnz/s where the
masked walk is issue-bound at ~0.3 and segment_sum measures 0.06.

Scale-out is structural recursion, not a new kernel:
* rows denser than the kernel's 32-slot cap: R is CHAINED —
  R₂ · R₁ where R₁ reduces ≤32 positions into sub-rows and R₂ (whose
  windows are contiguous, hence tiny) folds ≤32 sub-rows per row;
* n_cols or nnz beyond the VMEM-resident envelope: COLUMN-RANGE parts,
  each its own two-pass plan on x[c0:c1], summed — so arbitrary sizes
  stream through bounded-footprint passes.

Zones are padded to 128-row multiples so no 128-row kernel group
straddles two zones (host-side coverage is asserted at plan build).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_spmv as _ps
from .pallas_spmv import (LANES, MAX_SLOTS, MAX_WINDOW_ROWS,
                          ROWS_PER_TILE, EllPlan, _ell_spmv_packed,
                          _round_up, _use_interpret, pattern_key)


def _x_cap() -> int:
    # read pallas_spmv's cap DYNAMICALLY: the envelope that EllPlan's
    # supported-check consults must be the same one the column splitter
    # uses, including under test monkeypatching
    return _ps.MAX_X_ELEMS_VMEM

# Leave W-cap slack: the zone span bound B*w <= ~0.75 of the kernel's
# 512-tile-row (65536-element) window ceiling.
_W_ELEM_CAP = MAX_WINDOW_ROWS * LANES
_ZONE_ELEM_CAP = (3 * _W_ELEM_CAP) // 4


def _rt_for(w: int, n_rows: int) -> int:
    """Row-tiles per grid step: amortize the ~1.5 us fixed step cost down
    to ~16 slot-tiles of gather work per step, without exceeding the
    plan's own tile count."""
    rt = max(1, 16 // max(w, 1))
    while rt > 1 and (rt * ROWS_PER_TILE) > 2 * max(n_rows, 1):
        rt //= 2
    return rt


def _ell_cost(plan: EllPlan, *, effective=False) -> float:
    """Weighted vector-ops per 128-row group of ``plan`` — delegated to
    pallas_spmv's model so the weights, the unroll threshold, and the
    dynamic-loop derate stay in ONE place.  ``effective=True`` applies
    the derate, used when comparing zone-height candidates."""
    if effective:
        return _ps._derated_cost("resident", plan)
    return _ps.spmv_tier_cost("resident", plan)


class _TwoPassPart:
    """One column-range part: G' (expand · data) + chained R reductions.

    Attributes (when ``ok``):
      g_plan    — EllPlan of the expansion pattern (P × n_cols)
      r_plans   — list of EllPlan reductions, applied in order; the last
                  one's n_rows == the part's n_rows
      sigma     — nnz permutation: part-CSR order -> G-row order
      P         — padded product-vector length (G row count)
    """

    def __init__(self, indptr, indices, n_rows, n_cols):
        self.ok = False
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int64)
        counts = np.diff(indptr)
        nnz = len(indices)
        if nnz == 0 or n_rows == 0:
            return
        w = int(counts.max())
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), counts)

        # Candidate zone heights around the G/R balance point.
        b_opt = int(np.sqrt(128.0 * max(n_cols, 1)) / max(w, 1))
        cand = []
        for b in (b_opt // 2, b_opt, 2 * b_opt):
            b = max(128 * max(b // 128, 1), 128)
            while b > 128 and b * w > _ZONE_ELEM_CAP:
                b //= 2
            if b not in cand:
                cand.append(b)
        best = None
        for B in cand:
            built = self._try_build(indptr, indices, rows, counts,
                                    n_rows, n_cols, nnz, B)
            if built is None:
                continue
            if best is None or built["eff_cost"] < best["eff_cost"]:
                best = built
        if best is None:
            return
        self.g_plan = best["g_plan"]
        self.r_plans = best["r_plans"]
        self.sigma = best["sigma"]
        self.P = best["P"]
        self.B = best["B"]
        self.cost = best["cost"]
        self.table_bytes = best["table_bytes"]
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.nnz = nnz
        self.ok = True

    @staticmethod
    def _try_build(indptr, indices, rows, counts, n_rows, n_cols, nnz, B):
        blk = rows // B
        nblocks = int(blk[-1]) + 1 if nnz else 1
        order = np.lexsort((indices, blk))
        zs = np.bincount(blk, minlength=nblocks)        # zone nnz
        zpad = ((zs + 127) // 128) * 128
        zstart = np.concatenate([[0], np.cumsum(zpad)])[:-1]
        zcum = np.concatenate([[0], np.cumsum(zs)])
        sorted_blk = blk[order]
        rank = np.arange(nnz, dtype=np.int64) - zcum[sorted_blk]
        pos_sorted = zstart[sorted_blk] + rank
        P = int(zpad.sum())
        if P > _x_cap():
            return None

        # G: P rows, one column each at the padded position's nonzero.
        # rt amortizes the kernel's fixed per-grid-step cost over 16
        # row-tiles — at w=1 a single tile is ~30 vector ops of work
        # against ~1.5 us of step overhead (measured v5e).
        g_counts = np.zeros(P, np.int64)
        g_counts[pos_sorted] = 1
        g_indptr = np.concatenate([[0], np.cumsum(g_counts)])
        g_indices = indices[order]      # G-CSR order == sorted order
        g_plan = EllPlan(g_indptr, g_indices, P, n_cols,
                         rt=_rt_for(1, P))
        if not g_plan.supported:
            return None

        # R chain: positions of each row's products, ascending (within a
        # zone sorted by column, a row's entries keep their column order,
        # so CSR-order positions are already ascending per row).
        pos_csr = np.empty(nnz, np.int64)
        pos_csr[order] = pos_sorted
        cur_indptr, cur_indices = indptr, pos_csr
        cur_len, out_rows = P, n_rows
        r_plans = []
        while True:
            ccounts = np.diff(cur_indptr)
            wmax = int(ccounts.max()) if ccounts.size else 1
            if wmax <= MAX_SLOTS:
                rp = EllPlan(cur_indptr, cur_indices, out_rows, cur_len,
                             rt=_rt_for(wmax, out_rows))
                if not rp.supported:
                    return None
                r_plans.append(rp)
                break
            # Split every row's entry list into <=MAX_SLOTS chunks: R1
            # keeps the zone-bounded windows, R2's sub-rows per row are
            # contiguous (tiny windows by construction).
            nsub = (ccounts + MAX_SLOTS - 1) // MAX_SLOTS
            nsub = np.maximum(nsub, 1)
            sub_total = int(nsub.sum())
            sub_row = np.repeat(np.arange(len(ccounts)), nsub)
            sub_first = np.concatenate([[0], np.cumsum(nsub)])[:-1]
            sub_rank = np.arange(sub_total) - sub_first[sub_row]
            sub_counts = np.minimum(
                ccounts[sub_row] - sub_rank * MAX_SLOTS, MAX_SLOTS)
            r1_indptr = np.concatenate([[0], np.cumsum(sub_counts)])
            rp1 = EllPlan(r1_indptr, cur_indices, sub_total, cur_len,
                          rt=_rt_for(MAX_SLOTS, sub_total))
            if not rp1.supported:
                return None
            r_plans.append(rp1)
            cur_indptr = np.concatenate([[0], np.cumsum(nsub)])
            cur_indices = np.arange(sub_total, dtype=np.int64)
            cur_len = sub_total
            # loop folds sub-rows; next wmax = ceil of previous /32

        cost = _ell_cost(g_plan) * (g_plan.n_pad // LANES)
        eff = _ell_cost(g_plan, effective=True) * (g_plan.n_pad // LANES)
        table_bytes = 8 * g_plan.idx.size + 8 * P     # G tables + p rw
        for rp in r_plans:
            cost += _ell_cost(rp) * (rp.n_pad // LANES)
            eff += _ell_cost(rp, effective=True) * (rp.n_pad // LANES)
            table_bytes += 8 * rp.idx.size            # idx + unit data
        return {"g_plan": g_plan, "r_plans": r_plans, "sigma": order,
                "P": P, "B": B, "cost": cost, "eff_cost": eff,
                "table_bytes": table_bytes}


class ScatterPlan:
    """Host-built two-pass plan for one pattern, with column-range parts
    when n_cols or the product vector exceed the VMEM-resident envelope.

    ``parts`` is a list of (c0, c1, data_sel, _TwoPassPart): the column
    range [c0, c1) and ``data_sel``, which maps A's CSR data order to
    the part's CSR data order (a static take, hoisted by the staged
    closure)."""

    def __init__(self, indptr, indices, n_rows, n_cols):
        self.ok = False
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int64)
        self.indptr = indptr
        self.indices = indices
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)
        self.n_pad = _round_up(max(self.n_rows, 1), ROWS_PER_TILE)
        self._transpose = None
        nnz = len(indices)
        if nnz == 0:
            return
        cap = int(0.9 * _x_cap())
        nsplit = max(-(-self.n_cols // cap), -(-nnz // cap))
        # Column boundaries balancing nnz per part.
        if nsplit == 1:
            bounds = [0, self.n_cols]
        else:
            percol = np.bincount(indices, minlength=self.n_cols)
            cums = np.cumsum(percol)
            targets = (np.arange(1, nsplit) * nnz) / nsplit
            cuts = np.searchsorted(cums, targets) + 1
            bounds = [0] + sorted(set(int(c) for c in cuts)) + [self.n_cols]
            bounds = sorted(set(bounds))
        counts = np.diff(indptr)
        rows = np.repeat(np.arange(self.n_rows, dtype=np.int64), counts)
        parts = []
        for c0, c1 in zip(bounds[:-1], bounds[1:]):
            sel = np.flatnonzero((indices >= c0) & (indices < c1))
            if sel.size == 0:
                continue
            if sel.size > _x_cap():
                return      # a single column range can't be split further
            prows = rows[sel]
            pindices = indices[sel] - c0
            pindptr = np.concatenate(
                [[0], np.cumsum(np.bincount(prows,
                                            minlength=self.n_rows))])
            part = _TwoPassPart(pindptr, pindices, self.n_rows, c1 - c0)
            if not part.ok:
                return
            part.sel = sel          # also on the part: _dev_table caching
            parts.append((int(c0), int(c1), sel, part))
        if not parts:
            return
        self.parts = parts
        self.nnz = nnz
        self.cost = sum(p.cost for (_c0, _c1, _s, p) in parts)
        self.table_bytes = sum(p.table_bytes
                               for (_c0, _c1, _s, p) in parts)
        self.ok = True

    @property
    def supported(self) -> bool:
        return self.ok

    @property
    def row_ids(self):
        return np.repeat(np.arange(self.n_rows, dtype=np.int64),
                         np.diff(self.indptr))

    def transpose_pattern(self):
        """(tindptr, tindices, tperm) of A^T (host, cached)."""
        if self._transpose is None:
            self._transpose = _ps.transpose_pattern_of(
                self.indptr, self.indices, self.n_rows, self.n_cols)
        return self._transpose

    # -- traced application -------------------------------------------------

    def stage(self, csr_data, interpret: bool):
        """Hoistable per-data state: packed G tables + packed unit R
        tables per part (one pass over the data, once per Newton step).
        Static tables (sel/sigma/validity masks, nnz-scale) ride
        _dev_table — per-trace jnp.asarray embeds them as HLO literals
        (pallas_spmv.py)."""
        from .pallas_spmv import _dev_table
        staged = []
        for (_c0, _c1, _sel, part) in self.parts:
            pdata = jnp.take(csr_data, _dev_table(part, "sel"))
            gdata = jnp.take(pdata, _dev_table(part, "sigma"))
            g_packed = part.g_plan.pack_data(gdata)
            r_packed = [_dev_table(rp, "valid", csr_data.dtype).reshape(
                rp.ntiles, 8, rp.w, LANES) for rp in part.r_plans]
            staged.append((g_packed, r_packed))
        return staged

    def stage_unit(self, dtype):
        """Staged state for UNIT data (selection/permutation operators,
        e.g. the colored-Jacobian decompression): the packed tables are
        the plans' static validity masks — zero device gathers, safe to
        rebuild inside any trace."""
        from .pallas_spmv import _dev_table
        staged = []
        for (_c0, _c1, _sel, part) in self.parts:
            g = part.g_plan
            g_packed = _dev_table(g, "valid", dtype).reshape(
                g.ntiles, 8, g.w, LANES)
            r_packed = [_dev_table(rp, "valid", dtype).reshape(
                rp.ntiles, 8, rp.w, LANES) for rp in part.r_plans]
            staged.append((g_packed, r_packed))
        return staged

    def apply_staged(self, staged, x, interpret: bool):
        y = None
        for (c0, c1, _sel, part), (g_packed, r_packed) in zip(
                self.parts, staged):
            xp = jax.lax.slice_in_dim(x, c0, c1)
            p = _ell_spmv_packed(part.g_plan, g_packed,
                                 part.g_plan.pack_x(xp), interpret)
            for rp, packed in zip(part.r_plans, r_packed):
                p = _ell_spmv_packed(rp, packed,
                                     rp.pack_x(p[:rp.n_cols]), interpret)
            yp = p[:self.n_rows]
            y = yp if y is None else y + yp
        return y


_SCATTER_PLAN_CACHE: dict = {}


def scatter_plan_for(indptr, indices, n_rows, n_cols) -> ScatterPlan:
    key = pattern_key(indptr, indices, n_rows, n_cols)
    plan = _SCATTER_PLAN_CACHE.get(key)
    if plan is None:
        plan = ScatterPlan(indptr, indices, int(n_rows), int(n_cols))
        _SCATTER_PLAN_CACHE[key] = plan
    return plan


def _scatter_spmv_core(plan: ScatterPlan, interpret: bool, csr_data, x):
    return plan.apply_staged(plan.stage(csr_data, interpret), x, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _scatter_spmv_ad(plan, interpret, csr_data, x):
    return _scatter_spmv_core(plan, interpret, csr_data, x)


def _scatter_spmv_fwd(plan, interpret, csr_data, x):
    return _scatter_spmv_core(plan, interpret, csr_data, x), (csr_data, x)


def _scatter_spmv_bwd(plan, interpret, res, ybar):
    csr_data, x = res
    tindptr, tindices, tperm = plan.transpose_pattern()
    tplan = scatter_plan_for(tindptr, tindices, plan.n_cols, plan.n_rows)
    tdata = jnp.take(csr_data, jnp.asarray(tperm))
    if tplan.supported:
        xbar = _scatter_spmv_core(tplan, interpret, tdata, ybar)
    else:
        prod = tdata * jnp.take(ybar, jnp.asarray(tindices))
        xbar = jax.ops.segment_sum(
            prod, jnp.asarray(np.repeat(np.arange(plan.n_cols),
                                        np.diff(tindptr))),
            num_segments=plan.n_cols)
    from .pallas_spmv import _dev_table
    dbar = (jnp.take(ybar, _dev_table(plan, "row_ids"))
            * jnp.take(x, _dev_table(plan, "indices")))
    return dbar.astype(csr_data.dtype), xbar.astype(x.dtype)


_scatter_spmv_ad.defvjp(_scatter_spmv_fwd, _scatter_spmv_bwd)


def scatter_spmv_pallas(plan: ScatterPlan, csr_data, x, *, interpret=None):
    """y = A @ x through the two-pass expand/regroup kernels
    (reverse-mode differentiable in both operands; the x-cotangent rides
    the transpose-pattern plan)."""
    return _scatter_spmv_ad(plan, _use_interpret(interpret), csr_data, x)


def scatter_spmv_staged(plan: ScatterPlan, csr_data, *, interpret=None):
    """Pre-staged forward-only matvec closure (packing hoisted — same
    contract as pallas_spmv.csr_spmv_staged)."""
    interp = _use_interpret(interpret)
    staged = plan.stage(csr_data, interp)

    def mv(x):
        return plan.apply_staged(staged, x, interp)

    return mv
