"""Device-side triangular application of the host-persistent sparse LU.

Role: the reference's KLU path factors on host and SOLVES on host too —
fine on a CPU, but on TPU every host round-trip costs ~25 ms on a
tunnel-attached chip (docs/tpu_tuning.md §8), so a Newton step with a
concrete sparse Jacobian pays host latency per linear solve, and using
the exact factor as a Krylov PRECONDITIONER (the KLU-preconditioned
role of /root/reference/docs/src/tutorials/large_systems.md:211-244)
would pay it per Krylov iteration — a non-starter.

This module keeps the numeric (re)factorization on host — sequential
elimination is hostile to TPUs — but applies the triangular factors
ON-DEVICE:

* the C factor object exports the factors in pivot space
  (``csrc/sparsetools.cpp:sp_lu_factor_export``): strict-lower L-hat
  (unit diagonal), strict-upper U-hat, diagonal, and the composed
  row/column permutations;
* the factor PATTERN is static across numeric-only refactorizations
  (full-pattern retention + frozen pivot order), so a **level schedule**
  is built host-side once per pattern: rows grouped by dependency depth,
  each level an ELL-padded (rows, cols, value-slot) table;
* ``refresh(data)`` runs ONE ``pure_callback`` (refactor + export +
  static scatter of values into the level tables) returning a traced
  value pytree; ``solve(state, b)`` then runs entirely on device —
  per level a static-index gather + dot + row update.  A Newton step
  costs at most one host callback; reusing the factor (modified Newton,
  IFT/sensitivity second solves, Krylov preconditioning) costs none.

A re-pivot (degraded pivot on refactorization, rc -3) changes the fill
pattern; the callback detects it via the factorization counter and
reports ``ok=False`` so the caller falls back to the exact host path for
that step.  Schedules deeper than ``MAX_LEVELS`` or with pathological
ELL padding are rejected at plan time (``supported == False``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

MAX_LEVELS = 768          # unrolled per-level ops in the traced solve
                          # (r5: a width-bucketed 256² Bratu factor
                          # needs 675 stages; compile cost measured
                          # acceptable — docs/tpu_tuning.md)
PAD_RATIO_CAP = 4.0       # per-level ELL padding budget vs nnz
# Levels at most this many rows are absorbed into dense triangular
# blocks (runs of consecutive thin levels, each block one fused XLA
# TriangularSolve); wider levels stay sparse ELL stages.  The 64² Bratu
# factor's 458 levels collapse to ~10 stages.
DENSE_TAIL_MAX_LEVEL_ROWS = 128
DENSE_TAIL_ROWS_CAP = 1024
# Dense stages are applied by BLOCKED substitution with host-inverted
# SB x SB diagonal blocks — XLA's TriangularSolve serializes narrow
# solves (measured v5e: 2.6 ms and a 450 s compile for one 864² solve;
# the blocked matmul form is a handful of fused ops).
DENSE_SUB_BLOCK = 128


def _levels_from_csc(colptr, rowidx, n, *, descending=False):
    """Dependency depth per row for a strict triangular factor stored
    CSC-by-pivot-column.  Entry (r, k) means row r depends on slot k;
    processing columns in elimination order (ascending for L, descending
    for U) is topological, so each column's level is final when its
    dependents are updated."""
    lvl = np.zeros(n, np.int64)
    order = range(n - 1, -1, -1) if descending else range(n)
    for k in order:
        rows = rowidx[colptr[k]:colptr[k + 1]]
        if rows.size:
            np.maximum.at(lvl, rows, lvl[k] + 1)
    return lvl


def _ell_rows(rows, row_start, kk, ee, counts, nnz):
    """ELL-pad the (col, export-idx) lists of ``rows``: pad value-slots
    point at index nnz, where a zero is appended to the value vector."""
    w = int(counts[rows].max()) if rows.size else 0
    M = len(rows)
    cols = np.zeros((M, w), np.int64)
    vmap = np.full((M, w), nnz, np.int64)
    for i, rv in enumerate(rows):
        a, b = row_start[rv], row_start[rv + 1]
        cols[i, :b - a] = kk[a:b]
        vmap[i, :b - a] = ee[a:b]
    return cols, vmap


def _stage_schedule(colptr, rowidx, n, lvl, *, width_buckets=False):
    """The level schedule as an ordered list of STAGES.

    A wide level stays a sparse ELL stage ('ell', rows (M,), cols (M, w),
    vmap (M, w)) — ``cols`` indexes the evolving solution vector,
    ``vmap`` the EXPORT-ORDER value array.  RUNS of thin consecutive
    levels (the elimination tree's long chains — the 64² Bratu factor
    has 458 levels, 449 of them ≤ 32 rows) are collapsed into ONE dense
    stage ('dense', block): rows ordered by (depth, pivot) so mutual
    couplings form a strictly-lower (T, T) block solved by a single
    fused TriangularSolve; dependencies on earlier stages ride an
    ELL-padded pre-gather (pre_cols/pre_vmap).  Depth-0 rows outside any
    block appear in no stage (handled by the sweep's initialization).

    Returns (stages, pad_slots)."""
    nnz = int(colptr[n])
    cols_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(colptr))
    r = np.asarray(rowidx, np.int64)
    order = np.lexsort((cols_of, r))
    rr, kk, ee = r[order], cols_of[order], order
    counts = np.bincount(rr, minlength=n)
    row_start = np.concatenate([[0], np.cumsum(counts)])
    nlev = int(lvl.max()) + 1 if n else 1

    stages = []
    total = 0
    pending = []          # row arrays of thin levels awaiting a block
    pending_rows = 0

    def build_block(row_groups):
        rows_t = np.concatenate(row_groups)      # (lvl asc, pivot asc)
        T = len(rows_t)
        tpos = np.full(n, -1, np.int64)
        tpos[rows_t] = np.arange(T)
        in_blk = tpos >= 0
        sel = in_blk[rr]
        rr_t, kk_t, ee_t = rr[sel], kk[sel], ee[sel]
        dense_sel = in_blk[kk_t]
        dense_ij = (tpos[rr_t[dense_sel]], tpos[kk_t[dense_sel]])
        dense_k = ee_t[dense_sel]
        pre_r, pre_k, pre_e = (rr_t[~dense_sel], kk_t[~dense_sel],
                               ee_t[~dense_sel])
        pcounts = np.bincount(pre_r, minlength=n)
        wp = int(pcounts[rows_t].max()) if T else 0
        pre_cols = np.zeros((T, wp), np.int64)
        pre_vmap = np.full((T, wp), nnz, np.int64)
        porder = np.argsort(pre_r, kind="stable")
        pre_k, pre_e = pre_k[porder], pre_e[porder]
        pstart = np.concatenate([[0], np.cumsum(pcounts)])
        for i, rv in enumerate(rows_t):
            a, b = pstart[rv], pstart[rv + 1]
            pre_cols[i, :b - a] = pre_k[a:b]
            pre_vmap[i, :b - a] = pre_e[a:b]
        return {"rows": rows_t, "pre_cols": pre_cols,
                "pre_vmap": pre_vmap, "dense_ij": dense_ij,
                "dense_k": dense_k, "T": T}

    def flush():
        nonlocal pending, pending_rows, total
        if pending:
            blk = build_block(pending)
            stages.append(("dense", blk))
            total += blk["pre_cols"].size
            pending, pending_rows = [], 0

    def ell_width_buckets(rows):
        """Split a level's rows into width classes (max ≤ ~2× min per
        bucket): ELL-padding a whole level to its widest row explodes
        past PAD_RATIO_CAP on 192²+ factors (measured: one U level's
        padding alone 26.5M slots vs 6M nnz); buckets bound the waste at
        ~2× while staying same-depth (order within a level is free)."""
        w_r = counts[rows]
        nnz_lvl = max(int(w_r.sum()), 1)
        pad_one = rows.size * int(w_r.max()) - nnz_lvl
        if not width_buckets or pad_one <= 0.5 * nnz_lvl:
            return [rows]          # whole level in one stage: fine
        order_w = np.argsort(w_r, kind="stable")
        rows_s, w_s = rows[order_w], w_r[order_w]
        start = 0
        out = []
        while start < len(rows_s):
            w0 = max(int(w_s[start]), 1)
            end = int(np.searchsorted(w_s, max(2 * w0, w0 + 8),
                                      side="right"))
            end = max(end, start + 1)
            out.append(rows_s[start:end])
            start = end
        return out

    for ell in range(1, nlev):
        rows = np.flatnonzero(lvl == ell)
        if rows.size == 0:
            continue
        if rows.size > DENSE_TAIL_MAX_LEVEL_ROWS:
            flush()
            for bucket in ell_width_buckets(rows):
                cols, vmap = _ell_rows(bucket, row_start, kk, ee,
                                       counts, nnz)
                stages.append(("ell", bucket, cols, vmap))
                total += cols.size
        else:
            if pending_rows + rows.size > DENSE_TAIL_ROWS_CAP:
                flush()
            pending.append(rows)
            pending_rows += int(rows.size)
    flush()
    return stages, total


class DeviceLU:
    """Host-factored, device-applied sparse LU (see module docstring).

    ``sample_data`` fixes the pivot order at plan time; refactorizations
    reuse it (KLU-style).  ``supported`` is False when the native library
    is missing, the sample factorization fails, or the level schedule is
    too deep/padded for an unrolled device sweep.
    """

    def __init__(self, indptr, indices, n, *, perm=None, sample_data=None,
                 dtype=jnp.float32):
        import threading
        self.n = int(n)
        self.dtype = dtype
        self.supported = False
        self.fac = None
        self.repivoted = False     # a refresh hit a pivot-order change
        self._repivot_data = None  # the data that forced it (rebase seed)
        self._refresh_lock = threading.Lock()
        try:
            from ..native import SpLuFactor, amd_ordering, get_lib
            if get_lib() is None:
                return
            if perm is None:
                # fill-reducing ordering is not optional here: natural-
                # order fill also DEEPENS the level schedule
                perm = amd_ordering(np.asarray(indptr, np.int32),
                                    np.asarray(indices, np.int32), self.n)
            fac = SpLuFactor(indptr, indices, self.n, perm=perm)
        except (RuntimeError, OSError):
            return
        if sample_data is None:
            # deterministic pseudo-values with a dominant diagonal: the
            # threshold pivoting then prefers the diagonal, the most
            # refactorization-stable order for PDE Jacobians
            rng = np.random.default_rng(0)
            indptr_a = np.asarray(indptr, np.int64)
            indices_a = np.asarray(indices, np.int64)
            rows = np.repeat(np.arange(self.n), np.diff(indptr_a))
            sample_data = rng.uniform(0.5, 1.5, size=len(indices_a))
            sample_data = np.where(indices_a == rows,
                                   10.0 + sample_data, -sample_data)
        if fac.factorize(np.asarray(sample_data, np.float64)) != 0:
            return
        exp = fac.export_factor()
        if exp is None:
            return
        self.fac = fac
        self.epoch = exp["n_factor"]
        self.nnzL = len(exp["Lrow"])
        self.nnzU = len(exp["Urow"])
        lvlL = _levels_from_csc(exp["Lp"], exp["Lrow"], self.n)
        lvlU = _levels_from_csc(exp["Up"], exp["Urow"], self.n,
                                descending=True)
        self.Lstages, padL = _stage_schedule(exp["Lp"], exp["Lrow"],
                                             self.n, lvlL)
        self.Ustages, padU = _stage_schedule(exp["Up"], exp["Urow"],
                                             self.n, lvlU)
        if padL + padU > PAD_RATIO_CAP * max(self.nnzL + self.nnzU, 1):
            # rebuild with per-level width buckets: uneven U levels on
            # 192²+ factors pad 8-9x in one-stage-per-level form (a
            # single wide row pads the whole level); bucketing bounds
            # the waste at ~2x per stage at the price of more stages,
            # so it is the FALLBACK, not the default
            self.Lstages, padL = _stage_schedule(
                exp["Lp"], exp["Lrow"], self.n, lvlL, width_buckets=True)
            self.Ustages, padU = _stage_schedule(
                exp["Up"], exp["Urow"], self.n, lvlU, width_buckets=True)
        if len(self.Lstages) + len(self.Ustages) > MAX_LEVELS:
            return
        if padL + padU > PAD_RATIO_CAP * max(self.nnzL + self.nnzU, 1):
            return
        self._in_perm_np = exp["in_perm"].astype(np.int64)
        out_inv = np.empty(self.n, np.int64)
        out_inv[exp["out_perm"]] = np.arange(self.n)
        self._out_inv_np = out_inv
        # Sweep-order renumbering: XLA TPU scatter effectively serializes
        # per element (~1 Melem/s measured — .at[rows].add across the
        # stages cost ~4.5 ms of the 64² factor's 4.7 ms solve), so each
        # sweep works in its own ordering where every stage's rows are a
        # CONTIGUOUS segment and updates are static slice-sets.  The two
        # orderings are bridged by single static n-gathers at the phase
        # boundaries.
        self._build_sweep_orders()
        # Per-stage Pallas gather plans: XLA's take gathers run at
        # ~0.14 Gelem/s on TPU (docs/tpu_tuning.md §7d) while the
        # windowed-ELL register-gather kernel runs the same static
        # patterns 30-50x faster.  Values are packed into kernel layout
        # by the refresh callback, so the device sweep reads them
        # directly.
        self._plan_stage_gathers()
        self.supported = True

    # -- state construction -------------------------------------------------

    def _build_sweep_orders(self):
        """Per-sweep renumbering: [untouched depth-0 rows] then each
        stage's rows as one contiguous segment, in stage order.  Stage
        column tables are remapped into the sweep's ordering; per-stage
        segment offsets are recorded for static slice updates."""
        def order_for(stages):
            groups = []
            for stage in stages:
                groups.append(stage[1]["rows"] if stage[0] == "dense"
                              else stage[1])
            staged = (np.concatenate(groups) if groups
                      else np.zeros(0, np.int64))
            untouched = np.setdiff1d(np.arange(self.n, dtype=np.int64),
                                     staged, assume_unique=False)
            perm = np.concatenate([untouched, staged])
            pos = np.empty(self.n, np.int64)
            pos[perm] = np.arange(self.n)
            offs = []
            off = len(untouched)
            for g in groups:
                offs.append(off)
                off += len(g)
            return perm, pos, offs

        self._permL, posL, self._offL = order_for(self.Lstages)
        self._permU, posU, self._offU = order_for(self.Ustages)

        def remap(stages, pos):
            out = []
            for stage in stages:
                if stage[0] == "ell":
                    _t, rows, cols, vmap = stage
                    out.append(("ell", rows, pos[cols], vmap))
                else:
                    blk = stage[1]
                    blk["pre_cols"] = pos[blk["pre_cols"]]
                    out.append(stage)
            return out

        self.Lstages = remap(self.Lstages, posL)
        self.Ustages = remap(self.Ustages, posU)
        # composed static gathers: pivot-space plumbing never appears at
        # runtime — b -> L-order, L-order -> U-order, U-order -> x
        self.in_take = jnp.asarray(
            np.asarray(self._in_perm_np)[self._permL])
        self.lu_map = jnp.asarray(posL[self._permU])
        out_inv_np = np.asarray(self._out_inv_np)
        self.out_take = jnp.asarray(posU[out_inv_np])

    def _plan_stage_gathers(self):
        """Attach a windowed-ELL SpMV plan to every gather table (ELL
        stages and dense-stage pre-gathers) that fits the kernel
        envelope; others keep the XLA-take fallback.  TPU backend only:
        plan layout decides the refresh packing, and interpret-mode grid
        execution on CPU is orders slower than the take it replaces
        (a 128² factor's 34 ELL stages hang for minutes eagerly)."""
        from .pallas_spmv import MAX_SLOTS, EllPlan as SpmvPlan
        on_tpu = jax.default_backend() == "tpu"

        def plan_for(cols, vmap, nnz_flat):
            if not on_tpu:
                return None
            M, w = vmap.shape
            if M == 0 or w == 0:
                return None
            valid = vmap != nnz_flat
            counts = valid.sum(axis=1)
            # rows wider than the kernel's slot cap split into S
            # sub-rows summed after the kernel (chained-reduction trick)
            S = max(1, -(-w // MAX_SLOTS))
            if S == 1:
                sub_counts = counts
            else:
                sub_counts = np.clip(
                    counts[:, None] - MAX_SLOTS * np.arange(S)[None, :],
                    0, MAX_SLOTS).reshape(-1)
            indptr = np.concatenate([[0], np.cumsum(sub_counts)])
            indices = cols[valid]
            plan = SpmvPlan(indptr, indices, M * S, self.n)
            if not plan.supported:
                return None
            return {"plan": plan, "valid": valid, "S": S, "M": M}

        def warm(g):
            # materialize the kernel tables as device arrays NOW (outside
            # any trace): a fresh jnp.asarray per trace embeds them as
            # HLO literals — the axon remote-compile rejected the 128²
            # factor's ~30 MB of stage tables with HTTP 413, and the
            # tunnel re-ships program constants per execution
            if g is not None:
                from .pallas_spmv import _dev_table
                _dev_table(g["plan"], "r0")
                _dev_table(g["plan"], "idx")
            return g

        def attach(stages, nnz_flat):
            out = []
            for stage in stages:
                if stage[0] == "ell":
                    _tag, rows, cols, vmap = stage
                    out.append(("ell", rows, cols, vmap,
                                warm(plan_for(cols, vmap, nnz_flat))))
                else:
                    blk = stage[1]
                    blk["pre_plan"] = warm(plan_for(
                        blk["pre_cols"], blk["pre_vmap"], nnz_flat))
                    out.append(stage)
            return out

        self.Lstages = attach(self.Lstages, self.nnzL)
        self.Ustages = attach(self.Ustages, self.nnzU)

    @staticmethod
    def _dense_block(blk, vals, diag):
        """(M (Tp, Tp), Minv (K, SB, SB)) numpy pair for a dense stage:
        the full lower-triangular block (unit diagonal when ``diag`` is
        None, padded rows get identity) plus the inverses of its SB x SB
        diagonal sub-blocks, inverted HOST-side at refresh (trivial
        flops) so the device sweep is pure matmuls."""
        import scipy.linalg as sla
        T = blk["T"]
        SB = DENSE_SUB_BLOCK
        Tp = -(-max(T, 1) // SB) * SB
        M = np.zeros((Tp, Tp))
        M[blk["dense_ij"]] = vals[blk["dense_k"]]
        dvec = np.ones(Tp)
        if diag is not None:
            dvec[:T] = diag[blk["rows"]]
        M[np.arange(Tp), np.arange(Tp)] = dvec
        K = Tp // SB
        Minv = np.empty((K, SB, SB))
        eye = np.eye(SB)
        for k in range(K):
            Mkk = M[k * SB:(k + 1) * SB, k * SB:(k + 1) * SB]
            Minv[k] = sla.solve_triangular(Mkk, eye, lower=True)
        return M, Minv

    @staticmethod
    def _pack_table(flat0, vmap, gather):
        """Stage values in device layout: the (M, w) take-table for the
        fallback path, or the Pallas plan's slot-major tile layout."""
        vals2d = flat0[vmap]
        if gather is None:
            return vals2d
        plan, valid = gather["plan"], gather["valid"]
        csr_vals = vals2d[valid]
        packed = np.where(plan.valid, csr_vals[plan.safe_perm], 0.0)
        return packed.reshape(plan.ntiles, 8, plan.w, 128)

    def _sweep_state(self, stages, flat_vals, diag, dt):
        flat0 = np.concatenate([flat_vals, [0.0]])
        out = []
        for stage in stages:
            if stage[0] == "ell":
                _t, _rows, _cols, vmap, gather = stage
                out.append(self._pack_table(flat0, vmap,
                                            gather).astype(dt))
            else:
                blk = stage[1]
                M, Minv = self._dense_block(blk, flat_vals, diag)
                pre = self._pack_table(flat0, blk["pre_vmap"],
                                       blk["pre_plan"]).astype(dt)
                out.append((M.astype(dt), Minv.astype(dt), pre))
        return tuple(out)

    def _sweep_specs(self, stages, nnz_flat, dt):
        SB = DENSE_SUB_BLOCK
        out = []
        for stage in stages:
            if stage[0] == "ell":
                _t, _rows, _cols, vmap, gather = stage
                if gather is None:
                    out.append(jax.ShapeDtypeStruct(vmap.shape, dt))
                else:
                    p = gather["plan"]
                    out.append(jax.ShapeDtypeStruct(
                        (p.ntiles, 8, p.w, 128), dt))
            else:
                blk = stage[1]
                Tp = -(-max(blk["T"], 1) // SB) * SB
                if blk["pre_plan"] is None:
                    pre = jax.ShapeDtypeStruct(blk["pre_vmap"].shape, dt)
                else:
                    p = blk["pre_plan"]["plan"]
                    pre = jax.ShapeDtypeStruct((p.ntiles, 8, p.w, 128),
                                               dt)
                out.append((jax.ShapeDtypeStruct((Tp, Tp), dt),
                            jax.ShapeDtypeStruct((Tp // SB, SB, SB), dt),
                            pre))
        return tuple(out)

    def _state_arrays(self, exp):
        dt = np.dtype(jnp.dtype(self.dtype))
        if exp is None:
            specs = (self._sweep_specs(self.Lstages, self.nnzL, dt),
                     self._sweep_specs(self.Ustages, self.nnzU, dt))
            zero = jax.tree.map(lambda s: np.zeros(s.shape, dt), specs,
                                is_leaf=lambda x: isinstance(
                                    x, jax.ShapeDtypeStruct))
            return (np.ones(self.n, dt), zero[0], zero[1],
                    np.asarray(False))
        return (exp["Ud"][self._permU].astype(dt),   # U-sweep order
                self._sweep_state(self.Lstages, exp["Lval"], None, dt),
                self._sweep_state(self.Ustages, exp["Uval"], exp["Ud"],
                                  dt),
                np.asarray(True))

    def _refresh_np(self, data):
        # one lock around factorize+export: concurrent refresh callbacks
        # on XLA's pool must not interleave another call's numeric values
        # between the two (the factor object's own locks are per-call)
        with self._refresh_lock:
            rc = self.fac.factorize(np.asarray(data, np.float64))
            exp = self.fac.export_factor() if rc == 0 else None
        if exp is not None and exp["n_factor"] != self.epoch:
            # re-pivot changed the fill pattern: the static schedule no
            # longer applies — caller must fall back for this step.  A
            # compiled program with this plan baked in stays degraded
            # (ok=False -> identity apply); record the offending data so
            # device_lu_for rebases the CACHED plan against the new pivot
            # order for future traces, and tell the user once.
            if not self.repivoted:
                self.repivoted = True
                self._repivot_data = np.asarray(data, np.float64).copy()
                import sys
                print(
                    "[nonlinearsolve_tpu:linear:precond_unavailable] "
                    "device_lu re-pivoted: the static schedule no longer "
                    "matches the factor; this compiled program degrades "
                    "to the identity preconditioner on re-pivoted steps "
                    "(the plan cache rebases on the next trace)",
                    file=sys.stderr)
            exp = None
        return self._state_arrays(exp)

    # -- host API -----------------------------------------------------------

    def refresh_host(self, data):
        """Eager state construction from CONCRETE data (numpy/host): the
        same state pytree as :meth:`refresh` without any callback — the
        path for frozen-factor preconditioning and for runtimes without
        host-callback support (the axon tunnel rejects pure_callback;
        standard TPU runtimes accept it)."""
        return jax.tree.map(jnp.asarray, self._refresh_np(data))

    # -- traced API ---------------------------------------------------------

    def refresh(self, data):
        """ONE host callback: numeric refactorization + export + static
        packing of values into per-stage device layouts.  Returns the
        state pytree for :meth:`solve`."""
        dt = self.dtype
        return jax.pure_callback(
            self._refresh_np,
            (jax.ShapeDtypeStruct((self.n,), dt),
             self._sweep_specs(self.Lstages, self.nnzL, dt),
             self._sweep_specs(self.Ustages, self.nnzU, dt),
             jax.ShapeDtypeStruct((), jnp.bool_)),
            data, vmap_method="sequential")

    @staticmethod
    def _gather_dot(stage_vals, gather, cols, vec, m):
        """Σⱼ vals[i, j] · vec[cols[i, j]] per row — the register-gather
        kernel when a plan fits (TPU only: interpret-mode grid execution
        on CPU is orders slower than the take it replaces — a 128²
        factor's 34 ELL stages hang for minutes eagerly), the XLA-take
        fallback otherwise."""
        if m == 0:
            return jnp.zeros((0,), vec.dtype)
        if gather is not None:
            from .pallas_spmv import _ell_spmv_packed, _use_interpret
            plan, S = gather["plan"], gather["S"]
            out = _ell_spmv_packed(plan, stage_vals, plan.pack_x(vec),
                                   _use_interpret(None))[:m * S]
            return out if S == 1 else out.reshape(m, S).sum(axis=1)
        if cols.shape[1] == 0:
            return jnp.zeros((m,), vec.dtype)
        return jnp.sum(stage_vals * jnp.take(vec, jnp.asarray(cols)),
                       axis=1)

    @staticmethod
    def _dense_solve(M, Minv, rhs):
        """Blocked forward substitution with precomputed diagonal-block
        inverses: xₖ = Minvₖ (rhsₖ − M[k,<k] x₍₌ₖ₎).  HIGHEST precision —
        the terminal forces --xla_allow_excess_precision, which would
        silently run these f32 matvecs single-pass bf16 (tpu_tuning §4b).
        rhs (T,) with T <= Tp; returns (T,)."""
        SB = DENSE_SUB_BLOCK
        Tp = M.shape[0]
        T = rhs.shape[0]
        hi = jax.lax.Precision.HIGHEST
        rhs_p = jnp.zeros(Tp, rhs.dtype).at[:T].set(rhs)
        x = jnp.zeros(Tp, rhs.dtype)
        for k in range(Tp // SB):
            lo = k * SB
            acc = rhs_p[lo:lo + SB]
            if lo:
                acc = acc - jnp.dot(M[lo:lo + SB, :lo], x[:lo],
                                    precision=hi)
            x = x.at[lo:lo + SB].set(
                jnp.dot(Minv[k], acc, precision=hi))
        return x[:T]

    def solve(self, state, b):
        """x = A⁻¹ b on device with the current state: register-gather
        ELL stages for the wide levels, blocked dense substitution for
        the runs of thin levels.  Each sweep runs in its own contiguous-
        segment ordering — every update is a static slice-set, no
        scatters (see _build_sweep_orders).  Returns (x, ok)."""
        Ud, Lst, Ust, ok = state
        y = jnp.take(b, self.in_take).astype(Ud.dtype)   # L-sweep order
        for stage, sv, off in zip(self.Lstages, Lst, self._offL):
            if stage[0] == "ell":
                _tag, rows, cols, _vmap, gather = stage
                m = len(rows)
                g = self._gather_dot(sv, gather, cols, y, m)
                y = y.at[off:off + m].set(y[off:off + m] - g)
            else:
                blk = stage[1]
                M, Minv, pre_vals = sv
                T = blk["T"]
                rhs = y[off:off + T] - self._gather_dot(
                    pre_vals, blk["pre_plan"], blk["pre_cols"], y, T)
                y = y.at[off:off + T].set(self._dense_solve(M, Minv, rhs))
        yu = jnp.take(y, self.lu_map)                    # U-sweep order
        z = yu / Ud
        for stage, sv, off in zip(self.Ustages, Ust, self._offU):
            if stage[0] == "ell":
                _tag, rows, cols, _vmap, gather = stage
                m = len(rows)
                g = self._gather_dot(sv, gather, cols, z, m)
                z = z.at[off:off + m].set(
                    (yu[off:off + m] - g) / Ud[off:off + m])
            else:
                blk = stage[1]
                M, Minv, pre_vals = sv
                T = blk["T"]
                rhs = yu[off:off + T] - self._gather_dot(
                    pre_vals, blk["pre_plan"], blk["pre_cols"], z, T)
                z = z.at[off:off + T].set(self._dense_solve(M, Minv, rhs))
        x = jnp.take(z, self.out_take)
        return x.astype(b.dtype), ok


_DEVICE_LU_CACHE: dict = {}


def device_lu_for(indptr, indices, n, **kw) -> Optional[DeviceLU]:
    """Pattern-keyed cache of DeviceLU plans (host symbolic work runs
    once per pattern, like every other plan cache).  Returns None when
    the plan is unsupported.  The key includes the resolved dtype and a
    fingerprint of any explicit ``perm`` — two requests differing only
    in dtype (e.g. an f32 solve then an x64 refinement on the same
    pattern) must NOT share a plan, or solve() silently runs the
    triangular sweeps at the first request's precision."""
    from .pallas_spmv import pattern_key
    dt = jnp.dtype(kw.get("dtype", jnp.float32))
    perm = kw.get("perm")
    if perm is None:
        perm_fp = -1
    else:
        # collision-free fingerprint (a weighted sum collides: e.g.
        # (2,0,1) and (1,2,0) both sum to 5 — the cached plan's static
        # elimination schedule would silently serve the wrong ordering)
        import hashlib
        perm_fp = hashlib.sha1(np.ascontiguousarray(
            np.asarray(perm, np.int64))).hexdigest()
    key = pattern_key(indptr, indices, n) + (dt.name, perm_fp)
    hit = _DEVICE_LU_CACHE.get(key, False)
    if hit is not False:
        if hit is None or not hit.repivoted:
            return hit
        # epoch rebase: the cached plan's frozen pivot order was rejected
        # by real data — rebuild the schedule seeded with that data so
        # the new plan's pivot order (and static schedule) matches what
        # refactorization will actually produce.
        kw = {**kw, "sample_data": hit._repivot_data}
    lu = DeviceLU(indptr, indices, n, **kw)
    out = lu if lu.supported else None
    _DEVICE_LU_CACHE[key] = out
    return out


def device_lu_preconditioner(csr):
    """Exact-LU right/left preconditioner for on-device Krylov: refreshes
    the host factor ONCE at construction (one callback) and returns
    ``apply(x) -> M⁻¹ x`` running entirely on device — the role ILU/AMG
    preconditioners play for the reference's Krylov path, with an exact
    factor (docs/src/tutorials/large_systems.md:211-244).  Returns None
    when no device plan applies."""
    lu = device_lu_for(np.asarray(csr.indptr), np.asarray(csr.indices),
                       csr.shape[0], dtype=csr.data.dtype)
    if lu is None:
        return None
    try:
        # concrete data: stage entirely host-side — zero callbacks in the
        # compiled program (required on callback-less runtimes)
        state = lu.refresh_host(np.asarray(csr.data))
    except jax.errors.TracerArrayConversionError:
        state = lu.refresh(csr.data)

    def apply(x):
        # ok=False (re-pivot placeholder state) degrades to the identity
        # preconditioner instead of a singular zero map
        out, ok = lu.solve(state, x)
        return jnp.where(ok, out, x)

    return apply
