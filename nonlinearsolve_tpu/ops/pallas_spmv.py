"""General Pallas SpMV/SpMM kernels for unstructured sparse patterns.

The role of the reference's SuiteSparse/Krylov sparse matvec engine
(/root/reference/lib/NonlinearSolveBase/src/jacobian.jl:90-102 routes Krylov
methods over sparse operators; docs/src/tutorials/large_systems.md:227
recommends that as the large-system path), built TPU-first.

Hardware model
--------------
TPUs have no scalar-gather unit.  The one vectorized random-access
primitive Mosaic exposes is a **dynamic gather within a 2D register tile**:
``take_along_axis(x, idx, axis=0|1)`` with ``idx.shape == x.shape``
(lowering to ``tpu.dynamic_gather``; see jax/_src/pallas/mosaic/lowering.py
``_gather_lowering_rule``).  An arbitrary 1D gather ``x[c]`` therefore has
to be composed from tile-level gathers.  For one slot of 128 entries with
packed indices ``c = 128*hi + lo`` against a window ``xw`` of x tiles
(``xw[r, l] = x[128*(r0+r) + l]``):

    a1 = take_along_axis(xw, broadcast(lo), axis=1)   # a1[r, l] = xw[r, lo[l]]
    a2 = take_along_axis(a1, broadcast(hi), axis=0)   # a2[r, l] = xw[hi[l], lo[l]]

— every row of ``a2`` equals the desired gathered vector (lane gather MUST
run first; the reversed order composes to the wrong element).  The cost is
``2*W`` register-gather element-ops per nonzero for a window of ``W`` x-tile
rows, so the plan minimizes ``W`` per 128-row group host-side.

Layout
------
**Slot-major windowed ELL ("ELL-T")**: ``data[t, j, s, l]`` is the s-th
nonzero of row ``1024 t + 128 j + l`` — rows ride the 128-lane axis, so the
final slot reduction is a native cross-sublane sum.  Column indices ship as
ONE packed int32 per nonzero (window-local ``128*(hi-r0) + lo``), so HBM
traffic is 8 bytes/nnz (4 data + 4 index).  Padding slots read x[window
start] with a stored value of 0 — no masking in the inner loop.

The plan is pattern-static: built host-side once per sparsity pattern
(cached by fingerprint) exactly like the reference reuses its symbolic
factorization across ``reinit!`` solves.

Feasibility envelope (checked by :func:`pallas_spmv_supported`):
``x`` VMEM-resident (n_cols <= ~2.5M f32) and per-row-group column window
``W <= 512`` x-tile rows (= 64k columns).  RCM-banded patterns (the
realistic "general sparse" case, reordered by ``native.rcm``) have tiny
windows at any n; fully random patterns are covered up to n_cols ~ 64k and
fall back to the XLA segment_sum path beyond — at that scale the library
steers to matrix-free/DIA/distributed operators anyway (see
``docs/solvers.md``).

BSR matvec reuses the same kernel through a symbolic block->scalar ELL
expansion (at b <= 8 the blocks are VPU work, not MXU work).
``bsr_spmm_pallas`` is the genuinely MXU-shaped multi-RHS kernel: per
block-row, dynamically sliced (b, nrhs) row-blocks of X feed
(b, b) x (b, nrhs) matmuls.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
ROWS_PER_TILE = SUBLANES * LANES  # 1024 rows of A per grid step

# x must be VMEM-resident for the in-kernel window slices.
MAX_X_ELEMS_VMEM = (10 * 1024 * 1024) // 4
MAX_WINDOW_ROWS = 512   # per-group column window cap (x-tile rows)
MAX_SLOTS = 32          # max nnz/row the kernel unrolls


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def transpose_pattern_of(indptr, indices, n_rows, n_cols):
    """(tindptr, tindices, tperm): the CSR pattern of A^T plus the
    permutation mapping A's data order into A^T's.  Host-side; the ONE
    implementation every plan class's ``transpose_pattern`` delegates
    to."""
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr))
    order = np.lexsort((rows, indices))     # sort by (col, row)
    counts = np.bincount(indices, minlength=n_cols)
    tindptr = np.concatenate([[0], np.cumsum(counts)])
    return tindptr, rows[order], order


class EllPlan:
    """Host-built slot-major windowed gather plan for one pattern.

    Attributes:
      w        — slot count (max nnz/row)
      n_pad    — rows padded to a 1024 multiple; ntiles = n_pad // 1024
      nx_rows  — padded x tile-row count
      W        — window height in x-tile rows (static, multiple of 8)
      r0       — (ntiles, 8) int32 window start per 128-row group
      idx      — (ntiles, 8, w, 128) packed window-local int32 index
      perm/valid/safe_perm — CSR-order -> slot-layout scatter map
    """

    def __init__(self, indptr, indices, n_rows, n_cols, *, min_w=1,
                 min_W=SUBLANES, force_mode=None, rt=1):
        """``min_w``/``min_W``/``force_mode`` force lower bounds on the
        slot count / window height / window granularity so per-shard plans
        of a row-partitioned operator share one static kernel shape
        (parallel/sparse_dist.py).  ``rt`` = row-tiles per grid step: the
        kernel's fixed per-grid-step cost (~1.5 us DMA orchestration,
        measured v5e) dominates thin plans (w ~ 1), so low-slot callers
        amortize it by walking rt tiles per step via an in-kernel loop."""
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int64)
        self.indptr = indptr
        self.indices = indices
        self._transpose = None   # lazy (tindptr, tindices, tperm)
        counts = np.diff(indptr)
        w = max(int(counts.max()) if counts.size else 1, 1, int(min_w))
        self.rt = max(int(rt), 1)
        n_pad = _round_up(max(n_rows, 1), ROWS_PER_TILE * self.rt)
        ntiles = n_pad // ROWS_PER_TILE

        # slot-major dense tables in (w, n_pad) row-major layout
        hi_t = np.zeros((w, n_pad), np.int64)
        lo_t = np.zeros((w, n_pad), np.int64)
        has = np.zeros((w, n_pad), bool)
        perm = np.full((w, n_pad), -1, np.int64)
        nnz_pos = np.arange(len(indices), dtype=np.int64)
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        slot_ids = nnz_pos - indptr[:-1][row_ids]
        hi_t[slot_ids, row_ids] = indices // LANES
        lo_t[slot_ids, row_ids] = indices % LANES
        has[slot_ids, row_ids] = True
        perm[slot_ids, row_ids] = nnz_pos

        # (w, n_pad) -> (ntiles, 8, w, 128)
        def to_tiles(a):
            return (a.reshape(w, ntiles, SUBLANES, LANES)
                    .transpose(1, 2, 0, 3).copy())

        hi_t, lo_t, has = to_tiles(hi_t), to_tiles(lo_t), to_tiles(has)
        self.perm = to_tiles(perm).reshape(-1)
        self.valid = self.perm >= 0
        self.safe_perm = np.where(self.valid, self.perm, 0)

        # Two window granularities (r3):
        #  * "group": one window per 128-row group, kernel walks its
        #    Wg/8 tiles ONCE applying every slot — best when slots share
        #    the window (scrambled patterns: every slot is global anyway).
        #  * "slot": one window per (group, slot) — one slot's 128 lanes
        #    are 128 CONSECUTIVE rows' s-th nonzeros, whose columns span
        #    ~bandwidth/128 + 1 tiles even when the group window is wide
        #    (periodic wrap rows).  The 512² Brusselator CSR drops from
        #    Wg=4096 to Ws=8, at the cost of per-slot tile fetches.
        # Mode chosen by the op-count model (fetch + 2 gathers per tile
        # visit): slot iff 3·w·Gs < (2·w+1)·Gg.
        hi_min_s = np.where(has, hi_t, np.iinfo(np.int64).max).min(axis=3)
        hi_max_s = np.where(has, hi_t, -1).max(axis=3)
        empty_s = hi_max_s < 0                  # (ntiles, 8, w)
        hi_min_s = np.where(empty_s, 0, hi_min_s)
        hi_max_s = np.where(empty_s, 0, hi_max_s)
        r0_s = (hi_min_s // SUBLANES) * SUBLANES
        Ws = _round_up(max(int((hi_max_s - r0_s + 1).max()), 1,
                           int(min_W)), SUBLANES)
        hi_min_g = hi_min_s.min(axis=2)         # (ntiles, 8)
        hi_max_g = hi_max_s.max(axis=2)
        r0_g = (hi_min_g // SUBLANES) * SUBLANES
        Wg = _round_up(max(int((hi_max_g - r0_g + 1).max()), 1,
                           int(min_W)), SUBLANES)
        if force_mode is not None:
            mode = force_mode
        else:
            Gs, Gg = Ws // SUBLANES, Wg // SUBLANES
            mode = "slot" if 3 * w * Gs < (2 * w + 1) * Gg else "group"
        if mode == "slot":
            W, r0 = Ws, r0_s                    # (ntiles, 8, w)
        else:
            W, r0 = Wg, r0_g                    # (ntiles, 8)
        nx_rows = max(_round_up(pl.cdiv(max(n_cols, 1), LANES), SUBLANES), W)
        r0 = np.minimum(r0, nx_rows - W)
        if mode == "slot":
            hi_local = hi_t - r0[:, :, :, None]
        else:
            hi_local = hi_t - r0[:, :, None, None]
        # padding slots gather window element 0 (value multiplied by 0)
        hi_local = np.where(has, hi_local, 0)
        lo_t = np.where(has, lo_t, 0)
        self.idx = (hi_local * LANES + lo_t).astype(np.int32)
        self.r0 = (r0 // SUBLANES).astype(np.int32)   # window start, tiles
        self.W = W
        self.mode = mode
        self.w = w
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.n_pad = n_pad
        self.ntiles = ntiles
        self.nx_rows = nx_rows

    def pack_data(self, csr_data):
        """Scatter CSR-ordered nonzeros into the slot-major tile layout
        (traced; indices static)."""
        vals = jnp.where(_dev_table(self, "valid"),
                         jnp.take(csr_data, _dev_table(self, "safe_perm")),
                         jnp.zeros((), csr_data.dtype))
        return vals.reshape(self.ntiles, SUBLANES, self.w, LANES)

    def pack_x(self, x):
        xp = jnp.zeros((self.nx_rows * LANES,), x.dtype)
        return xp.at[:x.shape[0]].set(x).reshape(
            self.nx_rows // SUBLANES, SUBLANES, LANES)

    @property
    def supported(self) -> bool:
        return (self.n_cols <= MAX_X_ELEMS_VMEM
                and self.W <= MAX_WINDOW_ROWS
                and self.w <= MAX_SLOTS)

    @property
    def row_ids(self):
        return np.repeat(np.arange(self.n_rows, dtype=np.int64),
                         np.diff(self.indptr))

    def transpose_pattern(self):
        """(tindptr, tindices, tperm) of A^T (host, cached)."""
        if self._transpose is None:
            self._transpose = transpose_pattern_of(
                self.indptr, self.indices, self.n_rows, self.n_cols)
        return self._transpose


_PLAN_CACHE: dict = {}


def pattern_key(indptr, indices, *extra) -> tuple:
    """Cache key for a static sparsity pattern: sha1 over (indptr,
    indices) plus any extra static scalars.  The ONE keying idiom for
    every pattern-keyed cache (plans, reorders, shard plans)."""
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(np.asarray(indptr, np.int64)))
    h.update(np.ascontiguousarray(np.asarray(indices, np.int64)))
    return (h.hexdigest(),) + tuple(int(e) for e in extra)


def _default_rt(indptr, n_rows) -> int:
    """Row-tiles per grid step for the public resident tier: amortize
    the fixed per-step pipeline cost on thin plans (measured v5e, 512²
    Brusselator CSR w=6: rt=1 13.9 → rt=2 17.3 Gnnz/s), shrunk so tiny
    patterns keep at least two grid steps."""
    counts = np.diff(np.asarray(indptr, np.int64))
    w = max(int(counts.max()) if counts.size else 1, 1)
    rt = max(1, min(16, 16 // min(w, 16)))
    while rt > 1 and rt * ROWS_PER_TILE > max(int(n_rows), 1):
        rt //= 2
    return rt


def ell_plan_for(indptr, indices, n_rows, n_cols) -> EllPlan:
    """Build (or fetch) the gather plan for a pattern, keyed by a
    fingerprint of the symbolic structure, so repeated solves and data
    refreshes reuse the host work and the jit cache."""
    key = pattern_key(indptr, indices, n_rows, n_cols)
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        plan = EllPlan(indptr, indices, int(n_rows), int(n_cols),
                       rt=_default_rt(indptr, n_rows))
        _PLAN_CACHE[key] = plan
    return plan


def _make_ell_kernel(W: int, w: int, mode: str, rt: int = 1):
    # The two-stage register gather must stay WITHIN one native (8, 128)
    # tile: Mosaic lowers a sublane take_along_axis over G*8 rows into
    # per-row select chains whose compile time explodes around W ≈ 16
    # (measured: W=8 compiles in seconds, W=32 hangs >10 min on v5e).  So
    # windows are walked as G = W/8 native tiles (constant compile cost),
    # each slot contributing where its window-local tile index equals g.
    # "group" mode fetches each of the G tiles ONCE and applies all
    # slots; "slot" mode fetches each slot's own (much smaller) window.
    #
    # rt > 1 walks rt row-tiles per grid step through a DYNAMIC fori_loop
    # (constant compile cost): the fixed per-grid-step pipeline cost
    # (~1.5 us measured v5e) would otherwise dominate thin plans (w ~ 1,
    # e.g. the scatter tier's expansion pass).
    G = W // SUBLANES

    def kernel(r0_ref, idx_ref, data_ref, x_ref, out_ref):
        # r0_ref: (ntiles, 8[, w]) SMEM whole-array resident (blocked SMEM
        # specs reject small tiles once ntiles > 1), storing window starts
        # as TILE indices (r0 // 8): x rides as (R/8, 8, 128) and window
        # tiles are fetched by whole-tile leading-axis indexing — a VMEM
        # address offset.  (A dynamic sublane-offset slice of a flat
        # (R, 128) x compiles, but Mosaic's lowering cost grows with R:
        # R=32 compiled in ~80 s, R=512 hung >9 min on v5e.)
        # idx/data: (rt, 8, w, 128); out: (rt, 8, 128)
        base = pl.program_id(0) * rt    # hoisted: program_id is not
        # re-bindable inside a fori_loop body jaxpr in interpret mode

        def tile_step(tl, _):
            i = base + tl
            for j in range(SUBLANES):
                if mode == "slot":
                    acc = jnp.zeros((1, LANES), dtype=out_ref.dtype)
                    for s in range(w):
                        t0 = r0_ref[i, j, s]
                        idx = idx_ref[tl, j, s:s + 1, :]  # (1, 128) packed
                        his = jax.lax.shift_right_logical(idx, jnp.int32(7))
                        los = jax.lax.bitwise_and(idx, jnp.int32(127))
                        hi8 = jax.lax.bitwise_and(his, jnp.int32(7))
                        dat = data_ref[tl, j, s:s + 1, :]

                        def slot_contrib(g0, acc_s, t0=t0, his=his, los=los,
                                         hi8=hi8, dat=dat):
                            xt = x_ref[t0 + g0]          # (8, 128) tile
                            # lane gather FIRST, then sublane (module doc)
                            a1 = jnp.take_along_axis(
                                xt, jnp.broadcast_to(los, (SUBLANES, LANES)),
                                axis=1)
                            a2 = jnp.take_along_axis(
                                a1, jnp.broadcast_to(hi8, (SUBLANES, LANES)),
                                axis=0)
                            in_tile = (jax.lax.shift_right_logical(
                                his, jnp.int32(3)) == g0)
                            return acc_s + jnp.where(
                                in_tile, dat * a2[0:1, :],
                                jnp.zeros((), acc_s.dtype))

                        if G <= _UNROLL_G:
                            # static unroll: a dynamic fori_loop pays
                            # scalar-core per-iteration overhead that
                            # dwarfs the ~12-op body
                            for g0 in range(G):
                                acc = slot_contrib(jnp.int32(g0), acc)
                        else:
                            acc = jax.lax.fori_loop(0, G, slot_contrib, acc)
                    out_ref[tl, j, :] = acc[0, :]
                    continue

                # group mode
                t0 = r0_ref[i, j]
                his = []
                los = []
                for s in range(w):
                    idx = idx_ref[tl, j, s:s + 1, :]     # (1, 128) packed
                    his.append(jax.lax.shift_right_logical(idx, jnp.int32(7)))
                    los.append(jax.lax.bitwise_and(idx, jnp.int32(127)))

                def tile_contrib(g0, acc, j=j, tl=tl, his=his, los=los,
                                 t0=t0):
                    xt = x_ref[t0 + g0]                  # (8, 128) tile
                    for s in range(w):
                        hi8 = jax.lax.bitwise_and(his[s], jnp.int32(7))
                        a1 = jnp.take_along_axis(
                            xt, jnp.broadcast_to(los[s], (SUBLANES, LANES)),
                            axis=1)
                        a2 = jnp.take_along_axis(
                            a1, jnp.broadcast_to(hi8, (SUBLANES, LANES)),
                            axis=0)
                        in_tile = (jax.lax.shift_right_logical(
                            his[s], jnp.int32(3)) == g0)
                        acc = acc + jnp.where(
                            in_tile, data_ref[tl, j, s:s + 1, :] * a2[0:1, :],
                            jnp.zeros((), acc.dtype))
                    return acc

                acc = jnp.zeros((1, LANES), dtype=out_ref.dtype)
                if G <= _UNROLL_G:
                    for g0 in range(G):      # static unroll (see above)
                        acc = tile_contrib(jnp.int32(g0), acc)
                else:
                    acc = jax.lax.fori_loop(0, G, tile_contrib, acc)
                out_ref[tl, j, :] = acc[0, :]
            return 0

        if rt == 1:
            tile_step(0, 0)      # static indexing — the proven lowering
        else:
            jax.lax.fori_loop(0, rt, tile_step, 0)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ntiles", "w", "W", "mode", "interpret",
                                    "rt"))
def _ell_spmv_call(r0, idx, data, x2d, *, ntiles, w, W, mode, interpret,
                   rt=1):
    return pl.pallas_call(
        _make_ell_kernel(W, w, mode, rt),
        grid=(ntiles // rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # r0 resident
            pl.BlockSpec((rt, SUBLANES, w, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, SUBLANES, w, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident
        ],
        out_specs=pl.BlockSpec((rt, SUBLANES, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, SUBLANES, LANES),
                                       data.dtype),
        interpret=interpret,
    )(r0, idx, data, x2d)


# The r0 table is SMEM-whole-resident; above ~24 KB (measured: 24.5 KB
# compiles, 98 KB fails the Mosaic compile on v5e) the grid is CHUNKED
# along the tile axis into separate pallas calls sharing the packed x.
_SMEM_R0_CAP_BYTES = 24 * 1024

# Window walks up to this many tiles are statically unrolled in the
# kernel; beyond it the compile-time cost of the unrolled gather chains
# outweighs the fori_loop's scalar-core per-iteration overhead.
_UNROLL_G = 8


def _dev_table(plan, name, dtype=None):
    """Static table as a CACHED device array: a fresh ``jnp.asarray``
    of the numpy table at every trace embeds an HLO literal per trace —
    the axon tunnel re-ships program constants per execution and its
    remote-compile rejects programs past a body-size limit (HTTP 413,
    observed at the 128² device-LU factor's ~30 MB of stage tables).  A
    plan-cached concrete array is captured once and shared.  ``dtype``
    converts (and caches per dtype — e.g. validity masks applied in the
    value dtype)."""
    key = ("_" + name + "_dev" if dtype is None
           else "_" + name + "_" + jnp.dtype(dtype).name + "_dev")
    arr = getattr(plan, key, None)
    if arr is None:
        arr = (jnp.asarray(getattr(plan, name)) if dtype is None
               else jnp.asarray(getattr(plan, name), dtype))
        # inside an active trace jnp.asarray returns a TRACER — caching
        # it would poison later traces ("no constant handler"); only
        # cache the concrete array created outside any trace (checked
        # directly on the result: trace_state_clean moved between jax
        # releases, and the import-error fallback silently disabled the
        # cache on jax 0.9)
        if not isinstance(arr, jax.core.Tracer):
            try:
                setattr(plan, key, arr)
            except AttributeError:
                pass
    return arr


def _ell_spmv_packed(plan: "EllPlan", packed, x2d, interpret: bool):
    """Run the kernel on pre-packed data, chunking the grid when the SMEM
    r0 table would exceed the Mosaic budget.  Returns (n_pad,) output."""
    r0 = np.asarray(plan.r0)
    rt = plan.rt
    per_tile = int(r0[0].size) * 4
    tiles_per_chunk = max(_SMEM_R0_CAP_BYTES // max(per_tile, 1), 1)
    tiles_per_chunk = max(tiles_per_chunk // rt, 1) * rt
    if plan.ntiles <= tiles_per_chunk:
        out = _ell_spmv_call(_dev_table(plan, "r0"),
                             _dev_table(plan, "idx"),
                             packed, x2d, ntiles=plan.ntiles, w=plan.w,
                             W=plan.W, mode=plan.mode, interpret=interpret,
                             rt=rt)
        return out.reshape(plan.n_pad)
    outs = []
    r0_dev = _dev_table(plan, "r0")
    idx_dev = _dev_table(plan, "idx")
    for t0 in range(0, plan.ntiles, tiles_per_chunk):
        t1 = min(t0 + tiles_per_chunk, plan.ntiles)
        out = _ell_spmv_call(
            jax.lax.slice_in_dim(r0_dev, t0, t1, axis=0),
            jax.lax.slice_in_dim(idx_dev, t0, t1, axis=0),
            packed[t0:t1], x2d, ntiles=t1 - t0, w=plan.w, W=plan.W,
            mode=plan.mode, interpret=interpret, rt=rt)
        outs.append(out.reshape((t1 - t0) * ROWS_PER_TILE))
    return jnp.concatenate(outs)


def _use_interpret(interpret):
    if interpret is not None:
        return bool(interpret)
    return jax.default_backend() != "tpu"


def _ell_spmv_core(plan: EllPlan, interpret: bool, csr_data, x):
    data = plan.pack_data(csr_data)
    x2d = plan.pack_x(x)
    return _ell_spmv_packed(plan, data, x2d, interpret)[:plan.n_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ell_spmv_ad(plan, interpret, csr_data, x):
    return _ell_spmv_core(plan, interpret, csr_data, x)


def _ell_spmv_fwd(plan, interpret, csr_data, x):
    return _ell_spmv_core(plan, interpret, csr_data, x), (csr_data, x)


def _ell_spmv_bwd(plan, interpret, res, ybar):
    csr_data, x = res
    # x-cotangent: A^T ybar — same kernel on the transpose pattern when it
    # fits the envelope, XLA segment_sum otherwise.
    tindptr, tindices, tperm = plan.transpose_pattern()
    tplan = ell_plan_for(tindptr, tindices, plan.n_cols, plan.n_rows)
    tdata = jnp.take(csr_data, jnp.asarray(tperm))
    if tplan.supported or interpret:
        xbar = _ell_spmv_core(tplan, interpret, tdata, ybar)
    else:
        prod = tdata * jnp.take(ybar, jnp.asarray(tindices))
        xbar = jax.ops.segment_sum(
            prod, jnp.asarray(np.repeat(np.arange(plan.n_cols),
                                        np.diff(tindptr))),
            num_segments=plan.n_cols)
    # data-cotangent: dbar_k = ybar[row_k] * x[col_k] (static-index takes)
    dbar = (jnp.take(ybar, jnp.asarray(plan.row_ids))
            * jnp.take(x, jnp.asarray(plan.indices)))
    return dbar.astype(csr_data.dtype), xbar.astype(x.dtype)


_ell_spmv_ad.defvjp(_ell_spmv_fwd, _ell_spmv_bwd)


def ell_spmv_pallas(plan: EllPlan, csr_data, x, *, interpret=None):
    """y = A @ x through the slot-major windowed gather kernel.

    ``csr_data`` is the CSR-ordered nonzero vector (traced), ``plan`` the
    static pattern plan.  Falls back transparently to interpret mode off
    TPU so the same code path is exercised in CPU tests.  Reverse-mode
    differentiable in both ``csr_data`` and ``x`` (custom VJP — the
    x-cotangent rides the transpose-pattern kernel); forward-mode callers
    should apply the kernel to the tangent directly (the map is linear).
    """
    return _ell_spmv_ad(plan, _use_interpret(interpret), csr_data, x)


_REORDER_CACHE: dict = {}
_RCM_PATTERN_CACHE: dict = {}


def _rcm_pattern(indptr, indices, n_rows):
    """RCM symmetric permutation of a square pattern: returns
    (perm, pinv, dperm, new_indptr, new_indices) or None.  Host, cached —
    shared by the resident and streamed tiers."""
    key = pattern_key(indptr, indices, n_rows)
    hit = _RCM_PATTERN_CACHE.get(key, False)
    if hit is not False:
        return hit
    from ..native import rcm_ordering
    out = None
    perm = rcm_ordering(np.asarray(indptr, np.int32),
                        np.asarray(indices, np.int32), n_rows)
    if perm is not None:
        perm = np.asarray(perm, np.int64)
        pinv = np.empty(n_rows, np.int64)
        pinv[perm] = np.arange(n_rows)
        indptr64 = np.asarray(indptr, np.int64)
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64),
                            np.diff(indptr64))
        new_row = pinv[row_ids]
        new_col = pinv[np.asarray(indices, np.int64)]
        dperm = np.lexsort((new_col, new_row))
        new_indices = new_col[dperm]
        new_indptr = np.concatenate(
            [[0], np.cumsum(np.bincount(new_row, minlength=n_rows))])
        out = (perm, pinv, dperm, new_indptr, new_indices)
    _RCM_PATTERN_CACHE[key] = out
    return out


def _plan_maybe_reordered(indptr, indices, n_rows, n_cols):
    """(plan, perm, pinv, dperm): the direct RESIDENT plan when it fits
    the envelope (perm=None), else an RCM-reordered plan for square
    patterns whose windows the symmetric permutation shrinks (e.g.
    PERIODIC stencils: a handful of wrap rows span the whole matrix raw,
    but are banded after RCM — bandwidth-reduction is exactly the
    fill/window medicine, same as the banded direct tier).  Host, cached
    by pattern."""
    key = pattern_key(indptr, indices, n_rows, n_cols)
    hit = _REORDER_CACHE.get(key)
    if hit is not None:
        return hit
    plan = ell_plan_for(indptr, indices, n_rows, n_cols)
    out = (plan, None, None, None)
    if not plan.supported and n_rows == n_cols:
        rcm = _rcm_pattern(indptr, indices, n_rows)
        if rcm is not None:
            perm, pinv, dperm, new_indptr, new_indices = rcm
            rplan = ell_plan_for(new_indptr, new_indices, n_rows, n_cols)
            if rplan.supported:
                out = (rplan, perm, pinv, dperm)
    _REORDER_CACHE[key] = out
    return out


_TIER_CACHE: dict = {}


def spmv_tier_cost(tier, plan) -> float:
    """Weighted vector-op count per 128-row group — the op-count model
    that both ORDERS the Pallas SpMV tiers and anchors the roofline.

    Per-visit weights reflect the Mosaic lowering: a lane gather is ~1
    vector op but the sublane gather decomposes into ~8 per-row selects,
    so a slot-mode tile visit costs ~12 ops (tile fetch + lane gather +
    8-op sublane gather + mask + mac); group mode pays that per slot per
    tile walked (+2 fetch); the streamed kernel's dual-block select adds
    ~2 (14/visit).  Validated v5e: streamed 3D 7-point measures 15.8
    Gnnz/s = 92% of this model's bound; resident-slot Brusselator 13 =
    32%; resident-group scrambled 1.6 = 17% (masked-walk ILP, the
    documented gather-issue gap — docs/tpu_tuning.md)."""
    if tier == "resident":
        G = plan.W // SUBLANES
        if plan.mode == "slot":
            return 12.0 * plan.w * G
        return (12.0 * plan.w + 2.0) * G
    if tier == "stream":
        return 14.0 * sum(m * span for (_l, _h, m, _b, span, _g)
                          in plan.bands)
    if tier == "scatter":
        # plan.cost is the summed per-group cost over BOTH passes (and
        # every part); normalize to per-128-output-row-group so the
        # ordering and the roofline stay in one unit.
        return plan.cost / max(plan.n_pad / LANES, 1.0)
    if tier == "dia":
        # zero gathers: per diagonal one data pass + one shifted-x read
        # + y (the roofline's traffic model).  HBM-equivalent ops
        # (streamed bytes at the vec-op rate) vs the mul+add-per-
        # diagonal-per-native-(8,128)-tile VPU floor.
        hbm_equiv = (VPU_VEC_OPS_PER_S * (8.0 * plan.ndiag + 8.0) * LANES
                     / HBM_BYTES_PER_S)
        return max(hbm_equiv, 0.25 * plan.ndiag)
    return float("inf")


# Single-chip model constants for the per-tier rooflines (VERDICT r3
# next#2): HBM from the measured streamed triad on the bench chip
# (utils/profiling.hbm_triad_probe: ~2.2 TB/s sustained, r5 — the
# public v5e spec's 819 GB/s is far below what this part streams, and
# understating it inflates hbm-bound pct); VPU issue 4 ALUs x (8,128)
# lanes at ~940 MHz = ~3.76e9 vector-ops/s ideal (gathers/selects
# cannot beat 1 vec-op/ALU-cycle — the BOUND, not an attainable rate).
HBM_BYTES_PER_S = 2.2e12
VPU_VEC_OPS_PER_S = 4 * 940e6
SEGSUM_MEASURED_NNZ_S = 0.065e9   # measured XLA gather+scatter path, v5e


def spmv_roofline(tier, plan, nnz: int) -> dict:
    """Model upper bound for a pattern on its selected tier (nnz/s).

    gather bound: weighted vec-ops per 128-row group (spmv_tier_cost)
    against the ideal VPU issue rate; hbm bound: 8 B/nnz streamed tables
    plus ~3 auxiliary passes over the state vectors.  ``bound`` is their
    min; report measured/bound as pct_of_roofline.  The dia tier has no
    gathers at all: its bounds are the streamed traffic of ndiag
    (data + shifted-x) passes and ~2 vec-ops per diagonal per group."""
    if tier == "dia":
        groups = max(plan.n_pad / LANES, 1.0)
        # traffic: per diagonal one data pass + one shifted-x read
        # (XLA's fusion does NOT share shifted windows between
        # diagonals — long-chain sustained rates sit at ~80% of THIS
        # model and ~50% of a shared-x one), plus the y write.
        bytes_per_nnz = (8.0 * plan.ndiag + 8.0) * plan.n_rows / max(nnz, 1)
        hbm_bound = HBM_BYTES_PER_S / bytes_per_nnz
        # issue: mul+add per diagonal per native (8,128) tile = 8 groups
        vpu_bound = (VPU_VEC_OPS_PER_S * nnz
                     / max(0.25 * plan.ndiag * groups, 1e-9))
        bound = min(hbm_bound, vpu_bound)
        return {"bound": bound,
                "model": ("hbm-stream" if hbm_bound <= vpu_bound
                          else "gather-issue"),
                "gather_bound": vpu_bound, "hbm_bound": hbm_bound}
    if tier not in ("resident", "stream", "scatter"):
        return {"bound": SEGSUM_MEASURED_NNZ_S, "model": "segsum-measured"}
    groups = max(plan.n_pad / LANES, 1.0)
    nnz_g = nnz / groups
    ops_g = max(spmv_tier_cost(tier, plan), 1e-9)
    gather_bound = VPU_VEC_OPS_PER_S * nnz_g / ops_g
    n_state = max(plan.n_rows, getattr(plan, "n_cols", plan.n_rows))
    if tier == "scatter":
        # exact streamed-table traffic: G idx+data, unit-R idx+mask
        # (both include ELL/zone padding), product vector write+read.
        bytes_per_nnz = (plan.table_bytes / max(nnz, 1)
                         + 12.0 * n_state / max(nnz, 1))
    else:
        bytes_per_nnz = 8.0 + 12.0 * n_state / max(nnz, 1)
    hbm_bound = HBM_BYTES_PER_S / bytes_per_nnz
    bound = min(gather_bound, hbm_bound)
    return {"bound": bound,
            "model": ("gather-issue" if gather_bound <= hbm_bound
                      else "hbm-stream"),
            "gather_bound": gather_bound, "hbm_bound": hbm_bound}


def select_spmv_plan(indptr, indices, n_rows, n_cols):
    """Tiered plan selection: (tier, plan, perm, pinv, dperm).

    tier 'resident': windowed-ELL kernel, x VMEM-resident (direct or
    RCM-reordered); tier 'stream': column-streamed band-ELL kernel
    (pallas_spmv_stream — no n_cols cap; direct or RCM-reordered); tier
    None: no Pallas kernel applies (XLA segment_sum fallback).  When both
    kernels fit, the op-count model decides — e.g. a 3D 7-point stencil
    is resident-SUPPORTED at 128³ but its boundary-mixed slots force
    W=136 masked walks, ~8× more tile visits than the streamed band
    kernel's affine windows.  Host, cached by pattern fingerprint."""
    key = pattern_key(indptr, indices, n_rows, n_cols)
    hit = _TIER_CACHE.get(key)
    if hit is not None:
        return hit
    from .pallas_spmv_stream import band_plan_for
    plan, perm, pinv, dperm = _plan_maybe_reordered(
        indptr, indices, n_rows, n_cols)
    candidates = []
    # dia first: stencil-born patterns (few generalized diagonals) beat
    # every gather kernel with shifted streamed fmas (ops/spmv_dia.py —
    # 512² Brusselator 15.9 -> 111.7 Gnnz/s measured r5)
    from .spmv_dia import dia_plan_for
    dplan = dia_plan_for(indptr, indices, n_rows, n_cols)
    if dplan.supported:
        candidates.append(("dia", dplan, None, None, None))
    if plan.supported:
        candidates.append(("resident", plan, perm, pinv, dperm))
    bplan = band_plan_for(indptr, indices, n_rows, n_cols)
    if bplan.supported:
        candidates.append(("stream", bplan, None, None, None))
    if not candidates and n_rows == n_cols:
        rcm = _rcm_pattern(indptr, indices, n_rows)
        if rcm is not None:
            rperm, rpinv, rdperm, new_indptr, new_indices = rcm
            rbplan = band_plan_for(new_indptr, new_indices,
                                   n_rows, n_cols)
            if rbplan.supported:
                candidates.append(
                    ("stream", rbplan, rperm, rpinv, rdperm))
    # The two-pass scatter tier (pallas_spmv_scatter) is the no-locality
    # fallback: only PLANNED (an O(nnz log nnz) host sort) when the best
    # structured tier is already paying heavily per nonzero — i.e. the
    # pattern is scrambled enough that its windows degenerated — or when
    # no structured tier fits at all.
    nnz = max(len(np.asarray(indices)), 1)
    if candidates:
        best_pn = min(_derated_cost(c[0], c[1]) for c in candidates) \
            * (_round_up(max(n_rows, 1), ROWS_PER_TILE) / LANES) / nnz
    if not candidates or best_pn > _SCATTER_TRY_THRESHOLD:
        from .pallas_spmv_scatter import scatter_plan_for
        splan = scatter_plan_for(indptr, indices, n_rows, n_cols)
        if splan.supported:
            candidates.append(("scatter", splan, None, None, None))
    if candidates:
        out = min(candidates, key=lambda c: _derated_cost(c[0], c[1]))
    else:
        out = (None, None, None, None, None)
    _TIER_CACHE[key] = out
    return out


# Measured v5e: walks of <= _UNROLL_G tiles are statically unrolled and
# reach 45-92% of the op-count bound (resident-group scrambled 6.7
# Gnnz/s = 69%, scatter OOE 2.46 = 75%, tridiag resident 7.65); walks
# beyond it fall back to a dynamic fori_loop whose scalar-core
# per-iteration overhead dwarfs the 12-op body (the SAME scrambled
# kernel measured 1.48 Gnnz/s = 17% when looped) — so tier ORDERING
# derates looped walks by ~4x.  Rooflines stay un-derated (bounds).
_LOOP_WALK_DERATE = 4.0
# cost-per-nnz above which the scatter plan is worth building: banded /
# windowed selections sit at 0.1-0.25, degenerate walks well above.
_SCATTER_TRY_THRESHOLD = 0.35


def _derated_cost(tier, plan) -> float:
    c = spmv_tier_cost(tier, plan)
    if tier == "resident" and plan.W // SUBLANES > _UNROLL_G:
        c *= _LOOP_WALK_DERATE
    return c


def pallas_spmv_supported(csr) -> bool:
    """Cheap host check: does ANY Pallas SpMV tier apply to this CSR
    pattern — the resident windowed kernel, the streamed band kernel, in
    either case directly or after a symmetric RCM reordering?
    (Builds/caches the plan — symbolic work only.)"""
    try:
        tier, _, _, _, _ = select_spmv_plan(
            csr.indptr, csr.indices, csr.shape[0], csr.shape[1])
    except Exception:  # noqa: BLE001 — malformed pattern: use XLA path
        return False
    return tier is not None


def csr_spmv_pallas(csr, x, *, interpret=None):
    """CSR matvec through the best-fitting Pallas tier (plan cached by
    pattern; transparently RCM-reordered when that is what makes the
    pattern fit a kernel envelope — y = P⁻¹ · K(P A Pᵀ) · P x)."""
    tier, plan, perm, pinv, dperm = select_spmv_plan(
        csr.indptr, csr.indices, csr.shape[0], csr.shape[1])
    if tier == "dia":
        from .spmv_dia import dia_spmv_pallas as _apply
    elif tier == "stream":
        from .pallas_spmv_stream import band_spmv_pallas as _apply
    elif tier == "scatter":
        from .pallas_spmv_scatter import scatter_spmv_pallas as _apply
    else:
        _apply = functools.partial(ell_spmv_pallas)
    if perm is None:
        return _apply(plan, csr.data, x, interpret=interpret)
    y = _apply(plan, jnp.take(csr.data, jnp.asarray(dperm)),
               jnp.take(x, jnp.asarray(perm)), interpret=interpret)
    return jnp.take(y, jnp.asarray(pinv))


def csr_spmv_staged(csr, *, interpret=None):
    """Pre-staged matvec closure: the slot-major data packing (a gather of
    every nonzero, ~2 full passes over the data tables) runs ONCE here —
    at operator-construction time, i.e. once per Newton step — instead of
    inside every Krylov iteration.  XLA's while-loop LICM hoists the
    resulting ARRAY into the loop closure but would NOT hoist the gather
    chain itself (docs/tpu_tuning.md §7b), so staging is worth ~2× on
    assembled-operator Krylov solves.

    Forward-only (linear-solve internals); use ``csr_spmv_pallas`` where
    reverse-mode AD through the matvec is needed."""
    interpret = _use_interpret(interpret)
    tier, plan, perm, pinv, dperm = select_spmv_plan(
        csr.indptr, csr.indices, csr.shape[0], csr.shape[1])
    data = csr.data if perm is None \
        else jnp.take(csr.data, jnp.asarray(dperm))
    perm_j = None if perm is None else jnp.asarray(perm)
    pinv_j = None if pinv is None else jnp.asarray(pinv)

    if tier == "dia":
        from .spmv_dia import dia_spmv_staged
        inner = dia_spmv_staged(plan, data, interpret=interpret)
    elif tier == "stream":
        from .pallas_spmv_stream import band_spmv_staged
        inner = band_spmv_staged(plan, data, interpret=interpret)
    elif tier == "scatter":
        from .pallas_spmv_scatter import scatter_spmv_staged
        inner = scatter_spmv_staged(plan, data, interpret=interpret)
    else:
        packed = plan.pack_data(data)

        def inner(x):
            x2d = plan.pack_x(x)
            return _ell_spmv_packed(plan, packed, x2d,
                                    interpret)[:plan.n_rows]

    def mv(x):
        xx = x if perm_j is None else jnp.take(x, perm_j)
        y = inner(xx)
        return y if pinv_j is None else jnp.take(y, pinv_j)

    return mv


# ---------------------------------------------------------------------------
# BSR: block expansion for SpMV; MXU block-row kernel for SpMM
# ---------------------------------------------------------------------------


_BSR_EXPAND_CACHE: dict = {}


def bsr_scalar_pattern(bsr) -> tuple:
    """Expand a BSR block pattern to the equivalent scalar CSR pattern
    (host, symbolic, cached).  Returns (indptr, indices, take_order) where
    ``take_order`` maps flattened (nblocks, b, b) data into CSR nonzero
    order."""
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(bsr.indptr))
    h.update(np.ascontiguousarray(bsr.indices))
    key = (h.hexdigest(), bsr.shape, bsr.blocksize)
    hit = _BSR_EXPAND_CACHE.get(key)
    if hit is not None:
        return hit
    b = bsr.blocksize
    nbr = bsr.shape[0] // b
    block_counts = np.diff(bsr.indptr)
    indptr = [0]
    indices = []
    order = []
    for i in range(nbr):
        blocks = np.arange(bsr.indptr[i], bsr.indptr[i + 1])
        bcols = bsr.indices[bsr.indptr[i]:bsr.indptr[i + 1]]
        o = np.argsort(bcols, kind="stable")
        blocks, bcols = blocks[o], bcols[o]
        for r in range(b):
            for k, bc in zip(blocks, bcols):
                indices.append(np.arange(bc * b, bc * b + b))
                order.append(k * b * b + r * b + np.arange(b))
            indptr.append(indptr[-1] + b * int(block_counts[i]))
    indices = (np.concatenate(indices).astype(np.int64) if indices
               else np.zeros((0,), np.int64))
    order = (np.concatenate(order).astype(np.int64) if order
             else np.zeros((0,), np.int64))
    out = (np.asarray(indptr, np.int64), indices, order)
    _BSR_EXPAND_CACHE[key] = out
    return out


def bsr_spmv_pallas(bsr, x, *, interpret=None):
    """BSR matvec through the scalar ELL gather kernel (symbolic block
    expansion cached; the data reshuffle is a static take)."""
    indptr, indices, order = bsr_scalar_pattern(bsr)
    plan = ell_plan_for(indptr, indices, bsr.shape[0], bsr.shape[1])
    csr_data = jnp.take(bsr.data.reshape(-1), jnp.asarray(order))
    return ell_spmv_pallas(plan, csr_data, x, interpret=interpret)


def _bsr_spmm_kernel(cols_ref, data_ref, x_ref, out_ref, acc_ref):
    """One block-row of Y = A @ X.

    cols_ref: (nbr, wb) SMEM whole-array resident block-column ids
    (ELL-padded, -1 = pad; blocked SMEM tiles are rejected on hardware —
    same constraint as the ELL kernel's r0); data_ref: (1, wb, b, b);
    x_ref: (nbc, 8, nrhs) resident — each block-row PADDED to a full
    8-sublane native tile so the dynamic leading-axis fetch is a plain
    VMEM address offset (for b < 8 an unpadded (nbc, b, nrhs) layout
    makes every dynamic index a sublane-realignment Mosaic decomposes);
    out: (1, b, nrhs).
    """
    _, wb, b, _ = data_ref.shape
    i = pl.program_id(0)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    # The slot loop is UNROLLED (wb is static and small): a fori_loop
    # would index data_ref[0, k] dynamically, and dynamic indexing into
    # the sub-native-tile (wb, b, b) layout is another Mosaic
    # decomposition trap.  Only the x block fetch (whole padded tile,
    # address offset) and the pad predicate stay dynamic.
    for k in range(wb):
        bc = cols_ref[i, k]

        @pl.when(bc >= 0)
        def _(k=k, bc=bc):
            xb = x_ref[bc][:b]
            acc_ref[...] += jnp.dot(data_ref[0, k], xb,
                                    preferred_element_type=acc_ref.dtype)

    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nbr", "wb", "b", "interpret"))
def _bsr_spmm_call(cols, data, x, *, nbr, wb, b, interpret):
    nrhs = x.shape[2]
    return pl.pallas_call(
        _bsr_spmm_kernel,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # cols resident
            pl.BlockSpec((1, wb, b, b), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # x resident
        ],
        out_specs=pl.BlockSpec((1, b, nrhs), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbr, b, nrhs), data.dtype),
        scratch_shapes=[pltpu.VMEM(
            (b, nrhs),
            jnp.float64 if data.dtype == jnp.float64 else jnp.float32)],
        interpret=interpret,
    )(cols, data, x)


def _bsr_ell_blocks(bsr):
    """ELL-pad the block pattern: (cols (nbr, wb) int32 with -1 padding,
    perm block ids, valid mask)."""
    b = bsr.blocksize
    nbr = bsr.shape[0] // b
    counts = np.diff(bsr.indptr)
    wb = max(int(counts.max()) if counts.size else 1, 1)
    cols = np.full((nbr, wb), -1, np.int32)
    perm = np.zeros((nbr, wb), np.int64)
    valid = np.zeros((nbr, wb), bool)
    for i in range(nbr):
        k = counts[i]
        cols[i, :k] = bsr.indices[bsr.indptr[i]:bsr.indptr[i + 1]]
        perm[i, :k] = np.arange(bsr.indptr[i], bsr.indptr[i + 1])
        valid[i, :k] = True
    return cols, perm, valid


def bsr_spmm_pallas(bsr, X, *, interpret=None):
    """Y = A @ X for BSR A and dense multi-RHS X — the MXU path.

    On TPU hardware this lowers through XLA as one batched-gather +
    batched (b, b) × (b, nrhs) einsum + segment-sum — every flop on the
    MXU, and all three stages fuse-friendly.  (The hand-written Pallas
    block-row streaming kernel below lowers for the interpret tier and
    stays the development vehicle: on v5e Mosaic decomposes its
    sub-native-tile (b < 8) block arithmetic so badly that compilation
    effectively hangs — static-unrolled and whole-tile-fetch variants
    included.  Revisit when block sizes reach native tile shapes.)
    """
    if not _use_interpret(interpret):
        b = bsr.blocksize
        nbc = bsr.shape[1] // b
        Xb = X.reshape(nbc, b, X.shape[1])
        gathered = jnp.take(Xb, jnp.asarray(bsr.indices), axis=0)
        acc_dt = (jnp.float64 if bsr.data.dtype == jnp.float64
                  else jnp.float32)
        # Precision.HIGHEST: the terminal forces
        # --xla_allow_excess_precision, which silently runs f32 matmuls
        # as single-pass bf16 on the MXU (~3e-3 relative error —
        # docs/tpu_tuning.md §4b); a sparse matvec must be exact f32.
        prods = jnp.einsum("nij,njr->nir", bsr.data, gathered,
                           preferred_element_type=acc_dt,
                           precision=jax.lax.Precision.HIGHEST)
        out = jax.ops.segment_sum(prods,
                                  jnp.asarray(bsr.block_row_ids),
                                  num_segments=bsr.shape[0] // b)
        return out.astype(X.dtype).reshape(bsr.shape[0], X.shape[1])

    b = bsr.blocksize
    n, m = bsr.shape
    cols, perm, valid = _bsr_ell_blocks(bsr)
    nbr, wb = cols.shape
    data = jnp.where(jnp.asarray(valid)[:, :, None, None],
                     jnp.take(bsr.data, jnp.asarray(perm.reshape(-1)),
                              axis=0).reshape(nbr, wb, b, b),
                     jnp.zeros((), bsr.data.dtype))
    nrhs = X.shape[1]
    nrhs_pad = _round_up(nrhs, LANES)
    nbc = m // b
    Xp = jnp.zeros((nbc, SUBLANES, nrhs_pad), X.dtype)
    Xp = Xp.at[:, :b, :nrhs].set(X.reshape(nbc, b, nrhs))
    out = _bsr_spmm_call(jnp.asarray(cols), data, Xp, nbr=nbr, wb=wb, b=b,
                         interpret=True)
    return out.reshape(n, nrhs_pad)[:, :nrhs]
