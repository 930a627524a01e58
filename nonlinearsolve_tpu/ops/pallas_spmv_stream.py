"""Column-streamed band-ELL SpMV: the beyond-VMEM Pallas tier.

Role: the reference's SuiteSparse/PETSc MatMult has no problem-size
ceiling (/root/reference/ext/NonlinearSolvePETScExt.jl:123-142); the
resident windowed-ELL kernel (pallas_spmv.py) does — it requires the
whole x vector VMEM-resident (n_cols <= ~2.6M f32).  This tier removes
that ceiling for every pattern with bounded *diagonal band structure*
(stencils, banded, and anything RCM makes banded — i.e. every assembled
PDE Jacobian), at ANY problem size.

Design (TPU-first)
------------------
The resident kernel needs per-(group, slot) window-start tables in SMEM
(a few KB cap on v5e) — streaming those does not scale.  The key
observation: if slots are assigned by **diagonal-offset band** instead of
per-row column rank, every window position becomes *affine in the grid
index*:

    slot s covers offsets [band_lo_s, band_hi_s], width <= 1024
    => columns of rows [1024 t + 128 j, +128) in slot s lie in
       [1024 t + 128 j + band_lo_s, ... + 127 + band_hi_s]
    => the window start tile is  max((1024 t + 128 j + band_lo_s) // 1024, 0)
       — computed IN-KERNEL from ``pl.program_id`` and static band bounds,
       no tables at all —
    and the span is a static <= 3 tiles per band.

x then *streams* through VMEM as two aligned F-tile blocks (dual
operands of the same array, block indices k and k+1 where
k = max(t + lo_t, 0) // F) — the classic overlapping-window workaround
for BlockSpec's block-granular indexing.  The Pallas pipeline re-fetches
a block only when its index changes, i.e. once per F grid steps: x
traffic is ~8/w bytes per nonzero.  Total HBM traffic ≈ 8 B/nnz
(4 data + 4 packed index), the same as the resident kernel — with NO cap
on n_cols.

Rows whose band has several nonzeros get sub-slots (the band's per-row
max count); the plan refuses patterns where that padding explodes
(``ok == False``) and the caller falls back (resident kernel envelope or
XLA segment_sum).  Fully random patterns have n/1024 bands — structurally
rejected here; see docs/tpu_tuning.md for the gather-issue roofline
argument for why no TPU kernel can run those fast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spmv import (LANES, ROWS_PER_TILE, SUBLANES, _round_up,
                          _use_interpret, pattern_key)

# Structural caps: total slots the kernel unrolls (compile time) and the
# band count; padding ratio cap keeps degenerate clusterings off this
# tier.  Bands far apart in column space (periodic wraps!) are CLUSTERED
# into window groups, each streaming its own pair of x blocks:
# 2 * groups * F tiles * 4 KB * 2 pipeline buffers <= ~8 MB VMEM.
MAX_BAND_SLOTS = 48
MAX_BANDS = 48
PAD_RATIO_CAP = 3.0
MAX_F_TILES = 512
MAX_GROUPS = 8
BAND_WIDTH = 1024  # columns per band (one x tile)


class BandPlan:
    """Host-built streamed band-ELL plan for one sparsity pattern.

    Attributes (when ``ok``):
      w          — total slot count (sum of per-band sub-slot counts)
      bands      — list of (band_lo, band_hi, nslots, slot_base, span)
      lo_t       — static global window base offset in tiles (can be < 0)
      F          — x block height in tiles
      ntiles     — 1024-row grid length
      idx        — (ntiles, 8, w, 128) packed window-local int32
      perm/valid/safe_perm — CSR-order -> slot-layout scatter map
      nx_pad     — padded x tile count
    """

    def __init__(self, indptr, indices, n_rows, n_cols):
        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int64)
        self.indptr = indptr
        self.indices = indices
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.ok = False
        self._transpose = None
        counts = np.diff(indptr)
        nnz = len(indices)
        if nnz == 0 or n_rows == 0:
            return
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        # Canonicalize to per-row-SORTED column order: the (row, band)
        # run/rank logic below requires it, but CSR permits unsorted
        # columns — without this, interleaved band entries restarted
        # rank at 0 and silently collided in one ELL slot.  ``order0``
        # maps sorted position -> original CSR position (identity when
        # already sorted; rows are invariant under the stable sort).
        order0 = np.lexsort((indices, rows))
        indices = indices[order0]
        offs = indices - rows

        # Greedy band clustering of the distinct diagonal offsets.
        uo = np.unique(offs)
        band_lo, band_hi = [], []
        i = 0
        while i < len(uo):
            lo = uo[i]
            j = int(np.searchsorted(uo, lo + BAND_WIDTH, side="left"))
            band_lo.append(int(lo))
            band_hi.append(int(uo[j - 1]))
            i = j
        K = len(band_lo)
        if K > MAX_BANDS:
            return
        band_lo_a = np.asarray(band_lo, np.int64)
        band_id = np.searchsorted(band_lo_a, offs, side="right") - 1

        # Rank within each row's band run.  CSR columns are sorted per
        # row and band id is monotone in the offset, so (row, band) runs
        # are contiguous in CSR order.
        key = rows * K + band_id
        first = np.concatenate([[0], np.flatnonzero(np.diff(key)) + 1]) \
            if nnz > 1 else np.zeros(1, np.int64)
        run_start = np.zeros(nnz, np.int64)
        run_start[first] = first
        run_start = np.maximum.accumulate(run_start)
        rank = np.arange(nnz, dtype=np.int64) - run_start

        m_k = np.zeros(K, np.int64)
        np.maximum.at(m_k, band_id, rank + 1)
        w = int(m_k.sum())
        n_pad = _round_up(max(n_rows, 1), ROWS_PER_TILE)
        if w > MAX_BAND_SLOTS or w * n_pad > PAD_RATIO_CAP * nnz + 4096 * w:
            return
        slot_base = np.concatenate([[0], np.cumsum(m_k)])[:-1]
        slots = slot_base[band_id] + rank

        ntiles = n_pad // ROWS_PER_TILE
        # Streaming window geometry: cluster bands into proximity GROUPS
        # — bands far apart in column space (periodic wrap diagonals, far
        # couplings) would blow a single window, but each cluster's union
        # span is small.  Every group streams its own dual x-block pair
        # with static base offset lo_t_g (python ints; affine in t).
        group_lo_t, group_hi_edge, band_gid = [], [], []
        for k in range(K):       # band_lo sorted ascending
            lo_t_k = band_lo[k] // BAND_WIDTH
            hi_edge_k = (BAND_WIDTH - 1 + band_hi[k]) // BAND_WIDTH + 1
            if (group_lo_t
                    and hi_edge_k - group_lo_t[-1] + 1 <= MAX_F_TILES):
                group_hi_edge[-1] = max(group_hi_edge[-1], hi_edge_k)
            else:
                group_lo_t.append(lo_t_k)
                group_hi_edge.append(hi_edge_k)
            band_gid.append(len(group_lo_t) - 1)
        G = len(group_lo_t)
        if G > MAX_GROUPS:
            return
        F = max(hi - lo + 1
                for lo, hi in zip(group_lo_t, group_hi_edge))
        if F > MAX_F_TILES:
            return
        self.F = F
        self.group_lo_t = [int(v) for v in group_lo_t]
        spans = [int((LANES - 1 + band_hi[k] - band_lo[k]) // BAND_WIDTH) + 2
                 for k in range(K)]
        self.bands = [(band_lo[k], band_hi[k], int(m_k[k]),
                       int(slot_base[k]), spans[k], band_gid[k])
                      for k in range(K)]

        # Window-local packed indices: the kernel recomputes ws(t, j, k)
        # with this EXACT formula — keep the two in lockstep.
        g = rows // LANES                       # 128-row group id
        ws = np.maximum((LANES * g + band_lo_a[band_id]) // BAND_WIDTH, 0)
        hi_local = indices // LANES - ws * SUBLANES
        lo_local = indices % LANES
        packed = (hi_local * LANES + lo_local).astype(np.int32)

        # Scatter into the (ntiles, 8, w, 128) slot-major tile layout.
        idx_t = np.zeros((w, n_pad), np.int32)
        perm = np.full((w, n_pad), -1, np.int64)
        idx_t[slots, rows] = packed
        perm[slots, rows] = order0      # slot -> ORIGINAL CSR position

        def to_tiles(a):
            return (a.reshape(w, ntiles, SUBLANES, LANES)
                    .transpose(1, 2, 0, 3).copy())

        self.idx = to_tiles(idx_t)
        self.perm = to_tiles(perm).reshape(-1)
        self.valid = self.perm >= 0
        self.safe_perm = np.where(self.valid, self.perm, 0)
        self.w = w
        self.n_pad = n_pad
        self.ntiles = ntiles
        # Host-side coverage proof: for every (t, j, band), the walked
        # window [ws, ws + span) must fall inside the group's dual block
        # [base_g(t), base_g(t) + 2F).  Affine-in-t with floors — verify
        # exhaustively (vectorized, cheap) instead of trusting algebra.
        tt = np.arange(ntiles, dtype=np.int64)
        for _ in range(4):
            okc = True
            F = self.F
            for (b_lo, b_hi, _ns, _sb, span, gid) in self.bands:
                base = (np.maximum(tt + self.group_lo_t[gid], 0)
                        // F) * F
                for j in (0, SUBLANES - 1):
                    wsv = np.maximum(
                        (ROWS_PER_TILE * tt + LANES * j + b_lo)
                        // BAND_WIDTH, 0)
                    if ((wsv < base).any()
                            or (wsv + span > base + 2 * F).any()):
                        okc = False
            if okc:
                break
            self.F += 8
        else:
            return
        F = self.F
        if F > MAX_F_TILES:
            return
        # x padding: cover every streamed block and the real columns.
        kmax = max(max(ntiles - 1 + lo, 0) // F
                   for lo in self.group_lo_t)
        nxr = -(-max(n_cols, 1) // BAND_WIDTH)        # real x tiles
        self.nx_pad = max((kmax + 2) * F, (-(-nxr // F) + 1) * F)
        self.ok = True

    @property
    def supported(self) -> bool:
        return self.ok

    @property
    def row_ids(self):
        return np.repeat(np.arange(self.n_rows, dtype=np.int64),
                         np.diff(self.indptr))

    def pack_data(self, csr_data):
        vals = jnp.where(jnp.asarray(self.valid),
                         jnp.take(csr_data, jnp.asarray(self.safe_perm)),
                         jnp.zeros((), csr_data.dtype))
        return vals.reshape(self.ntiles, SUBLANES, self.w, LANES)

    def pack_x(self, x):
        xp = jnp.zeros((self.nx_pad * ROWS_PER_TILE,), x.dtype)
        return xp.at[:x.shape[0]].set(x).reshape(
            self.nx_pad, SUBLANES, LANES)

    def transpose_pattern(self):
        """(tindptr, tindices, tperm) of A^T (host, cached)."""
        if self._transpose is None:
            from .pallas_spmv import transpose_pattern_of
            self._transpose = transpose_pattern_of(
                self.indptr, self.indices, self.n_rows, self.n_cols)
        return self._transpose


_BAND_PLAN_CACHE: dict = {}


def band_plan_for(indptr, indices, n_rows, n_cols) -> BandPlan:
    key = pattern_key(indptr, indices, n_rows, n_cols)
    plan = _BAND_PLAN_CACHE.get(key)
    if plan is None:
        plan = BandPlan(indptr, indices, int(n_rows), int(n_cols))
        _BAND_PLAN_CACHE[key] = plan
    return plan


def _make_band_kernel(bands, w, F, group_lo_t):
    """bands: static (band_lo, band_hi, nslots, slot_base, span, gid)."""
    G = len(group_lo_t)

    def kernel(idx_ref, data_ref, *xrefs_out):
        out_ref = xrefs_out[-1]
        xrefs = xrefs_out[:-1]                      # 2G x block refs
        t = pl.program_id(0)
        bases = [jnp.maximum(t + group_lo_t[g], 0) // F * F
                 for g in range(G)]                 # block A starts (tiles)
        for j in range(SUBLANES):
            acc = jnp.zeros((1, LANES), dtype=out_ref.dtype)
            for (b_lo, _b_hi, nslots, s_base, span, gid) in bands:
                xa_ref = xrefs[2 * gid]
                xb_ref = xrefs[2 * gid + 1]
                # window start tile: EXACTLY the host packing formula
                ws = jnp.maximum(
                    (ROWS_PER_TILE * t + LANES * j + b_lo) // BAND_WIDTH, 0)
                woff = ws - bases[gid]              # in [0, 2F)
                for m in range(nslots):
                    s = s_base + m
                    idx = idx_ref[0, j, s:s + 1, :]   # (1, 128) packed
                    his = jax.lax.shift_right_logical(idx, jnp.int32(7))
                    los = jax.lax.bitwise_and(idx, jnp.int32(127))
                    hi8 = jax.lax.bitwise_and(his, jnp.int32(7))
                    dat = data_ref[0, j, s:s + 1, :]
                    for g0 in range(span):
                        rel = woff + g0
                        in_a = rel < F
                        xa = xa_ref[jnp.minimum(rel, F - 1)]
                        xb = xb_ref[jnp.clip(rel - F, 0, F - 1)]
                        xt = jnp.where(in_a, xa, xb)
                        # lane gather FIRST, then sublane (pallas_spmv
                        # module doc — reversed order composes wrong)
                        a1 = jnp.take_along_axis(
                            xt, jnp.broadcast_to(los, (SUBLANES, LANES)),
                            axis=1)
                        a2 = jnp.take_along_axis(
                            a1, jnp.broadcast_to(hi8, (SUBLANES, LANES)),
                            axis=0)
                        in_tile = (jax.lax.shift_right_logical(
                            his, jnp.int32(3)) == g0)
                        acc = acc + jnp.where(
                            in_tile, dat * a2[0:1, :],
                            jnp.zeros((), acc.dtype))
            out_ref[0, j, :] = acc[0, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ntiles", "w", "F", "group_lo_t", "bands",
                              "interpret"))
def _band_spmv_call(idx, data, x3d, *, ntiles, w, F, group_lo_t, bands,
                    interpret):
    def xmaps(lo_t, delta):
        return lambda t: (jnp.maximum(t + lo_t, 0) // F + delta, 0, 0)

    x_specs = []
    for lo_t in group_lo_t:
        x_specs.append(pl.BlockSpec((F, SUBLANES, LANES), xmaps(lo_t, 0),
                                    memory_space=pltpu.VMEM))
        x_specs.append(pl.BlockSpec((F, SUBLANES, LANES), xmaps(lo_t, 1),
                                    memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _make_band_kernel(list(bands), w, F, list(group_lo_t)),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, SUBLANES, w, LANES), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, w, LANES), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + x_specs,
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, SUBLANES, LANES),
                                       data.dtype),
        interpret=interpret,
        # per-group dual aligned window blocks of the SAME x array
    )(idx, data, *([x3d] * (2 * len(group_lo_t))))


def _band_spmv_packed(plan: BandPlan, packed, x3d, interpret: bool):
    out = _band_spmv_call(jnp.asarray(plan.idx), packed, x3d,
                          ntiles=plan.ntiles, w=plan.w, F=plan.F,
                          group_lo_t=tuple(plan.group_lo_t),
                          bands=tuple(plan.bands), interpret=interpret)
    return out.reshape(plan.n_pad)


def _band_spmv_core(plan: BandPlan, interpret: bool, csr_data, x):
    data = plan.pack_data(csr_data)
    x3d = plan.pack_x(x)
    return _band_spmv_packed(plan, data, x3d, interpret)[:plan.n_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _band_spmv_ad(plan, interpret, csr_data, x):
    return _band_spmv_core(plan, interpret, csr_data, x)


def _band_spmv_fwd(plan, interpret, csr_data, x):
    return _band_spmv_core(plan, interpret, csr_data, x), (csr_data, x)


def _band_spmv_bwd(plan, interpret, res, ybar):
    csr_data, x = res
    tindptr, tindices, tperm = plan.transpose_pattern()
    tplan = band_plan_for(tindptr, tindices, plan.n_cols, plan.n_rows)
    tdata = jnp.take(csr_data, jnp.asarray(tperm))
    if tplan.supported:
        xbar = _band_spmv_core(tplan, interpret, tdata, ybar)
    else:
        prod = tdata * jnp.take(ybar, jnp.asarray(tindices))
        xbar = jax.ops.segment_sum(
            prod, jnp.asarray(np.repeat(np.arange(plan.n_cols),
                                        np.diff(tindptr))),
            num_segments=plan.n_cols)
    dbar = (jnp.take(ybar, jnp.asarray(plan.row_ids))
            * jnp.take(x, jnp.asarray(plan.indices)))
    return dbar.astype(csr_data.dtype), xbar.astype(x.dtype)


_band_spmv_ad.defvjp(_band_spmv_fwd, _band_spmv_bwd)


def band_spmv_pallas(plan: BandPlan, csr_data, x, *, interpret=None):
    """y = A @ x through the streamed band-ELL kernel (reverse-mode
    differentiable in both operands; the x-cotangent rides the
    transpose-pattern plan)."""
    return _band_spmv_ad(plan, _use_interpret(interpret), csr_data, x)


def band_spmv_staged(plan: BandPlan, csr_data, *, interpret=None):
    """Pre-staged forward-only matvec closure (packing hoisted — same
    contract as pallas_spmv.csr_spmv_staged)."""
    interp = _use_interpret(interpret)
    packed = plan.pack_data(csr_data)

    def mv(x):
        x3d = plan.pack_x(x)
        return _band_spmv_packed(plan, packed, x3d, interp)[:plan.n_rows]

    return mv
