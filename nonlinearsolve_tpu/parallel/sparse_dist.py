"""Row-partitioned general-sparse SpMV over a device mesh.

The reference distributes *assembled* sparse operators through PETSc's MPI
MatMult (/root/reference/ext/NonlinearSolvePETScExt.jl:123-142; SURVEY
§2.10's "row/block-partitioned Jacobian across hosts" target).  This module
is the TPU-native equivalent: a CSR operator is row-partitioned across a
``jax.sharding.Mesh`` axis, each shard applies its local rows with the
windowed-ELL Pallas gather kernel (ops/pallas_spmv.py) — or an XLA
segment-sum tier off-TPU / out-of-envelope — and the off-shard ``x``
columns each shard's window needs arrive by ``ppermute`` ring halo
exchange over ICI (single-hop when every shard's column window fits its
neighbors' chunks; ``all_gather`` fallback for genuinely global patterns
such as scrambled matrices).

The communication pattern is issued FIRST inside the shard program, so
XLA's latency-hiding scheduler overlaps the ICI transfer with the local
data packing — the same discipline as the stencil tiers
(parallel/distributed.py).

Everything symbolic is planned host-side ONCE per pattern (cached): the
row partition, per-shard windows, halo widths, and per-shard ELL plans
forced to one static kernel shape so the mesh program is SPMD.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pallas_spmv import (MAX_SLOTS, MAX_WINDOW_ROWS, MAX_X_ELEMS_VMEM,
                               EllPlan, LANES, SUBLANES, _ell_spmv_call,
                               _use_interpret)


class ShardedCsrPlan(NamedTuple):
    """Host-built plan for one (pattern, n_shards) pair."""
    n: int                   # global square dimension
    n_shards: int
    chunk: int               # rows per shard (n padded to n_shards*chunk)
    mode: str                # "halo" | "allgather"
    hl: int                  # left halo width (cols), halo mode
    hr: int                  # right halo width
    buf_len: int             # per-shard x buffer length
    ntiles: int              # ELL grid steps per shard
    w: int                   # common slot count
    W: int                   # common window height (x-tile rows)
    nx_rows: int             # padded x-buffer tile rows
    kmode: str               # kernel window granularity: "slot" | "group"
    pallas_ok: bool          # every shard within the kernel envelope
    r0_all: np.ndarray       # (S, ntiles, 8[, w]) int32
    idx_all: np.ndarray      # (S, ntiles, 8, w, 128) int32
    perm_all: np.ndarray     # (S, ntiles*8*w*128) int64 → global data idx
    valid_all: np.ndarray    # same shape bool
    # segment-sum tier tables
    seg_pos: np.ndarray      # (S, nnz_max) int32 buffer position
    seg_row: np.ndarray      # (S, nnz_max) int32 local row
    seg_src: np.ndarray      # (S, nnz_max) int64 global data idx
    seg_valid: np.ndarray    # (S, nnz_max) bool


_PLAN_CACHE: dict = {}


def build_sharded_csr_plan(indptr, indices, n, n_shards) -> ShardedCsrPlan:
    """Plan the row partition + halo strategy + per-shard ELL layouts."""
    from ..ops.pallas_spmv import pattern_key
    key = pattern_key(indptr, indices, n, n_shards)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit

    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    S = int(n_shards)
    chunk = -(-n // S)

    # per-shard column windows → halo widths
    c0 = np.zeros(S, np.int64)
    c1 = np.zeros(S, np.int64)
    for s in range(S):
        r_lo, r_hi = s * chunk, min((s + 1) * chunk, n)
        cols = indices[indptr[r_lo]:indptr[r_hi]] if r_lo < n else indices[:0]
        if cols.size:
            c0[s], c1[s] = cols.min(), cols.max() + 1
        else:
            c0[s], c1[s] = s * chunk, s * chunk
    hl = int(max(0, (np.arange(S) * chunk - c0).max()))
    hr = int(max(0, (c1 - (np.arange(S) + 1) * chunk).max()))
    # Multi-hop ring halos (r3): widths up to _MAX_HALO_HOPS neighbor
    # chunks ride ppermute (hop k fetches the chunk k shards away; the
    # farthest hop is sliced); wider windows — or halos covering most of
    # the ring anyway — fall back to one all_gather.
    hops = max(-(-hl // chunk), -(-hr // chunk))
    if hops <= _MAX_HALO_HOPS and hl + hr < (S - 1) * chunk:
        mode = "halo"
    else:
        mode, hl, hr = "allgather", 0, 0
    buf_len = hl + chunk + hr if mode == "halo" else S * chunk

    # per-shard local patterns (columns remapped into the buffer)
    shard_patterns = []
    nnz_max = 1
    for s in range(S):
        r_lo, r_hi = s * chunk, min((s + 1) * chunk, n)
        base = indptr[r_lo] if r_lo < n else indptr[n]
        sub_indptr = np.zeros(chunk + 1, np.int64)
        if r_lo < n:
            sub_indptr[:r_hi - r_lo + 1] = indptr[r_lo:r_hi + 1] - base
            sub_indptr[r_hi - r_lo + 1:] = sub_indptr[r_hi - r_lo]
        cols = indices[base:indptr[r_hi]] if r_lo < n else indices[:0]
        shift = (s * chunk - hl) if mode == "halo" else 0
        local_cols = cols - shift
        shard_patterns.append((sub_indptr, local_cols, int(base)))
        nnz_max = max(nnz_max, int(cols.size))

    # two passes: learn per-shard (w, W, mode), then force the common
    # static kernel shape (SPMD: every shard runs one program)
    probe = [EllPlan(sp, lc, chunk, buf_len)
             for sp, lc, _ in shard_patterns]
    w = max(p.w for p in probe)
    mode_f = "slot" if all(p.mode == "slot" for p in probe) else "group"
    plans = [EllPlan(sp, lc, chunk, buf_len, min_w=w, force_mode=mode_f)
             for sp, lc, _ in shard_patterns]
    W = max(p.W for p in plans)
    plans = [EllPlan(sp, lc, chunk, buf_len, min_w=w, min_W=W,
                     force_mode=mode_f)
             for sp, lc, _ in shard_patterns]
    p0 = plans[0]
    from ..ops.pallas_spmv import _SMEM_R0_CAP_BYTES
    pallas_ok = (buf_len <= MAX_X_ELEMS_VMEM and W <= MAX_WINDOW_ROWS
                 and w <= MAX_SLOTS
                 and np.asarray(p0.r0).size * 4 <= _SMEM_R0_CAP_BYTES)

    r0_all = np.stack([p.r0 for p in plans])
    idx_all = np.stack([p.idx for p in plans])
    perm_all = np.stack([p.safe_perm + off
                         for p, (_, _, off) in zip(plans, shard_patterns)])
    valid_all = np.stack([p.valid for p in plans])

    seg_pos = np.zeros((S, nnz_max), np.int32)
    seg_row = np.zeros((S, nnz_max), np.int32)
    seg_src = np.zeros((S, nnz_max), np.int64)
    seg_valid = np.zeros((S, nnz_max), bool)
    for s, (sub_indptr, local_cols, off) in enumerate(shard_patterns):
        m = local_cols.size
        seg_pos[s, :m] = local_cols
        seg_row[s, :m] = np.repeat(np.arange(chunk), np.diff(sub_indptr))
        seg_src[s, :m] = off + np.arange(m)
        seg_valid[s, :m] = True

    plan = ShardedCsrPlan(
        n=int(n), n_shards=S, chunk=chunk, mode=mode, hl=hl, hr=hr,
        kmode=mode_f,
        buf_len=buf_len, ntiles=p0.ntiles, w=w, W=W, nx_rows=p0.nx_rows,
        pallas_ok=pallas_ok, r0_all=r0_all, idx_all=idx_all,
        perm_all=perm_all, valid_all=valid_all, seg_pos=seg_pos,
        seg_row=seg_row, seg_src=seg_src, seg_valid=seg_valid)
    _PLAN_CACHE[key] = plan
    return plan


#: halo widths up to this many neighbor chunks use ppermute hops; wider
#: windows take the all_gather path
_MAX_HALO_HOPS = 3


def _ring_halo(axis: str, x_local, hl: int, hr: int):
    """Receive the ``hl`` entries preceding this shard's chunk and the
    ``hr`` entries following it (periodic ring over ICI).  Widths may span
    MULTIPLE neighbor chunks: hop ``k`` ppermutes the full chunk from the
    shard ``k`` positions away; the farthest hop is sliced to the
    remaining width.  Either width may be 0 (no transfer issued)."""
    n = jax.lax.axis_size(axis)
    chunk = x_local.shape[0]

    def hop(payload, k, direction):
        # direction +1: receive from the shard k positions to the LEFT
        perm = [(i, (i + direction * k) % n) for i in range(n)]
        return jax.lax.ppermute(payload, axis, perm)

    parts = []
    if hl > 0:
        k = -(-hl // chunk)
        rem = hl - (k - 1) * chunk
        parts.append(hop(x_local[-rem:], k, +1))   # farthest: slice first
        for kk in range(k - 1, 0, -1):
            parts.append(hop(x_local, kk, +1))
    parts.append(x_local)
    if hr > 0:
        k = -(-hr // chunk)
        for kk in range(1, k):
            parts.append(hop(x_local, kk, -1))
        rem = hr - (k - 1) * chunk
        parts.append(hop(x_local[:rem], k, -1))
    return jnp.concatenate(parts) if len(parts) > 1 else x_local


def make_sharded_csr_matvec(csr, mesh: Mesh, axis: str = "x", *,
                            use_pallas: Optional[bool] = None) -> Callable:
    """Build ``matvec(x_global) -> y_global`` for a square CSR operator,
    row-partitioned over ``mesh[axis]``.

    ``csr``: ops/sparse.CSR (data traced-friendly; pattern static).
    ``use_pallas``: force the Pallas tier (interpret off-TPU) or the
    segment-sum tier; default picks Pallas on TPU when the per-shard
    plans fit the kernel envelope.

    The returned callable is jittable; ``x`` may be sharded or not (it is
    constrained to the row sharding internally).  ``y`` comes back with
    the same row sharding.
    """
    S = int(np.prod([mesh.shape[a] for a in (axis,)]))
    n = csr.shape[0]
    if csr.shape[0] != csr.shape[1]:
        raise ValueError("row-sharded matvec requires a square operator")
    plan = build_sharded_csr_plan(csr.indptr, csr.indices, n, S)
    interpret = _use_interpret(None)
    if use_pallas is None:
        pallas = plan.pallas_ok and not interpret
    else:
        pallas = bool(use_pallas) and plan.pallas_ok

    npad = plan.n_shards * plan.chunk
    spec = P(axis)
    sharding = NamedSharding(mesh, spec)

    r0_all = jnp.asarray(plan.r0_all)
    idx_all = jnp.asarray(plan.idx_all)
    seg_pos = jnp.asarray(plan.seg_pos)
    seg_row = jnp.asarray(plan.seg_row)

    def pack_data(data):
        if pallas:
            vals = jnp.where(jnp.asarray(plan.valid_all),
                             jnp.take(data, jnp.asarray(plan.perm_all)),
                             jnp.zeros((), data.dtype))
            return vals.reshape(plan.n_shards, plan.ntiles, SUBLANES,
                                plan.w, LANES)
        vals = jnp.where(jnp.asarray(plan.seg_valid),
                         jnp.take(data, jnp.asarray(plan.seg_src)),
                         jnp.zeros((), data.dtype))
        return vals

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    def _mv_pallas(r0_l, idx_l, data_l, x_l):
        # 1. kick off the ICI gather of the off-shard x columns
        if plan.mode == "halo":
            buf = _ring_halo(axis, x_l, plan.hl, plan.hr)
        else:
            buf = jax.lax.all_gather(x_l, axis, tiled=True)
        # 2. pack x into the (R/8, 8, 128) tile layout the kernel reads
        xp = jnp.zeros((plan.nx_rows * LANES,), x_l.dtype)
        xp = xp.at[:plan.buf_len].set(buf[:plan.buf_len])
        xp = xp.reshape(plan.nx_rows // SUBLANES, SUBLANES, LANES)
        out = _ell_spmv_call(r0_l[0], idx_l[0], data_l[0], xp,
                             ntiles=plan.ntiles, w=plan.w, W=plan.W,
                             mode=plan.kmode, interpret=interpret)
        return out.reshape(1, plan.ntiles * SUBLANES * LANES)[
            :, :plan.chunk]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    def _mv_segsum(pos_l, row_l, data_l, x_l):
        if plan.mode == "halo":
            buf = _ring_halo(axis, x_l, plan.hl, plan.hr)
        else:
            buf = jax.lax.all_gather(x_l, axis, tiled=True)
        prod = data_l[0] * jnp.take(buf, pos_l[0])       # (nnz_max,)
        y = jax.ops.segment_sum(prod, row_l[0], num_segments=plan.chunk)
        return y[None, :]

    # pack-once staging (r3): the default data packs HERE, at operator
    # construction, not inside every Krylov iteration (XLA's loop LICM
    # hoists the packed ARRAY but not the gather chain)
    packed_default = pack_data(csr.data)

    def matvec(x, *, data=None):
        packed = packed_default if data is None else pack_data(data)
        xp = jnp.zeros((npad,), x.dtype).at[:n].set(x)
        xp = jax.lax.with_sharding_constraint(xp, sharding)
        if pallas:
            y = _mv_pallas(r0_all, idx_all, packed, xp)
        else:
            y = _mv_segsum(seg_pos, seg_row, packed, xp)
        y = y.reshape(npad)
        if n % plan.n_shards == 0:
            y = jax.lax.with_sharding_constraint(y, sharding)
        return y[:n]

    matvec.plan = plan
    matvec.tier = "pallas" if pallas else "segment_sum"
    return matvec
