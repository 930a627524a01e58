"""Grid-blocked Pallas kernel for the 3D reaction-diffusion JVP.

The 2D kernels in ``pallas_stencil.py`` hold the whole state in VMEM —
fine up to ~12 MB, useless for the 3D 256³ problem (64 MB per array,
SURVEY BASELINE config 5).  This kernel blocks the leading (z) axis:

* ``u`` (frozen state) and the output stream through the standard Pallas
  block pipeline, one (Bz, N, N) slab per grid step;
* the tangent ``t`` stays in HBM (``memory_space=ANY``) and each program
  issues THREE manual DMAs into a (Bz+2, N, N) VMEM scratch: the slab
  body plus one periodic halo plane on each side (``pltpu.make_async_copy``
  with dynamic, wrapped slice indices);
* the z-derivative comes from shifted scratch reads, the in-plane
  derivatives from lane/sublane ``pltpu.roll`` — no gathers anywhere.

The reference meets this problem with distributed CSR SpMV over MPI
(SURVEY §2.10); on TPU a blocked stencil stream at HBM bandwidth is the
speed-of-light design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stencil import _interpret


def _rd3d_stencil(u, t_b, up, down, d_h2):
    """``D Δt + (1 − 3u²) t`` on one (bz, N, N) slab: in-plane derivatives
    via lane/sublane rolls, z-derivative from the shifted scratch windows
    ``up``/``down`` (each the same shape as ``t_b``)."""
    inplane = (pltpu.roll(t_b, 1, 1)
               + pltpu.roll(t_b, (-1) % t_b.shape[1], 1)
               + pltpu.roll(t_b, 1, 2)
               + pltpu.roll(t_b, (-1) % t_b.shape[2], 2)
               - 6.0 * t_b)
    return d_h2 * (inplane + up + down) + (1.0 - 3.0 * u * u) * t_b


def _periodic_dmas(nz, bz, t_hbm, page, sem, block):
    """The three periodic-wrap DMAs for one z-block: slab body plus one
    halo plane each side.  ``page(ds)`` maps a z-slice to the target
    scratch ref (a fixed page of a double-buffered scratch, or the whole
    scratch); ``sem(j)`` the matching semaphore."""
    z0 = block * bz
    top = (z0 - 1) % nz
    bot = (z0 + bz) % nz
    return (
        pltpu.make_async_copy(t_hbm.at[pl.ds(z0, bz)],
                              page(pl.ds(1, bz)), sem(0)),
        pltpu.make_async_copy(t_hbm.at[pl.ds(top, 1)],
                              page(pl.ds(0, 1)), sem(1)),
        pltpu.make_async_copy(t_hbm.at[pl.ds(bot, 1)],
                              page(pl.ds(bz + 1, 1)), sem(2)),
    )


def _rd3d_jvp_kernel(nz: int, bz: int, u_ref, t_hbm, params_ref, out_ref,
                     scr, sems):
    i = pl.program_id(0)
    dmas = _periodic_dmas(nz, bz, t_hbm, lambda ds: scr.at[ds],
                          lambda j: sems.at[j], i)
    for cp in dmas:
        cp.start()
    for cp in dmas:
        cp.wait()

    u = u_ref[:]
    d_h2 = params_ref[0, 0].astype(u.dtype)
    out_ref[:] = _rd3d_stencil(u, scr[pl.ds(1, bz)], scr[pl.ds(0, bz)],
                               scr[pl.ds(2, bz)], d_h2)


def _rd3d_db_load(nz: int, bz: int, t_hbm, scr, sems):
    """Double-buffer scaffolding shared by the db kernels: program i
    prefetches block i+1's slab and halos into the other scratch page
    while waiting on block i's (started by program i-1; program 0
    bootstraps its own).  TPU Pallas grids execute sequentially on a
    core, so scratch and semaphores persist across grid steps.  Returns
    the scratch page holding block i."""
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    slot = jax.lax.rem(i, jnp.int32(2))
    nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

    def dmas(block, page_idx):
        return _periodic_dmas(nz, bz, t_hbm,
                              lambda ds: scr.at[page_idx, ds],
                              lambda j: sems.at[page_idx, j], block)

    @pl.when(i == 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    @pl.when(i + 1 < nblk)
    def _():
        for cp in dmas(i + 1, nxt):
            cp.start()

    for cp in dmas(i, slot):
        cp.wait()
    return slot


def _rd3d_jvp_kernel_db(nz: int, bz: int, u_ref, t_hbm, params_ref,
                        out_ref, scr, sems):
    slot = _rd3d_db_load(nz, bz, t_hbm, scr, sems)
    u = u_ref[:]
    d_h2 = params_ref[0, 0].astype(u.dtype)
    out_ref[:] = _rd3d_stencil(u, scr[slot, pl.ds(1, bz)],
                               scr[slot, pl.ds(0, bz)],
                               scr[slot, pl.ds(2, bz)], d_h2)


def _rd3d_jvp_kernel_db_scaled(nz: int, bz: int, u_ref, t_hbm, params_ref,
                               out_ref, max_ref, scr, sems):
    """Double-buffered chain step: ``out = (J·t) · inv_s`` plus the running
    absmax of the scaled output, all in one HBM round-trip.

    The max output block maps to the same (1, 1) SMEM slot for every grid
    step; TPU grids run sequentially on the core, so accumulating into it
    across steps is the standard revisited-block reduction pattern."""
    i = pl.program_id(0)
    slot = _rd3d_db_load(nz, bz, t_hbm, scr, sems)
    u = u_ref[:]
    d_h2 = params_ref[0, 0].astype(u.dtype)
    inv_s = params_ref[0, 1].astype(u.dtype)
    res = _rd3d_stencil(u, scr[slot, pl.ds(1, bz)],
                        scr[slot, pl.ds(0, bz)],
                        scr[slot, pl.ds(2, bz)], d_h2) * inv_s
    out_ref[:] = res
    m_blk = jnp.max(jnp.abs(res)).astype(max_ref.dtype)

    @pl.when(i == 0)
    def _():
        max_ref[0, 0] = m_blk

    @pl.when(i > 0)
    def _():
        max_ref[0, 0] = jnp.maximum(max_ref[0, 0], m_blk)


@functools.partial(jax.jit, static_argnames=("bz",))
def rd3d_jvp_scaled(u, t, D, inv_scale, *, bz: int = 4):
    """Fused ``(J·(t · inv_scale), max|out|)`` for the 3D RD operator — the
    3D analogue of ``brusselator_jvp_scaled`` (pallas_stencil.py).

    Chained matvec loops (power iteration, the config-5 SpMV benchmark)
    need a normalization between applications to stay finite; as separate
    XLA ops that costs three extra full passes over the 64 MB state per
    step (read for the max reduce, read+write for the divide) — measured
    136 Gnnz/s at 256³ versus 518 Gnnz/s for the raw kernel (~95% of the
    3-array HBM roofline on v5e).  Here the scale rides the output write
    and the absmax accumulates in SMEM across the sequential grid steps,
    so the whole chain step is one 3-array HBM round-trip.

    Returns ``(out, absmax)`` with ``absmax`` a scalar of the params
    dtype (f32 for sub-f32 states)."""
    nz, ny, nx = t.shape
    if nz % bz:
        raise ValueError(f"bz={bz} must divide Nz={nz}")
    dtype = u.dtype
    h2 = (1.0 / nz) ** 2
    pdtype = jnp.float32 if jnp.dtype(dtype).itemsize < 4 else dtype
    params = jnp.stack([jnp.asarray(D / h2, pdtype),
                        jnp.asarray(inv_scale, pdtype)]).reshape(1, 2)
    kernel = functools.partial(_rd3d_jvp_kernel_db_scaled, nz, bz)
    out, mx = pl.pallas_call(
        kernel,
        grid=(nz // bz,),
        in_specs=[
            pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0)),      # u slab
            pl.BlockSpec(memory_space=pl.ANY),                 # t in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((nz, ny, nx), dtype),
                   jax.ShapeDtypeStruct((1, 1), pdtype)),
        scratch_shapes=[pltpu.VMEM((2, bz + 2, ny, nx), dtype),
                        pltpu.SemaphoreType.DMA((2, 3))],
        interpret=_interpret(),
    )(u, t, params)
    return out, mx[0, 0]


def _rd3d_jvp_kernel_halo(nz: int, bz: int, u_ref, t_hbm, lo_hbm, hi_hbm,
                          params_ref, out_ref, scr, sems):
    """Shard-local variant: the z-neighbors at the shard boundary come from
    explicit halo planes (received over ICI via ppermute) instead of a
    periodic wrap.  Interior blocks never touch the halo refs, so only the
    first/last grid steps depend on the exchange."""
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    z0 = i * bz

    body = pltpu.make_async_copy(t_hbm.at[pl.ds(z0, bz)],
                                 scr.at[pl.ds(1, bz)], sems.at[0])
    body.start()

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(lo_hbm, scr.at[pl.ds(0, 1)], sems.at[1])
        cp.start()
        cp.wait()

    @pl.when(i > 0)
    def _():
        cp = pltpu.make_async_copy(t_hbm.at[pl.ds(z0 - 1, 1)],
                                   scr.at[pl.ds(0, 1)], sems.at[1])
        cp.start()
        cp.wait()

    @pl.when(i == nblk - 1)
    def _():
        cp = pltpu.make_async_copy(hi_hbm, scr.at[pl.ds(bz + 1, 1)],
                                   sems.at[2])
        cp.start()
        cp.wait()

    @pl.when(i < nblk - 1)
    def _():
        cp = pltpu.make_async_copy(t_hbm.at[pl.ds(z0 + bz, 1)],
                                   scr.at[pl.ds(bz + 1, 1)], sems.at[2])
        cp.start()
        cp.wait()

    body.wait()

    u = u_ref[:]
    d_h2 = params_ref[0, 0].astype(u.dtype)
    out_ref[:] = _rd3d_stencil(u, scr[pl.ds(1, bz)], scr[pl.ds(0, bz)],
                               scr[pl.ds(2, bz)], d_h2)


@functools.partial(jax.jit, static_argnames=("bz", "n_global"))
def rd3d_jvp_blocked_halo(u, t, lo, hi, D, *, bz: int = 8,
                          n_global: int = None):
    """Shard-local blocked JVP with explicit z-halo planes ``lo``/``hi``
    (each (1, N, N)) — the per-shard kernel under the shard_map halo
    exchange (parallel/distributed.py:sharded_rd3d_jvp_pallas_factory).
    ``n_global`` sets the grid spacing h = 1/Nz_global (the local shard
    holds only Nz_global / n_shards planes)."""
    nz, ny, nx = t.shape
    if nz % bz:
        raise ValueError(f"bz={bz} must divide local Nz={nz}")
    dtype = u.dtype
    n_g = n_global if n_global is not None else nz
    h2 = (1.0 / n_g) ** 2
    params = jnp.asarray([[D / h2]], jnp.float32 if
                         jnp.dtype(dtype).itemsize < 4 else dtype)
    kernel = functools.partial(_rd3d_jvp_kernel_halo, nz, bz)
    return pl.pallas_call(
        kernel,
        grid=(nz // bz,),
        in_specs=[
            pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0)),      # u slab
            pl.BlockSpec(memory_space=pl.ANY),                 # t in HBM
            pl.BlockSpec(memory_space=pl.ANY),                 # lo halo
            pl.BlockSpec(memory_space=pl.ANY),                 # hi halo
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        scratch_shapes=[pltpu.VMEM((bz + 2, ny, nx), dtype),
                        pltpu.SemaphoreType.DMA((3,))],
        interpret=_interpret(),
    )(u, t, lo, hi, params)


@functools.partial(jax.jit, static_argnames=("bz", "double_buffer"))
def rd3d_jvp_blocked(u, t, D, *, bz: int = 8, double_buffer: bool = False):
    """JVP of the 3D RD operator ``D Δu + u − u³ + g`` applied to ``t``:
    ``out = D Δt + (1 − 3u²) t`` on a periodic (Nz, N, N) grid with
    ``h = 1/Nz``.  ``bz`` must divide Nz."""
    nz, ny, nx = t.shape
    if nz % bz:
        raise ValueError(f"bz={bz} must divide Nz={nz}")
    dtype = u.dtype
    h2 = (1.0 / nz) ** 2
    params = jnp.asarray([[D / h2]], jnp.float32 if
                         jnp.dtype(dtype).itemsize < 4 else dtype)

    if double_buffer:
        kernel = functools.partial(_rd3d_jvp_kernel_db, nz, bz)
        scratch = [pltpu.VMEM((2, bz + 2, ny, nx), dtype),
                   pltpu.SemaphoreType.DMA((2, 3))]
    else:
        kernel = functools.partial(_rd3d_jvp_kernel, nz, bz)
        scratch = [pltpu.VMEM((bz + 2, ny, nx), dtype),
                   pltpu.SemaphoreType.DMA((3,))]
    return pl.pallas_call(
        kernel,
        grid=(nz // bz,),
        in_specs=[
            pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0)),      # u slab
            pl.BlockSpec(memory_space=pl.ANY),                 # t in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(u, t, params)
