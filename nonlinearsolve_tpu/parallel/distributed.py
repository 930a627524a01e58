"""Distributed Newton–Krylov over a device mesh.

TPU-native replacement for the reference's PETSc-SNES/MPI layer (SURVEY.md
§2.10, §5.8).  Two tiers:

1. **GSPMD tier** (`distributed_solve`): the whole solver — residual
   stencil, JVP operator, GMRES, line search reductions — is ordinary JAX
   code on global arrays.  We place the state on a
   ``NamedSharding`` (row/block-partitioned grid) and ``jit`` the full
   solve: XLA inserts ICI collectives for the stencil halos (rolls on the
   sharded axis → ``collective-permute``) and for the Krylov dot products /
   norms (``all-reduce``).  This is the "pick a mesh, annotate shardings,
   let XLA insert collectives" recipe, and it reuses the single-chip code
   path byte-for-byte.

2. **shard_map tier** (`halo_exchange`, `sharded_matvec`): explicit
   per-shard SPMD with ``ppermute`` halo exchange for when manual
   scheduling (halo/compute overlap, Pallas kernels per shard) is needed.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.solve import _solve_impl
from .mesh import create_mesh, row_sharding


def distributed_solve(prob, alg=None, mesh: Optional[Mesh] = None,
                      shard_axis: int = 0, *, abstol=None, reltol=None,
                      maxiters=1000, termination_condition=None):
    """Solve with the leading state axis row-partitioned across ``mesh``.

    The u0/p arrays are placed on the mesh; the jitted solve then runs SPMD
    with XLA-managed halo exchange + psum reductions.  Converged result
    matches the single-chip solve bitwise up to reduction order.
    """
    from ..core.problems import NonlinearProblem
    from ..core.solve import solve_nonlinear
    from ..core.termination import default_termination_mode
    from ..utils.norms import get_tolerance

    if mesh is None:
        mesh = create_mesh()
    axis = mesh.axis_names[0]

    u0 = prob.u0
    sharding = row_sharding(mesh, axis, ndim=jnp.ndim(u0),
                            shard_dim=shard_axis)
    u0_sharded = jax.device_put(u0, sharding)
    # Parameters are replicated unless they match the state's sharded shape.
    def shard_param(x):
        x = jnp.asarray(x)
        if x.ndim == jnp.ndim(u0) and x.shape == jnp.shape(u0):
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    p_sharded = jax.tree_util.tree_map(shard_param, prob.p) \
        if prob.p is not None else None

    prob2 = prob.remake(u0=u0_sharded, p=p_sharded)
    if alg is None:
        from ..core.solve import _default_algorithm
        alg = _default_algorithm(prob2)
    return solve_nonlinear(prob2, alg, abstol=abstol, reltol=reltol,
                           maxiters=maxiters,
                           termination_condition=termination_condition)


# ---------------------------------------------------------------------------
# Explicit shard_map tier
# ---------------------------------------------------------------------------

def halo_exchange(axis: str, x_local, width: int = 1):
    """Exchange ``width`` boundary slices with ring neighbors via ppermute.

    Returns (left_halo, right_halo) received from the ring neighbors of the
    current shard along ``axis`` (periodic topology — ICI-friendly ring).
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    right_send = x_local[-width:]
    left_send = x_local[:width]
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    left_halo = jax.lax.ppermute(right_send, axis, fwd)   # from left neighbor
    right_halo = jax.lax.ppermute(left_send, axis, bwd)   # from right neighbor
    return left_halo, right_halo


def sharded_laplacian_1d_factory(mesh: Mesh, axis: str = "x"):
    """Example explicit-SPMD stencil: periodic 1D Laplacian over shards with
    ppermute halos — the hand-scheduled analogue of what GSPMD does for
    ``jnp.roll`` on a sharded axis."""
    from jax import shard_map

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def lap(x_local):
        left, right = halo_exchange(axis, x_local)
        xm = jnp.concatenate([left, x_local, right])
        return xm[:-2] - 2.0 * x_local + xm[2:]

    return lap


def sharded_rd3d_jvp_factory(mesh: Mesh, D, N: int, axis: str = "x"):
    """Explicit-SPMD JVP of the 3D reaction-diffusion operator
    (models/reaction_diffusion.py): ``J·t = D Δt + (1 − 3u²) t`` with the
    leading (z) axis sharded across the mesh.

    Halo/compute overlap by construction: the ``ppermute`` halo exchange
    for the two boundary planes is issued FIRST, and everything that does
    not depend on it — the in-plane (axis 1/2) stencil contributions and
    the reaction term — is traced before the halos are consumed, so
    XLA's latency-hiding scheduler runs the ICI transfer underneath the
    interior compute.  This is the hand-scheduled tier; the GSPMD tier
    (``distributed_solve``) gets the same collectives automatically.  On
    real TPU slices the per-shard interior compute can further drop into
    the Pallas stencil kernels.
    """
    from jax import shard_map

    h2 = (1.0 / N) ** 2

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis))
    def jvp(u_local, t_local):
        # 1. kick off the ICI halo exchange for the boundary planes
        left, right = halo_exchange(axis, t_local)
        # 2. interior work that overlaps the transfer
        inplane = (jnp.roll(t_local, 1, 1) + jnp.roll(t_local, -1, 1)
                   + jnp.roll(t_local, 1, 2) + jnp.roll(t_local, -1, 2)
                   - 6.0 * t_local)
        reaction = (1.0 - 3.0 * u_local ** 2) * t_local
        # 3. consume the halos for the sharded-axis neighbors
        up = jnp.concatenate([left, t_local[:-1]], axis=0)
        down = jnp.concatenate([t_local[1:], right], axis=0)
        lap = (inplane + up + down) / h2
        return D * lap + reaction

    return jvp


def sharded_rd3d_jvp_pallas_factory(mesh: Mesh, D, N: int, axis: str = "x",
                                    bz: int = 8):
    """Per-shard Pallas tier of the 3D RD JVP: ``ppermute`` halo exchange
    over ICI feeding the grid-blocked VMEM kernel
    (ops/pallas_stencil3d.py:rd3d_jvp_blocked_halo).

    This is the full TPU-native stack replacing PETSc's distributed MatMult
    (SURVEY §5.8): inter-chip boundary planes ride ICI, the local stencil
    streams HBM→VMEM in (bz, N, N) slabs with manual async-copy halos, and
    only the first/last grid steps of the kernel consume the exchanged
    planes — interior slabs are independent of the collective, so the
    transfer hides behind the bulk of the sweep."""
    from ..ops.pallas_stencil3d import rd3d_jvp_blocked_halo

    # check_vma=False: pallas_call outputs carry no varying-mesh-axis
    # annotation, so shard_map's vma checker cannot see through the kernel.
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    def jvp(u_local, t_local):
        left, right = halo_exchange(axis, t_local)
        return rd3d_jvp_blocked_halo(u_local, t_local, left, right, D,
                                     bz=bz, n_global=N)

    return jvp


def psum_dot_factory(mesh: Mesh, axis: str = "x"):
    """Globally-reduced dot product over row-sharded vectors (the GMRES /
    line-search reduction primitive of SURVEY §2.10)."""
    from jax import shard_map

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P())
    def pdot(a, b):
        return jax.lax.psum(jnp.dot(a, b), axis)

    return pdot
