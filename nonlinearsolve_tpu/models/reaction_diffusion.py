"""3D reaction–diffusion steady state — BASELINE config 5 (multi-host).

``F(u) = D Δu + u - u³ + g(x, y, z) = 0`` on an N³ periodic grid — the
Allen–Cahn-type steady state used as the multi-host weak-scaling target.
The residual is pure rolls + elementwise ops, so under ``shard_map``/pjit
with the leading axis sharded across devices XLA lowers the axis-0 rolls to
ICI ``ppermute`` halo exchanges automatically (see parallel/).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def forcing(N: int, dtype=jnp.float64):
    xyz = np.linspace(0.0, 1.0, N, endpoint=False)
    x = xyz[:, None, None]
    y = xyz[None, :, None]
    z = xyz[None, None, :]
    g = 0.5 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y) \
        * np.sin(2 * np.pi * z)
    return jnp.asarray(np.broadcast_to(g, (N, N, N)), dtype)


def reaction_diffusion_3d(u, p):
    """u: (N, N, N); p = (D, g) with g the forcing field."""
    D, g = p
    N = u.shape[0]
    h = 1.0 / N
    lap = (jnp.roll(u, 1, 0) + jnp.roll(u, -1, 0)
           + jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1)
           + jnp.roll(u, 1, 2) + jnp.roll(u, -1, 2) - 6.0 * u) / (h * h)
    return D * lap + u - u ** 3 + g


def make_problem(N: int = 32, D: float = 0.01, dtype=jnp.float64,
                 pallas_jvp: bool = False, bz: int = 4):
    """``pallas_jvp=True`` attaches the grid-blocked, double-buffered
    Pallas JVP kernel (ops/pallas_stencil3d.py) as the analytic ``jvp``:
    3.3x the XLA-fused roll pipeline's matvec throughput at 256³ on one
    v5e chip (91 → 299 Gnnz/s, chain-length-slope timing — see
    docs/tpu_tuning.md §8).  bz=4 slabs keep the scoped-VMEM footprint
    ~7 MB so the kernel also fits inside larger jitted programs (the
    Newton-GMRES while_loop); bz=8 is ~3% faster standalone but brushes
    the 16 MB scoped limit at 256³.  Requires ``bz | N``."""
    from ..core.problems import NonlinearFunction, NonlinearProblem
    u0 = jnp.full((N, N, N), 0.1, dtype)
    p = (jnp.asarray(D, dtype), forcing(N, dtype))
    f = reaction_diffusion_3d
    if pallas_jvp:
        if N % bz:
            raise ValueError(f"pallas_jvp needs bz ({bz}) | N ({N})")
        from ..ops.pallas_stencil3d import rd3d_jvp_blocked

        def jvp(v, U, pp):
            return rd3d_jvp_blocked(U, v, pp[0], bz=bz, double_buffer=True)

        f = NonlinearFunction(f=reaction_diffusion_3d, jvp=jvp)
    return NonlinearProblem(f, u0, p)
