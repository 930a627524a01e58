"""2D Brusselator steady state — BASELINE config 4 (and the reference's
ill-conditioned large-system tutorial,
/root/reference/docs/src/tutorials/large_systems.md:64-110).

Semantics match the reference exactly: N×N periodic grid, dx = 1/(N-1) steps
of ``range(0, 1, length=N)``, state U[i,j,:] = (u, v), parameters
(A, B, alpha) = (3.4, 1.0, 10.0), forcing 5·1[(x-0.3)²+(y-0.6)² ≤ 0.01].

The residual is written with ``jnp.roll`` shifts — XLA fuses the whole
stencil into one bandwidth-bound kernel, which is the TPU-native expression
of the 5-point Laplacian (no scalar loops, no gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import CSR


def grid(N: int, dtype=jnp.float64):
    xy = jnp.linspace(0.0, 1.0, N, dtype=dtype)
    return xy


def init_u0(N: int, dtype=jnp.float64):
    """init_brusselator_2d (large_systems.md:95-106)."""
    xy = np.linspace(0.0, 1.0, N)
    x = xy[:, None]
    y = xy[None, :]
    u = 22.0 * (y * (1.0 - y)) ** 1.5 * np.ones((N, N))
    v = 27.0 * (x * (1.0 - x)) ** 1.5 * np.ones((N, N))
    return jnp.asarray(np.stack([u, v], axis=-1), dtype)


def default_p(N: int, dtype=jnp.float64):
    dx = 1.0 / (N - 1)
    return jnp.asarray([3.4, 1.0, 10.0, dx], dtype)


def brusselator_2d(U, p):
    """Residual F(U) with periodic BCs; U has shape (N, N, 2)."""
    A, B, alpha, dx = p[0], p[1], p[2], p[3]
    alpha = alpha / dx ** 2
    u = U[..., 0]
    v = U[..., 1]
    N = u.shape[0]
    xy = jnp.linspace(0.0, 1.0, N, dtype=U.dtype)
    x = xy[:, None]
    y = xy[None, :]
    force = 5.0 * (((x - 0.3) ** 2 + (y - 0.6) ** 2) <= 0.01).astype(U.dtype)

    def lap(w):
        return (jnp.roll(w, 1, 0) + jnp.roll(w, -1, 0) + jnp.roll(w, 1, 1)
                + jnp.roll(w, -1, 1) - 4.0 * w)

    du = alpha * lap(u) + B + u * u * v - (A + 1.0) * u + force
    dv = alpha * lap(v) + A * u - u * u * v
    return jnp.stack([du, dv], axis=-1)


def brusselator_2d_df32(U_hi, U_lo, p):
    """The same residual evaluated in double-f32 (ops/doublef32.py): the
    state is the unevaluated sum ``U_hi + U_lo``; every term — Laplacian
    scaling alpha/dx² (~2.6e6 at N=512, the dominant f32 noise source),
    the cubic reaction, the forcing — is carried as an error-free f32 pair
    (~1e-14 relative).  Feeds the mixed-precision refinement loop
    (solvers/refinement.py) that certifies the flagship root to reference
    accuracy (f64 abstol=1e-10 anchor, large_systems.md:141-165) on f32
    hardware.  Returns (F_hi, F_lo).

    Constants are split exactly from float64 on the host (pattern-static),
    so ``p`` must be CONCRETE (close over it; don't pass it traced).
    """
    from ..ops.doublef32 import (DF, df_add, df_add_f, df_from_f64, df_mul,
                                 df_mul_f, df_roll, df_sub)

    dtype = U_hi.dtype
    A64, B64, alpha64, dx64 = np.asarray(
        jax.device_get(p), np.float64).tolist()
    alpha_df = df_from_f64(alpha64 / dx64 ** 2, dtype)
    A_df = df_from_f64(A64, dtype)
    A1_df = df_from_f64(A64 + 1.0, dtype)
    B_df = df_from_f64(B64, dtype)

    u = DF(U_hi[..., 0], U_lo[..., 0])
    v = DF(U_hi[..., 1], U_lo[..., 1])
    N = u.hi.shape[0]
    xy = np.linspace(0.0, 1.0, N)
    x = xy[:, None]
    y = xy[None, :]
    force = jnp.asarray(
        5.0 * (((x - 0.3) ** 2 + (y - 0.6) ** 2) <= 0.01), dtype)

    def lap(w: DF) -> DF:
        s = df_add(df_roll(w, 1, 0), df_roll(w, -1, 0))
        s = df_add(s, df_add(df_roll(w, 1, 1), df_roll(w, -1, 1)))
        return df_sub(s, df_mul_f(w, jnp.asarray(4.0, dtype)))

    def bcast(c: DF, shape) -> DF:
        return DF(jnp.broadcast_to(c.hi, shape), jnp.broadcast_to(c.lo, shape))

    shape = u.hi.shape
    uuv = df_mul(df_mul(u, u), v)
    du = df_add(df_mul(bcast(alpha_df, shape), lap(u)),
                df_add(bcast(B_df, shape), uuv))
    du = df_sub(du, df_mul(bcast(A1_df, shape), u))
    du = df_add_f(du, force)
    dv = df_sub(df_add(df_mul(bcast(alpha_df, shape), lap(v)),
                       df_mul(bcast(A_df, shape), u)), uuv)
    F_hi = jnp.stack([du.hi, dv.hi], axis=-1)
    F_lo = jnp.stack([du.lo, dv.lo], axis=-1)
    return F_hi, F_lo


def sparsity_pattern(N: int) -> CSR:
    """Analytic Jacobian sparsity for the periodic 5-point stencil + local
    u↔v coupling (12 nnz per grid point), in the flattened (i, j, comp)
    C-order used by ravel_pytree.  This is the ``jac_prototype`` fast path
    (reference jacobian.jl:286-360) at scales where probe detection would
    need an N²×N² dense jacobian."""
    idx = np.arange(N * N * 2).reshape(N, N, 2)
    rows_list = []
    cols_list = []

    def add(r, c):
        rows_list.append(r.ravel())
        cols_list.append(c.ravel())

    for comp in range(2):
        r = idx[:, :, comp]
        # self + same-point other component
        add(r, r)
        add(r, idx[:, :, 1 - comp])
        # periodic neighbors in i and j (same component)
        for shift, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
            add(r, np.roll(idx[:, :, comp], shift, axis=axis))
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    return CSR.from_pattern(rows, cols, (N * N * 2, N * N * 2))


def make_problem(N: int = 32, dtype=jnp.float64, with_sparsity: bool = False,
                 pallas_jvp: bool = False):
    """Build the steady-state problem.  ``pallas_jvp=True`` attaches the
    fused VMEM-resident Pallas JVP kernel as the analytic ``jvp`` — the
    matrix-free Newton-Krylov path then applies the Jacobian at ~110% of
    the XLA-fused stencil throughput (ops/pallas_stencil.py)."""
    from ..core.problems import NonlinearFunction, NonlinearProblem
    f = brusselator_2d
    if with_sparsity:
        f = NonlinearFunction(f=brusselator_2d, sparsity=sparsity_pattern(N))
    elif pallas_jvp:
        from ..ops.pallas_stencil import brusselator_jvp

        def jvp(v, U, p):
            return brusselator_jvp(U, v, p)

        f = NonlinearFunction(f=brusselator_2d, jvp=jvp)
    return NonlinearProblem(f, init_u0(N, dtype), default_p(N, dtype))
