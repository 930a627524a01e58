"""Pallas TPU kernels for stencil operators.

The hot "SpMV" of the benchmark set is the Jacobian-vector product of a
periodic reaction–diffusion stencil — a banded matrix applied as shifts +
elementwise products.  XLA's fused roll pipeline reaches ~45% of HBM
bandwidth on the Brusselator 512² operator; these kernels go further by
keeping every operand resident in VMEM for the whole product (one HBM
round-trip per array instead of one per fused sub-expression).

``brusselator_jvp_kernel`` — the fused 2-component 5-point-stencil JVP
  out_u = (α/h²)·lapₚ(t_u) + (2uv-(A+1))·t_u + u²·t_v
  out_v = (α/h²)·lapₚ(t_v) + (A-2uv)·t_u  - u²·t_v
with periodic Laplacian via ``pltpu.roll`` (lane/sublane rotations — no
gathers, no HBM traffic between ops).

``dia_spmv_pallas`` — banded (DIA) SpMV y = Σ_d data[d]·shift(x, off[d])
entirely in VMEM, the general-banded-matrix version of the same idea.

Grid strategy: for states ≤ ~12 MB everything fits in VMEM and a single
program computes the whole product; larger states fall back to the XLA path
(callers check ``fits_vmem``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _interpret() -> bool:
    # Compiled Mosaic kernels need a real TPU; elsewhere (CPU tests,
    # the virtual mesh) run the kernels in interpreter mode.
    return jax.default_backend() != "tpu"


def fits_vmem(*arrays) -> bool:
    total = sum(a.size * a.dtype.itemsize for a in arrays)
    return total <= VMEM_BUDGET_BYTES


def _roll2(x, shift, axis):
    # pltpu.roll requires a non-negative shift; normalize modulo the axis.
    # Mosaic's rotate only handles 32-bit element types — for bf16 use a
    # slice+concat circular shift instead (copies, still VMEM-resident).
    k = shift % x.shape[axis]
    if x.dtype.itemsize < 4:
        if k == 0:
            return x
        lo = jax.lax.slice_in_dim(x, x.shape[axis] - k, x.shape[axis],
                                  axis=axis)
        hi = jax.lax.slice_in_dim(x, 0, x.shape[axis] - k, axis=axis)
        return jax.lax.concatenate([lo, hi], axis)
    return pltpu.roll(x, k, axis)


def _periodic_lap(w):
    return (_roll2(w, 1, 0) + _roll2(w, -1, 0)
            + _roll2(w, 1, 1) + _roll2(w, -1, 1) - 4.0 * w)


def _brusselator_jvp_kernel(u_ref, v_ref, tu_ref, tv_ref, params_ref,
                            ou_ref, ov_ref):
    u = u_ref[:]
    # SMEM scalars stay f32, and ALL scalar arithmetic happens outside the
    # kernel (scalar bf16 addf does not legalize on Mosaic); in here we
    # only cast the precomputed scalars to the compute dtype.
    al = params_ref[0, 0].astype(u.dtype)      # α/h²
    ap1 = params_ref[0, 1].astype(u.dtype)     # A + 1
    A = params_ref[0, 2].astype(u.dtype)
    v = v_ref[:]
    tu = tu_ref[:]
    tv = tv_ref[:]
    two_uv = 2.0 * u * v
    u2 = u * u
    ou_ref[:] = al * _periodic_lap(tu) + (two_uv - ap1) * tu + u2 * tv
    ov_ref[:] = al * _periodic_lap(tv) + (A - two_uv) * tu - u2 * tv


@functools.partial(jax.jit, static_argnames=())
def brusselator_jvp(U, T, p):
    """Fused JVP of models.brusselator.brusselator_2d at state ``U`` applied
    to tangent ``T`` (both (N, N, 2)).  Single-program VMEM-resident kernel.
    """
    A, B, alpha, dx = p[0], p[1], p[2], p[3]
    al = alpha / dx ** 2
    N = U.shape[0]
    dtype = U.dtype
    # SMEM scalars: ≥32-bit dtypes keep full precision; bf16 compute gets
    # f32 scalars (scalar bf16 arithmetic does not legalize on Mosaic, so
    # the kernel only *casts* these precomputed values).
    pdtype = jnp.float32 if jnp.dtype(dtype).itemsize < 4 else dtype
    params = jnp.stack([al.astype(pdtype), (A + 1.0).astype(pdtype),
                        A.astype(pdtype)]).reshape(1, 3)
    u, v = U[..., 0], U[..., 1]
    tu, tv = T[..., 0], T[..., 1]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ou, ov = pl.pallas_call(
        _brusselator_jvp_kernel,
        out_shape=(jax.ShapeDtypeStruct((N, N), dtype),
                   jax.ShapeDtypeStruct((N, N), dtype)),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec, spec),
        interpret=_interpret(),
    )(u, v, tu, tv, params)
    return jnp.stack([ou, ov], axis=-1)


def _brusselator_jvp_scaled_kernel(u_ref, v_ref, tu_ref, tv_ref, params_ref,
                                   ou_ref, ov_ref, max_ref):
    u = u_ref[:]
    al = params_ref[0, 0].astype(u.dtype)
    ap1 = params_ref[0, 1].astype(u.dtype)
    A = params_ref[0, 2].astype(u.dtype)
    inv_s = params_ref[0, 3].astype(u.dtype)
    v = v_ref[:]
    tu = tu_ref[:] * inv_s          # scale applied on read: J(t/s) = J(t)/s
    tv = tv_ref[:] * inv_s
    two_uv = 2.0 * u * v
    u2 = u * u
    ou = al * _periodic_lap(tu) + (two_uv - ap1) * tu + u2 * tv
    ov = al * _periodic_lap(tv) + (A - two_uv) * tu - u2 * tv
    ou_ref[:] = ou
    ov_ref[:] = ov
    max_ref[0, 0] = jnp.maximum(jnp.max(jnp.abs(ou)), jnp.max(jnp.abs(ov)))


@functools.partial(jax.jit, static_argnames=())
def brusselator_jvp_scaled(U, T, p, inv_scale):
    """Fused ``(J · (T · inv_scale), max|out|)`` in ONE kernel pass.

    Chained matvec loops (power iteration, SpMV benchmarks, Krylov-free
    smoothers) need a normalization between applications to stay finite;
    doing it as a separate XLA op costs two extra full passes over the
    state per iteration.  Here the scale is applied as the tangent is read
    from VMEM and the output's absmax is reduced to an SMEM scalar — the
    whole chain step is a single 3-in/2-out HBM round-trip.
    """
    ou, ov, mx = brusselator_jvp_scaled_pair(
        U[..., 0], U[..., 1], T[..., 0], T[..., 1], p, inv_scale)
    return jnp.stack([ou, ov], axis=-1), mx


@functools.partial(jax.jit, static_argnames=())
def brusselator_jvp_scaled_pair(u, v, tu, tv, p, inv_scale):
    """``brusselator_jvp_scaled`` on component-separated arrays.

    For chained matvecs (the SpMV benchmark's scan) carry (tu, tv) as a
    pair: the stacked (N, N, 2) interface pays a channel-minor
    stack + strided re-slice across every loop iteration — two extra
    full passes over the state that the kernel itself was built to avoid.
    Returns ``(ou, ov, absmax)``.
    """
    A, B, alpha, dx = p[0], p[1], p[2], p[3]
    al = alpha / dx ** 2
    N = u.shape[0]
    dtype = u.dtype
    pdtype = jnp.float32 if jnp.dtype(dtype).itemsize < 4 else dtype
    params = jnp.stack([al.astype(pdtype), (A + 1.0).astype(pdtype),
                        A.astype(pdtype),
                        jnp.asarray(inv_scale, pdtype)]).reshape(1, 4)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ou, ov, mx = pl.pallas_call(
        _brusselator_jvp_scaled_kernel,
        out_shape=(jax.ShapeDtypeStruct((N, N), dtype),
                   jax.ShapeDtypeStruct((N, N), dtype),
                   jax.ShapeDtypeStruct((1, 1), pdtype)),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec, spec, pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=_interpret(),
    )(u, v, tu, tv, params)
    return ou, ov, mx[0, 0]


def make_brusselator_jvp_bf16(U, p):
    """Mixed-precision matvec factory: returns ``mv(T) -> J·T`` with the
    frozen state pre-cast to bfloat16 (once per Newton step) and the
    stencil product computed in bf16 — half the HBM/VMEM bytes and 2× the
    VPU rate of f32, at ~1e-2 relative matvec error.

    That error budget is exactly what inexact Newton-Krylov tolerates in
    its early/loose phase (Eisenstat-Walker forcing starts at η ≈ 0.9),
    and is always acceptable for preconditioner application.  The result
    is returned in the tangent's dtype so the Krylov basis stays f32 for
    orthogonality.
    """
    Ub = U.astype(jnp.bfloat16)

    def mv(T):
        out = brusselator_jvp(Ub, T.astype(jnp.bfloat16),
                              p.astype(jnp.float32))
        return out.astype(T.dtype)

    return mv


def _dia_kernel_factory(offsets: Sequence[int], n_rows: int):
    def kernel(data_ref, x_ref, y_ref):
        x = x_ref[:]
        acc = jnp.zeros_like(x)
        for d, off in enumerate(offsets):
            # y[i] += data[d, i] * x[i + off]  (periodic wrap handled by the
            # caller zeroing out-of-band data entries before the call)
            acc = acc + data_ref[d, :] * pltpu.roll(x, (-off) % x.shape[1], 1)
        y_ref[:] = acc

    return kernel


def dia_spmv_pallas(data, offsets: Sequence[int], x):
    """Banded SpMV via in-VMEM shifted products.

    ``data``: (n_diags, n) with data[d, i] = A[i, i+off[d]]; out-of-range
    entries must be zero (DIA.from_csr guarantees this), so the circular
    shift is safe for the non-periodic case too.
    """
    n = x.shape[0]
    data2 = data.reshape(data.shape[0], 1, n)
    x2 = x.reshape(1, n)
    y = pl.pallas_call(
        _dia_kernel_factory(tuple(offsets), n),
        out_shape=jax.ShapeDtypeStruct((1, n), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(data2[:, 0, :], x2)
    return y.reshape(n)
