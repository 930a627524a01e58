"""Preconditioners for the Krylov layer.

The reference reaches ILU/AMG through LinearSolve.jl `precs`
(/root/reference/docs/src/tutorials/large_systems.md:246-318).  ILU is a
sequential triangular sweep — hostile to TPUs — so the TPU-native toolkit
here is:

* ``jacobi_preconditioner`` — diagonal scaling from any materialized matrix.
* ``fft_poisson_preconditioner`` — exact inverse of the periodic
  constant-coefficient Laplacian part of a stencil operator via XLA FFT.
  For Laplacian-dominated Jacobians (Brusselator/reaction–diffusion class)
  this collapses the Krylov iteration count to O(10), and every FLOP is a
  batched FFT — MXU/VPU-friendly, no sequential dependencies.
* ``block_jacobi_preconditioner`` — small dense diagonal blocks inverted in
  a batch (MXU-friendly) for interleaved multi-component systems.

All return ``v -> M⁻¹ v`` callables fed to ``ops.krylov`` via
``LinearSolver(precond_fn=...)``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def jacobi_preconditioner(diag):
    safe = jnp.where(diag == 0, jnp.ones_like(diag), diag)
    return lambda v: v / safe


def fft_poisson_symbol(shape: Sequence[int], alpha, h, shift=1.0,
                       dtype=jnp.float64):
    """Eigenvalues of ``alpha·Δ_h - shift`` on a periodic grid: the 2d-point
    stencil symbol ``(α/h²)·Σ_d (2cos(2πk_d/N_d) - 2) - shift``."""
    sym = None
    for d, Nd in enumerate(shape):
        k = jnp.arange(Nd, dtype=dtype)
        lam = 2.0 * jnp.cos(2.0 * jnp.pi * k / Nd) - 2.0
        expand = [None] * len(shape)
        expand[d] = slice(None)
        lam = lam[tuple(expand)]
        sym = lam if sym is None else sym + lam
    return (alpha / (h * h)) * sym - shift


def fft_poisson_preconditioner(grid_shape: Sequence[int], alpha, h, *,
                               shift=1.0, n_components: int = 1,
                               component_axis: int = -1):
    """Return ``M(v)`` approximating ``(α Δ_h - shift·I)⁻¹ v`` on a flat
    vector laid out as a periodic grid (+ optional trailing component axis).

    This inverts exactly the stiff part of a reaction–diffusion Jacobian
    ``αΔ + diag(...)`` — the textbook spectral preconditioner, and the
    TPU-native replacement for the reference's ILU/AMG recommendation.
    """
    grid_shape = tuple(int(s) for s in grid_shape)
    last = grid_shape[-1]

    # The reciprocal symbol is staged IN-GRAPH per application (a
    # cos/broadcast chain XLA constant-folds or hoists; measured equal to
    # a precomputed constant inside a scan at 512²).  Deliberately NOT
    # precomputed on the host: a large closed-over constant is embedded in
    # the executable and re-shipped per execution over remote-dispatch
    # tunnels (measured 2.5× on the chained-solve bench), and lazy caching
    # would leak a tracer across jit traces.  Multiplying by the
    # reciprocal replaces a complex-by-real divide in the hot path.
    def _inv_sym(real_dt, half: bool):
        sym = fft_poisson_symbol(grid_shape, alpha, h, shift, real_dt)
        return 1.0 / (sym[..., : last // 2 + 1] if half else sym)

    grid_axes = tuple(range(len(grid_shape)))

    def apply(v):
        dtype = v.dtype
        real_dt = jnp.float64 if dtype == jnp.float64 else jnp.float32
        if n_components == 2 and not jnp.issubdtype(dtype, jnp.complexfloating):
            # Two-for-one: pack the components as z = u + i·w — the symbol
            # is REAL, so multiplying the packed spectrum preconditions
            # both components in ONE complex FFT round-trip (measured
            # 1.4× the batch-2 rfft path at 512², bit-exact to 1e-9).
            w = v.reshape(grid_shape + (2,))
            z = jax.lax.complex(w[..., 0].astype(real_dt),
                                w[..., 1].astype(real_dt))
            zh = jnp.fft.fftn(z, axes=grid_axes) * _inv_sym(real_dt, False)
            out = jnp.fft.ifftn(zh, axes=grid_axes)
            out = jnp.stack([jnp.real(out), jnp.imag(out)],
                            axis=-1).astype(dtype)
            return out.reshape(v.shape)
        if n_components > 1:
            full = grid_shape + (n_components,)
            w = v.reshape(full)
            w = jnp.moveaxis(w, -1, 0)          # (C, *grid)
        else:
            w = v.reshape(grid_shape)[None]
        axes = tuple(range(1, 1 + len(grid_shape)))
        # Real-input FFT halves the spectral work: the symbol is sliced to
        # the rfft half-spectrum on the last grid axis.
        what = jnp.fft.rfftn(w, axes=axes)
        what = what * _inv_sym(real_dt, True)[None]
        out = jnp.fft.irfftn(what, s=grid_shape, axes=axes).astype(dtype)
        if n_components > 1:
            out = jnp.moveaxis(out, 0, -1)
        return out.reshape(v.shape)

    return apply


def block_jacobi_preconditioner(blocks):
    """``blocks``: (n_blocks, b, b) dense diagonal blocks; inverts them in a
    single batched solve (MXU path) and applies blockwise."""
    n_blocks, b, _ = blocks.shape
    inv = jnp.linalg.inv(blocks)

    def apply(v):
        vb = v.reshape(n_blocks, b)
        out = jnp.einsum("nij,nj->ni", inv, vb)
        return out.reshape(v.shape)

    return apply


def _dft_matrices(n: int, dtype=jnp.float32):
    """Real/imag parts of the n-point DFT matrix F[j,k] = e^{-2πi·jk/n},
    staged in-graph: int32 iota outer product reduced mod n BEFORE the
    trig (the reduced jk < n is exact in f32), then one cos/sin pass.
    No host constants — over a remote-dispatch tunnel embedded MB-scale
    constants are re-shipped per execution (docs/tpu_tuning.md §7b),
    while this chain is generated on-device once per capture point.

    The i·j product itself is int32, exact only for n ≤ 46340 — far past
    any practical dense DFT-matrix size (n = 46341 would be a 17 GB
    matrix pair), but guarded rather than silently wrapped."""
    if n > 46340:
        raise ValueError(
            f"_dft_matrices: n={n} overflows the int32 i*j product "
            "(max 46340); a dense DFT matrix at this size is impractical "
            "anyway — use the FFT preconditioner family")
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    jk = jax.lax.rem(i * j, jnp.int32(n)).astype(jnp.float32)
    ang = (-2.0 * jnp.pi / n) * jk
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def _resolve_precision(precision):
    """Accept the documented string names, common aliases, None, or a raw
    ``jax.lax.Precision`` value; fail with the valid options otherwise."""
    if isinstance(precision, jax.lax.Precision):
        return precision
    table = {None: None, "default": None, "bf16": None,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST,
             "f32": jax.lax.Precision.HIGHEST}
    key = precision.lower() if isinstance(precision, str) else precision
    if key not in table:
        raise ValueError(
            f"precision={precision!r}: expected one of "
            "None/'default'/'bf16'/'high'/'highest'/'f32' or a "
            "jax.lax.Precision value")
    return table[key]


def _dft_apply(xr, xi, mats, axes, inverse=False, precision=None):
    """Complex N-D DFT of (xr + i·xi) via MXU matmuls along ``axes``,
    one (C, S) matrix pair per axis.  Inverse uses conj(F)/n per axis."""
    scale = 1.0

    def td(M, a, axis):
        return jnp.tensordot(M, a, axes=[[1], [axis]], precision=precision)

    for (C, S), a in zip(mats, axes):
        Sa = -S if inverse else S
        yr = td(C, xr, a) - td(Sa, xi, a)
        yi = td(C, xi, a) + td(Sa, xr, a)
        xr = jnp.moveaxis(yr, 0, a)
        xi = jnp.moveaxis(yi, 0, a)
        if inverse:
            scale = scale / C.shape[0]
    return xr * scale if inverse else xr, xi * scale if inverse else xi


def mxu_poisson_preconditioner(grid_shape: Sequence[int], alpha, h, *,
                               shift=1.0, n_components: int = 1,
                               precision="high"):
    """Staged MXU matmul-DFT variant of ``fft_poisson_preconditioner``:
    ``prep(u) -> (v -> M⁻¹v)``.

    XLA's fftn costs ~136 µs per 512² c64 roundtrip on v5e; the same
    transform as eight 512³ MXU matmuls measures ~22 µs — but ONLY when
    the DFT matrices live outside the Krylov loop (generated inside the
    loop body, the cos/sin chain is not hoisted by XLA's while-loop LICM
    and swamps the matmuls).  This factory therefore follows the
    two-stage ``LinearSolver.precond_fn`` contract: the outer ``prep(u)``
    call — traced once per Newton linearization, OUTSIDE the GMRES
    while_loop — materializes the DFT matrices and the reciprocal symbol,
    and the returned closure captures them as loop invariants.

    ``precision`` (default 'high'): v5e runs f32 matmuls as bf16 passes
    under --xla_allow_excess_precision.  Measured at 512² per c64
    roundtrip: default/bf16 24 µs at 3e-3 relative error; 'high'
    (bf16x3) 89 µs at 2e-5; 'highest' (bf16x6) 146 µs at 1e-7 — slower
    than fftn (136 µs), pointless.

    End-to-end caveat (measured on the 512² Brusselator Newton-GMRES at
    the f32-floor tolerance abstol≈2e-6·|f₀|): the preconditioner's
    systematic error acts as a nonlinear-residual FLOOR — bf16 stalls at
    ~1e-4 relative, 'high' at ~3e-6, just above the f32 floor — so the
    exact 'fft' family remains the default and the bench configuration.
    The matmul path pays off at loose tolerances (solves targeting
    ≥1e-4 relative, smoothing, inner preconditioning of an outer flexible
    method) where its 1.5×-over-fftn apply cost wins and the floor is
    irrelevant."""
    grid_shape = tuple(int(s) for s in grid_shape)
    prec = _resolve_precision(precision)

    def prep(_u=None):
        mats = tuple(_dft_matrices(n) for n in grid_shape)
        inv_sym32 = (1.0 / fft_poisson_symbol(grid_shape, alpha, h, shift,
                                              jnp.float32))
        return _make_mxu_apply(grid_shape, n_components, prec, mats,
                               inv_sym32)

    return prep


def _make_mxu_apply(grid_shape, n_components, prec, mats, inv_sym32):
    """Build the ``v -> M⁻¹v`` closure over staged DFT matrices + symbol
    (shared by the mxu and hybrid factories)."""
    axes = tuple(range(len(grid_shape)))

    def apply(v):
        dtype = v.dtype
        if n_components == 2 and not jnp.issubdtype(
                dtype, jnp.complexfloating):
            w = v.reshape(grid_shape + (2,))
            xr = w[..., 0].astype(jnp.float32)
            xi = w[..., 1].astype(jnp.float32)
            xr, xi = _dft_apply(xr, xi, mats, axes, precision=prec)
            xr, xi = xr * inv_sym32, xi * inv_sym32
            xr, xi = _dft_apply(xr, xi, mats, axes, inverse=True,
                                precision=prec)
            out = jnp.stack([xr, xi], axis=-1).astype(dtype)
            return out.reshape(v.shape)
        if n_components > 1:
            w = jnp.moveaxis(v.reshape(grid_shape + (n_components,)), -1, 0)
        else:
            w = v.reshape(grid_shape)[None]
        w32 = w.astype(jnp.float32)
        caxes = tuple(a + 1 for a in axes)
        xr, xi = _dft_apply(w32, jnp.zeros_like(w32), mats, caxes,
                            precision=prec)
        xr, xi = xr * inv_sym32[None], xi * inv_sym32[None]
        xr, _ = _dft_apply(xr, xi, mats, caxes, inverse=True,
                           precision=prec)
        out = xr.astype(dtype)
        if n_components > 1:
            out = jnp.moveaxis(out, 0, -1)
        return out.reshape(v.shape)

    return apply


def hybrid_poisson_preconditioner(grid_shape: Sequence[int], alpha, h, *,
                                  shift=1.0, n_components: int = 1,
                                  switch_abs, loose_precision=None):
    """Residual-gated mixed-precision spectral preconditioner:
    ``prep(u, fu) -> (v -> M⁻¹v)`` choosing per Newton linearization
    between the fast loose-precision MXU matmul-DFT (default: raw bf16
    MXU passes, ~24 µs per 512² c64 roundtrip) and the exact XLA-FFT
    inverse (~136 µs).

    Rationale (measured, docs/tpu_tuning.md §4b): a preconditioner's
    systematic error acts as a nonlinear-residual floor, so loose
    precision is free while the outer residual is far above that floor
    and poison below it.  Inexact Newton spends most Krylov iterations
    in the far-from-floor phase — gating on ``‖fu‖∞ > switch_abs``
    runs those at bf16-MXU speed and switches to the exact FFT for the
    endgame.  The gate is a scalar ``lax.cond`` staged at the
    per-linearization call (loop-invariant inside the Krylov loop, one
    branch executed per Newton step — note: under ``vmap`` the cond
    degrades to both-branches-select, losing the saving).

    ``switch_abs``: ∞-norm threshold of the (flattened) residual; it must
    sit ABOVE the loose path's residual floor or the gate never trips and
    the solve stalls there (observed).  Exposed because the factory
    cannot see ‖f₀‖ — it is staged per linearization, not per solve.

    When it pays: only if the loose path's floor is ≥2 decades below
    ‖f₀‖∞, so several Newton steps run at loose cost.  Measured on the
    512² f32 Brusselator bench, the bf16 floor is ~3e-2·‖f₀‖∞ (the 3e-3
    matvec error times the preconditioned conditioning) — a <1 decade
    loose window, NOT worth it there; the exact FFT family stays the
    bench configuration.  The gate earns its keep with wider
    loose/exact quality gaps (Jacobi loose + spectral exact, f32 loose +
    f64 exact on CPU).
    """
    grid_shape = tuple(int(s) for s in grid_shape)
    exact = fft_poisson_preconditioner(grid_shape, alpha, h, shift=shift,
                                       n_components=n_components)
    prec = _resolve_precision(loose_precision)

    def prep(_u, fu):
        from jax.flatten_util import ravel_pytree
        fu_flat, _ = ravel_pytree(fu)
        # ∞-norm gate: the loose path's residual floor is far lower in the
        # ∞-norm than in l2 (its error concentrates in few entries), so an
        # l2 gate can sit BELOW the loose floor and never trip — observed
        # as a permanent stall at the bf16 floor.
        big = jnp.max(jnp.abs(fu_flat)) > switch_abs

        # Stage the DFT matrices under the same gate: on endgame (exact)
        # linearizations the cos/sin generation is replaced by cheap zero
        # fills instead of doing FFT-apply-scale dead work per step.
        def gen():
            return tuple(_dft_matrices(n) for n in grid_shape)

        def skip():
            return tuple((jnp.zeros((n, n), jnp.float32),
                          jnp.zeros((n, n), jnp.float32))
                         for n in grid_shape)

        mats = jax.lax.cond(big, gen, skip)
        inv_sym32 = (1.0 / fft_poisson_symbol(grid_shape, alpha, h, shift,
                                              jnp.float32))
        loose = _make_mxu_apply(grid_shape, n_components, prec, mats,
                                inv_sym32)

        def apply(v):
            return jax.lax.cond(big, loose, exact, v)

        return apply

    prep.wants_residual = True
    return prep
