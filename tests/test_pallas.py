"""Pallas stencil kernels — correctness vs the XLA jvp (interpret mode on
CPU; compiled Mosaic on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonlinearsolve_tpu.models import brusselator
from nonlinearsolve_tpu.ops.pallas_stencil import (brusselator_jvp,
                                                   dia_spmv_pallas)
from nonlinearsolve_tpu.ops.sparse import CSR, DIA


def test_brusselator_pallas_jvp_matches_ad():
    N = 16
    U = brusselator.init_u0(N)
    p = brusselator.default_p(N)
    T = jnp.asarray(np.random.default_rng(0).standard_normal((N, N, 2)))
    _, lin = jax.linearize(lambda X: brusselator.brusselator_2d(X, p), U)
    np.testing.assert_allclose(np.asarray(brusselator_jvp(U, T, p)),
                               np.asarray(lin(T)), rtol=1e-10, atol=1e-8)


def test_pallas_jvp_through_newton_krylov():
    import nonlinearsolve_tpu as nls
    prob = brusselator.make_problem(16, pallas_jvp=True)
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=30)), abstol=1e-8)
    assert bool(sol.success)


def test_brusselator_scaled_pair_matches_stacked():
    from nonlinearsolve_tpu.ops.pallas_stencil import (
        brusselator_jvp_scaled, brusselator_jvp_scaled_pair)
    N = 16
    U = brusselator.init_u0(N)
    p = brusselator.default_p(N)
    T = jnp.asarray(np.random.default_rng(2).standard_normal((N, N, 2)))
    ref, mref = brusselator_jvp_scaled(U, T, p, 0.5)
    ou, ov, m = brusselator_jvp_scaled_pair(U[..., 0], U[..., 1],
                                            T[..., 0], T[..., 1], p, 0.5)
    np.testing.assert_allclose(np.asarray(jnp.stack([ou, ov], -1)),
                               np.asarray(ref), rtol=1e-12)
    np.testing.assert_allclose(float(m), float(mref), rtol=1e-12)


def test_dia_spmv_pallas():
    n = 64
    A = (np.diag(2.0 * np.ones(n)) + np.diag(-np.ones(n - 1), 1)
         + np.diag(0.5 * np.ones(n - 3), -3))
    dia = DIA.from_csr(CSR.from_dense(A))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    y = dia_spmv_pallas(dia.data, dia.offsets, x)
    np.testing.assert_allclose(np.asarray(y), A @ np.asarray(x), atol=1e-12)


def test_brusselator_jvp_bf16():
    """Mixed-precision matvec factory: bf16 compute, f32 in/out, ~1e-2
    relative error budget (inexact Newton-Krylov / preconditioner use)."""
    from nonlinearsolve_tpu.ops.pallas_stencil import (
        brusselator_jvp, make_brusselator_jvp_bf16)
    N = 32
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.random((N, N, 2)), jnp.float32)
    T = jnp.asarray(rng.standard_normal((N, N, 2)), jnp.float32)
    p = jnp.asarray([3.4, 1.0, 10.0, 1.0 / (N - 1)], jnp.float32)
    ref = brusselator_jvp(U, T, p)
    out = make_brusselator_jvp_bf16(U, p)(T)
    assert out.dtype == jnp.float32
    rel = float(jnp.linalg.norm((out - ref).ravel())
                / jnp.linalg.norm(ref.ravel()))
    assert rel < 2e-2, rel


def test_brusselator_jvp_scaled():
    """Fused scale-on-read + in-kernel absmax chain step: matches the
    unfused J(T/s) exactly and reports max|out|."""
    from nonlinearsolve_tpu.ops.pallas_stencil import (
        brusselator_jvp, brusselator_jvp_scaled)
    N = 32
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.random((N, N, 2)), jnp.float32)
    T = jnp.asarray(rng.standard_normal((N, N, 2)), jnp.float32)
    p = jnp.asarray([3.4, 1.0, 10.0, 1.0 / (N - 1)], jnp.float32)
    ref = brusselator_jvp(U, T / 2.0, p)
    out, m = brusselator_jvp_scaled(U, T, p, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    np.testing.assert_allclose(float(m), float(jnp.max(jnp.abs(ref))),
                               rtol=1e-6)


def test_rd3d_jvp_blocked():
    """Grid-blocked 3D stencil JVP with manual periodic halo DMA matches
    jax.jvp of the global operator (interpret mode)."""
    from nonlinearsolve_tpu.models.reaction_diffusion import (
        reaction_diffusion_3d, forcing)
    from nonlinearsolve_tpu.ops.pallas_stencil3d import rd3d_jvp_blocked
    N, D = 16, 0.01
    g = forcing(N)
    u = jnp.asarray(np.random.default_rng(0).random((N, N, N)))
    t = jnp.asarray(np.random.default_rng(1).standard_normal((N, N, N)))
    _, ref = jax.jvp(lambda x: reaction_diffusion_3d(x, (D, g)), (u,), (t,))
    for bz in [4, 8]:
        for db in [False, True]:
            out = rd3d_jvp_blocked(u, t, D, bz=bz, double_buffer=db)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-11)
    with pytest.raises(ValueError, match="must divide"):
        rd3d_jvp_blocked(u, t, D, bz=5)


def test_rd3d_jvp_scaled():
    """Fused chain-step kernel: out = (J·t)·inv_s with the absmax of the
    scaled output accumulated across grid steps (interpret mode)."""
    from nonlinearsolve_tpu.models.reaction_diffusion import (
        reaction_diffusion_3d, forcing)
    from nonlinearsolve_tpu.ops.pallas_stencil3d import rd3d_jvp_scaled
    N, D = 16, 0.01
    g = forcing(N)
    u = jnp.asarray(np.random.default_rng(2).random((N, N, N)))
    t = jnp.asarray(np.random.default_rng(3).standard_normal((N, N, N)))
    _, ref = jax.jvp(lambda x: reaction_diffusion_3d(x, (D, g)), (u,), (t,))
    for bz, s in [(4, 0.5), (8, 1.0)]:
        out, m = rd3d_jvp_scaled(u, t, D, s, bz=bz)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref) * s,
                                   atol=1e-11)
        np.testing.assert_allclose(float(m), float(jnp.max(jnp.abs(ref))) * s,
                                   rtol=1e-12)
    with pytest.raises(ValueError, match="must divide"):
        rd3d_jvp_scaled(u, t, D, 1.0, bz=5)


def test_rd3d_make_problem_pallas_jvp_solves():
    """make_problem(pallas_jvp=True) attaches the blocked kernel as the
    analytic jvp; the Newton-GMRES solve through it (interpret mode on
    CPU) matches the plain-jvp solve."""
    import nonlinearsolve_tpu as nls
    from nonlinearsolve_tpu.models import reaction_diffusion as rd

    N = 16
    alg = nls.NewtonRaphson(linsolve=nls.LinearSolver(method="gmres",
                                                      restart=20))
    sols = []
    for pallas in (False, True):
        prob = rd.make_problem(N, dtype=jnp.float64, pallas_jvp=pallas)
        sol = nls.solve(prob, alg, abstol=1e-9, maxiters=30)
        assert int(sol.retcode) == 1, int(sol.retcode)
        sols.append(np.asarray(sol.u))
    np.testing.assert_allclose(sols[0], sols[1], atol=1e-7)
    with pytest.raises(ValueError, match="bz"):
        rd.make_problem(10, pallas_jvp=True)
