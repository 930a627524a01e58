"""Distributed-layer tests on the virtual 8-device CPU mesh (the multi-chip
simulation strategy of SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.parallel import (create_mesh, distributed_solve,
                                         psum_dot_factory,
                                         sharded_laplacian_1d_factory)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh():
    return create_mesh((8,), ("x",))


def test_shard_map_laplacian(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    lap = sharded_laplacian_1d_factory(mesh)
    x = jnp.arange(32.0)
    out = lap(jax.device_put(x, NamedSharding(mesh, P("x"))))
    expected = jnp.roll(x, 1) - 2 * x + jnp.roll(x, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected))


def test_psum_dot(mesh):
    pdot = psum_dot_factory(mesh)
    x = jnp.arange(16.0)
    np.testing.assert_allclose(float(pdot(x, x)), float(jnp.dot(x, x)))


def test_distributed_newton_krylov_matches_single_device(mesh):
    from nonlinearsolve_tpu.models import reaction_diffusion
    from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing

    prob = reaction_diffusion.make_problem(16)
    alg = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=20),
        forcing=EisenstatWalkerForcing())
    sol_single = nls.solve(prob, alg, abstol=1e-8)
    sol_dist = distributed_solve(prob, alg, mesh, abstol=1e-8)
    assert bool(sol_dist.success)
    np.testing.assert_allclose(np.asarray(sol_dist.u),
                               np.asarray(sol_single.u), atol=1e-6)
    # result stays row-sharded over the mesh
    assert "x" in str(sol_dist.u.sharding)


def test_distributed_sharded_2d_mesh():
    """2×4 mesh: shard two grid axes (the 'tp×dp' analogue for PDE grids)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nonlinearsolve_tpu.models import reaction_diffusion
    mesh = create_mesh((2, 4), ("x", "y"))
    prob = reaction_diffusion.make_problem(16)
    u0 = jax.device_put(prob.u0, NamedSharding(mesh, P("x", "y", None)))
    p = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), prob.p)
    prob2 = prob.remake(u0=u0, p=p)
    sol = nls.solve(prob2, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=20)), abstol=1e-8)
    assert bool(sol.success)


def test_sharded_rd3d_jvp_halo_overlap():
    """Explicit-SPMD 3D RD JVP with ppermute halos issued before the
    interior compute (halo/compute overlap): bitwise-matches jax.jvp of
    the global operator, and drives sharded GMRES to convergence."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from nonlinearsolve_tpu.models.reaction_diffusion import (
        reaction_diffusion_3d, forcing)
    from nonlinearsolve_tpu.parallel.distributed import (
        sharded_rd3d_jvp_factory)
    from nonlinearsolve_tpu.ops.krylov import gmres

    N, D = 16, 0.01
    g = forcing(N)
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    jvp = sharded_rd3d_jvp_factory(mesh, D, N)
    sh = NamedSharding(mesh, P("x"))

    u = jnp.asarray(np.random.default_rng(0).random((N, N, N)))
    t = jnp.asarray(np.random.default_rng(1).standard_normal((N, N, N)))
    _, ref = jax.jvp(lambda x: reaction_diffusion_3d(x, (D, g)), (u,), (t,))
    out = jax.jit(jvp)(jax.device_put(u, sh), jax.device_put(t, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)

    # negative-definite state -> GMRES over the sharded operator converges
    u2 = jax.device_put(jnp.full((N, N, N), 0.7071), sh)
    b = jax.device_put(
        jnp.asarray(np.random.default_rng(2).standard_normal((N, N, N))), sh)
    res = jax.jit(lambda bb: gmres(lambda v: jvp(u2, v), bb, restart=40,
                                   rtol=1e-8, maxiter=400))(b)
    assert bool(res.success)


def test_sharded_rd3d_jvp_pallas_tier():
    """Per-shard Pallas tier: ppermute halos feeding the grid-blocked VMEM
    kernel (rd3d_jvp_blocked_halo) — matches jax.jvp of the global
    operator across an 8-way mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from nonlinearsolve_tpu.models.reaction_diffusion import (
        reaction_diffusion_3d, forcing)
    from nonlinearsolve_tpu.parallel.distributed import (
        sharded_rd3d_jvp_pallas_factory)

    N, D = 16, 0.01
    g = forcing(N)
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    jvp = sharded_rd3d_jvp_pallas_factory(mesh, D, N, bz=2)  # local nz = 2
    sh = NamedSharding(mesh, P("x"))

    u = jnp.asarray(np.random.default_rng(0).random((N, N, N)))
    t = jnp.asarray(np.random.default_rng(1).standard_normal((N, N, N)))
    _, ref = jax.jvp(lambda x: reaction_diffusion_3d(x, (D, g)), (u,), (t,))
    out = jax.jit(jvp)(jax.device_put(u, sh), jax.device_put(t, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-11)


def test_blocked_halo_kernel_matches_periodic():
    """Single-shard sanity: rd3d_jvp_blocked_halo with wrapped halo planes
    reproduces the periodic blocked kernel."""
    from nonlinearsolve_tpu.ops.pallas_stencil3d import (rd3d_jvp_blocked,
                                                         rd3d_jvp_blocked_halo)
    N, D = 16, 0.05
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random((N, N, N)))
    t = jnp.asarray(rng.standard_normal((N, N, N)))
    ref = rd3d_jvp_blocked(u, t, D, bz=4)
    out = rd3d_jvp_blocked_halo(u, t, t[-1:], t[:1], D, bz=4, n_global=N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_sharded_gmres_with_multigrid():
    """Multigrid-preconditioned GMRES runs unchanged over a sharded state:
    GSPMD lowers the V-cycle's pooling/slice ops and the Krylov
    reductions to collectives (iteration count matches single-device)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from nonlinearsolve_tpu.ops.multigrid import multigrid_preconditioner
    from nonlinearsolve_tpu.ops.krylov import gmres

    N, h = 64, 1.0 / 64
    rng = np.random.default_rng(0)
    cfield = jnp.asarray(1.0 + 2.0 * rng.random((N, N)))
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    sh = NamedSharding(mesh, P("x"))
    c_s = jax.device_put(cfield, sh)

    def lap_dir(u):
        out = -4.0 * u
        out = out.at[1:, :].add(u[:-1, :])
        out = out.at[:-1, :].add(u[1:, :])
        out = out.at[:, 1:].add(u[:, :-1])
        out = out.at[:, :-1].add(u[:, 1:])
        return out

    A = lambda u: (1.0 / h ** 2) * lap_dir(u) - c_s * u
    M = multigrid_preconditioner((N, N), 1.0, h, c=c_s, bc="dirichlet")
    b = jax.device_put(jnp.asarray(rng.standard_normal((N, N))), sh)
    r = jax.jit(lambda bb: gmres(A, bb, restart=30, rtol=1e-8,
                                 maxiter=500, M=M))(b)
    assert bool(r.success) and int(r.iterations) < 30
    rel = float(jnp.linalg.norm(A(r.x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-6


def test_weak_scaling_report_runs():
    """The weak-scaling harness produces rates and efficiencies on the
    virtual mesh (real multi-host numbers need hardware)."""
    from nonlinearsolve_tpu.parallel.scaling import weak_scaling_report
    rows = weak_scaling_report([1, 2, 4, 8], base_n=8, n_matvecs=5)
    assert len(rows) == 4
    for k, rate, eff in rows:
        assert rate > 0 and np.isfinite(eff)
    assert rows[0][2] == 1.0
    # explicit shard_map + blocked Pallas tier takes the same path
    rows_p = weak_scaling_report([1, 2], base_n=8, n_matvecs=3,
                                 use_pallas=True, bz=4)
    assert len(rows_p) == 2
    assert all(r > 0 for _, r, _ in rows_p)


def test_weak_scaling_sparse_report_runs():
    """The general-sparse weak-scaling mode (row-partitioned CSR operator,
    r3) produces the same report shape — turnkey for real multi-host."""
    from nonlinearsolve_tpu.parallel.scaling import weak_scaling_sparse_report
    rows = weak_scaling_sparse_report([1, 2, 4], rows_per_device=512,
                                      n_matvecs=3)
    assert len(rows) == 3
    for k, rate, eff in rows:
        assert rate > 0 and np.isfinite(eff)
    assert rows[0][2] == 1.0
