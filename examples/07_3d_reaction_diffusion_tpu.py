"""3D reaction-diffusion steady state on one TPU chip — config 5's
single-chip half (BASELINE.md; the multi-host layer rides parallel/).

Solves F(u) = D*lap(u) + u - u^3 + g = 0 on an N^3 periodic grid with
matrix-free Newton-GMRES: the Jacobian is applied as a jax.jvp of the
stencil (optionally the grid-blocked Pallas kernel,
ops/pallas_stencil3d.py) and preconditioned by the exact FFT inverse of
its stiff part D*lap + (1 - 3*u0^2)|_mean (ops/preconditioners.py).

Run on the real chip:  python examples/07_3d_reaction_diffusion_tpu.py [N]
(N defaults to 128; 256 fits one v5e chip: 64 MB per f32 field).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(N: int = 128):
    import nonlinearsolve_tpu as nls
    from nonlinearsolve_tpu.models import reaction_diffusion
    from nonlinearsolve_tpu.ops.preconditioners import (
        fft_poisson_preconditioner)
    from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing
    from nonlinearsolve_tpu.utils.profiling import chained_solve_time

    dtype = jnp.float32
    D = 0.01
    on_tpu = jax.default_backend() != "cpu"
    prob = reaction_diffusion.make_problem(N, D=D, dtype=dtype,
                                           pallas_jvp=on_tpu and N % 8 == 0)

    # Stiff-part spectral preconditioner: alpha*lap - shift with
    # shift ~ -(1 - 3*mean(u0^2)) ~ -1 (the reaction linearization at the
    # flat u0 = 0.1 start); sign convention matches (alpha*lap - shift*I).
    h = 1.0 / N
    pm = fft_poisson_preconditioner((N, N, N), D, h, shift=-0.9)

    # Loose forcing + short restart: the 3D FFT preconditioner dominates
    # per-iteration cost even more than in 2D, and matrix-free Newton
    # steps are nearly free — same operating-point logic as bench.py.
    alg = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=8,
                                  krylov_maxiter=200, precond_fn=pm),
        forcing=EisenstatWalkerForcing(eta_0=0.1, eta_max=0.1))

    abstol = 1e-5 * N  # ~f32 floor for the h^-2-scaled residual
    sol = nls.solve(prob, alg, abstol=abstol, maxiters=30)
    jax.block_until_ready(sol.u)
    resid = float(jnp.max(jnp.abs(sol.resid)))
    print(f"N={N}^3 retcode={int(sol.retcode)} |resid|_inf={resid:.3e} "
          f"nsteps={int(sol.stats.nsteps)}")

    t = chained_solve_time(prob, alg, k=2, reps=2, abstol=abstol,
                           maxiters=30)
    dof = N ** 3
    print(f"time-to-solve: {t:.3f}s  ({dof/1e6:.1f} MDoF, "
          f"{dof / t / 1e6:.0f} MDoF/s)")

    # Pure matvec throughput of the stencil JVP (8 nnz per grid point:
    # 6 neighbors + diagonal + cubic-reaction diagonal term).  The chain
    # needs a normalization between applications to stay finite; on the
    # Pallas path the fused chain-step kernel (rd3d_jvp_scaled) folds the
    # scale into the output write and the absmax into an SMEM accumulator,
    # so each step is one 3-array HBM round-trip (~95% of the v5e HBM
    # roofline) instead of paying three extra passes for a separate
    # max-reduce + divide.  Fallback: jax.linearize + explicit normalize.
    u0 = prob.u0
    p = prob.p
    use_pallas = getattr(prob.f, "jvp", None) is not None and N % 8 == 0

    # Chain-length slope with forced fetch (docs/tpu_tuning.md §8): the
    # tunnel round-trip and constant shipping cancel in the paired-median
    # difference (utils/profiling.slope_time).
    from nonlinearsolve_tpu.utils.profiling import slope_time

    if use_pallas:
        from nonlinearsolve_tpu.ops.pallas_stencil3d import rd3d_jvp_scaled

        def make_scan(L):
            @jax.jit
            def spmv_scan(v):
                def body(carry, _):
                    c, s = carry
                    w, m = rd3d_jvp_scaled(u0, c, p[0], 1.0 / s, bz=8)
                    return (w, jnp.maximum(m, jnp.float32(1.0))), None
                (out, _), _ = jax.lax.scan(body, (v, jnp.float32(1.0)),
                                           None, length=L)
                return jnp.sum(jnp.abs(out))
            return spmv_scan
    else:
        f = lambda u: reaction_diffusion.reaction_diffusion_3d(u, p)
        _, lin = jax.linearize(f, u0)

        def make_scan(L):
            @jax.jit
            def spmv_scan(v):
                def body(c, _):
                    w = lin(c)
                    return w / jnp.maximum(jnp.max(jnp.abs(w)), 1.0), None
                out, _ = jax.lax.scan(body, v, None, length=L)
                return jnp.sum(jnp.abs(out))
            return spmv_scan

    v0 = jnp.ones_like(u0)
    L1, L2 = 10, 110
    s1, s2 = make_scan(L1), make_scan(L2)
    float(s1(v0)), float(s2(v0))
    dt = max(slope_time(lambda: float(s1(v0)), lambda: float(s2(v0)),
                        span=L2 - L1, rounds=3), 1e-9)
    nnz = 8 * dof
    print(f"jvp matvec: {dt*1e6:.0f} us, {nnz/dt/1e9:.1f} Gnnz/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
