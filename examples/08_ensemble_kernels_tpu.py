"""Batched rootfinding on TPU — the reference's GPU tutorial, TPU-native.

The reference's docs/src/tutorials/nonlinear_solve_gpus.md shows two GPU
forms: (1) a large system whose ``u0``/``p`` live on the device (CuArray),
and (2) "kernel generation" — compiling a whole SimpleNonlinearSolve solver
into a per-parameter GPU kernel via KernelAbstractions.jl (its ImmutableNonlinearProblem
+ StaticArrays + SimpleNewtonRaphson recipe, :80-175).

On TPU both forms are one idiom:

1. Large system: JAX arrays are device arrays — nothing to change.
2. Kernel ensemble: ``jax.vmap`` over the WHOLE solve fuses the entire
   solver while_loop into one XLA program where every lane advances one
   trajectory — the kernels-in-kernels analogue, with the VPU's 8x128
   lanes playing the role of CUDA threads (solvers/simple.py keeps the
   Simple tier's carries minimal precisely so they vmap this way).

   Measured on one v5e chip (batch-size slope): SimpleNewtonRaphson
   ~4M solves/s, SimpleTrustRegion 2.5M, and the FULL-tier
   NewtonRaphson engine 2.7M — where the reference's tutorial restricts
   kernels to its Simple tier ("most NonlinearSolve.jl algorithms will
   not be compatible with being in kernels"), the functional engines
   here vmap whole.  The enabler is the vectorized Gauss-Jordan small
   -system solve (docs/tpu_tuning.md §4c).

Run:  python examples/08_ensemble_kernels_tpu.py
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def p2_f(x, p):
    """The reference tutorial's 4-equation test system
    (nonlinear_solve_gpus.md:140-146)."""
    return jnp.stack([
        x[0] + p[0] * x[1],
        jnp.sqrt(p[1]) * (x[2] - x[3]),
        (x[1] - p[2] * x[2]) ** 2,
        jnp.sqrt(p[3]) * (x[0] - x[3]) * (x[0] - x[3]),
    ])


def main():
    import nonlinearsolve_tpu as nls
    from nonlinearsolve_tpu.utils.profiling import slope_time

    # ---- Form 1: large system, device arrays end-to-end -----------------
    # The reference's CuArray form verbatim (nonlinear_solve_gpus.md:66-73):
    # f(u,p) = u.*u .- p, u0 = ones(1000), NewtonRaphson, abstol 1e-4.
    n = 1000
    p = jnp.arange(1, n + 1, dtype=jnp.float32)
    prob = nls.NonlinearProblem(lambda u, q: u * u - q,
                                jnp.ones(n, jnp.float32), p)
    sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-4)
    err = float(jnp.max(jnp.abs(sol.u - jnp.sqrt(p))))
    print(f"large system  n={n}: retcode={int(sol.retcode)} "
          f"max|u-sqrt(p)|={err:.2e}")

    # ---- Form 2: kernel ensemble — vmap over whole Simple solves --------
    u0 = jnp.array([1.0, 2.0, 3.0, 4.0], jnp.float32)

    def solve_one(pi):
        prob_i = nls.NonlinearProblem(p2_f, u0, pi)
        s = nls.solve(prob_i, nls.SimpleNewtonRaphson(), abstol=1e-4,
                      maxiters=100)
        return s.u, s.retcode

    ps = jax.random.uniform(jax.random.PRNGKey(0), (1024, 4), jnp.float32,
                            minval=0.1, maxval=1.0)
    us, rcs = jax.jit(jax.vmap(solve_one))(ps)
    resid = jax.vmap(p2_f)(us, ps)
    print(f"ensemble 1024: all Success={bool(jnp.all(rcs == 1))} "
          f"max|f|={float(jnp.max(jnp.abs(resid))):.2e}")

    # Throughput: batch-size slope (dispatch/fetch terms cancel,
    # docs/tpu_tuning.md §8).
    B1, B2 = 4096, 65536
    key = jax.random.PRNGKey(1)

    def mk(B):
        pB = jax.random.uniform(key, (B, 4), jnp.float32,
                                minval=0.1, maxval=1.0)
        f = jax.jit(lambda ps_: jnp.sum(jax.vmap(solve_one)(ps_)[0]))
        return lambda: float(f(pB))

    r1, r2 = mk(B1), mk(B2)
    r1(); r2()
    t = slope_time(r1, r2, span=B2 - B1, rounds=5)
    print(f"kernel-ensemble throughput: {1.0 / t:,.0f} solves/s "
          f"({t*1e9:.0f} ns/solve marginal)")


if __name__ == "__main__":
    main()
