"""Subprocess golden cross-validation for bench.py.

Runs in its OWN process so the float64 polish never flips x64 inside the
bench process after f32 executables were compiled (ADVICE r2).  Forces the
CPU backend via jax.config (the axon sitecustomize ignores JAX_PLATFORMS).

Usage: python tools/golden_polish.py <npz>  — the npz holds u_fast (f32
root), u_hi/u_lo (refined double-f32 root) and N; prints ONE JSON line
{"golden_fast": ..., "golden_refined": ..., "retcode64": ...} where the
golden values are rel-inf distances to the float64 fixed point found by a
warm-started f64 Newton-GMRES polish with the SAME engine.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np       # noqa: E402


def main(path):
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import nonlinearsolve_tpu as nls
    from nonlinearsolve_tpu.models import brusselator
    from nonlinearsolve_tpu.ops.preconditioners import (
        fft_poisson_preconditioner)
    from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing

    z = np.load(path)
    N = int(z["N"])
    u_fast = np.asarray(z["u_fast"], np.float64)
    u_ref = np.asarray(z["u_hi"], np.float64) + np.asarray(z["u_lo"],
                                                           np.float64)

    prob64 = brusselator.make_problem(N, jnp.float64)
    prob64 = prob64.remake(u0=jnp.asarray(u_ref))
    pm64 = fft_poisson_preconditioner((N, N), alpha=10.0, h=1.0 / (N - 1),
                                      shift=3.0, n_components=2)
    alg64 = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=16,
                                  krylov_maxiter=200, precond_fn=pm64),
        forcing=EisenstatWalkerForcing(eta_0=1e-4, eta_max=1e-4))
    sol64 = nls.solve(prob64, alg64, abstol=1e-4, maxiters=10)
    jax.block_until_ready(sol64.u)
    u64 = np.asarray(sol64.u, np.float64)
    scale = max(float(np.max(np.abs(u64))), 1.0)
    print(json.dumps({
        "golden_fast": float(np.max(np.abs(u_fast - u64))) / scale,
        "golden_refined": float(np.max(np.abs(u_ref - u64))) / scale,
        "retcode64": int(sol64.retcode),
    }))


if __name__ == "__main__":
    main(sys.argv[1])
