"""Certify an f32 TPU root to float64 grade with double-f32 refinement.

The reference certifies its large-system tutorial at Float64 abstol=1e-10
(large_systems.md:141-165).  TPU compute is f32; a plain solve stalls at
the residual-evaluation noise floor (~3 digits in u on the 512²
Brusselator).  `nls.refine_root` lifts that floor with error-free-transform
arithmetic: the defect is evaluated in double-f32 (~48 mantissa bits from
pure f32 VPU ops) and corrected with ordinary f32 GMRES — a few extra
milliseconds for ~12 more digits.

Run: python examples/11_mixed_precision_refinement.py  [N]
(CPU works too — the same code, slower.)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import nonlinearsolve_tpu as nls                                  # noqa: E402
from nonlinearsolve_tpu.models import brusselator                 # noqa: E402
from nonlinearsolve_tpu.ops.preconditioners import (              # noqa: E402
    fft_poisson_preconditioner)
from nonlinearsolve_tpu.solvers.first_order import (              # noqa: E402
    EisenstatWalkerForcing)


def main(N=128):
    prob = brusselator.make_problem(N, jnp.float32)
    pm = fft_poisson_preconditioner((N, N), alpha=10.0, h=1.0 / (N - 1),
                                    shift=3.0, n_components=2)
    alg = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=16,
                                  krylov_maxiter=100, precond_fn=pm),
        forcing=EisenstatWalkerForcing(eta_0=1e-2, eta_max=1e-2))
    # abstol near the f32 noise floor for this scaling (alpha/h² ~ 1.6e5)
    sol = nls.solve(prob, alg, abstol=0.5, maxiters=30)
    print(f"f32 solve: retcode={int(sol.retcode)}, "
          f"|f|_inf={float(jnp.max(jnp.abs(sol.resid))):.2e}")

    # Hand-written double-f32 residual for the flagship (exact f64-split
    # constants).  For your own polynomial/rational model, skip this and
    # call nls.auto_refine(prob, sol.u) — the jaxpr interpreter builds the
    # double-word defect automatically.
    p64 = np.array([3.4, 1.0, 10.0, 1.0 / (N - 1)], np.float64)
    p32 = brusselator.default_p(N, jnp.float32)
    res = nls.refine_root(
        sol.u,
        lambda uh, ul: brusselator.brusselator_2d_df32(uh, ul, p64),
        lambda uh: (lambda v: jax.jvp(
            lambda U: brusselator.brusselator_2d(U, p32), (uh,), (v,))[1]),
        rounds=3, inner_rtol=1e-2, restart=16, precond_fn=pm)
    print(f"refined: double-f32 defect |f|_inf={float(res.defect_norm):.2e} "
          f"(u = hi + lo, reconstruct off-chip as f64)")

    # generic one-call variant (same numbers, zero extra code)
    res2 = nls.auto_refine(prob, sol.u, p64=p64, rounds=3, precond_fn=pm)
    print(f"auto_refine: defect {float(res2.defect_norm):.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
