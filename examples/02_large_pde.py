"""Newton-Krylov with FFT preconditioning on the 2D Brusselator
(docs/large_systems.md) — the BASELINE config-4 workflow."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.models import brusselator
from nonlinearsolve_tpu.ops.preconditioners import fft_poisson_preconditioner
from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing

N = 128
prob = brusselator.make_problem(N)
p = brusselator.default_p(N)
M = fft_poisson_preconditioner((N, N), p[2], 1.0 / (N - 1), n_components=2)

alg = nls.NewtonRaphson(
    linsolve=nls.LinearSolver(method="gmres", restart=16,
                              precond_fn=lambda u: M),
    forcing=EisenstatWalkerForcing())
# float32 carries ~eps*(alpha/dx^2) discretization noise per stencil
# point, so the meaningful absolute tolerance at this stiffness is O(1)
# in the inf-norm (the TPU-native dtype choice; run x64 on CPU for 1e-9).
sol = nls.solve(prob, alg, abstol=1.0, maxiters=30)
print("success:", bool(sol.success), "steps:", int(sol.stats.nsteps))
