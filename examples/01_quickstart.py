"""Quickstart: solve f(u, p) = u^2 - 2 = 0 (docs/quickstart.md)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import nonlinearsolve_tpu as nls

prob = nls.NonlinearProblem(lambda u, p: u ** 2 - p, jnp.array([1.0, 1.0]), 2.0)

sol = nls.solve(prob)                       # polyalgorithm auto-selection
print("polyalg:", sol.u, sol.retcode)

sol = nls.solve(prob, nls.NewtonRaphson())  # explicit solver
print("newton: ", sol.u, "steps:", int(sol.stats.nsteps))

sol = nls.solve(prob, nls.TrustRegion(), abstol=1e-12)
print("tr:     ", sol.u)
