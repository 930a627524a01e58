"""Find ALL nearby roots of a smooth system (docs/solvers.md)."""
import jax
jax.config.update("jax_platforms", "cpu")   # C128 tracking unsupported on TPU
jax.config.update("jax_enable_x64", True)   # path tracking wants f64
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import nonlinearsolve_tpu as nls

# bistable reaction system: three equilibria
def f(u, p):
    return jnp.array([u[0] - u[0] ** 3 - 0.2 * u[1],
                      u[1] - jnp.tanh(u[0])])

prob = nls.NonlinearProblem(f, jnp.array([0.5, 0.5]), None)
roots = nls.solve_multistart(prob, order=3)
print("equilibria:\n", roots)
