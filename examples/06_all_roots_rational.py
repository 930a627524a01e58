"""All roots of polynomial / rational systems (HomotopyContinuationJL tier).

The reference reaches HomotopyContinuation.jl through a bridge; here the
total-degree tracker is in-repo and every path is tracked in one vmap.
"""
import jax
jax.config.update("jax_platforms", "cpu")   # C128 tracking unsupported on TPU
jax.config.update("jax_enable_x64", True)   # path tracking wants f64
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import nonlinearsolve_tpu as nls

# 1. all real solutions of x²+y²=5, xy=2 (degrees measured automatically)
def f(u, p):
    return jnp.array([u[0] ** 2 + u[1] ** 2 - 5.0, u[0] * u[1] - 2.0])

sol = nls.solve(nls.NonlinearProblem(f, jnp.array([1.0, 1.0])),
                nls.HomotopyContinuationJL(all_roots=True))
print("all real roots:\n", sol.u)

# 2. a rational system: roots where the denominator vanishes are spurious
hf = nls.HomotopyNonlinearFunction(
    f=lambda u, p: u ** 2 - 7 * u + 10.0,        # numerator roots: 2, 5
    denominator=lambda u, p: u - 2.0)             # ... 2 is a pole
sol = nls.solve(nls.NonlinearProblem(hf, jnp.array([0.0])),
                nls.HomotopyContinuationJL(all_roots=True))
print("rational roots (pole filtered):", sol.u)

# 3. smooth (non-polynomial) residual: Taylor surrogate + Newton polish
sol = nls.solve(nls.NonlinearProblem(lambda u, p: jnp.sin(u) - 0.5,
                                     jnp.array([0.3])),
                nls.TaylorHomotopyContinuationJL(degree=3, all_roots=True))
print("sin(u) = 1/2 near 0.3:", sol.u)
