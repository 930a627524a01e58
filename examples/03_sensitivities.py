"""Differentiating through solves (docs/differentiability.md)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import nonlinearsolve_tpu as nls

def root_of(p):
    prob = nls.NonlinearProblem(lambda u, q: u ** 3 + u - q,
                                jnp.array([1.0]), p)
    return nls.solve(prob, nls.NewtonRaphson()).u[0]

print("root(2)     =", root_of(2.0))
print("d root/dp   =", jax.grad(root_of)(2.0))
print("d2 root/dp2 =", jax.grad(jax.grad(root_of))(2.0))
print("batched     =", jax.vmap(jax.grad(root_of))(jnp.array([1.0, 2.0, 4.0])))
