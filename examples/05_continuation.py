"""Homotopy continuation through a fold (docs/continuation.md)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.numpy as jnp
import nonlinearsolve_tpu as nls

# u^3 - u + lam: folds at lam = +/- 2/(3 sqrt 3)
prob = nls.HomotopyProblem(lambda u, p, lam: u ** 3 - u + lam * p,
                           jnp.array([-1.2]), 1.0, lambdaspan=(0.0, 0.5))
sol = nls.solve(prob, nls.ArcLengthContinuation())
print("arclength landing:", sol.u, "retcode:", int(sol.retcode))
