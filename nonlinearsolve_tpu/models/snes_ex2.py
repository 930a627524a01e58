"""PETSc SNES example 2 — the reference's head-to-head tutorial problem.

1D nonlinear BVP  u'' + u² = F(x)  with  F = 6x + (x+1e-12)⁶, Dirichlet
u(0)=0, u(1)=1 (/root/reference/docs/src/tutorials/snes_ex2.md:17-33;
PETSc src/snes/examples/tutorials/ex2.c).  The exact solution is
u(x) = x + (x+1e-12)³·? — well, PETSc's classic has u = x³+..., but the
docs treat the discrete solve itself as the target, so we cross-check
dense vs sparse-AD solves against each other like the tutorial does.

Jacobian is tridiagonal → the sparse path exercises the exact jaxpr
sparsity tracer + parallel-cyclic-reduction direct solve.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def residual(x, _p=None):
    n = x.shape[0]
    xp = jnp.linspace(0.0, 1.0, n)
    F = 6.0 * xp + (xp + 1e-12) ** 6
    dx = 1.0 / (n - 1)
    interior = ((x[:-2] - 2.0 * x[1:-1] + x[2:]) / dx ** 2
                + x[1:-1] * x[1:-1] - F[1:-1])
    return jnp.concatenate([x[:1], interior, x[-1:] - 1.0])


def make_problem(n: int = 128, sparse: bool = False):
    from ..core.problems import NonlinearFunction, NonlinearProblem
    u0 = jnp.full((n,), 0.5)
    if sparse:
        # tridiagonal pattern as a COO spec (or rely on exact detection)
        rows = [0] + [i for i in range(1, n - 1) for _ in range(3)] + [n - 1]
        cols = [0] + [j for i in range(1, n - 1)
                      for j in (i - 1, i, i + 1)] + [n - 1]
        f = NonlinearFunction(f=residual,
                              sparsity=(np.array(rows), np.array(cols)))
        return NonlinearProblem(f, u0, None)
    return NonlinearProblem(residual, u0, None)
