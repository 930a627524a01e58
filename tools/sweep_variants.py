"""Empirical broken-set sweep for new 23-problem variant rows (round 3).

Runs each candidate algorithm over the 23-problem suite on the CPU x64
backend (same config as tests/conftest.py) and prints the failing problem
indices, for curation into tests/test_23_problems.py CASES.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.models.problems23 import PROBLEMS_23

EPS = 1e-4

VARIANTS = [
    # round 4 (VERDICT r3 next#6): the three missing reference alg_ops rows
    ("SimpleTrustRegion-NLsolve",
     lambda: nls.SimpleTrustRegion(nlsolve_update_rule=True)),
    ("LevenbergMarquardt-Geodesic01",
     lambda: nls.LevenbergMarquardt(alpha_geodesic=0.1)),
    ("LevenbergMarquardt-Cholesky",
     lambda: nls.LevenbergMarquardt(
         linsolve=nls.LinearSolver(method="cholesky"))),
]

VARIANTS_R3 = [
    ("TrustRegion-Hei", lambda: nls.TrustRegion(radius_update_scheme="hei")),
    ("TrustRegion-Yuan", lambda: nls.TrustRegion(radius_update_scheme="yuan")),
    ("Broyden-TrueJac",
     lambda: nls.Broyden(init_jacobian="true_jacobian")),
    ("Broyden-Bad", lambda: nls.Broyden(update_rule="bad_broyden")),
    ("Broyden-TrueJac-Bad",
     lambda: nls.Broyden(init_jacobian="true_jacobian",
                         update_rule="bad_broyden")),
]


def main():
    for name, mk in VARIANTS:
        alg = mk()
        failures = []
        for tp in PROBLEMS_23:
            prob = nls.NonlinearProblem(tp.f, jnp.asarray(tp.start))
            try:
                sol = nls.solve(prob, alg, maxiters=10000)
                resid = float(jnp.max(jnp.abs(jnp.asarray(tp.f(sol.u, None)))))
                ok = resid <= EPS
            except Exception as e:  # noqa: BLE001
                ok, resid = False, repr(e)
            if not ok:
                failures.append((tp.index, resid))
            jax.clear_caches()
        print(f"{name}: broken = {sorted(i for i, _ in failures)}")
        for i, r in failures:
            print(f"    #{i}: {r}")


if __name__ == "__main__":
    main()
