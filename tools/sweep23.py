"""Run the 23-problem sweep for every CASES row and print the ACTUAL
failing-problem sets, so the BROKEN sets in tests/test_23_problems.py can be
re-curated after fixture changes.  Run on the CPU backend:

    JAX_PLATFORMS=cpu python tools/sweep23.py
"""
import os

import jax

# The axon sitecustomize force-registers the tunnel platform and IGNORES
# the JAX_PLATFORMS env var (.claude/skills/verify/SKILL.md) — force the
# CPU backend + x64 the way tests/conftest.py does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nonlinearsolve_tpu as nls  # noqa: E402
from nonlinearsolve_tpu.models.problems23 import PROBLEMS_23  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_23_problems import CASES, EPS  # noqa: E402

only = set(sys.argv[1:])

for name, alg, broken in CASES:
    if only and name not in only:
        continue
    failing = []
    for tp in PROBLEMS_23:
        prob = nls.NonlinearProblem(tp.f, jnp.asarray(tp.start))
        try:
            sol = (nls.solve(prob, alg, maxiters=10000) if alg is not None
                   else nls.solve(prob, maxiters=10000))
            resid = float(jnp.max(jnp.abs(jnp.asarray(tp.f(sol.u, None)))))
            ok = resid <= EPS
        except Exception as e:  # noqa: BLE001
            ok, resid = False, repr(e)[:60]
        if not ok:
            failing.append(tp.index)
    jax.clear_caches()
    newly_broken = sorted(set(failing) - set(broken))
    fixed = sorted(set(broken) - set(failing))
    print(f"{name}: failing={sorted(failing)} "
          f"(curated={sorted(broken)}; new={newly_broken}; fixed={fixed})",
          flush=True)
