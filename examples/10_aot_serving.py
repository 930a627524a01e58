"""AOT export / serving: compile once, serve anywhere.

The reference ships precompile workloads so user processes pay no JIT
latency (/root/reference/src/NonlinearSolve.jl:49-181).  The TPU-native
deployment analogue goes further: ``nls.export_solver`` lowers a fully
configured solve to a serialized StableHLO artifact, and a serving process
(even one that never imports the solver internals on its hot path)
deserializes and calls it — zero tracing, stable numerics, any batch size
via a symbolic batch dimension.

Run: python examples/10_aot_serving.py
"""

import os
import subprocess
import sys
import tempfile

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import nonlinearsolve_tpu as nls  # noqa: E402

SERVER = """
import sys, numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
import nonlinearsolve_tpu as nls

f = nls.deserialize_solver(open({path!r}, "rb").read())
for n in (3, 8):                       # one artifact, any batch size
    ps = jnp.arange(2.0, 2.0 + n)
    sols = f(jnp.ones((n, 1)), ps)
    ok = np.allclose(np.asarray(sols.u).ravel(), np.sqrt(np.asarray(ps)))
    print(f"SERVED batch={{n}} ok={{ok}} retcodes={{np.asarray(sols.retcode)}}")
"""


def main():
    # --- build side: configure + export once -------------------------------
    prob = nls.NonlinearProblem(lambda u, p: u * u - p, jnp.array([1.0]), 2.0)
    data = nls.export_solver(prob, nls.NewtonRaphson(), batch="b",
                             abstol=1e-10)
    print(f"exported artifact: {len(data)} bytes")

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "newton_sqrt.nlsx")
        with open(path, "wb") as fh:
            fh.write(data)

        # --- serve side: a fresh process loads and calls it ----------------
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [sys.executable, "-c", SERVER.format(repo=repo, path=path)],
            capture_output=True, text=True, timeout=300)
        sys.stdout.write(out.stdout)
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise SystemExit("serving process failed")


if __name__ == "__main__":
    main()
