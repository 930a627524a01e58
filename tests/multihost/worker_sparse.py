"""Multi-process (fake multi-host) worker for the ROW-SHARDED GENERAL-
SPARSE operator (parallel/sparse_dist.py): 2 processes x 2 devices solve
f(u) = A u + 0.1 u^3 - b with A banded CSR row-partitioned over the global
mesh (ppermute ring halo exchange across the process boundary).  Prints a
solution fingerprint for the parent to compare against single-process.
"""

import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=proc_id)

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.ops.sparse import CSR
from nonlinearsolve_tpu.parallel import make_sharded_csr_matvec

rng = np.random.default_rng(0)
Ng = 16
n = Ng * Ng
d = np.ones(n)
A = sp.diags([d * 4, -d[:-1], -d[:-1], -d[:-Ng], -d[:-Ng]],
             [0, 1, -1, Ng, -Ng], format="csr")
A.data = A.data * (1 + 0.1 * rng.standard_normal(A.nnz))
b = rng.standard_normal(n)

mesh = Mesh(np.array(jax.devices()).reshape(-1), ("x",))
csr = CSR(jnp.asarray(A.data), np.asarray(A.indices, np.int32),
          np.asarray(A.indptr, np.int32), (n, n))
mv = make_sharded_csr_matvec(csr, mesh, "x")
b_j = jnp.asarray(b)


def f(u, p):
    return mv(u) + 0.1 * u ** 3 - b_j


def jvp(v, u, p):
    return mv(v) + 0.3 * u ** 2 * v


prob = nls.NonlinearProblem(
    nls.NonlinearFunction(f=f, jvp=jvp), jnp.zeros(n))
alg = nls.NewtonRaphson(
    linsolve=nls.LinearSolver(method="gmres", restart=30,
                              krylov_maxiter=400))
sol = nls.solve(prob, alg, abstol=1e-5, maxiters=50)

resid = float(jnp.max(jnp.abs(sol.resid)))
fingerprint = float(jnp.sum(sol.u * sol.u))
print(f"RESULT {proc_id} retcode={int(sol.retcode)} resid={resid:.6e} "
      f"fingerprint={fingerprint:.8e} mode={mv.plan.mode}", flush=True)
