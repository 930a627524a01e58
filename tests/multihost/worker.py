"""Multi-process (fake multi-host) worker: distributed Newton-Krylov on the
3D reaction-diffusion problem across 2 processes x 2 devices, with the
state row-partitioned over the global mesh.  Prints the residual norm and a
solution fingerprint for the parent test to compare against single-process.
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.models import reaction_diffusion
from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing

N = 16
prob = reaction_diffusion.make_problem(N, dtype=jnp.float32)
mesh = Mesh(np.array(jax.devices()).reshape(-1), ("x",))
sharding = NamedSharding(mesh, P("x", None, None))

from jax.experimental import multihost_utils

# each process owns its slab of the initial state
n_local = N // jax.process_count() // jax.local_device_count() \
    * jax.local_device_count()
lo = proc_id * (N // nprocs)
u0_local = np.full((N // nprocs, N, N), 0.1, np.float32)
u0 = multihost_utils.host_local_array_to_global_array(
    jnp.asarray(u0_local), mesh, P("x", None, None))
g_local = np.asarray(reaction_diffusion.forcing(N, jnp.float32))[lo:lo + N // nprocs]
g = multihost_utils.host_local_array_to_global_array(
    jnp.asarray(g_local), mesh, P("x", None, None))
p = (jax.device_put(jnp.float32(0.01), NamedSharding(mesh, P())), g)

prob2 = prob.remake(u0=u0, p=p)
alg = nls.NewtonRaphson(
    linsolve=nls.LinearSolver(method="gmres", restart=20),
    forcing=EisenstatWalkerForcing())
sol = nls.solve(prob2, alg, abstol=1e-4)

resid = float(jnp.max(jnp.abs(sol.resid)))
fingerprint = float(jnp.sum(sol.u * sol.u))
print(f"RESULT {proc_id} retcode={int(sol.retcode)} resid={resid:.6e} "
      f"fingerprint={fingerprint:.8e}", flush=True)
