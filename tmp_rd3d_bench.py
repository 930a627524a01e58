import time, jax, numpy as np, jax.numpy as jnp
from nonlinearsolve_tpu.models.reaction_diffusion import reaction_diffusion_3d, forcing
from nonlinearsolve_tpu.ops.pallas_stencil3d import rd3d_jvp_blocked
N, D = 256, 0.01
dtype = jnp.float32
g = forcing(N, dtype)
u = jax.random.uniform(jax.random.PRNGKey(0), (N, N, N), dtype)
t = jax.random.normal(jax.random.PRNGKey(1), (N, N, N), dtype)
def xla_jvp(tt):
    return jax.jvp(lambda x: reaction_diffusion_3d(x, (D, g)), (u,), (tt,))[1]
xj = jax.jit(xla_jvp)
t0=time.time(); r1 = xj(t).block_until_ready(); print("xla compiled", time.time()-t0, flush=True)
nbytes = N**3*4*3
for bz in [8, 16, 32]:
    try:
        pj = jax.jit(lambda tt, b=bz: rd3d_jvp_blocked(u, tt, D, bz=b))
        t0=time.time(); r2 = pj(t).block_until_ready(); print(f"pallas bz={bz} compiled", time.time()-t0, flush=True)
        err = float(jnp.max(jnp.abs(r1 - r2)))
        ts=[]
        for _ in range(10):
            t0=time.perf_counter(); pj(t).block_until_ready(); ts.append(time.perf_counter()-t0)
        print(f"  bz={bz}: err={err:.2e}  {min(ts)*1e3:.3f} ms ({nbytes/min(ts)/1e9:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"  bz={bz} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
ts=[]
for _ in range(10):
    t0=time.perf_counter(); xj(t).block_until_ready(); ts.append(time.perf_counter()-t0)
print(f"xla: {min(ts)*1e3:.3f} ms  ({nbytes/min(ts)/1e9:.0f} GB/s effective)", flush=True)
