import time, functools, jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512
dtype = jnp.float32

def roll_r(x, k, ax):   # pltpu.roll
    return pltpu.roll(x, k % x.shape[ax], ax)

def roll_c(x, k, ax):   # slice+concat
    k = k % x.shape[ax]
    if k == 0: return x
    lo = jax.lax.slice_in_dim(x, x.shape[ax]-k, x.shape[ax], axis=ax)
    hi = jax.lax.slice_in_dim(x, 0, x.shape[ax]-k, axis=ax)
    return jax.lax.concatenate([lo, hi], ax)

def make_kernel(rollfn):
    def kern(u_ref, tu_ref, o_ref):
        u = u_ref[:]; t = tu_ref[:]
        lap = (rollfn(t,1,0)+rollfn(t,-1,0)+rollfn(t,1,1)+rollfn(t,-1,1)-4.0*t)
        o_ref[:] = 0.1 * lap + (1.0 - u*u) * t
    return kern

def make_call(rollfn):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    @jax.jit
    def f(u, t):
        return pl.pallas_call(make_kernel(rollfn),
            out_shape=jax.ShapeDtypeStruct((N,N), dtype),
            in_specs=[spec, spec], out_specs=spec)(u, t)
    return f

u = jax.random.uniform(jax.random.PRNGKey(0), (N,N), dtype)
t = jax.random.normal(jax.random.PRNGKey(1), (N,N), dtype)
fr, fc = make_call(roll_r), make_call(roll_c)
r1 = fr(u,t).block_until_ready(); r2 = fc(u,t).block_until_ready()
print("variants agree:", float(jnp.max(jnp.abs(r1-r2))), flush=True)

def chain(f):
    @jax.jit
    def run(tt):
        def body(c, _):
            return f(u, c) * 0.1, None
        out, _ = jax.lax.scan(body, tt, None, length=200)
        return out
    return run
cr, cc = chain(fr), chain(fc)
cr(t).block_until_ready(); cc(t).block_until_ready()
for name, c in [("pltpu.roll", cr), ("concat", cc), ("pltpu.roll2", cr), ("concat2", cc)]:
    ts=[]
    for _ in range(7):
        t0=time.perf_counter(); c(t).block_until_ready(); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)/200*1e6:.2f} us/apply", flush=True)
