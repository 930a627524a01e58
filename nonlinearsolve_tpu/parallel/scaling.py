"""Weak-scaling measurement harness.

North-star metric (BASELINE.json): ≥80% SpMV nnz/s weak-scaling efficiency
from 1 chip to a multi-host slice.  This harness measures nnz/s of the 3D
reaction–diffusion Jacobian operator with a per-device-constant grid slab,
sharded over a growing device mesh (GSPMD halo exchange on the sharded
axis).  On the single-real-chip environment it runs on the virtual CPU mesh
— a topology/compilation validation, not a hardware number; on a real slice
the same code produces the hardware curve.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.reaction_diffusion import reaction_diffusion_3d, forcing
from .mesh import create_mesh


def weak_scaling_report(device_counts: Sequence[int], base_n: int = 32,
                        n_matvecs: int = 50, dtype=jnp.float32,
                        devices=None, use_pallas: bool = False, bz: int = 8):
    """Per-device slab of base_n × base_n² grid points; returns
    [(k, nnz_per_s, efficiency_vs_1)].

    ``use_pallas`` switches the per-shard operator from the GSPMD
    jax.linearize tier to the explicit shard_map + blocked-VMEM-kernel
    tier (``sharded_rd3d_jvp_pallas_factory``) — the same collective
    pattern, hand-scheduled."""
    results = []
    base_rate = None
    all_devices = list(devices if devices is not None else jax.devices())
    for k in device_counts:
        if k > len(all_devices):
            break
        mesh = create_mesh((k,), ("x",), devices=all_devices[:k])
        N0 = base_n * k          # leading axis grows with devices
        u = jnp.full((N0, base_n, base_n), 0.1, dtype)
        p = (jnp.asarray(0.01, dtype),
             jnp.zeros((N0, base_n, base_n), dtype))
        sharding = NamedSharding(mesh, P("x", None, None))
        u = jax.device_put(u, sharding)
        p = (jax.device_put(p[0], NamedSharding(mesh, P())),
             jax.device_put(p[1], sharding))

        if use_pallas:
            from .distributed import sharded_rd3d_jvp_pallas_factory
            bz_k = bz
            while base_n % bz_k:
                bz_k //= 2
            jvp = sharded_rd3d_jvp_pallas_factory(
                mesh, float(p[0]), N0, bz=max(bz_k, 1))
            lin = lambda t: jvp(u, t)
        else:
            _, lin = jax.linearize(lambda x: reaction_diffusion_3d(x, p), u)

        @jax.jit
        def chain(v):
            def body(c, _):
                return lin(c) * 1e-3, None
            return jax.lax.scan(body, v, None, length=n_matvecs)[0]

        v0 = jnp.ones_like(u)
        chain(v0).block_until_ready()
        t0 = time.perf_counter()
        out = chain(v0)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        nnz = 7 * N0 * base_n * base_n      # 7-point stencil
        rate = n_matvecs * nnz / dt
        if base_rate is None:
            base_rate = rate / k if k > 0 else rate
        eff = rate / (base_rate * k)
        results.append((k, rate, eff))
    return results


def weak_scaling_sparse_report(device_counts: Sequence[int],
                               rows_per_device: int = 4096,
                               n_matvecs: int = 50, dtype=jnp.float32,
                               devices=None):
    """Weak scaling of the row-partitioned GENERAL-sparse operator
    (parallel/sparse_dist.py — the PETSc distributed-MatMult role): each
    device owns ``rows_per_device`` rows of a banded-plus-noise CSR whose
    halo rides the ppermute ring.  Same report shape as
    :func:`weak_scaling_report` so the multi-host runner consumes either."""
    import numpy as np
    import scipy.sparse as sp
    from jax.sharding import Mesh
    from ..ops.sparse import CSR
    from .sparse_dist import make_sharded_csr_matvec

    results = []
    base_rate = None
    all_devices = list(devices if devices is not None else jax.devices())
    rng = np.random.default_rng(0)
    for k in device_counts:
        if k > len(all_devices):
            break
        mesh = Mesh(np.array(all_devices[:k]), ("x",))
        n = rows_per_device * k
        Ng = max(int(np.sqrt(n)), 2)
        d = np.ones(n)
        A = sp.diags([d * 4, -d[:-1], -d[:-1], -d[:-Ng], -d[:-Ng]],
                     [0, 1, -1, Ng, -Ng], format="csr")
        A.data = A.data * (1 + 0.1 * rng.standard_normal(A.nnz))
        csr = CSR(jnp.asarray(A.data, dtype),
                  np.asarray(A.indices, np.int32),
                  np.asarray(A.indptr, np.int32), (n, n))
        mv = make_sharded_csr_matvec(csr, mesh, "x")

        @jax.jit
        def chain(v, mv=mv):
            def body(c, _):
                w = mv(c)
                return w / jnp.maximum(jnp.max(jnp.abs(w)), 1.0), None
            return jax.lax.scan(body, v, None, length=n_matvecs)[0]

        v0 = jnp.ones((n,), dtype)
        chain(v0).block_until_ready()
        t0 = time.perf_counter()
        chain(v0).block_until_ready()
        dt = time.perf_counter() - t0
        rate = n_matvecs * A.nnz / dt
        if base_rate is None:
            base_rate = rate / k
        eff = rate / (base_rate * k)
        results.append((k, rate, eff))
    return results
