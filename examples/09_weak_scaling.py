"""Weak-scaling harness — config 5's multi-chip half (BASELINE.md).

Measures SpMV (stencil-JVP) throughput of the 3D reaction-diffusion
Jacobian with a per-device-constant slab, sharded over a growing device
mesh (GSPMD halo exchange, optionally the explicit shard_map + Pallas
halo kernel tier).  The BASELINE target is ≥80% nnz/s efficiency from
1 chip to a multi-host slice.

On this environment only ONE real TPU chip is reachable, so the default
run validates topology/compilation on an 8-way virtual CPU mesh — NOT a
hardware number; on a real slice the same code produces the hardware
curve:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/09_weak_scaling.py
    python examples/09_weak_scaling.py --pallas    # shard_map+Pallas tier
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    if jax.device_count() == 1 and jax.default_backend() == "cpu":
        print("NOTE: single device — set "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8 for the "
              "virtual-mesh validation run.")

    from nonlinearsolve_tpu.parallel.scaling import weak_scaling_report

    use_pallas = "--pallas" in sys.argv
    counts = [1, 2, 4, 8]
    rows = weak_scaling_report(counts, base_n=32, n_matvecs=50,
                               use_pallas=use_pallas)
    kind = "shard_map+Pallas halo" if use_pallas else "GSPMD"
    print(f"weak scaling ({kind}; per-device slab 32x32x32, 7-pt stencil)")
    print(f"{'devices':>8s} {'Gnnz/s':>10s} {'efficiency':>11s}")
    for k, rate, eff in rows:
        print(f"{k:8d} {rate/1e9:10.2f} {eff:10.1%}")
    if jax.default_backend() == "cpu":
        print("(virtual CPU mesh: collective/topology validation only — "
              "efficiencies are not hardware numbers)")
    # Driver-format record (BASELINE: >=80% nnz/s weak-scaling efficiency
    # 1 chip -> multi-host) so a real-hardware run is turnkey.
    import json
    if rows:
        k, rate, eff = rows[-1]
        print(json.dumps({
            "metric": "rd3d_weak_scaling_efficiency",
            "value": eff,
            "unit": f"nnz/s efficiency at {k} devices vs 1 "
                    f"({rate / 1e9:.2f} Gnnz/s aggregate; {kind}; "
                    f"{'VIRTUAL cpu mesh - not a hardware number' if jax.default_backend() == 'cpu' else 'hardware'})",
            "vs_baseline": eff / 0.80,
        }))


if __name__ == "__main__":
    main()
