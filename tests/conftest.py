"""Test configuration: force the CPU backend with a virtual 8-device mesh
(the standard JAX analogue of a fake multi-chip slice, SURVEY.md §4) and
enable x64 so golden values match the reference's Float64 tests.

Set ``NLS_TPU_TESTS=1`` to leave the platform alone (real-TPU conformance
runs, tests/test_tpu_conformance.py) — f64 stays off there since the TPU
tier is float32."""

import os

if os.environ.get("NLS_TPU_TESTS", "") == "1":
    import jax  # noqa: F401  (real-hardware run: native backend, f32)
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
