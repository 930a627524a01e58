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


# ---------------------------------------------------------------------------
# xdist stability: long-lived workers accumulate XLA CPU executables until
# the worker segfaults ("node down: Not properly terminated") — observed
# roaming across test files (sensitivities, NLLS, multihost, linesearch).
# Clear the compile caches every N tests per worker; heavyweight files add
# their own per-test clears on top.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_TEST_COUNT = {"n": 0}
_CLEAR_EVERY = 20


@pytest.fixture(autouse=True)
def _periodic_xla_cache_clear():
    yield
    _TEST_COUNT["n"] += 1
    if _TEST_COUNT["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()
