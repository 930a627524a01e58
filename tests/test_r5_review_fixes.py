"""Regression tests for the round-5 end-of-round code-review findings.

Each test pins one confirmed finding from the r5 self-review pass:
  1. _dev_table's trace_state_clean import broke on jax 0.9 and silently
     disabled the device-array table cache (the HTTP-413 / per-execution
     constant-reshipping fix was a no-op).
  2. dryrun shape 5 asserted on non-dividing device counts (gate logic
     only — the full dryrun is driver-run).
  3. NonlinearVerbosity('standard') never created a linear sub-specifier,
     so the 'precond_unavailable' class added to the linear 'standard'
     preset could not fire at verbose=True.
  4. device_lu_for's perm fingerprint (weighted sum) collided for
     distinct permutations.
  5. DIA.matvec multiplied out-of-range tail slots — non-finite garbage
     there poisoned the output via 0*inf = NaN.
  6. StaticSelection.apply re-embedded its multi-MB tables per trace.
  7. CSR.rmatvec_fn staged closure (hoists the dia repack).
  8. The assembly-direct DIA jacobian branch was TPU-gated with no test
     hook — _FORCE_DIA_JAC now drives it end-to-end on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import nonlinearsolve_tpu as nls


def _tridiag_csr(n, dtype=np.float64, rng=None):
    d = np.ones(n)
    A = sp.diags([3.0 * d, -d[:-1], -d[:-1]], [0, 1, -1], format="csr")
    if rng is not None:
        A.data = A.data * (1.0 + 0.1 * rng.standard_normal(A.nnz))
    return A


class TestDevTableCache:
    def _plan(self, n=256):
        from nonlinearsolve_tpu.ops.pallas_spmv import EllPlan, _default_rt
        A = _tridiag_csr(n)
        return EllPlan(A.indptr, A.indices.astype(np.int64), n, n,
                       rt=_default_rt(A.indptr, n))

    def test_caches_concrete_array(self):
        from nonlinearsolve_tpu.ops.pallas_spmv import _dev_table
        plan = self._plan()
        a1 = _dev_table(plan, "idx")
        a2 = _dev_table(plan, "idx")
        assert a1 is a2, (
            "concrete table not cached — the r5 finding: the "
            "trace_state_clean import failed on jax 0.9 and the cache "
            "silently never populated")
        assert not isinstance(a1, jax.core.Tracer)
        np.testing.assert_array_equal(np.asarray(a1), plan.idx)

    def test_dtype_variants_cached_separately(self):
        from nonlinearsolve_tpu.ops.pallas_spmv import _dev_table
        plan = self._plan()
        f32 = _dev_table(plan, "valid", jnp.float32)
        f64 = _dev_table(plan, "valid", jnp.float64)
        assert f32.dtype == jnp.float32 and f64.dtype == jnp.float64
        assert _dev_table(plan, "valid", jnp.float32) is f32
        assert _dev_table(plan, "valid", jnp.float64) is f64

    def test_no_tracer_poison(self):
        """A first call under an active trace must NOT poison the cache:
        the traced call returns a tracer, the next eager call still gets
        (and caches) a concrete array."""
        from nonlinearsolve_tpu.ops.pallas_spmv import _dev_table
        plan = self._plan()

        @jax.jit
        def probe(x):
            t = _dev_table(plan, "idx")
            assert isinstance(t, jax.core.Tracer)
            return x + jnp.float64(t.sum())

        probe(jnp.float64(0.0))
        eager = _dev_table(plan, "idx")
        assert not isinstance(eager, jax.core.Tracer)
        assert _dev_table(plan, "idx") is eager


class TestDryrunShape5Gate:
    def test_shape5_size_is_power_of_two(self):
        """The config-5 dryrun shape (2·128²) divides the driver's
        8-mesh but NOT e.g. 6 — the block must skip, not assert (the
        gate `n5 % n_devices == 0` in __graft_entry__)."""
        n5 = 2 * 128 * 128
        assert n5 % 8 == 0
        assert n5 % 6 != 0   # the count that used to AssertionError


class TestVerbosityLinearSubspec:
    def test_standard_creates_linear_subspec(self):
        from nonlinearsolve_tpu.core.verbosity import NonlinearVerbosity
        v = NonlinearVerbosity("standard")
        assert v.linear is not None
        assert v.linear.enabled("precond_unavailable")
        assert v.linear.enabled("krylov_unconverged")
        assert not v.linear.enabled("krylov_breakdown")

    def test_true_maps_to_standard_with_linear(self):
        from nonlinearsolve_tpu.core.verbosity import NonlinearVerbosity
        v = NonlinearVerbosity(True)
        assert v.linear is not None and v.linear.enabled(
            "precond_unavailable")

    def test_none_has_no_linear(self):
        from nonlinearsolve_tpu.core.verbosity import NonlinearVerbosity
        assert NonlinearVerbosity("none").linear is None

    def test_explicit_subspec_wins(self):
        from nonlinearsolve_tpu.core.verbosity import (LinearVerbosity,
                                                       NonlinearVerbosity)
        v = NonlinearVerbosity("standard",
                               linear_verbosity=LinearVerbosity("none"))
        assert not v.linear.enabled("precond_unavailable")

    def test_device_lu_degradation_visible_at_verbose_true(self, capsys):
        """verbose=True + precond='device_lu' on a non-CSR operator J
        must say so on stderr (the r4 ADVICE 'visible degradation' fix,
        dead at its advertised configuration until the subspec fix)."""
        def f(u, p):
            return u ** 3 - jnp.ones_like(u)

        prob = nls.NonlinearProblem(f, jnp.full(4, 0.5))
        sol = nls.solve(
            prob, nls.NewtonRaphson(
                linsolve=nls.LinearSolver(method="gmres",
                                          precond="device_lu")),
            abstol=1e-10, verbose=True)
        assert bool(sol.success)
        err = capsys.readouterr().err
        assert "precond_unavailable" in err
        assert "device_lu" in err


class TestDeviceLuPermFingerprint:
    def test_colliding_perms_get_distinct_cache_keys(self):
        """(2,0,1) and (1,2,0) share the old weighted-sum fingerprint
        (both 5) — they must key separate cache entries now."""
        from nonlinearsolve_tpu.ops import device_lu as dlu
        A = _tridiag_csr(3)
        n_before = len(dlu._DEVICE_LU_CACHE)
        dlu.device_lu_for(A.indptr, A.indices, 3, perm=np.array([2, 0, 1]))
        n_mid = len(dlu._DEVICE_LU_CACHE)
        dlu.device_lu_for(A.indptr, A.indices, 3, perm=np.array([1, 2, 0]))
        n_after = len(dlu._DEVICE_LU_CACHE)
        assert n_mid == n_before + 1
        assert n_after == n_mid + 1, (
            "distinct perms collided onto one device-LU plan cache entry")


class TestDiaGarbageTails:
    def test_matvec_ignores_out_of_range_slots(self):
        from nonlinearsolve_tpu.ops.sparse import DIA
        n = 12
        rng = np.random.default_rng(0)
        offsets = (-3, -1, 0, 2)
        data = rng.standard_normal((len(offsets), n))
        poisoned = data.copy()
        for d, off in enumerate(offsets):
            if off > 0:
                poisoned[d, n - off:] = np.inf
            elif off < 0:
                poisoned[d, :-off] = np.nan
        x = rng.standard_normal(n)
        ref = sp.diags(
            [data[d, max(0, -off):n - max(0, off)] if off >= 0
             else data[d, -off:] for d, off in enumerate(offsets)],
            offsets, shape=(n, n)).toarray()
        A = DIA(jnp.asarray(poisoned), offsets, (n, n))
        y = np.asarray(A.matvec(jnp.asarray(x)))
        assert np.all(np.isfinite(y)), (
            "non-finite out-of-range slots leaked into matvec")
        np.testing.assert_allclose(y, ref @ x, rtol=1e-12)
        yt = np.asarray(A.rmatvec(jnp.asarray(x)))
        assert np.all(np.isfinite(yt))
        np.testing.assert_allclose(yt, ref.T @ x, rtol=1e-12)


class TestSelectionTableCaching:
    def test_apply_tables_are_cached_device_arrays(self):
        """Two eager applies must reuse the same underlying table
        arrays (per-trace jnp.asarray re-embedded them as HLO literals
        — the tunnel reships those per execution)."""
        from nonlinearsolve_tpu.ops import selection as selm
        from nonlinearsolve_tpu.ops.pallas_spmv import _dev_table
        src = np.arange(512, dtype=np.int64)[::-1].copy()
        s = selm.StaticSelection(src, 512)
        vals = jnp.asarray(np.random.default_rng(1).standard_normal(512))
        old = selm._FORCE_PALLAS_SELECT
        selm._FORCE_PALLAS_SELECT = True
        try:
            out = np.asarray(s.apply(vals))
            if s._plan is not None:
                v1 = _dev_table(s._plan, "valid", vals.dtype)
                out2 = np.asarray(s.apply(vals))
                v2 = _dev_table(s._plan, "valid", vals.dtype)
                assert v1 is v2
                np.testing.assert_array_equal(out, out2)
        finally:
            selm._FORCE_PALLAS_SELECT = old
        np.testing.assert_allclose(out, np.asarray(vals)[src])

    def test_xla_fallback_caches_src(self):
        from nonlinearsolve_tpu.ops import selection as selm
        src = np.array([3, 1, 4, 4, 0], np.int64)
        s = selm.StaticSelection(src, 4)   # entry 4 == n_src -> pad
        vals = jnp.asarray([10.0, 11.0, 12.0, 13.0])
        out = np.asarray(s.apply(vals))
        np.testing.assert_allclose(out, [13.0, 11.0, 0.0, 0.0, 10.0])
        assert getattr(s, "_src_dev", None) is not None
        out2 = np.asarray(s.apply(vals))
        np.testing.assert_array_equal(out, out2)


class TestRmatvecFn:
    def test_staged_matches_unstaged_and_dense(self):
        from nonlinearsolve_tpu.ops.sparse import CSR
        rng = np.random.default_rng(2)
        A = sp.random(24, 17, density=0.2, random_state=3, format="csr")
        A.data = rng.standard_normal(A.nnz)
        csr = CSR(jnp.asarray(A.data), A.indices.astype(np.int32),
                  A.indptr.astype(np.int32), A.shape)
        y = jnp.asarray(rng.standard_normal(24))
        ref = A.toarray().T @ np.asarray(y)
        np.testing.assert_allclose(np.asarray(csr.rmatvec(y)), ref,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(csr.rmatvec_fn()(y)), ref,
                                   rtol=1e-12)


class TestForceDiaJacobian:
    def test_dia_jacobian_solve_end_to_end(self, monkeypatch):
        """Drive nls.solve through construct_jacobian's assembly-direct
        DIA branch on CPU: a DIA-typed J must flow through as_matvec
        routing + jacobi preconditioning to convergence (previously only
        reachable on real TPU hardware)."""
        from nonlinearsolve_tpu.core import jacobian as jacm
        from nonlinearsolve_tpu.ops import sparse_jac as sjm
        from nonlinearsolve_tpu.ops.sparse import DIA

        monkeypatch.setattr(jacm, "_FORCE_DIA_JAC", True)
        calls = []
        orig_dia = sjm.ColoredJacobian.dia

        def spy_dia(self, f_flat, u):
            out = orig_dia(self, f_flat, u)
            calls.append(type(out).__name__)
            return out

        monkeypatch.setattr(sjm.ColoredJacobian, "dia", spy_dia)

        n = 64
        rng = np.random.default_rng(4)
        A = _tridiag_csr(n, rng=rng)
        Aj = jnp.asarray(A.toarray())
        b = jnp.asarray(rng.standard_normal(n))

        def f(u, p):
            return Aj @ u + 0.1 * u ** 3 - b

        from nonlinearsolve_tpu.core.autodiff import JacobianPolicy
        prob = nls.NonlinearProblem(f, jnp.zeros(n))
        sol = nls.solve(
            prob,
            nls.NewtonRaphson(
                autodiff=JacobianPolicy(mode="sparse"), concrete_jac=True,
                linsolve=nls.LinearSolver(method="gmres", restart=30,
                                          krylov_maxiter=200,
                                          precond="jacobi")),
            abstol=1e-10, maxiters=30)
        assert bool(sol.success), f"retcode={int(sol.retcode)}"
        assert float(jnp.max(jnp.abs(sol.resid))) < 1e-9
        assert calls and all(c == "DIA" for c in calls), (
            "the assembly-direct DIA branch was not taken "
            f"(dia() calls: {calls})")

        # cross-check the root against the dense-jacobian engine
        sol_dense = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-10)
        np.testing.assert_allclose(np.asarray(sol.u),
                                   np.asarray(sol_dense.u), atol=1e-8)
