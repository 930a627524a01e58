"""Mixed-precision (double-f32) refinement — VERDICT r2 next#1.

The reference's large-system anchor is Float64 at abstol=1e-10
(large_systems.md:141-165); on f32 TPU hardware the same digits come from
error-free-transform arithmetic (ops/doublef32.py) + iterative refinement
(solvers/refinement.py).  These tests certify the library against float64
ground truth on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.ops import doublef32 as dfm


class TestDoubleF32Ops:
    def test_self_check(self):
        assert dfm.self_check()

    def test_two_sum_exact(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal(512) * 1e4, jnp.float32)
        b = jnp.asarray(rng.standard_normal(512), jnp.float32)
        s, e = dfm.two_sum(a, b)
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        want = np.asarray(a, np.float64) + np.asarray(b, np.float64)
        np.testing.assert_array_equal(got, want)    # error-FREE

    def test_two_prod_exact(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.standard_normal(512) * 1e3, jnp.float32)
        b = jnp.asarray(rng.standard_normal(512), jnp.float32)
        p, e = dfm.two_prod(a, b)
        # p + e must equal the exact f64 product of the f32 inputs
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
        np.testing.assert_array_equal(got, exact)

    @pytest.mark.parametrize("op,ref", [
        (dfm.df_add, lambda a, b: a + b),
        (dfm.df_sub, lambda a, b: a - b),
        (dfm.df_mul, lambda a, b: a * b),
        (dfm.df_div, lambda a, b: a / b),
    ])
    def test_df_arithmetic_accuracy(self, op, ref):
        """Double-word ops must hold ~2^-45 relative (vs f32's 2^-24)."""
        rng = np.random.default_rng(7)
        a64 = rng.standard_normal(2048) * 1e3
        b64 = rng.standard_normal(2048) + 2.0   # keep divisors away from 0
        got = dfm.df_value_f64(op(dfm.df_from_f64(a64), dfm.df_from_f64(b64)))
        want = ref(a64, b64)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
        assert rel.max() < 1e-13

    def test_df_ops_jittable(self):
        @jax.jit
        def f(a, b):
            x = dfm.DF(a, jnp.zeros_like(a))
            y = dfm.DF(b, jnp.zeros_like(b))
            return dfm.df_mul(dfm.df_add(x, y), x)

        a = jnp.asarray([1.5, 2.5], jnp.float32)
        b = jnp.asarray([3.0, 4.0], jnp.float32)
        out = f(a, b)
        np.testing.assert_allclose(dfm.df_value_f64(out),
                                   (np.asarray(a, np.float64)
                                    + np.asarray(b)) * np.asarray(a),
                                   rtol=1e-14)

    def test_df_mul_constant_under_jit(self):
        """Regression: XLA CPU rematerializes cheap muls into consumer
        fusions and LLVM contracts ``p + e`` to ``fma(a, b, e)``, which
        double-counts the captured product error (measured 0.07 absolute
        pre-fix on a 1e6-scaled multiply).  The select guard in two_prod
        must keep jit == eager."""
        rng = np.random.default_rng(5)
        u64 = rng.standard_normal(64) * 3
        u32 = jnp.asarray(u64, jnp.float32)
        ulo = jnp.asarray(u64 - np.asarray(u32, np.float64), jnp.float32)
        c = dfm.DF(jnp.asarray(1e6, jnp.float32),
                   jnp.asarray(0.0, jnp.float32))

        def f(h, l):
            return dfm.df_mul(dfm.DF(h, l), c)

        want = u64 * 1e6
        for out in (f(u32, ulo), jax.jit(f)(u32, ulo)):
            err = np.abs(dfm.df_value_f64(out) - want).max()
            # double-word grade: ~1e-14 relative on a 1e6 scale (the
            # contraction bug measured 0.226 absolute here)
            assert err < 1e-5, err

    def test_df_sum_compensated(self):
        """Summing n values of magnitude ~1 with an f32 accumulator loses
        ~eps·n; the compensated reduction must stay at double-word grade."""
        rng = np.random.default_rng(3)
        v64 = rng.standard_normal(100_000)
        got = dfm.df_value_f64(dfm.df_sum(dfm.df_from_f64(v64)))
        want = np.sum(v64)
        assert abs(got - want) / abs(want) < 1e-10


class TestBrusselatorDF32:
    def test_residual_accuracy_vs_f64(self):
        from nonlinearsolve_tpu.models import brusselator
        N = 32
        u32 = brusselator.init_u0(N, jnp.float32)
        p64 = brusselator.default_p(N, jnp.float64)
        fhi, flo = brusselator.brusselator_2d_df32(
            u32, jnp.zeros_like(u32), p64)
        u64 = jnp.asarray(np.asarray(u32, np.float64))
        f64res = np.asarray(brusselator.brusselator_2d(u64, p64))
        err = np.max(np.abs(np.asarray(fhi, np.float64)
                            + np.asarray(flo, np.float64) - f64res))
        scale = np.max(np.abs(f64res))
        # f32 evaluation errs ~1e-2 absolute here; double-f32 must be
        # ~1e-11 (measured 3e-12 at this N)
        assert err < 1e-10 * max(scale, 1.0)


class TestRefineRoot:
    @pytest.mark.slow
    def test_flagship_refinement_to_f64_grade(self):
        """f32 Newton-GMRES root -> refine -> must land ≤1e-8 rel-inf of
        the float64 fixed point (measured 3e-12; bar 1e-8 ≫ the 1e-6
        certification target)."""
        from nonlinearsolve_tpu.models import brusselator
        from nonlinearsolve_tpu.ops.preconditioners import (
            fft_poisson_preconditioner)
        from nonlinearsolve_tpu.solvers.first_order import (
            EisenstatWalkerForcing)

        N = 16
        prob32 = brusselator.make_problem(N, jnp.float32)
        pm = fft_poisson_preconditioner((N, N), alpha=10.0, h=1.0 / (N - 1),
                                        shift=3.0, n_components=2)
        alg = nls.NewtonRaphson(
            linsolve=nls.LinearSolver(method="gmres", restart=16,
                                      krylov_maxiter=100, precond_fn=pm),
            forcing=EisenstatWalkerForcing(eta_0=1e-2, eta_max=1e-2))
        sol32 = nls.solve(prob32, alg, abstol=0.05, maxiters=30)
        assert bool(sol32.success)

        prob64 = brusselator.make_problem(N, jnp.float64)
        pm64 = fft_poisson_preconditioner((N, N), alpha=10.0,
                                          h=1.0 / (N - 1), shift=3.0,
                                          n_components=2)
        alg64 = nls.NewtonRaphson(
            linsolve=nls.LinearSolver(method="gmres", restart=16,
                                      krylov_maxiter=200, precond_fn=pm64),
            forcing=EisenstatWalkerForcing(eta_0=1e-4, eta_max=1e-4))
        sol64 = nls.solve(prob64, alg64, abstol=1e-8, maxiters=50)
        assert bool(sol64.success)
        scale = float(jnp.max(jnp.abs(sol64.u)))

        p64 = brusselator.default_p(N, jnp.float64)
        p32 = brusselator.default_p(N, jnp.float32)

        def residual_df(uh, ul):
            return brusselator.brusselator_2d_df32(uh, ul, p64)

        def jvp_at(uh):
            def mv(v):
                return jax.jvp(
                    lambda U: brusselator.brusselator_2d(U, p32),
                    (uh,), (v,))[1]
            return mv

        res = nls.refine_root(sol32.u, residual_df, jvp_at, rounds=3,
                              inner_rtol=1e-2, restart=16, precond_fn=pm)
        u_ref = (np.asarray(res.u.hi, np.float64)
                 + np.asarray(res.u.lo, np.float64))
        err_before = float(np.max(np.abs(
            np.asarray(sol32.u, np.float64) - np.asarray(sol64.u)))) / scale
        err_after = float(np.max(np.abs(
            u_ref - np.asarray(sol64.u)))) / scale
        assert err_after < 1e-8, (err_before, err_after)
        assert err_after < err_before / 10.0
        # the refined defect itself must certify double-word convergence
        assert float(res.defect_norm) < 1e-6


class TestDFEval:
    """Generic jaxpr-interpreted double-f32 evaluation
    (ops/doublef32_eval.py): ANY polynomial/rational residual gets a
    double-word defect without a hand-written variant."""

    def _split(self, v64):
        hi = jnp.asarray(v64, jnp.float32)
        lo = jnp.asarray(v64 - np.asarray(hi, np.float64), jnp.float32)
        return dfm.DF(hi, lo)

    def test_matches_f64_on_mixed_expression(self):
        from nonlinearsolve_tpu.ops.doublef32_eval import df_eval

        def f(u):
            w = jnp.roll(u, 1) + jnp.roll(u, -1) - 2.0 * u
            return (1e6 * w + u ** 3 * 2.5
                    - jnp.sqrt(jnp.abs(u) + 1.0)
                    + jnp.sum(u ** 2) / (1.0 + u ** 2))

        rng = np.random.default_rng(0)
        u64 = rng.standard_normal(128) * 3
        want = np.asarray(f(jnp.asarray(u64)))
        scale = np.abs(want).max()
        d = self._split(u64)
        eager = dfm.df_value_f64(df_eval(f, d))
        jitted = dfm.df_value_f64(
            jax.jit(lambda h, l: df_eval(f, dfm.DF(h, l)))(d.hi, d.lo))
        assert np.abs(eager - want).max() < 1e-12 * scale
        assert np.abs(jitted - want).max() < 1e-12 * scale

    def test_jit_matches_eager(self):
        from nonlinearsolve_tpu.ops.doublef32_eval import df_eval

        def f(u):
            return 1e6 * (jnp.roll(u, 1) - u) + u ** 3

        rng = np.random.default_rng(1)
        u64 = rng.standard_normal(64)
        d = self._split(u64)
        eager = dfm.df_value_f64(df_eval(f, d))
        jitted = dfm.df_value_f64(
            jax.jit(lambda h, l: df_eval(f, dfm.DF(h, l)))(d.hi, d.lo))
        want = np.asarray(f(jnp.asarray(u64)))
        # ~1e-14 relative on the ~1e6 scale (f32 evaluation errs ~0.1 here)
        assert np.abs(eager - want).max() < 1e-7
        assert np.abs(jitted - want).max() < 1e-7

    def test_generic_matches_handwritten_brusselator(self):
        """The generic interpreter must agree with the HAND-WRITTEN df32
        residual away from the forcing-disc boundary.  (At the boundary
        the two legitimately differ: df_eval promotes the arithmetic of
        the traced f32 function — whose grid constants are f32-rounded —
        while the hand-written variant bakes exact-f64 constants, so the
        `<= 0.01` disc mask can flip at a boundary grid point.  That is a
        property of the constants, not an interpreter defect.)"""
        from nonlinearsolve_tpu.models import brusselator
        from nonlinearsolve_tpu.ops.doublef32_eval import df_eval
        N = 16
        U32 = brusselator.init_u0(N, jnp.float32)
        p64 = np.array([3.4, 1.0, 10.0, 1.0 / (N - 1)], np.float64)
        p_df = self._split(p64)
        out = df_eval(brusselator.brusselator_2d,
                      dfm.DF(U32, jnp.zeros_like(U32)), p_df)
        got = dfm.df_value_f64(out)
        hhi, hlo = brusselator.brusselator_2d_df32(
            U32, jnp.zeros_like(U32), p64)
        hand = np.asarray(hhi, np.float64) + np.asarray(hlo, np.float64)
        diff = np.abs(got - hand)
        # mask out force-disc boundary flips (exactly ±5.0 if any)
        agree = diff < 2.0
        assert agree.mean() > 0.99
        assert diff[agree].max() < 1e-9

    def test_unsupported_primitive_message(self):
        from nonlinearsolve_tpu.ops.doublef32_eval import df_eval
        with pytest.raises(NotImplementedError, match="register a rule"):
            df_eval(lambda u: jnp.tanh(u), self._split(np.ones(4)))

    def test_custom_rule_registry(self):
        import jax.lax as lax
        from nonlinearsolve_tpu.ops import doublef32_eval as dfe

        # first-order-corrected exp: hi = exp(x.hi), lo = exp(x.hi)*x.lo
        def exp_rule(eqn, x):
            x = dfe._as_df(x)
            h = jnp.exp(x.hi)
            return dfm.DF(h, h * x.lo)

        prev = dfe._DF_RULES.get(lax.exp_p)   # default double-word rule
        dfe.register_df_rule(lax.exp_p, exp_rule)
        try:
            out = dfe.df_eval(lambda u: jnp.exp(u) * 2.0,
                              self._split(np.array([0.5, 1.5])))
            got = dfm.df_value_f64(out)
            want = np.exp([0.5, 1.5]) * 2.0
            assert np.abs(got - want).max() < 1e-6
        finally:
            if prev is not None:
                dfe._DF_RULES[lax.exp_p] = prev
            else:
                dfe._DF_RULES.pop(lax.exp_p, None)

    def test_refine_with_generic_defect(self):
        """End-to-end: refine_root fed by df_eval (no hand-written df32
        residual) reaches the same double-word grade."""
        from nonlinearsolve_tpu.ops.doublef32_eval import df_eval
        rng = np.random.default_rng(3)
        n = 64
        b64 = rng.standard_normal(n)
        b32 = jnp.asarray(b64, jnp.float32)

        def f32res(u, p=None):
            return u ** 3 + u - b32

        prob = nls.NonlinearProblem(f32res, jnp.zeros(n, jnp.float32))
        sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-4)
        assert bool(sol.success)

        b_df = self._split(b64)

        def residual_df(uh, ul):
            out = df_eval(lambda u, bb: u ** 3 + u - bb,
                          dfm.DF(uh, ul), b_df)
            return out.hi, out.lo

        def jvp_at(uh):
            return lambda v: (3.0 * uh ** 2 + 1.0) * v

        res = nls.refine_root(sol.u, residual_df, jvp_at, rounds=3)
        u_ref = dfm.df_value_f64(res.u)
        resid = np.abs(u_ref ** 3 + u_ref - b64).max()
        assert resid < 1e-11        # double-word grade (measured 1.1e-12)


class TestAutoRefine:
    def test_one_call_refinement(self):
        """nls.auto_refine: the double-f32 defect comes from the jaxpr
        interpreter automatically — no hand-written residual."""
        rng = np.random.default_rng(0)
        n = 64
        b32 = jnp.asarray(rng.standard_normal(n), jnp.float32)
        prob = nls.NonlinearProblem(lambda u, p: u ** 3 + p * u - b32,
                                    jnp.zeros(n, jnp.float32),
                                    jnp.asarray(1.0, jnp.float32))
        sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-4)
        assert bool(sol.success)
        res = nls.auto_refine(prob, sol.u, rounds=3)
        u_ref = dfm.df_value_f64(res.u)
        b = np.asarray(b32, np.float64)
        before = np.abs(np.asarray(sol.u, np.float64) ** 3
                        + np.asarray(sol.u, np.float64) - b).max()
        after = np.abs(u_ref ** 3 + u_ref - b).max()
        assert after < 1e-12 and after < before / 1e4

    def test_uses_analytic_jvp_when_present(self):
        calls = {"n": 0}

        def jvp(v, u, p):
            calls["n"] += 1
            return (3.0 * u ** 2 + 1.0) * v

        rng = np.random.default_rng(1)
        b32 = jnp.asarray(rng.standard_normal(16), jnp.float32)
        f = nls.NonlinearFunction(f=lambda u, p: u ** 3 + u - b32, jvp=jvp)
        prob = nls.NonlinearProblem(f, jnp.zeros(16, jnp.float32))
        sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-4)
        res = nls.auto_refine(prob, sol.u, rounds=2)
        assert calls["n"] > 0
        assert float(res.defect_norm) < 1e-10

    def test_transcendental_guidance(self):
        # tanh has no double-word rule — the evaluator must still raise
        # with guidance (exp/log/sin/cos are real double-word rules now)
        prob = nls.NonlinearProblem(lambda u, p: jnp.tanh(u) - 0.5,
                                    jnp.zeros(4, jnp.float32))
        sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-4)
        with pytest.raises(NotImplementedError, match="register a rule"):
            nls.auto_refine(prob, sol.u, rounds=1)

    def test_exp_residual_refines_full_grade(self):
        """exp is a GENUINE double-word rule (r4): an e^u residual
        refines to double-word defect without any opt-in."""
        prob = nls.NonlinearProblem(lambda u, p: jnp.exp(u) - 2.0,
                                    jnp.zeros(4, jnp.float32))
        sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-4)
        res = nls.auto_refine(prob, sol.u, rounds=3)
        u_ref = dfm.df_value_f64(res.u)
        assert np.max(np.abs(u_ref - np.log(2.0))) < 1e-12

    def test_bratu_certifies_to_reference_anchor(self):
        """VERDICT r3 next#4 acceptance: auto_refine on Bratu 32² (e^u
        residual — the reference large_systems.md Float64@1e-10 anchor
        class) reaches ≤1e-9 rel-inf vs an f64-CPU polish."""
        from nonlinearsolve_tpu.models import bratu
        N = 32
        prob32 = bratu.make_problem(N, dtype=jnp.float32)
        alg = nls.NewtonRaphson(
            linsolve=nls.LinearSolver(method="gmres", restart=32))
        # abstol at the f32 noise floor (tighter stalls — that is the
        # refinement's raison d'etre)
        sol = nls.solve(prob32, alg, abstol=1e-3, maxiters=50)
        assert bool(sol.success)
        res = nls.auto_refine(prob32, sol.u, rounds=4)
        u_ref = dfm.df_value_f64(res.u)
        # f64 ground truth on the CPU backend
        prob64 = bratu.make_problem(N, dtype=jnp.float64)
        sol64 = nls.solve(prob64, nls.NewtonRaphson(), abstol=1e-12,
                          maxiters=100)
        u64 = np.asarray(sol64.u, np.float64)
        rel_inf = np.max(np.abs(u_ref - u64)) / np.max(np.abs(u64))
        fast_rel = np.max(np.abs(np.asarray(sol.u, np.float64) - u64)) \
            / np.max(np.abs(u64))
        assert rel_inf < 1e-9
        assert rel_inf < fast_rel / 10.0

    def test_auto_refine_3d_reaction_diffusion(self):
        """Config-5 model family: the 3D RD residual is polynomial, so
        auto_refine certifies it with zero extra code."""
        from nonlinearsolve_tpu.models import reaction_diffusion
        N = 8
        prob = reaction_diffusion.make_problem(N, dtype=jnp.float32)
        sol = nls.solve(prob, nls.NewtonRaphson(
            linsolve=nls.LinearSolver(method="gmres", restart=16)),
            abstol=1e-3, maxiters=50)
        assert bool(sol.success)
        res = nls.auto_refine(prob, sol.u, rounds=3)
        d_before = float(jnp.max(jnp.abs(sol.resid)))
        d_after = float(res.defect_norm)
        assert d_after < 1e-8
        assert d_after < d_before

    def test_first_order_transcendentals(self):
        """Opt-in exp/log/sin rules: the transcendental TERM stays
        f32-grade while the scaled terms reach double-word — enough when
        the f32 stall came from scaling (measured 0.023 -> 6.4e-7 here)."""
        rng = np.random.default_rng(0)
        n = 32
        b32 = jnp.asarray(rng.uniform(1.0, 3.0, n) * 1e5, jnp.float32)
        prob = nls.NonlinearProblem(
            lambda u, p: jnp.exp(u) + 1e5 * u - b32,
            jnp.zeros(n, jnp.float32))
        sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-1)
        assert bool(sol.success)
        res = nls.auto_refine(prob, sol.u, rounds=3,
                              first_order_transcendentals=True)
        u_ref = dfm.df_value_f64(res.u)
        b64 = np.asarray(b32, np.float64)
        before = np.abs(np.exp(np.asarray(sol.u, np.float64))
                        + 1e5 * np.asarray(sol.u, np.float64) - b64).max()
        after = np.abs(np.exp(u_ref) + 1e5 * u_ref - b64).max()
        assert after < 1e-5 and after < before / 100

    def test_dot_general_double_word_rule(self):
        """A @ x in df_eval is genuinely double-word (error-free products
        + compensated fold), not a split-matmul approximation."""
        from nonlinearsolve_tpu.ops.doublef32_eval import df_eval
        def split(v64):
            hi = jnp.asarray(v64, jnp.float32)
            lo = jnp.asarray(v64 - np.asarray(hi, np.float64), jnp.float32)
            return dfm.DF(hi, lo)

        rng = np.random.default_rng(0)
        A64 = rng.standard_normal((48, 24)) * 10
        x64 = rng.standard_normal(24)
        out = df_eval(lambda A, x: A @ x, split(A64), split(x64))
        got = dfm.df_value_f64(out)
        want = A64 @ x64
        f32err = np.abs(np.asarray(
            jnp.asarray(A64, jnp.float32) @ jnp.asarray(x64, jnp.float32),
            np.float64) - want).max()
        dferr = np.abs(got - want).max()
        assert dferr < 1e-10 and dferr < f32err / 1e4

    def test_nlls_refinement_gauss_newton(self):
        """Least-squares refinement (r3): vjp_at triggers Gauss-Newton
        normal-equation corrections; a zero-residual NLLS problem refines
        well below the 1e-6 certification bar."""
        import scipy.optimize as so
        rng = np.random.default_rng(0)
        n, m = 24, 48
        A64 = rng.standard_normal((m, n)) * 10
        u_star = rng.standard_normal(n)
        y = A64 @ u_star
        b64 = y + 0.1 * y ** 3
        A32 = jnp.asarray(A64, jnp.float32)
        b32 = jnp.asarray(b64, jnp.float32)

        def f(u, p):
            w = A32 @ u
            return w + 0.1 * w ** 3 - b32

        prob = nls.NonlinearLeastSquaresProblem(f, jnp.zeros(n, jnp.float32))
        sol = nls.solve(prob, nls.GaussNewton(), abstol=1e-3, maxiters=100)
        assert bool(sol.success)
        res = nls.auto_refine(prob, sol.u, rounds=4)
        u_ref = dfm.df_value_f64(res.u)
        # ground truth of the f32-exact problem
        A_ex = np.asarray(A32, np.float64)
        b_ex = np.asarray(b32, np.float64)
        r = so.least_squares(
            lambda u: A_ex @ u + 0.1 * (A_ex @ u) ** 3 - b_ex,
            np.asarray(sol.u, np.float64), xtol=1e-15, ftol=1e-15)
        before = np.abs(np.asarray(sol.u, np.float64) - r.x).max()
        after = np.abs(u_ref - r.x).max()
        assert after < 1e-7          # measured 8e-9
        assert after < before / 10


def test_df_eval_pow_zero_base_and_small_expm1_log1p():
    """r4 review fixes: pow at base 0 must not NaN-poison the defect
    (exp(y*log 0)); expm1/log1p at small arguments keep double-word
    relative accuracy (series kernels, not exp(x)-1 / log(1+x))."""
    import numpy as np
    from nonlinearsolve_tpu.ops.doublef32 import (DF, df_expm1, df_log1p,
                                                  df_value_f64)
    from nonlinearsolve_tpu.ops.doublef32_eval import df_eval

    u = jnp.asarray(np.array([0.0, 1.0, 4.0], np.float32))
    out = df_eval(lambda v: v ** jnp.asarray(1.5, v.dtype), u)
    np.testing.assert_allclose(np.asarray(df_value_f64(out)),
                               [0.0, 1.0, 8.0], atol=1e-12)

    # includes probes straddling df_log1p's series/log switch at 0.05
    # (ADVICE r4: at the old 0.1 switch the Mercator truncation ~x^(N+1)
    # missed the f32-pair grade near the boundary)
    xs = np.array([1e-10, 1e-6, 1e-3, 0.02, 0.0499, 0.05, 0.0501, 0.09,
                   0.0999, 0.3, 2.0, -1e-8, -0.0499, -0.0501, -0.09,
                   -0.4], np.float32)
    x = DF(jnp.asarray(xs), jnp.zeros(xs.shape, jnp.float32))
    rel = np.abs((np.asarray(df_value_f64(df_expm1(x)))
                  - np.expm1(xs.astype(np.float64)))
                 / np.expm1(xs.astype(np.float64)))
    assert rel.max() < 1e-13
    rel2 = np.abs((np.asarray(df_value_f64(df_log1p(x)))
                   - np.log1p(xs.astype(np.float64)))
                  / np.log1p(xs.astype(np.float64)))
    assert rel2.max() < 1e-13


def test_trace_wide_auto_guard():
    """r5 (VERDICT r4 next#7): a dtype-introspecting residual under the
    wide f64 trace embeds different constants than the f32 function
    being certified — df_eval now detects the mismatch (dual trace +
    constant comparison), warns, and falls back to the narrow trace;
    well-behaved residuals keep the wide trace silently."""
    import warnings

    import numpy as np
    from nonlinearsolve_tpu.ops.doublef32 import DF, df_value_f64
    from nonlinearsolve_tpu.ops.doublef32_eval import df_eval

    u32 = jnp.asarray(np.linspace(0.1, 0.2, 16), jnp.float32)
    h = 1.0 / 31.0

    def resid(u):
        return (u - 0.3) / (h * h) + u * u

    with warnings.catch_warnings():
        warnings.simplefilter("error")       # wide path: no warning
        out = df_eval(resid, DF(u32, jnp.zeros_like(u32)))
    u64 = np.asarray(u32, np.float64)
    ref = (u64 - 0.3) / (h * h) + u64 * u64
    assert np.abs(np.asarray(df_value_f64(out)) - ref).max() < 1e-9

    def resid_introspect(u):
        return u * u + jnp.finfo(u.dtype).eps

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out2 = df_eval(resid_introspect, DF(u32, jnp.zeros_like(u32)))
    assert any("narrow" in str(w.message) for w in rec)
    ref2 = u64 * u64 + np.finfo(np.float32).eps   # the F32 constant
    assert np.abs(np.asarray(df_value_f64(out2)) - ref2).max() < 1e-12
    # explicit trace_wide=False stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        df_eval(resid_introspect, DF(u32, jnp.zeros_like(u32)),
                trace_wide=False)
