"""Real-TPU solver conformance — the reference's GPU-array test, TPU-native.

Mirrors /root/reference/test/gpu/cuda_tests__item1.jl:1-60: the same ten
solver configurations solve the affine residual ``f(u) = A u + b`` on device
arrays at ``abstol = reltol = 1e-5`` in float32, plus the Broyden
inverse-initialization residual check (‖A u* + b‖ < 1e-4).

Assertion strength follows the reference: its ten-config sweep is
``@test_nowarn`` — the solve must complete cleanly (here: finite iterate, a
retcode from the documented taxonomy), with the residual asserted only in
the Broyden-inverse-init testset.  We additionally assert the residual for
the configs that do converge on this fixture (Newton/TR/LM/DFSane/Broyden
tiers); PseudoTransient (SER ramp from α=1e-3 needs ≫1000 iterations when
min Re λ(A) is small), diagonal Klement and threshold-2 L-Broyden stall on
dense random systems — in the reference too, which is why it never asserts
their residuals.

Like the reference (gated on ``CUDA.functional()``), this file only runs on
real hardware: launch with ``NLS_TPU_TESTS=1 python -m pytest
tests/test_tpu_conformance.py`` on a TPU-attached host; under the CPU CI
conftest it skips.  No mock backend — skipping without hardware is the
reference's own policy (SURVEY.md §4.5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nonlinearsolve_tpu as nls

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real-TPU conformance test (set NLS_TPU_TESTS=1 on TPU hardware)")


def _fixture():
    rng = np.random.RandomState(0)           # StableRNG(0) analogue
    A = jnp.asarray(rng.rand(4, 4), jnp.float32)
    u0 = jnp.asarray(rng.rand(4), jnp.float32)
    b = jnp.asarray(rng.rand(4), jnp.float32)
    prob = nls.NonlinearProblem(lambda u, p: A @ u + b, u0)
    return A, b, prob


def _solvers():
    qr = nls.LinearSolver(method="qr")
    gmres = nls.LinearSolver(method="gmres")
    # (name, alg, assert_residual) — residual asserted where this fixture
    # genuinely converges; the rest mirror the reference's @test_nowarn.
    return [
        ("NewtonRaphson", nls.NewtonRaphson(), True),
        ("LM-QR", nls.LevenbergMarquardt(linsolve=qr), True),
        ("LM-GMRES", nls.LevenbergMarquardt(linsolve=gmres), True),
        ("PseudoTransient", nls.PseudoTransient(), False),
        ("Klement", nls.Klement(), False),
        ("Broyden-LiFukushima",
         nls.Broyden(linesearch=nls.LiFukushimaLineSearch()), True),
        ("LBroyden-LiFukushima",
         nls.LimitedMemoryBroyden(threshold=2,
                                  linesearch=nls.LiFukushimaLineSearch()),
         False),
        ("DFSane", nls.DFSane(), True),
        ("TrustRegion-QR", nls.TrustRegion(linsolve=qr), True),
        ("TrustRegion-GMRES",
         nls.TrustRegion(linsolve=gmres,
                         autodiff=nls.JacobianPolicy(mode="forward")), True),
    ]


@pytest.mark.parametrize("name,alg,check_resid", _solvers(),
                         ids=[s[0] for s in _solvers()])
def test_tpu_solvers(name, alg, check_resid):
    A, b, prob = _fixture()
    sol = nls.solve(prob, alg, abstol=1e-5, reltol=1e-5)
    assert bool(jnp.all(jnp.isfinite(sol.u))), f"{name}: non-finite iterate"
    assert int(sol.retcode) in {int(c) for c in nls.ReturnCode}
    if check_resid:
        resid = float(jnp.linalg.norm(A @ sol.u + b))
        assert resid < 1e-4, f"{name}: |Au*+b| = {resid:.2e}"


def test_broyden_inverse_initialization():
    A, b, prob = _fixture()
    sol = nls.solve(prob, nls.Broyden(linesearch=nls.LiFukushimaLineSearch()),
                    abstol=1e-5, reltol=1e-5)
    assert float(jnp.linalg.norm(A @ sol.u + b)) < 1e-4


def test_doublef32_exact_on_chip():
    """The error-free f32 transforms must hold on the REAL backend —
    catches any hardware/compiler combination that contracts or
    reassociates the compensation terms away (the CPU-LLVM fma hazard,
    fixed r3, had exactly this signature)."""
    import numpy as np
    from nonlinearsolve_tpu.ops import doublef32 as dfm
    assert dfm.self_check()
    # the jit-fused constant-multiply pattern that broke on CPU pre-fix
    rng = np.random.default_rng(5)
    u64 = rng.standard_normal(64) * 3
    u32 = jnp.asarray(u64, jnp.float32)
    ulo = jnp.asarray(u64 - np.asarray(u32, np.float64), jnp.float32)
    c = dfm.DF(jnp.asarray(1e6, jnp.float32), jnp.asarray(0.0, jnp.float32))
    out = jax.jit(lambda h, l: dfm.df_mul(dfm.DF(h, l), c))(u32, ulo)
    err = np.abs(dfm.df_value_f64(out) - u64 * 1e6).max()
    assert err < 1e-5, err


def test_refinement_certifies_root_on_chip():
    """f32 solve + double-f32 refinement on the real chip: the refined
    defect must drop to the double-word floor (the bench's golden
    subprocess certifies the 512^2 root against f64; this is the small
    self-contained conformance version)."""
    import numpy as np
    from nonlinearsolve_tpu.models import brusselator
    from nonlinearsolve_tpu.ops.preconditioners import (
        fft_poisson_preconditioner)
    from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing

    N = 32
    prob = brusselator.make_problem(N, jnp.float32)
    pm = fft_poisson_preconditioner((N, N), alpha=10.0, h=1.0 / (N - 1),
                                    shift=3.0, n_components=2)
    alg = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=16,
                                  krylov_maxiter=100, precond_fn=pm),
        forcing=EisenstatWalkerForcing(eta_0=1e-2, eta_max=1e-2))
    sol = nls.solve(prob, alg, abstol=0.1, maxiters=30)
    assert bool(sol.success)
    p64 = np.array([3.4, 1.0, 10.0, 1.0 / (N - 1)], np.float64)
    p32 = brusselator.default_p(N, jnp.float32)

    res = nls.refine_root(
        sol.u,
        lambda uh, ul: brusselator.brusselator_2d_df32(uh, ul, p64),
        lambda uh: (lambda v: jax.jvp(
            lambda U: brusselator.brusselator_2d(U, p32), (uh,), (v,))[1]),
        rounds=3, inner_rtol=1e-2, restart=16, precond_fn=pm)
    # |f0| scale here ~1e4: double-word defect floor is ~1e-9 relative
    defect = float(res.defect_norm)
    assert defect < 1e-3, defect
    # and the refinement must have moved the iterate (fast root is only
    # f32-noise-floor accurate)
    assert defect < 0.01 * float(jnp.max(jnp.abs(sol.resid)))


def test_staged_csr_matvec_newton_on_chip():
    """Concrete-sparse Newton-GMRES on the REAL chip through the staged
    Pallas matvec (as_matvec -> CSR.matvec_fn): an assembled banded
    Jacobian drives the Krylov loop without per-iteration repacking."""
    import numpy as np
    import scipy.sparse as sp
    from nonlinearsolve_tpu.ops.sparse import CSR

    rng = np.random.default_rng(2)
    Ng = 64
    n = Ng * Ng
    d = np.ones(n)
    A = sp.diags([d * 4, -d[:-1], -d[:-1], -d[:-Ng], -d[:-Ng]],
                 [0, 1, -1, Ng, -Ng], format="csr")
    A.data = A.data * (1 + 0.05 * rng.standard_normal(A.nnz))
    csr = CSR(jnp.asarray(A.data, jnp.float32),
              np.asarray(A.indices, np.int32),
              np.asarray(A.indptr, np.int32), (n, n))
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    mv = csr.matvec_fn()               # staged Pallas closure on TPU

    prob = nls.NonlinearProblem(
        nls.NonlinearFunction(
            f=lambda u, p: mv(u) + 0.1 * u ** 3 - b,
            jvp=lambda v, u, p: mv(v) + 0.3 * u ** 2 * v),
        jnp.zeros(n, jnp.float32))
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=30,
                                  krylov_maxiter=600)),
        abstol=1e-4, maxiters=50)
    assert bool(sol.success)
    resid = np.abs(A @ np.asarray(sol.u, np.float64)
                   + 0.1 * np.asarray(sol.u, np.float64) ** 3
                   - np.asarray(b, np.float64)).max()
    assert resid < 1e-3


def test_bratu_exp_refinement_on_chip():
    """r4 conformance: Bratu 32² (e^u residual) auto-refines ON-CHIP to
    the reference's Float64@1e-10-grade anchor (large_systems.md) via the
    genuine double-word exp rule + wide-trace literals — ≤1e-9 rel-inf
    vs the f64-CPU polish (computed in a subprocess on the CPU backend)."""
    import json
    import os
    import subprocess
    import sys

    import numpy as np
    from nonlinearsolve_tpu.models import bratu
    from nonlinearsolve_tpu.ops import doublef32 as dfm

    N = 32
    prob = bratu.make_problem(N, dtype=jnp.float32)
    alg = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=32))
    sol = nls.solve(prob, alg, abstol=1e-3, maxiters=50)
    assert bool(sol.success)
    res = nls.auto_refine(prob, sol.u, rounds=4)
    u_ref = dfm.df_value_f64(res.u)

    code = (
        "import jax, json, numpy as np\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import jax.numpy as jnp, sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "import nonlinearsolve_tpu as nls\n"
        "from nonlinearsolve_tpu.models import bratu\n"
        f"prob = bratu.make_problem({N}, dtype=jnp.float64)\n"
        "sol = nls.solve(prob, nls.NewtonRaphson(), abstol=1e-12,"
        " maxiters=100)\n"
        "print(json.dumps(np.asarray(sol.u, np.float64).ravel().tolist()))\n")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600)
    u64 = np.asarray(json.loads(out.stdout.strip().splitlines()[-1]),
                     np.float64).reshape(N, N)
    rel_inf = np.max(np.abs(u_ref - u64)) / np.max(np.abs(u64))
    fast_rel = np.max(np.abs(np.asarray(sol.u, np.float64) - u64)) \
        / np.max(np.abs(u64))
    assert rel_inf < 1e-9, rel_inf
    assert rel_inf < fast_rel / 10.0


def test_scatter_tier_random_matvec_on_chip():
    """The two-pass scatter tier (r4) on the REAL chip: a random pattern
    beyond every structured envelope dispatches to tier='scatter'
    through CSR.matvec and matches the f64 reference at f32 grade
    (measured 2.46 Gnnz/s = 75% of its op-count bound — bench row)."""
    import numpy as np
    import scipy.sparse as sp
    from nonlinearsolve_tpu.ops.pallas_spmv import select_spmv_plan
    from nonlinearsolve_tpu.ops.sparse import CSR

    rng = np.random.default_rng(7)
    n, w = 131072, 16
    cols = np.sort(rng.integers(0, n, size=(n, w)), axis=1).reshape(-1)
    indptr = np.arange(n + 1, dtype=np.int64) * w
    A = sp.csr_matrix((rng.standard_normal(n * w),
                       cols.astype(np.int64), indptr), shape=(n, n))
    tier, *_ = select_spmv_plan(A.indptr, A.indices, n, n)
    assert tier == "scatter"
    csr = CSR(jnp.asarray(A.data, jnp.float32),
              np.asarray(A.indices, np.int32),
              np.asarray(A.indptr, np.int32), (n, n))
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(csr.matvec(jnp.asarray(x)))
    y_ref = A @ x.astype(np.float64)
    rel = np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref))
    assert rel < 2e-5


def test_device_lu_precond_newton_on_chip():
    """Newton-GMRES with the frozen exact-LU device preconditioner on
    the REAL chip (refresh_host staging — axon rejects pure_callback):
    converges in a handful of steps and measured 3.3x faster end-to-end
    than Jacobi preconditioning (NOTES_ROUND4 #5)."""
    import numpy as np
    import scipy.sparse as sp
    from nonlinearsolve_tpu.ops.device_lu import DeviceLU
    from nonlinearsolve_tpu.ops.sparse import CSR

    N = 64
    n = N * N
    d = np.ones(n)
    L = sp.diags([4 * d, -d[:-1], -d[:-1], -d[:-N], -d[:-N]],
                 [0, 1, -1, N, -N], format="csr")
    csrL = CSR(jnp.asarray(L.data, jnp.float32),
               np.asarray(L.indices, np.int32),
               np.asarray(L.indptr, np.int32), (n, n))
    lu = DeviceLU(L.indptr, L.indices, n, dtype=jnp.float32)
    assert lu.supported
    state = jax.tree.map(jax.device_put, lu.refresh_host(L.data))

    def M0(x):
        return lu.solve(state, x)[0]

    def f(u, p):
        return csrL.matvec_xla(u) - p * jnp.exp(-u)

    prob = nls.NonlinearProblem(
        nls.NonlinearFunction(f, jac_prototype=csrL),
        jnp.zeros(n, jnp.float32), jnp.float32(1.0))
    sol = nls.solve(prob, nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres",
                                  precond_fn=lambda u: M0)),
        abstol=1e-5, maxiters=30)
    assert bool(sol.success)
    assert int(sol.stats.nsteps) <= 12
    resid = float(jnp.max(jnp.abs(f(sol.u, jnp.float32(1.0)))))
    assert resid < 1e-4


def test_device_lu_128sq_on_chip():
    """r5 (VERDICT r4 next#4): the width-bucketed 128² factor (61
    stages, 1.9M fill) applies on the REAL chip — ~3.7 ms/solve
    measured vs ~25 ms host round trip; f32 forward-error grade.  The
    first compile is slow (~130 s, cached; the stage tables ride as
    cached device arrays — embedded HLO literals hit the tunnel's
    remote-compile 413 body limit before r5's _dev_table fix).  192²+
    schedules are host-valid (CPU-verified) but the ≥384-stage program
    exceeds the tunnel's upload limit — standard runtimes are not
    subject to it (docs/tpu_tuning.md §7e)."""
    import numpy as np
    import scipy.sparse as sp
    from nonlinearsolve_tpu.ops.device_lu import DeviceLU

    N = 128
    n = N * N
    d = np.ones(n)
    A = sp.diags([4 * d, -d[:-1], -d[:-1], -d[:-N], -d[:-N]],
                 [0, 1, -1, N, -N], format="csr")
    lu = DeviceLU(A.indptr, A.indices, n, dtype=jnp.float32)
    assert lu.supported
    state = jax.tree.map(jax.device_put, lu.refresh_host(A.data))
    b = jnp.asarray(np.random.default_rng(5).standard_normal(n),
                    jnp.float32)
    x, ok = jax.jit(lambda s, bb: lu.solve(s, bb))(state, b)
    jax.block_until_ready(x)
    assert bool(ok)
    ref = sp.linalg.spsolve(A.tocsc(), np.asarray(b, np.float64))
    rel = np.abs(np.asarray(x, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < 5e-6, rel
