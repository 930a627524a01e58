"""Driver benchmark — one JSON line on stdout.

North-star metric (BASELINE.json): SpMV nnz/s/chip inside GMRES on the 2D
Brusselator N=512² Jacobian.  The Jacobian is applied matrix-free (jax.jvp of
the periodic stencil residual — the fused-stencil "SpMV" with 12 nnz per grid
point); we time a long scan of matvecs (pure SpMV throughput) and a full
Newton–GMRES+FFT-preconditioned solve for the secondary time-to-solve anchor.

Runs on whatever the default JAX backend is (the real TPU chip under the
driver; CPU elsewhere).  float32 (TPU-native dtype).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jax.flatten_util import ravel_pytree

    import nonlinearsolve_tpu as nls
    from nonlinearsolve_tpu.models import brusselator
    from nonlinearsolve_tpu.ops.preconditioners import (
        fft_poisson_preconditioner)
    from nonlinearsolve_tpu.solvers.first_order import EisenstatWalkerForcing

    import os
    N = int(os.environ.get("NLS_BENCH_N", "512"))   # override for smokes
    dtype = jnp.float32
    u0 = brusselator.init_u0(N, dtype)
    p = brusselator.default_p(N, dtype)

    # --- load-calibration probes (VERDICT r4 next#2) -----------------------
    # The tunnel chip is time-sliced; raw numbers move ±30-100% with
    # load (r3->r4: flagship 662->569, general 6.72->3.40).  Known-bound
    # probes (pure HBM triad + pure VPU-issue chain, utils/profiling.py)
    # run in the same window as each row group; rows are normalized by
    # probe/nominal, with nominal = the best probe window ever recorded
    # on this chip (BENCH_PROBE.json, updated as a running max).  Every
    # SpMV row's roofline is gather-issue-bound, so the VPU probe is the
    # matching normalizer; the triad tracks stream-bound work.
    from nonlinearsolve_tpu.utils.profiling import (hbm_triad_probe,
                                                    vpu_issue_probe)
    probe_log = []
    on_tpu = jax.default_backend() == "tpu"

    def probe_now(tag):
        rec = {"tag": tag, "triad_gbps": float("nan"),
               "vpu_gops": float("nan")}
        if on_tpu:
            try:
                rec["triad_gbps"] = hbm_triad_probe(rounds=3)
                rec["vpu_gops"] = vpu_issue_probe(rounds=3)
            except Exception:   # noqa: BLE001 — probes are diagnostic
                pass
        probe_log.append(rec)
        return rec

    def segment_load(tag_a, tag_b, kind, nominal):
        """probe/nominal for the window bounded by two probe tags."""
        if not nominal or not np.isfinite(nominal):
            return float("nan")
        vals = [pr[kind] for pr in probe_log if pr["tag"] in (tag_a, tag_b)
                and np.isfinite(pr[kind])]
        if not vals:
            return float("nan")
        return float(np.mean(vals)) / float(nominal)

    probe_now("start")

    def f_shaped(U):
        return brusselator.brusselator_2d(U, p)

    nnz = 12 * N * N  # 5-point stencil + u<->v coupling per grid point

    # --- SpMV (jvp matvec) throughput --------------------------------------
    # Shape-native Pallas kernel: the (N, N, 2) stencil layout is preserved
    # end-to-end (raveled layout costs a relayout per matvec: 24x slower)
    # and the whole fused JVP + state stay VMEM-resident across the scan
    # (ops/pallas_stencil.py).
    #
    # Timing: chain-length SLOPE with a forced scalar fetch.  The tunnel-
    # attached chip pays a ~25 ms round-trip per dispatch+fetch and
    # block_until_ready can acknowledge before completion, so a single
    # absolute wall clock lies by an order of magnitude; the difference of
    # two scan lengths cancels every fixed term and leaves pure device
    # time per matvec (docs/tpu_tuning.md §8).
    from nonlinearsolve_tpu.ops.pallas_stencil import brusselator_jvp_scaled
    L1, L2 = 50, 4050

    def make_scan(length):
        @jax.jit
        def spmv_scan(u0a, pa, v):
            # Fused chain step: scale-on-read + in-kernel absmax — one
            # 3-in/2-out VMEM round-trip per matvec, no normalize pass.
            def body(carry, _):
                c, s = carry
                w, m = brusselator_jvp_scaled(u0a, c, pa, 1.0 / s)
                return (w, jnp.maximum(m, jnp.float32(1.0))), None

            (out, _), _ = jax.lax.scan(body, (v, jnp.float32(1.0)), None,
                                       length=length)
            return jnp.sum(jnp.abs(out))       # scalar fetch ⇒ completion
        return spmv_scan

    from nonlinearsolve_tpu.utils.profiling import slope_time

    v0 = jnp.ones_like(u0)
    u0d, pd = jax.device_put(u0), jax.device_put(p)
    s1, s2 = make_scan(L1), make_scan(L2)
    float(s1(u0d, pd, v0))                     # compile + warm
    float(s2(u0d, pd, v0))
    spmv_time = max(slope_time(lambda: float(s1(u0d, pd, v0)),
                               lambda: float(s2(u0d, pd, v0)),
                               span=L2 - L1, rounds=7), 1e-9)
    nnz_per_s = nnz / spmv_time
    probe_now("post_flagship")

    # --- Newton-GMRES time-to-solve ----------------------------------------
    prob = brusselator.make_problem(N, dtype, pallas_jvp=True)
    pm = fft_poisson_preconditioner((N, N), alpha=10.0, h=1.0 / (N - 1),
                                    shift=3.0, n_components=2)
    # Operating point: with the FFT preconditioner at ~134 us/apply vs
    # ~9 us for the Pallas matvec, per-Krylov-iteration cost ~= one
    # preconditioner apply, while an extra Newton step is nearly free
    # (matrix-free: no assembly).  Loose forcing + short restart trades
    # Krylov iterations for Newton steps: eta=0.1/restart=8 measured
    # 6.1 ms vs 13.1 ms for eta_max=1e-2/restart=16 in the same chip-load
    # window (both retcode=Success at abstol=5.0, 5 vs 8 Newton steps).
    alg = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=8,
                                  krylov_maxiter=100, precond_fn=pm),
        forcing=EisenstatWalkerForcing(eta_0=0.1, eta_max=0.1))
    # f32 + alpha/h^2 ~ 2.6e6 → initial |f| ~ 1e6; abstol=5.0 is ~2e-6
    # relative, near the f32 floor for this scaling.
    sol = nls.solve(prob, alg, abstol=5.0, maxiters=30)   # compile+solve
    jax.block_until_ready(sol.u)
    resid = float(jnp.max(jnp.abs(sol.resid)))

    # Per-solve marginal device seconds via the chain-length slope
    # (utils/profiling.py): chains of 1 and k data-dependent solves,
    # paired-median difference — dispatch/shipping/fetch terms cancel.
    from nonlinearsolve_tpu.utils.profiling import chained_solve_time
    solve_time = chained_solve_time(prob, alg, k=4, reps=3,
                                    abstol=5.0, maxiters=30)

    # Tight-forcing companion (VERDICT r1 weak#1): the same solve at the
    # conservative operating point (eta<=1e-2, restart=16) so the headline
    # number has a defensible tight-tolerance twin.
    alg_tight = nls.NewtonRaphson(
        linsolve=nls.LinearSolver(method="gmres", restart=16,
                                  krylov_maxiter=200, precond_fn=pm),
        forcing=EisenstatWalkerForcing(eta_0=1e-2, eta_max=1e-2))
    sol_tight = nls.solve(prob, alg_tight, abstol=5.0, maxiters=30)
    jax.block_until_ready(sol_tight.u)
    resid_tight = float(jnp.max(jnp.abs(sol_tight.resid)))
    solve_time_tight = chained_solve_time(prob, alg_tight, k=4, reps=3,
                                          abstol=5.0, maxiters=30)

    # --- mixed-precision refinement (VERDICT r2 next#1) --------------------
    # Refine the fast f32 root with double-f32 defect correction
    # (solvers/refinement.py): the defect is evaluated in error-free f32
    # pairs (~1e-14 rel), corrections stay f32 GMRES, so the root reaches
    # the reference's f64 anchor grade (large_systems.md:141-165) on f32
    # hardware.  Timed via the same chain-length slope discipline.
    refine_time = float("nan")
    refine_defect = float("nan")
    u_hi = u_lo = None
    try:
        from nonlinearsolve_tpu.models.brusselator import brusselator_2d_df32
        from nonlinearsolve_tpu.ops.pallas_stencil import brusselator_jvp
        # host float64 parameters: jnp would silently truncate to f32 in
        # this (non-x64) process and the df32 constants would encode the
        # truncated values exactly — a ~1e-7 root shift vs the true problem
        p64 = np.array([3.4, 1.0, 10.0, 1.0 / (N - 1)], np.float64)

        def residual_df(uh, ul):
            return brusselator_2d_df32(uh, ul, p64)

        def jvp_at(uh):
            def mv(v):
                return brusselator_jvp(uh, v, p)
            return mv

        def refine(u0r):
            return nls.refine_root(u0r, residual_df, jvp_at, rounds=3,
                                   inner_rtol=1e-2, restart=16,
                                   krylov_maxiter=100, precond_fn=pm)

        def make_refine_chain(length):
            @jax.jit
            def run(u0r):
                def body(c, _):
                    r = refine(c)
                    # data-dependent chain: feed the refined hi word back
                    return r.u.hi, r.defect_norm
                out, defects = jax.lax.scan(body, u0r, None, length=length)
                return jnp.sum(jnp.abs(out)), defects[-1]
            return run

        r1, r2 = make_refine_chain(1), make_refine_chain(3)
        _, d1 = r1(sol.u)
        jax.block_until_ready(d1)
        _, d2 = r2(sol.u)
        refine_defect = float(d1)
        refine_time = max(slope_time(lambda: float(r1(sol.u)[0]),
                                     lambda: float(r2(sol.u)[0]),
                                     span=2, rounds=5), 1e-9)
        res_ref = jax.jit(refine)(sol.u)
        u_hi = np.asarray(jax.device_get(res_ref.u.hi))
        u_lo = np.asarray(jax.device_get(res_ref.u.lo))
    except Exception:   # noqa: BLE001 — diagnostic row, never fatal
        if os.environ.get("NLS_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()

    # --- general (unstructured) sparse SpMV: Pallas gather kernel ----------
    # The scrambled 64² Bratu Jacobian pattern (random symmetric
    # permutation of the 5-point stencil) through CSR.matvec — which
    # dispatches to the windowed-ELL Pallas kernel (ops/pallas_spmv.py) on
    # TPU — against the XLA segment_sum path on the same pattern.
    gen_nnz_per_s = float("nan")
    gen_speedup = float("nan")
    gen_pct = float("nan")
    try:
        import scipy.sparse as sp
        from nonlinearsolve_tpu.ops.pallas_spmv import (select_spmv_plan,
                                                        spmv_roofline)
        from nonlinearsolve_tpu.ops.sparse import CSR
        Ng = 64
        ng = Ng * Ng
        dg = np.ones(ng)
        Ag = sp.diags([dg * 4, -dg[:-1], -dg[:-1], -dg[:-Ng], -dg[:-Ng]],
                      [0, 1, -1, Ng, -Ng], format="csr")
        rngg = np.random.default_rng(0)
        sg = rngg.permutation(ng)
        Ag = Ag[np.ix_(sg, sg)].tocsr()
        Ag.data = rngg.standard_normal(Ag.nnz)
        csr_g = CSR(jnp.asarray(Ag.data, jnp.float32),
                    np.asarray(Ag.indices, np.int32),
                    np.asarray(Ag.indptr, np.int32), (ng, ng))
        xg = jnp.asarray(rngg.standard_normal(ng), jnp.float32)

        def chain_g(mv, length):
            @jax.jit
            def run(x):
                def body(c, _):
                    w = mv(c)
                    return w / jnp.maximum(jnp.max(jnp.abs(w)), 1.0), None
                out, _ = jax.lax.scan(body, x, None, length=length)
                return jnp.sum(jnp.abs(out))
            return run

        # 9 slope rounds (median): the r2->r3 1.89->1.42 drift was
        # chip-load spread — more rounds tighten the median's window.
        Lg1, Lg2 = 20, 520
        times = {}
        for name, mv in (("pallas", csr_g.matvec), ("segsum", csr_g.matvec_xla)):
            c1, c2 = chain_g(mv, Lg1), chain_g(mv, Lg2)
            float(c1(xg)); float(c2(xg))
            times[name] = max(slope_time(lambda: float(c1(xg)),
                                         lambda: float(c2(xg)),
                                         span=Lg2 - Lg1, rounds=9), 1e-9)
        gen_nnz_per_s = Ag.nnz / times["pallas"]
        gen_speedup = times["segsum"] / times["pallas"]
        gtier, gplan, _, _, _ = select_spmv_plan(
            csr_g.indptr, csr_g.indices, ng, ng)
        gen_pct = 100.0 * gen_nnz_per_s / spmv_roofline(
            gtier, gplan, Ag.nnz)["bound"]
    except Exception:   # noqa: BLE001 — diagnostic row, never fatal
        pass
    probe_now("post_general")

    # --- PDE-scale + out-of-envelope SpMV rows (VERDICT r2 next#7) ---------
    # (a) the ASSEMBLED 512² Brusselator CSR Jacobian (3.1M nnz) through
    # CSR.matvec — in-envelope for the Pallas kernel via the transparent
    # RCM reorder tier (W=40 after reordering the periodic wrap rows);
    # (b) a deliberately out-of-envelope random pattern — measures the
    # segment_sum crossover instead of asserting it.
    pde_nnz_per_s = float("nan")
    pde_path = "?"
    pde_pct = float("nan")
    ooe_nnz_per_s = float("nan")
    ooe_path = "?"
    pde3d_nnz_per_s = float("nan")
    pde3d_path = "?"
    pde3d_pct = float("nan")
    ooe_pct = float("nan")
    try:
        from nonlinearsolve_tpu.ops.pallas_spmv import (
            pallas_spmv_supported, select_spmv_plan, spmv_roofline)
        from nonlinearsolve_tpu.ops.sparse import CSR

        def time_matvec(csr_m, label_rounds=5):
            # the staged closure — packing hoisted out of the loop, the
            # same form every Krylov solve uses via as_matvec
            mv_fn = csr_m.matvec_fn()

            def chain(length):
                @jax.jit
                def run(x):
                    def body(c, _):
                        w = mv_fn(c)
                        return w / jnp.maximum(jnp.max(jnp.abs(w)), 1.0), None
                    out, _ = jax.lax.scan(body, x, None, length=length)
                    return jnp.sum(jnp.abs(out))
                return run
            x0 = jnp.asarray(
                np.random.default_rng(1).standard_normal(csr_m.shape[1]),
                jnp.float32)
            # dia-tier matvecs run tens of µs: short chains left the
            # slope inside dispatch noise (observed 126 vs 199 Gnnz/s
            # across runs) — longer spans stabilize it
            La, Lb = 10, 210
            ca, cb = chain(La), chain(Lb)
            float(ca(x0)); float(cb(x0))
            t = max(slope_time(lambda: float(ca(x0)),
                               lambda: float(cb(x0)),
                               span=Lb - La, rounds=label_rounds), 1e-9)
            return len(csr_m.indices) / t

        patt = brusselator.sparsity_pattern(N)
        npde = patt.shape[0]
        rngp = np.random.default_rng(2)
        csr_pde = CSR(jnp.asarray(rngp.standard_normal(len(patt.indices)),
                                  jnp.float32),
                      np.asarray(patt.indices, np.int32),
                      np.asarray(patt.indptr, np.int32), (npde, npde))
        def tier_label(csr_m):
            tier, plan, perm, _, _ = select_spmv_plan(
                csr_m.indptr, csr_m.indices, *csr_m.shape)
            if tier is None or jax.default_backend() != "tpu":
                return "segment_sum", None, None
            if tier == "scatter":
                mode = f"{len(plan.parts)}part"
            elif tier == "dia":
                mode = f"{plan.ndiag}off"
            else:
                mode = getattr(plan, "mode", "band")
            return (f"{tier}-{mode}" + ("+rcm" if perm is not None else ""),
                    tier, plan)

        pde_path, tierp, planp = tier_label(csr_pde)
        pde_nnz_per_s = time_matvec(csr_pde)
        if planp is not None:
            pde_pct = 100.0 * pde_nnz_per_s / spmv_roofline(
                tierp, planp, len(csr_pde.indices))["bound"]

        # 3D 7-point 128^3 assembled CSR (2.1M rows, 14.6M nnz): the
        # VERDICT r3 "at-any-scale" acceptance shape — dispatches to the
        # column-streamed band-ELL tier (pallas_spmv_stream).
        n3 = int(os.environ.get("NLS_BENCH_N3D", "128"))
        n3d = n3 ** 3
        offs3 = [0, 1, -1, n3, -n3, n3 * n3, -n3 * n3]
        import scipy.sparse as sp3
        A3 = sp3.diags(
            [rngp.standard_normal(n3d).astype(np.float32)]
            + [rngp.standard_normal(n3d - abs(o)).astype(np.float32)
               for o in offs3[1:]], offs3, format="csr")
        csr_3d = CSR(jnp.asarray(A3.data, jnp.float32),
                     np.asarray(A3.indices, np.int32),
                     np.asarray(A3.indptr, np.int32), (n3d, n3d))
        pde3d_path, tier3, plan3 = tier_label(csr_3d)
        pde3d_nnz_per_s = time_matvec(csr_3d)
        if plan3 is not None:
            pde3d_pct = 100.0 * pde3d_nnz_per_s / spmv_roofline(
                tier3, plan3, A3.nnz)["bound"]

        # out-of-envelope: random pattern, 16 nnz/row over 128k columns —
        # no ordering makes that windowed OR banded; lands on segment_sum
        # (the documented gather-issue-bound case, docs/tpu_tuning.md)
        nooe = 131072
        wooe = 16
        cols = rngp.integers(0, nooe, size=(nooe, wooe))
        indptr_o = np.arange(nooe + 1, dtype=np.int64) * wooe
        order = np.argsort(cols, axis=1)
        cols = np.take_along_axis(cols, order, axis=1).reshape(-1)
        csr_ooe = CSR(jnp.asarray(rngp.standard_normal(len(cols)),
                                  jnp.float32),
                      np.asarray(cols, np.int32),
                      np.asarray(indptr_o, np.int32), (nooe, nooe))
        ooe_path, tier_o, plan_o = tier_label(csr_ooe)
        ooe_nnz_per_s = time_matvec(csr_ooe)
        if plan_o is not None:
            ooe_pct = 100.0 * ooe_nnz_per_s / spmv_roofline(
                tier_o, plan_o, len(cols))["bound"]
    except Exception:   # noqa: BLE001 — diagnostic rows, never fatal
        if os.environ.get("NLS_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()
    probe_now("post_pde")

    # Golden cross-validation in a SUBPROCESS (ADVICE r2: never flip
    # jax_enable_x64 inside this process): tools/golden_polish.py polishes
    # the refined root in f64 on CPU with the same engine and reports
    # rel-inf distances of the fast and refined roots to the f64 fixed
    # point.  Certification bar (VERDICT r2 next#1): refined <= 1e-6.
    golden_match = float("nan")
    golden_refined = float("nan")
    try:
        import os
        import subprocess
        import tempfile
        u_fast = np.asarray(jax.device_get(sol.u))
        if u_hi is None:
            u_hi_s, u_lo_s = u_fast, np.zeros_like(u_fast)
        else:
            u_hi_s, u_lo_s = u_hi, u_lo
        here = os.path.dirname(os.path.abspath(__file__))
        with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as fh:
            np.savez(fh, N=N, u_fast=u_fast, u_hi=u_hi_s, u_lo=u_lo_s)
            tmp = fh.name
        try:
            out = subprocess.run(
                [sys.executable,
                 os.path.join(here, "tools", "golden_polish.py"), tmp],
                capture_output=True, text=True, timeout=1200, cwd=here)
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    golden_match = float(rec.get("golden_fast", float("nan")))
                    golden_refined = float(
                        rec.get("golden_refined", float("nan")))
        finally:
            os.unlink(tmp)
    except Exception:   # noqa: BLE001 — golden is diagnostic, never fatal
        if os.environ.get("NLS_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()


    # --- device-side LU triangular-solve row (VERDICT r3 next#5) -----------
    # apply the host-persistent 64² factor on device (the exact-LU Krylov
    # preconditioner economics: ~0.26 ms/solve vs ~25 ms/host-round-trip).
    devlu_ms = float("nan")
    try:
        import scipy.sparse as spd
        from nonlinearsolve_tpu.ops.device_lu import DeviceLU
        nl = 64 * 64
        dl = np.ones(nl)
        Ldl = spd.diags([4 * dl, -dl[:-1], -dl[:-1], -dl[:-64], -dl[:-64]],
                        [0, 1, -1, 64, -64], format="csr")
        lu = DeviceLU(Ldl.indptr, Ldl.indices, nl, dtype=jnp.float32)
        if lu.supported:
            st = jax.tree.map(jax.device_put, lu.refresh_host(Ldl.data))
            bdl = jnp.asarray(
                np.random.default_rng(3).standard_normal(nl), jnp.float32)

            def chain_lu(length):
                @jax.jit
                def run(b):
                    def body(c, _):
                        x, _ok = lu.solve(st, c)
                        return x / jnp.maximum(jnp.max(jnp.abs(x)),
                                               1.0), None
                    out, _ = jax.lax.scan(body, b, None, length=length)
                    return jnp.sum(jnp.abs(out))
                return run
            cl1, cl2 = chain_lu(3), chain_lu(13)
            float(cl1(bdl)); float(cl2(bdl))
            devlu_ms = 1e3 * slope_time(lambda: float(cl1(bdl)),
                                        lambda: float(cl2(bdl)),
                                        span=10, rounds=5)
    except Exception:   # noqa: BLE001 — diagnostic row, never fatal
        if os.environ.get("NLS_BENCH_DEBUG"):
            import traceback
            traceback.print_exc()

    probe_now("end")

    # nominal = best probe window ever recorded on this chip: persists in
    # BENCH_PROBE.json and only ratchets upward, so load_norm <= ~1 and
    # two invocations under different chip load agree after division.
    here_p = os.path.dirname(os.path.abspath(__file__))
    probe_path = os.path.join(here_p, "BENCH_PROBE.json")
    nominal = {"triad_gbps": float("nan"), "vpu_gops": float("nan")}
    try:
        with open(probe_path) as fh:
            nominal.update(json.load(fh))
    except (OSError, ValueError):
        pass
    seen_t = [pr["triad_gbps"] for pr in probe_log
              if np.isfinite(pr["triad_gbps"])]
    seen_v = [pr["vpu_gops"] for pr in probe_log
              if np.isfinite(pr["vpu_gops"])]
    if seen_t and seen_v and on_tpu:
        # outlier-guarded ratchet: a single bogus window (dispatch ack
        # before completion) once recorded a physically impossible
        # 6.1 TB/s triad and poisoned the nominal forever — cap any new
        # max at 1.5x the run's median before ratcheting
        def guarded(vals):
            return float(min(max(vals), 1.5 * float(np.median(vals))))
        nominal["triad_gbps"] = float(np.nanmax(
            [nominal.get("triad_gbps", float("nan")), guarded(seen_t)]))
        nominal["vpu_gops"] = float(np.nanmax(
            [nominal.get("vpu_gops", float("nan")), guarded(seen_v)]))
        try:
            with open(probe_path, "w") as fh:
                json.dump(nominal, fh, indent=1)
        except OSError:
            pass

    # per-window load factors (VPU matches every gather-issue-bound SpMV
    # roofline; triad tracks stream-bound work)
    load_flagship = segment_load("start", "post_flagship", "vpu_gops",
                                 nominal["vpu_gops"])
    load_general = segment_load("post_flagship", "post_general",
                                "vpu_gops", nominal["vpu_gops"])
    load_pde = segment_load("post_general", "post_pde", "vpu_gops",
                            nominal["vpu_gops"])
    load_med = (float(np.median(seen_v)) / nominal["vpu_gops"]
                if seen_v and np.isfinite(nominal["vpu_gops"])
                else float("nan"))

    def norm(val, load):
        return (val / load if np.isfinite(load) and load > 0
                else float("nan"))

    def jr(x, nd=3):
        """JSON-safe round: None instead of NaN (strict parsers)."""
        try:
            xf = float(x)
        except (TypeError, ValueError):
            return None
        return round(xf, nd) if np.isfinite(xf) else None

    metric = "brusselator512_spmv_nnz_per_s"
    # vs_baseline: ratio against a published reference number when one
    # exists in BASELINE.json (the reference publishes none — published={} —
    # in which case the ratio is reported against our own recorded round-1
    # result so regressions are visible).
    vs_baseline = 1.0
    try:
        import os
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BASELINE.json")) as fh:
            published = json.load(fh).get("published", {}) or {}
        baseline_val = published.get(metric)
        if baseline_val is None:
            # driver record: the bench JSON line lives in the "tail" field
            with open(os.path.join(here, "BENCH_r01.json")) as fh:
                tail = json.load(fh).get("tail", "")
            for line in tail.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    if rec.get("metric") == metric:
                        baseline_val = rec.get("value")
        if baseline_val:
            vs_baseline = nnz_per_s / float(baseline_val)
    except (OSError, ValueError, KeyError):
        pass

    print(json.dumps({
        "metric": metric,
        "value": nnz_per_s,
        "value_norm": jr(norm(nnz_per_s, load_flagship), 0),
        "load_norm": {
            "flagship": jr(load_flagship),
            "general": jr(load_general),
            "pde": jr(load_pde),
            "median": jr(load_med),
        },
        "rows_norm_gnnz_s": {
            "general": jr(norm(gen_nnz_per_s, load_general) / 1e9),
            "brusselator512_csr": jr(norm(pde_nnz_per_s, load_pde) / 1e9),
            "stencil3d_128": jr(norm(pde3d_nnz_per_s, load_pde) / 1e9),
            "out_of_envelope": jr(norm(ooe_nnz_per_s, load_pde) / 1e9),
        },
        "probes": {
            "vpu_gops": [jr(pr["vpu_gops"], 1) for pr in probe_log],
            "triad_gbps": [jr(pr["triad_gbps"], 1) for pr in probe_log],
            "nominal": {k: jr(v, 1) for k, v in nominal.items()},
        },
        "unit": f"nnz/s/chip (secondary: newton_gmres_fft solve "
                f"{solve_time:.3f}s @eta=0.1 / {solve_time_tight:.3f}s "
                f"@eta=1e-2, |resid|_inf={resid:.2e}/{resid_tight:.2e}, "
                f"retcode={int(sol.retcode)}/{int(sol_tight.retcode)}; "
                f"df32_refine +{refine_time:.3f}s -> "
                f"defect={refine_defect:.2e}, "
                f"golden_refined={golden_refined:.2e} rel-inf "
                f"(fast root {golden_match:.2e}) vs f64-CPU polish; "
                f"general_spmv={gen_nnz_per_s / 1e9:.2f} Gnnz/s "
                f"{gen_speedup:.1f}x vs segment_sum "
                f"{gen_pct:.0f}%-of-roofline; "
                f"brusselator512_csr[{pde_path}]="
                f"{pde_nnz_per_s / 1e9:.2f} Gnnz/s "
                f"{pde_pct:.0f}%; "
                f"stencil3d_128[{pde3d_path}]="
                f"{pde3d_nnz_per_s / 1e9:.2f} Gnnz/s "
                f"{pde3d_pct:.0f}%; "
                f"out_of_envelope[{ooe_path}]="
                f"{ooe_nnz_per_s / 1e9:.2f} Gnnz/s {ooe_pct:.0f}%; "
                f"device_lu_solve={devlu_ms:.2f} ms "
                f"(64sq factor, host round-trip ~25 ms))",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
