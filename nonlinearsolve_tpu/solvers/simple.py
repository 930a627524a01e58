"""Simple tier — low-overhead, vmap/scan-embeddable solvers.

TPU-native redesign of /root/reference/lib/SimpleNonlinearSolve/: the
reference's allocation-free single-function loops (designed to run inside GPU
kernels on SVector states) become minimal ``lax.while_loop`` solvers with tiny
carries — usable inside ``vmap``/``scan``/other jitted code, which is the
exact analogue of "kernels-in-kernels" on TPU.

Algorithms: SimpleNewtonRaphson (raphson.jl:20-82), SimpleBroyden
(broyden.jl), SimpleKlement (klement.jl), SimpleDFSane (dfsane.jl),
SimpleHalley (halley.jl:19-100, the elementwise Halley correction
``cᵢ = aᵢ²/(-aᵢ + bᵢ/2)``), SimpleTrustRegion (trust_region.jl),
SimpleLimitedMemoryBroyden (lbroyden.jl: low-rank ``-αI + UVᵀ`` inverse).

Default termination: the :simple callee — plain AbsNorm (max|f|)
(termination_conditions.jl:330-334).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core import linesearch as lsr
from ..core import termination as trm
from ..core.returncode import ReturnCode
from ..core.solution import NLStats
from ..ops.linear_solve import solve_dense
from ..utils.norms import l2_norm
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class SimpleNewtonRaphson:
    name: str = "SimpleNewtonRaphson"
    default_termination_callee = "simple"


def SimpleGaussNewton(**kw):
    return SimpleNewtonRaphson(**kw)


@static_config
class SimpleBroyden:
    linesearch: bool = False      # True → Li-Fukushima line search
    alpha: Optional[float] = None
    name: str = "SimpleBroyden"
    default_termination_callee = "simple"


@static_config
class SimpleKlement:
    name: str = "SimpleKlement"
    default_termination_callee = "simple"


@static_config
class SimpleDFSane:
    sigma_min: float = 1e-10
    sigma_max: float = 1e10
    sigma_1: float = 1.0
    M: int = 10
    gamma: float = 1e-4
    tau_min: float = 0.1
    tau_max: float = 0.5
    n_exp: int = 2
    max_inner_iterations: int = 100
    name: str = "SimpleDFSane"
    default_termination_callee = "simple"


@static_config
class SimpleHalley:
    name: str = "SimpleHalley"
    default_termination_callee = "simple"


@static_config
class SimpleTrustRegion:
    """trust_region.jl:49-60.  ``nlsolve_update_rule=True`` switches to the
    NLSolve.jl radius-update rule (trust_region.jl:77-96,190-196): different
    defaults (shrink_threshold 0.05, expand_threshold 0.9, shrink_factor
    0.5), initial radius ‖x₀‖ (or 1), and a step-length-based expansion
    ``Δ = t₂·‖δ‖`` when r > η₃ / ``Δ = max(Δ, t₂·‖δ‖)`` when r > 0.5."""
    max_trust_radius: Optional[float] = None
    initial_trust_radius: Optional[float] = None
    step_threshold: float = 0.0001
    shrink_threshold: Optional[float] = None
    expand_threshold: Optional[float] = None
    shrink_factor: Optional[float] = None
    expand_factor: float = 2.0
    max_shrink_times: int = 32
    nlsolve_update_rule: bool = False
    name: str = "SimpleTrustRegion"
    default_termination_callee = "simple"


@static_config
class SimpleLimitedMemoryBroyden:
    threshold: int = 27
    linesearch: bool = False
    alpha: Optional[float] = None
    name: str = "SimpleLimitedMemoryBroyden"
    default_termination_callee = "simple"


@pytree_dataclass
class SimpleCarry:
    u: Any
    xo: Any
    fu: Any
    extra: Any
    nsteps: Any
    force_stop: Any
    retcode: Any
    stats: Any
    term: Any


def _run_simple(ctx, term_cfg, abstol, reltol, maxiters, x0, extra0, step_fn,
                nf_init=1, njacs_init=0):
    fx0 = ctx.f_flat(x0)
    term = trm.init_termination(term_cfg, fx0, x0, reltol)
    carry0 = SimpleCarry(
        u=x0, xo=x0, fu=fx0, extra=extra0, nsteps=jnp.int32(0),
        force_stop=jnp.bool_(False), retcode=jnp.int32(ReturnCode.Default),
        stats=NLStats.zeros().incr(nf=nf_init, njacs=njacs_init), term=term)

    def cond(c):
        return (~c.force_stop) & (c.nsteps < maxiters)

    def body(c):
        x_new, fx_new, extra, nf, njacs, nsolve, fail = step_fn(c)
        stop, term = trm.check_termination(
            term_cfg, c.term, fx_new, x_new, c.u, abstol, reltol,
            is_least_squares=ctx.is_least_squares)
        retcode = jnp.where(stop, term.retcode, jnp.int32(ReturnCode.Default))
        retcode = jnp.where(fail, jnp.int32(ReturnCode.Unstable), retcode)
        return SimpleCarry(
            u=x_new, xo=c.u, fu=fx_new, extra=extra, nsteps=c.nsteps + 1,
            force_stop=c.force_stop | stop | fail,
            retcode=jnp.where(c.force_stop, c.retcode, retcode),
            stats=c.stats.incr(nf=nf, njacs=njacs, nsolve=nsolve, nsteps=1),
            term=term)

    final = jax.lax.while_loop(cond, body, carry0)
    retcode = jnp.where(
        final.retcode == ReturnCode.Default,
        jnp.where(final.nsteps >= maxiters, jnp.int32(ReturnCode.MaxIters),
                  jnp.int32(ReturnCode.Success)),
        final.retcode)
    x_final = trm.termination_result(term_cfg, final.term, final.u)
    if term_cfg.keeps_best:
        fx_final = ctx.f_flat(x_final)
    else:
        fx_final = final.fu
    return final.replace(u=x_final, fu=fx_final, retcode=retcode)


def _init_alpha(alpha, x, fx):
    """broyden.jl:52-58: α = max(‖x‖,1)/(2‖fx‖) if ‖fx‖ ≥ 1e-5 else 1;
    user alpha → 1/alpha."""
    if alpha is not None:
        return jnp.asarray(1.0 / alpha, x.dtype)
    fx_norm = l2_norm(fx)
    return jnp.where(fx_norm >= 1e-5,
                     jnp.maximum(l2_norm(x), 1.0) / (2.0 * fx_norm),
                     jnp.ones((), x.dtype))


def run_simple_newton(alg, ctx, term_cfg, jac_fn, x0, abstol, reltol,
                      maxiters):
    def step(c):
        J = jac_fn(c.u)
        if ctx.square:
            dx, ok = solve_dense(J, c.fu)
        else:
            dx, _, _, _ = jnp.linalg.lstsq(J, c.fu, rcond=None)
            ok = jnp.all(jnp.isfinite(dx))
        x = c.u - dx
        fx = ctx.f_flat(x)
        return x, fx, c.extra, 1, 1, 1, ~ok

    return _run_simple(ctx, term_cfg, abstol, reltol, maxiters, x0, None,
                       step, njacs_init=0)


def run_simple_broyden(alg: SimpleBroyden, ctx, term_cfg, x0, abstol, reltol,
                       maxiters):
    fx0 = ctx.f_flat(x0)
    n = x0.shape[0]
    Jinv0 = jnp.eye(n, dtype=x0.dtype) * _init_alpha(alg.alpha, x0, fx0)
    ls_cfg = lsr.LiFukushimaLineSearch() if alg.linesearch else None

    def step(c):
        Jinv, fprev = c.extra
        dx = -(Jinv @ fprev)
        if ls_cfg is not None:
            ls = lsr._li_fukushima(ls_cfg, None, ctx, c.u, dx, fprev,
                                   c.nsteps)
            alpha_s, nf_ls = ls.alpha, ls.nf
        else:
            alpha_s, nf_ls = jnp.ones((), x0.dtype), 0
        x = c.u + alpha_s * dx
        fx = ctx.f_flat(x)
        df = fx - fprev
        # Secant Δu = α·dx, the step actually taken (same exact-secant fix
        # as the full-tier engine — see solvers/quasi_newton.py; identical
        # when α = 1, i.e. whenever the line search is off).
        s = alpha_s * dx
        Jdf = Jinv @ df
        d = jnp.dot(s, Jdf)
        d = jnp.where(d == 0, 1e-5, d)
        row = s @ Jinv
        Jinv_new = Jinv + jnp.outer((s - Jdf) / d, row)
        return x, fx, (Jinv_new, fx), 1 + nf_ls, 0, 1, jnp.bool_(False)

    return _run_simple(ctx, term_cfg, abstol, reltol, maxiters, x0,
                       (Jinv0, fx0), step)


def run_simple_klement(alg, ctx, term_cfg, x0, abstol, reltol, maxiters):
    def step(c):
        J, fprev = c.extra
        J = jnp.where(J == 0, jnp.ones_like(J), J)
        dx = fprev / J
        x = c.u - dx
        fx = ctx.f_flat(x)
        dx = -dx
        dx2 = dx * dx * J * J
        dx2 = jnp.where(dx2 == 0, 1e-5, dx2)
        J_new = J + (fx - fprev - J * dx) / dx2 * dx * J * J
        return x, fx, (J_new, fx), 1, 0, 1, jnp.bool_(False)

    fx0 = ctx.f_flat(x0)
    return _run_simple(ctx, term_cfg, abstol, reltol, maxiters, x0,
                       (jnp.ones_like(x0), fx0), step)


def run_simple_halley(alg, ctx, term_cfg, x0, abstol, reltol, maxiters):
    """halley.jl: a = J⁻¹f, b = J⁻¹(d²f[a,a]), x += a²/(-a + b/2)."""

    def hvvp(x, a):
        # Second-order directional derivative d²f(x)[a, a] via jvp-of-jvp.
        return jax.jvp(lambda y: jax.jvp(ctx.f_flat, (y,), (a,))[1], (x,),
                       (a,))[1]

    def step(c):
        J = jax.jacfwd(ctx.f_flat)(c.u)
        a, ok1 = solve_dense(J, c.fu)
        h = hvvp(c.u, a)
        b, ok2 = solve_dense(J, h)
        denom = -a + 0.5 * b
        denom = jnp.where(denom == 0, jnp.finfo(x0.dtype).eps, denom)
        ci = (a * a) / denom
        x = c.u + ci
        fx = ctx.f_flat(x)
        return x, fx, c.extra, 3, 1, 2, ~(ok1 & ok2)

    return _run_simple(ctx, term_cfg, abstol, reltol, maxiters, x0, None,
                       step)


def run_simple_dfsane(alg: SimpleDFSane, ctx, term_cfg, x0, abstol, reltol,
                      maxiters):
    ls_cfg = lsr.RobustNonMonotoneLineSearch(
        gamma=alg.gamma, sigma_1=alg.sigma_1, M=alg.M, tau_min=alg.tau_min,
        tau_max=alg.tau_max, n_exp=alg.n_exp,
        maxiters=alg.max_inner_iterations)
    fx0 = ctx.f_flat(x0)
    ls_state0 = lsr.ls_init(ls_cfg, ctx, fx0, x0)
    sigma0 = jnp.asarray(alg.sigma_1, x0.dtype)

    def step(c):
        sigma, ls_state = c.extra
        dx = -sigma * c.fu
        ls = lsr._robust_nonmonotone(ls_cfg, ls_state, ctx, c.u, dx, c.fu)
        x = c.u + ls.alpha * dx
        fx = ctx.f_flat(x)
        ls_state = lsr.ls_post_step(ls_cfg, ls_state, fx)
        s = x - c.u
        y = fx - c.fu
        denom = jnp.dot(s, y)
        sig = jnp.dot(s, s) / jnp.where(denom == 0, jnp.ones_like(denom),
                                        denom)
        fallback = jnp.clip(1.0 / l2_norm(fx), 1.0, 1e5)
        ok = ((alg.sigma_min <= jnp.abs(sig)) & (jnp.abs(sig) <= alg.sigma_max)
              & (denom != 0) & jnp.isfinite(sig))
        sigma_new = jnp.where(ok, sig, fallback)
        return x, fx, (sigma_new, ls_state), ls.nf + 1, 0, 0, jnp.bool_(False)

    return _run_simple(ctx, term_cfg, abstol, reltol, maxiters, x0,
                       (sigma0, ls_state0), step)


def run_simple_trust_region(alg: SimpleTrustRegion, ctx, term_cfg, jac_fn, x0,
                            abstol, reltol, maxiters):
    """Classic dogleg trust region with the Simple scheme's radius updates;
    ``nlsolve_update_rule`` selects the NLSolve.jl variant
    (trust_region.jl:77-96,115-122,180-196)."""
    nur = bool(alg.nlsolve_update_rule)
    eta2 = (0.05 if nur else 0.25) if alg.shrink_threshold is None \
        else alg.shrink_threshold
    eta3 = (0.9 if nur else 0.75) if alg.expand_threshold is None \
        else alg.expand_threshold
    t1 = (0.5 if nur else 0.25) if alg.shrink_factor is None \
        else alg.shrink_factor
    t2 = alg.expand_factor
    fx0 = ctx.f_flat(x0)
    fnorm0 = l2_norm(fx0)
    mtr = (jnp.maximum(fnorm0, jnp.max(x0) - jnp.min(x0))
           if alg.max_trust_radius is None
           else jnp.asarray(alg.max_trust_radius, x0.dtype))
    if alg.initial_trust_radius is not None:
        tr0 = jnp.asarray(alg.initial_trust_radius, x0.dtype)
    elif nur:
        norm_x0 = l2_norm(x0)
        tr0 = jnp.where(norm_x0 > 0, norm_x0, jnp.ones((), x0.dtype))
    else:
        tr0 = mtr / 11.0

    def step(c):
        tr, shrink_counter = c.extra
        J = jac_fn(c.u)
        g = J.T @ c.fu
        # Dogleg step within radius tr.
        dx_newton, ok = solve_dense(J, c.fu)
        dx_newton = -dx_newton
        dx_cauchy = -g
        l_grad = l2_norm(dx_cauchy)
        Jg = J @ dx_cauchy
        gJJg = jnp.dot(Jg, Jg)
        d_cauchy = (l_grad ** 3) / jnp.where(gJJg == 0, 1.0, gJJg)
        newton_inside = l2_norm(dx_newton) <= tr
        lam = tr / jnp.where(l_grad == 0, 1.0, l_grad)
        du1 = (d_cauchy / jnp.where(l_grad == 0, 1.0, l_grad)) * dx_cauchy
        du2 = dx_newton - du1
        a = jnp.dot(du2, du2)
        b = 2.0 * jnp.dot(du1, du2)
        cc = d_cauchy ** 2 - tr ** 2
        aux = jnp.maximum(0.0, b * b - 4.0 * a * cc)
        tau = (-b + jnp.sqrt(aux)) / jnp.where(a == 0, 1.0, 2.0 * a)
        dx = jnp.where(newton_inside, dx_newton,
                       jnp.where(d_cauchy >= tr, lam * dx_cauchy,
                                 du1 + tau * du2))
        x_cand = c.u + dx
        fx_cand = ctx.f_flat(x_cand)
        # ρ = actual/predicted reduction.
        Jdx = J @ dx
        pred = -(jnp.dot(g, dx) + 0.5 * jnp.dot(Jdx, Jdx))
        act = 0.5 * (l2_norm(c.fu) ** 2 - l2_norm(fx_cand) ** 2)
        rho = act / jnp.where(pred == 0, jnp.finfo(x0.dtype).eps, pred)
        accept = rho >= alg.step_threshold
        x = jnp.where(accept, x_cand, c.u)
        fx = jnp.where(accept, fx_cand, c.fu)
        if nur:
            # NLSolve.jl rule (trust_region.jl:190-196): shrink when
            # r < η₂, else expand from the STEP LENGTH — Δ = t₂·‖δ‖ when
            # r > η₃, Δ = max(Δ, t₂·‖δ‖) when r > 0.5 — no Δmax clamp.
            dlen = l2_norm(dx)
            tr_new = jnp.where(rho < eta2, tr * t1, tr)
            tr_new = jnp.where(
                rho > eta3, t2 * dlen,
                jnp.where(rho > 0.5, jnp.maximum(tr_new, t2 * dlen), tr_new))
        else:
            tr_new = jnp.where(
                rho < eta2, tr * t1,
                jnp.where(rho > eta3, tr * t2, tr))
            tr_new = jnp.minimum(tr_new, mtr)
        shrink_counter = jnp.where(rho < eta2,
                                   shrink_counter + 1, jnp.int32(0))
        fail = (shrink_counter > alg.max_shrink_times) | ~ok
        return x, fx, (tr_new, shrink_counter), 1, 1, 1, fail

    return _run_simple(ctx, term_cfg, abstol, reltol, maxiters, x0,
                       (tr0, jnp.int32(0)), step)


def run_simple_lbroyden(alg: SimpleLimitedMemoryBroyden, ctx, term_cfg, x0,
                        abstol, reltol, maxiters):
    """lbroyden.jl:68-146: inverse ≈ (-αI + UVᵀ) with an η-deep history ring."""
    n = x0.shape[0]
    eta = min(alg.threshold, n) if n > alg.threshold else alg.threshold
    if n <= alg.threshold:
        return run_simple_broyden(
            SimpleBroyden(linesearch=alg.linesearch, alpha=alg.alpha), ctx,
            term_cfg, x0, abstol, reltol, maxiters)
    eta = alg.threshold
    fx0 = ctx.f_flat(x0)
    alpha = _init_alpha(alg.alpha, x0, fx0)
    U0 = jnp.zeros((eta, n), x0.dtype)
    V0 = jnp.zeros((eta, n), x0.dtype)

    def matvec(U, V, nhist, v):
        mask = (jnp.arange(eta) < nhist)[:, None]
        return (U * mask).T @ ((V * mask) @ v) - alpha * v

    def rmatvec(U, V, nhist, v):
        mask = (jnp.arange(eta) < nhist)[:, None]
        return (V * mask).T @ ((U * mask) @ v) - alpha * v

    ls_cfg = lsr.LiFukushimaLineSearch() if alg.linesearch else None

    def step(c):
        U, V, fo, dx = c.extra
        i = c.nsteps  # 0-based iteration counter
        if ls_cfg is not None:
            ls = lsr._li_fukushima(ls_cfg, None, ctx, c.u, dx, fo, c.nsteps)
            alpha_s, nf_ls = ls.alpha, ls.nf
        else:
            alpha_s, nf_ls = jnp.ones((), x0.dtype), 0
        x = c.u + alpha_s * dx
        fx = ctx.f_flat(x)
        df = fx - fo
        # Secant Δu = α·dx (exact-secant fix, see solvers/quasi_newton.py).
        s = alpha_s * dx
        vT = rmatvec(U, V, i, s)
        mvec = matvec(U, V, i, df)
        d = jnp.dot(vT, df)
        d = jnp.where(d == 0, 1e-5, d)
        dx_upd = (s - mvec) / d
        slot = jnp.mod(i, eta)
        U = U.at[slot].set(dx_upd)
        V = V.at[slot].set(vT)
        dx_next = -matvec(U, V, i + 1, fx)
        return x, fx, (U, V, fx, dx_next), 1 + nf_ls, 0, 1, jnp.bool_(False)

    return _run_simple(ctx, term_cfg, abstol, reltol, maxiters, x0,
                       (U0, V0, fx0, -fx0), step)


SIMPLE_ALGS = (SimpleNewtonRaphson, SimpleBroyden, SimpleKlement, SimpleDFSane,
               SimpleHalley, SimpleTrustRegion, SimpleLimitedMemoryBroyden)


def is_simple_alg(alg) -> bool:
    return isinstance(alg, SIMPLE_ALGS)


def run_simple(alg, ctx, term_cfg, analytic_jac, u0_flat, abstol, reltol,
               maxiters):
    jac_fn = analytic_jac if analytic_jac is not None \
        else jax.jacfwd(ctx.f_flat)
    if isinstance(alg, SimpleNewtonRaphson):
        return run_simple_newton(alg, ctx, term_cfg, jac_fn, u0_flat,
                                 abstol, reltol, maxiters)
    if isinstance(alg, SimpleBroyden):
        return run_simple_broyden(alg, ctx, term_cfg, u0_flat, abstol, reltol,
                                  maxiters)
    if isinstance(alg, SimpleKlement):
        return run_simple_klement(alg, ctx, term_cfg, u0_flat, abstol, reltol,
                                  maxiters)
    if isinstance(alg, SimpleDFSane):
        return run_simple_dfsane(alg, ctx, term_cfg, u0_flat, abstol, reltol,
                                 maxiters)
    if isinstance(alg, SimpleHalley):
        return run_simple_halley(alg, ctx, term_cfg, u0_flat, abstol, reltol,
                                 maxiters)
    if isinstance(alg, SimpleTrustRegion):
        return run_simple_trust_region(alg, ctx, term_cfg, jac_fn, u0_flat,
                                       abstol, reltol, maxiters)
    if isinstance(alg, SimpleLimitedMemoryBroyden):
        return run_simple_lbroyden(alg, ctx, term_cfg, u0_flat, abstol,
                                   reltol, maxiters)
    raise ValueError(f"unknown simple algorithm {alg!r}")
