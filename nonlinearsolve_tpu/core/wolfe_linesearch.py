"""Wolfe-condition line searches (the ``LineSearchesJL`` family).

The reference re-exports LineSearch.jl (``/root/reference/src/NonlinearSolve.jl:184``)
whose ``LineSearchesJL(method = ...)`` wrapper exposes the classic
LineSearches.jl algorithms; the reference test matrix exercises
``Static / BackTracking / MoreThuente / StrongWolfe / HagerZhang``
(/root/reference/lib/NonlinearSolveFirstOrder/test/rootfind_tests__item2.jl:41-46,
/root/reference/lib/NonlinearSolveQuasiNewton/test/core_tests__item1.jl:25-31).

TPU-native re-implementations, not ports: every search is a single
``lax.while_loop`` over a flat carry with a ``mode`` flag standing in for
the reference's mutable two-phase control flow, so whole solves stay
jit/vmap-compatible.  The 1-D merit is ``φ(α) = ½‖F(u + α·du)‖²`` with
``φ'(α) = ⟨F, J·du⟩`` — one ``jax.jvp`` per trial point yields both.

* ``StaticLineSearch`` — always take the full step (LineSearches.Static).
* ``StrongWolfe`` — bracket + zoom with cubic interpolation
  (Nocedal & Wright Alg. 3.5/3.6; defaults c₁=1e-4, c₂=0.9, ρ=2).
* ``HagerZhang`` — the CG_DESCENT line search (Hager & Zhang 2005):
  approximate-Wolfe acceptance ``(2δ-1)φ'(0) ≥ φ'(α) ≥ σφ'(0)`` with the
  ``φ(α) ≤ φ(0)+ε_k`` guard, bracketing by ρ-expansion, then secant steps
  with θ-bisection interval updates and γ-forced bisection.  (Single-secant
  refinement; the reference's wrapped implementation uses secant² — same
  acceptance conditions, both terminate on [approximate] Wolfe points.)
* ``MoreThuente`` — the MINPACK ``dcsrch``/``dcstep`` algorithm (Moré &
  Thuente 1994), including the stage-1 modified-function ψ trick and the
  four-case safeguarded cubic/quadratic ``cstep`` update.

All searches FAIL (``success=False``) when the iteration cap is exhausted
without satisfying their acceptance test — the engines map that to
``InternalLineSearchFailed`` or a quasi-Newton reset, matching the
reference's failure semantics.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..utils.norms import tree_dot
from ..utils.pytree import static_config


@static_config
class StaticLineSearch:
    """Always take ``alpha`` (LineSearches.Static)."""
    alpha: float = 1.0


@static_config
class StrongWolfe:
    c_1: float = 1e-4
    c_2: float = 0.9
    rho: float = 2.0          # bracket expansion factor
    alpha_0: float = 1.0
    alpha_max: float = 65536.0
    maxiters: int = 50


@static_config
class HagerZhang:
    delta: float = 0.1        # sufficient-decrease (Wolfe c1)
    sigma: float = 0.9        # curvature (Wolfe c2)
    epsilon: float = 1e-6     # approximate-Wolfe merit slack: ε·|φ(0)|
    theta: float = 0.5        # bisection weight in interval update
    gamma: float = 0.66       # required interval shrink per refine round
    rho: float = 5.0          # bracket expansion factor
    alpha_0: float = 1.0
    alpha_max: float = 65536.0
    maxiters: int = 50


@static_config
class MoreThuente:
    f_tol: float = 1e-4       # sufficient decrease (ftol)
    gtol: float = 0.9         # curvature
    x_tol: float = 1e-8       # relative interval width termination
    alpha_0: float = 1.0
    alpha_min: float = 1e-16
    alpha_max: float = 65536.0
    maxiters: int = 100       # maxfev


_WOLFE_TYPES = (StaticLineSearch, StrongWolfe, HagerZhang, MoreThuente)

_LSJL_STRINGS = {
    "static": StaticLineSearch,
    "strongwolfe": StrongWolfe,
    "hagerzhang": HagerZhang,
    "morethuente": MoreThuente,
}


def LineSearchesJL(method: Any = None, **kwargs):
    """Compatibility shim for the reference's ``LineSearchesJL(; method)``
    wrapper: resolves to the native config for the named method.

    ``method`` may be a config instance (returned as-is), a config class, or
    a case-insensitive string (``"static" | "backtracking" | "strongwolfe" |
    "hagerzhang" | "morethuente"``).  The ``autodiff`` kwarg of the reference
    is accepted and ignored (JAX is the single AD backend).
    """
    kwargs.pop("autodiff", None)
    if method is None:
        method = "static"
    if isinstance(method, str):
        key = method.lower().replace("_", "")
        if key == "backtracking":
            from .linesearch import BackTracking
            return BackTracking(**kwargs)
        if key not in _LSJL_STRINGS:
            raise ValueError(f"unknown LineSearchesJL method {method!r}")
        return _LSJL_STRINGS[key](**kwargs)
    if isinstance(method, type):
        return method(**kwargs)
    return method


from .linesearch import _real_dtype


def _phi_dphi_fn(ctx, u, du):
    """Return ``eval(α) -> (φ(α), φ'(α))`` — one jvp per call."""

    def eval_at(alpha):
        fu_a, jdu = jax.jvp(ctx.f_flat, (u + alpha * du,), (du,))
        phi = 0.5 * tree_dot(fu_a, fu_a)
        dphi = tree_dot(fu_a, jdu)
        return phi, dphi

    return eval_at


def _cubic_min(a, fa, dfa, b, fb, dfb):
    """Minimizer of the cubic interpolant through (a,fa,dfa), (b,fb,dfb).

    Nocedal & Wright eq. 3.59.  Returns NaN on degenerate data (callers
    safeguard with bisection).
    """
    d1 = dfa + dfb - 3.0 * (fa - fb) / (a - b)
    rad = d1 * d1 - dfa * dfb
    d2 = jnp.sqrt(jnp.maximum(rad, 0.0)) * jnp.sign(b - a)
    denom = dfb - dfa + 2.0 * d2
    x = b - (b - a) * (dfb + d2 - d1) / denom
    bad = (rad < 0.0) | (denom == 0.0) | ~jnp.isfinite(x)
    return jnp.where(bad, jnp.full_like(x, jnp.nan), x)


# --------------------------------------------------------------------------
# StrongWolfe: bracket (Alg 3.5) + zoom (Alg 3.6), one eval per iteration.
# mode: 0 = bracketing, 1 = zoom, 2 = done.
# --------------------------------------------------------------------------

def _strong_wolfe(cfg: StrongWolfe, ctx, u, du, fu):
    dtype = _real_dtype(jax.tree_util.tree_leaves(u)[0])
    ev = _phi_dphi_fn(ctx, u, du)
    zero = jnp.zeros((), dtype)
    phi0, dphi0 = ev(zero)
    c1, c2 = cfg.c_1, cfg.c_2

    def armijo(a, p):
        return p <= phi0 + c1 * a * dphi0

    # carry: mode, trial α, previous (α, φ) [bracketing], zoom interval
    # (lo: α/φ/φ', hi: α/φ/φ'), accepted (α, φ), it, first-iteration flag
    init = (jnp.int32(0), jnp.asarray(cfg.alpha_0, dtype),
            zero, phi0, zero, phi0, dphi0, zero, phi0, dphi0,
            zero, phi0, jnp.int32(0), jnp.bool_(True))

    def cond(c):
        mode, it = c[0], c[12]
        return (mode != 2) & (it < cfg.maxiters)

    def body(c):
        (mode, a, a_prev, phi_prev, a_lo, phi_lo, dphi_lo,
         a_hi, phi_hi, dphi_hi, a_star, phi_star, it, first) = c

        # Zoom trial: safeguarded cubic between lo and hi.
        a_mid = 0.5 * (a_lo + a_hi)
        a_c = _cubic_min(a_lo, phi_lo, dphi_lo, a_hi, phi_hi, dphi_hi)
        lo_, hi_ = jnp.minimum(a_lo, a_hi), jnp.maximum(a_lo, a_hi)
        margin = 0.1 * (hi_ - lo_)
        a_c = jnp.where(jnp.isfinite(a_c)
                        & (a_c > lo_ + margin) & (a_c < hi_ - margin),
                        a_c, a_mid)
        trial = jnp.where(mode == 0, a, a_c)
        p, dp = ev(trial)

        # --- bracketing-phase updates (Alg 3.5, in the algorithm's order:
        # Armijo-violation zoom → curvature ACCEPT → dp≥0 reverse zoom →
        # expand; testing dp≥0 before acceptance would throw away trials
        # that already satisfy the strong Wolfe conditions) ---
        to_zoom_hi = ~armijo(trial, p) | ((p >= phi_prev) & ~first)
        curv_ok = jnp.abs(dp) <= -c2 * dphi0
        accept_b = ~to_zoom_hi & curv_ok
        to_zoom_rev = ~to_zoom_hi & ~curv_ok & (dp >= 0.0)
        b_mode = jnp.where(to_zoom_hi | to_zoom_rev, jnp.int32(1),
                           jnp.where(accept_b, jnp.int32(2), jnp.int32(0)))
        # zoom(a_prev → lo, trial → hi); φ'(a_prev): unknown on the first
        # iteration only when a_prev = 0 where it is dphi0 — afterwards
        # a_prev was itself evaluated, and the reverse zoom (dp ≥ 0) puts
        # the evaluated trial in lo, so dphi_lo is always exact; the
        # hi-endpoint derivative is only used by the cubic (safeguarded).
        b_lo = jnp.where(to_zoom_hi, a_prev, trial)
        b_phi_lo = jnp.where(to_zoom_hi, phi_prev, p)
        b_dphi_lo = jnp.where(to_zoom_hi,
                              jnp.where(first, dphi0, dphi_lo), dp)
        b_hi = jnp.where(to_zoom_hi, trial, a_prev)
        b_phi_hi = jnp.where(to_zoom_hi, p, phi_prev)
        b_dphi_hi = jnp.where(to_zoom_hi, dp,
                              jnp.where(first, dphi0, dphi_lo))
        b_a_next = jnp.minimum(trial * cfg.rho, cfg.alpha_max)

        # --- zoom-phase updates (Alg 3.6) ---
        z_shrink_hi = ~armijo(trial, p) | (p >= phi_lo)
        z_done = ~z_shrink_hi & curv_ok
        z_flip = ~z_shrink_hi & ~z_done & (dp * (a_hi - a_lo) >= 0.0)
        z_lo = jnp.where(z_shrink_hi, a_lo, trial)
        z_phi_lo = jnp.where(z_shrink_hi, phi_lo, p)
        z_dphi_lo = jnp.where(z_shrink_hi, dphi_lo, dp)
        z_hi = jnp.where(z_shrink_hi, trial,
                         jnp.where(z_flip, a_lo, a_hi))
        z_phi_hi = jnp.where(z_shrink_hi, p,
                             jnp.where(z_flip, phi_lo, phi_hi))
        z_dphi_hi = jnp.where(z_shrink_hi, dp,
                              jnp.where(z_flip, dphi_lo, dphi_hi))
        # Interval collapse → terminate on the lo endpoint (an Armijo point
        # by the zoom invariant; LineSearches.jl likewise returns the best
        # bracketed point when the interval degenerates).
        tiny = jnp.abs(z_hi - z_lo) <= 1e-12 * jnp.maximum(1.0, z_hi)
        z_mode = jnp.where(z_done | tiny, jnp.int32(2), jnp.int32(1))
        z_star = jnp.where(z_done, trial, z_lo)
        z_phi_star = jnp.where(z_done, p, z_phi_lo)

        is_b = mode == 0
        mode_n = jnp.where(is_b, b_mode, z_mode)
        a_star_n = jnp.where(is_b, jnp.where(accept_b, trial, a_star),
                             z_star)
        phi_star_n = jnp.where(is_b, jnp.where(accept_b, p, phi_star),
                               z_phi_star)
        return (mode_n,
                jnp.where(is_b, b_a_next, a),
                jnp.where(is_b, trial, a_prev),
                jnp.where(is_b, p, phi_prev),
                jnp.where(is_b, b_lo, z_lo),
                jnp.where(is_b, b_phi_lo, z_phi_lo),
                jnp.where(is_b, b_dphi_lo, z_dphi_lo),
                jnp.where(is_b, b_hi, z_hi),
                jnp.where(is_b, b_phi_hi, z_phi_hi),
                jnp.where(is_b, b_dphi_hi, z_dphi_hi),
                a_star_n, phi_star_n, it + 1, jnp.bool_(False))

    out = jax.lax.while_loop(cond, body, init)
    mode, a_star, phi_star, it = out[0], out[10], out[11], out[12]
    # φ(a_star) was recorded at the accepting iteration — no extra eval.
    success = (mode == 2) & (a_star > 0.0) & armijo(a_star, phi_star) \
        & jnp.isfinite(phi_star)
    return a_star, success, it + 1


# --------------------------------------------------------------------------
# HagerZhang: ρ-expansion bracket, then secant with θ-bisection updates.
# mode: 0 = bracket, 1 = refine, 2 = done.
# --------------------------------------------------------------------------

def _hager_zhang(cfg: HagerZhang, ctx, u, du, fu):
    dtype = _real_dtype(jax.tree_util.tree_leaves(u)[0])
    ev = _phi_dphi_fn(ctx, u, du)
    zero = jnp.zeros((), dtype)
    phi0, dphi0 = ev(zero)
    eps_k = cfg.epsilon * jnp.abs(phi0)
    delta, sigma = cfg.delta, cfg.sigma

    def accept(a, p, dp):
        wolfe1 = (p - phi0) <= delta * a * dphi0
        wolfe2 = dp >= sigma * dphi0
        approx = ((2.0 * delta - 1.0) * dphi0 >= dp) & wolfe2 \
            & (p <= phi0 + eps_k)
        return (a > 0.0) & ((wolfe1 & wolfe2) | approx)

    # carry: mode, a (interval left), φ(a), φ'(a), b (right), φ'(b),
    # trial, it, accepted (α, φ, φ'), prev interval width (γ bookkeeping)
    big = jnp.asarray(cfg.alpha_max, dtype)
    init = (jnp.int32(0), zero, phi0, dphi0, big,
            jnp.asarray(jnp.inf, dtype), jnp.asarray(cfg.alpha_0, dtype),
            jnp.int32(0), zero, phi0, dphi0, big)

    def cond(c):
        return (c[0] != 2) & (c[7] < cfg.maxiters)

    def body(c):
        (mode, a, pa, da, b, db, trial, it,
         a_star, p_star, dp_star, width) = c
        p, dp = ev(trial)
        ok = accept(trial, p, dp)

        # --- bracket phase: expand until φ' ≥ 0 or merit above slack ---
        hi_found = (dp >= 0.0) | (p > phi0 + eps_k)
        nb_a = jnp.where(hi_found, a, trial)
        nb_pa = jnp.where(hi_found, pa, p)
        nb_da = jnp.where(hi_found, da, dp)
        nb_b = jnp.where(hi_found, trial, b)
        nb_db = jnp.where(hi_found, dp, db)
        nb_trial = jnp.where(
            hi_found,
            # θ-bisection if the right endpoint violates the merit slack
            # (HZ U3), plain secant otherwise.
            jnp.where(p > phi0 + eps_k,
                      (1.0 - cfg.theta) * nb_a + cfg.theta * nb_b,
                      (nb_a * nb_db - nb_b * nb_da)
                      / jnp.where(nb_db == nb_da, jnp.ones_like(da),
                                  nb_db - nb_da)),
            jnp.minimum(trial * cfg.rho, cfg.alpha_max))
        b_mode = jnp.where(hi_found, jnp.int32(1), jnp.int32(0))

        # --- refine phase: interval update (HZ U1-U3) + next secant ---
        # invariant: φ'(a) < 0, φ(a) ≤ φ0+ε; φ'(b) ≥ 0 OR φ(b) > φ0+ε.
        # The dp<0 & merit-too-high case shrinks b := trial (HZ U3's inner
        # θ-bisection unrolled across outer iterations: the invalid-secant
        # guard below then forces bisection).  Convergence: with
        # φ(a) ≤ φ0+ε < φ(b) the bisection limit is the left ε-level
        # crossing, where φ' ≥ 0 and φ ≤ φ0+ε — an approximate-Wolfe
        # point, so a sufficiently close trial triggers accept().
        inside = (trial > a) & (trial < b)
        lo_ok = (p <= phi0 + eps_k)
        move_b = inside & (dp >= 0.0)
        move_a = inside & (dp < 0.0) & lo_ok
        shrink_b = inside & ~lo_ok & (dp < 0.0)
        r_a = jnp.where(move_a, trial, a)
        r_pa = jnp.where(move_a, p, pa)
        r_da = jnp.where(move_a, dp, da)
        r_b = jnp.where(move_b | shrink_b, trial, b)
        r_db = jnp.where(move_b | shrink_b, dp, db)
        new_width = r_b - r_a
        # γ-forced bisection when the interval fails to shrink enough.
        secant = (r_a * r_db - r_b * r_da) / jnp.where(
            r_db == r_da, jnp.ones_like(da), r_db - r_da)
        use_bisect = ~jnp.isfinite(secant) | (secant <= r_a) \
            | (secant >= r_b) | (new_width > cfg.gamma * width)
        r_trial = jnp.where(use_bisect, 0.5 * (r_a + r_b), secant)
        tiny = new_width <= 1e-12 * jnp.maximum(1.0, r_b)
        r_mode = jnp.where(tiny, jnp.int32(2), jnp.int32(1))

        is_b = mode == 0
        mode_n = jnp.where(ok, jnp.int32(2),
                           jnp.where(is_b, b_mode, r_mode))
        # Returned-point record: the accepting trial, else the CURRENT
        # left endpoint (bracket: last expansion point; refine: interval
        # left — both with carried φ, φ').  Updated every iteration so
        # maxiters exhaustion still returns a usable step, not the α = 0
        # init: callers step with the returned α even on failure (e.g.
        # the quasi-Newton burn-in), and α = 0 there freezes fu while du
        # moves — a dfu = 0 secant that corrupts the Broyden update.
        a_star_n = jnp.where(ok, trial, jnp.where(is_b, nb_a, r_a))
        p_star_n = jnp.where(ok, p, jnp.where(is_b, nb_pa, r_pa))
        dp_star_n = jnp.where(ok, dp, jnp.where(is_b, nb_da, r_da))
        return (mode_n,
                jnp.where(is_b, nb_a, r_a), jnp.where(is_b, nb_pa, r_pa),
                jnp.where(is_b, nb_da, r_da),
                jnp.where(is_b, nb_b, r_b), jnp.where(is_b, nb_db, r_db),
                jnp.where(is_b, nb_trial, r_trial), it + 1,
                a_star_n, p_star_n, dp_star_n,
                jnp.where(is_b, width, new_width))

    out = jax.lax.while_loop(cond, body, init)
    mode, it, a_star, p_s, dp_s = out[0], out[7], out[8], out[9], out[10]
    success = (mode == 2) & accept(a_star, p_s, dp_s) & jnp.isfinite(p_s)
    return a_star, success, it + 1


# --------------------------------------------------------------------------
# MoreThuente: MINPACK dcsrch/dcstep.
# --------------------------------------------------------------------------

def _dcstep(stx, fx, dx, sty, fy, dy, stp, fp, dp, brackt, stpmin, stpmax):
    """The four-case safeguarded step of MINPACK ``dcstep``.

    Returns updated (stx, fx, dx, sty, fy, dy, stp, brackt).
    """
    sgnd = dp * jnp.sign(dx)

    def cubic_quad(case):
        theta = 3.0 * (fx - fp) / (stp - stx) + dx + dp
        s = jnp.maximum(jnp.abs(theta),
                        jnp.maximum(jnp.abs(dx), jnp.abs(dp)))
        s = jnp.where(s == 0.0, jnp.ones_like(s), s)
        gamma_sq = (theta / s) ** 2 - (dx / s) * (dp / s)
        gamma = s * jnp.sqrt(jnp.maximum(gamma_sq, 0.0))
        gamma = jnp.where(case != 4,
                          jnp.where(stp < stx, -gamma, gamma), gamma)
        return theta, gamma

    # Case 1: fp > fx → cubic vs quadratic (function values), bracketing.
    theta1, gamma1 = cubic_quad(jnp.int32(1))
    pnum1 = (gamma1 - dx) + theta1
    pden1 = ((gamma1 - dx) + gamma1) + dp
    r1 = pnum1 / jnp.where(pden1 == 0.0, jnp.ones_like(pden1), pden1)
    stpc1 = stx + r1 * (stp - stx)
    stpq1 = stx + ((dx / ((fx - fp) / (stp - stx) + dx)) / 2.0) * (stp - stx)
    stpf1 = jnp.where(jnp.abs(stpc1 - stx) < jnp.abs(stpq1 - stx),
                      stpc1, stpc1 + (stpq1 - stpc1) / 2.0)

    # Case 2: fp ≤ fx, sgnd < 0 → cubic vs secant, bracketing.
    theta2, gamma2 = cubic_quad(jnp.int32(2))
    pnum2 = (gamma2 - dp) + theta2
    pden2 = ((gamma2 - dp) + gamma2) + dx
    r2 = pnum2 / jnp.where(pden2 == 0.0, jnp.ones_like(pden2), pden2)
    stpc2 = stp + r2 * (stx - stp)
    stpq2 = stp + (dp / (dp - dx)) * (stx - stp)
    stpf2 = jnp.where(jnp.abs(stpc2 - stp) > jnp.abs(stpq2 - stp),
                      stpc2, stpq2)

    # Case 3: fp ≤ fx, same sign, |dp| < |dx| → extrapolation, clipped.
    theta3 = 3.0 * (fx - fp) / (stp - stx) + dx + dp
    s3 = jnp.maximum(jnp.abs(theta3),
                     jnp.maximum(jnp.abs(dx), jnp.abs(dp)))
    s3 = jnp.where(s3 == 0.0, jnp.ones_like(s3), s3)
    g3sq = jnp.maximum((theta3 / s3) ** 2 - (dx / s3) * (dp / s3), 0.0)
    gamma3 = s3 * jnp.sqrt(g3sq)
    gamma3 = jnp.where(stp > stx, -gamma3, gamma3)
    pnum3 = (gamma3 - dp) + theta3
    pden3 = (gamma3 + (dx - dp)) + gamma3
    r3 = pnum3 / jnp.where(pden3 == 0.0, jnp.ones_like(pden3), pden3)
    stpc3_raw = stp + r3 * (stx - stp)
    stpc3 = jnp.where((r3 < 0.0) & (gamma3 != 0.0), stpc3_raw,
                      jnp.where(stp > stx, stpmax, stpmin))
    stpq3 = stp + (dp / (dp - dx)) * (stx - stp)
    stpf3_br = jnp.where(jnp.abs(stpc3 - stp) < jnp.abs(stpq3 - stp),
                         stpc3, stpq3)
    stpf3_nbr = jnp.where(jnp.abs(stpc3 - stp) > jnp.abs(stpq3 - stp),
                          stpc3, stpq3)
    # Safeguard: stay within ±2/3 of the far endpoint when bracketed.
    lim = stp + 0.66 * (sty - stp)
    stpf3_br = jnp.where(stp > stx, jnp.minimum(lim, stpf3_br),
                         jnp.maximum(lim, stpf3_br))
    stpf3 = jnp.where(brackt, stpf3_br,
                      jnp.clip(stpf3_nbr, stpmin, stpmax))

    # Case 4: |dp| ≥ |dx| → cubic over [stp, sty] if bracketed, else bound.
    theta4 = 3.0 * (fp - fy) / (sty - stp) + dy + dp
    s4 = jnp.maximum(jnp.abs(theta4),
                     jnp.maximum(jnp.abs(dy), jnp.abs(dp)))
    s4 = jnp.where(s4 == 0.0, jnp.ones_like(s4), s4)
    g4sq = jnp.maximum((theta4 / s4) ** 2 - (dy / s4) * (dp / s4), 0.0)
    gamma4 = s4 * jnp.sqrt(g4sq)
    gamma4 = jnp.where(stp > sty, -gamma4, gamma4)
    pnum4 = (gamma4 - dp) + theta4
    pden4 = ((gamma4 - dp) + gamma4) + dy
    r4 = pnum4 / jnp.where(pden4 == 0.0, jnp.ones_like(pden4), pden4)
    stpc4 = stp + r4 * (sty - stp)
    stpf4 = jnp.where(brackt, stpc4,
                      jnp.where(stp > stx, stpmax, stpmin))

    case1 = fp > fx
    case2 = ~case1 & (sgnd < 0.0)
    case3 = ~case1 & ~case2 & (jnp.abs(dp) < jnp.abs(dx))
    stpf = jnp.where(case1, stpf1,
                     jnp.where(case2, stpf2,
                               jnp.where(case3, stpf3, stpf4)))
    brackt_n = brackt | case1 | case2

    # Interval update.
    keep_x = ~case1  # cases 2-4: trial becomes the new best point
    sty_n = jnp.where(case1, stp,
                      jnp.where(sgnd < 0.0, stx, sty))
    fy_n = jnp.where(case1, fp, jnp.where(sgnd < 0.0, fx, fy))
    dy_n = jnp.where(case1, dp, jnp.where(sgnd < 0.0, dx, dy))
    stx_n = jnp.where(keep_x, stp, stx)
    fx_n = jnp.where(keep_x, fp, fx)
    dx_n = jnp.where(keep_x, dp, dx)

    stpf = jnp.clip(stpf, stpmin, stpmax)
    return stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stpf, brackt_n


def _more_thuente(cfg: MoreThuente, ctx, u, du, fu):
    dtype = _real_dtype(jax.tree_util.tree_leaves(u)[0])
    ev = _phi_dphi_fn(ctx, u, du)
    zero = jnp.zeros((), dtype)
    phi0, dphi0 = ev(zero)
    gtest = cfg.f_tol * dphi0
    xtrapl, xtrapu = 1.1, 4.0

    width0 = jnp.asarray(cfg.alpha_max - cfg.alpha_min, dtype)
    # carry: stage, stx,fx,dx, sty,fy,dy, stp, brackt, width, width1,
    #        stmin, stmax, done, success, it
    init = (jnp.int32(1), zero, phi0, dphi0, zero, phi0, dphi0,
            jnp.asarray(cfg.alpha_0, dtype), jnp.bool_(False),
            width0, 2.0 * width0,
            zero, jnp.asarray(cfg.alpha_0 * (1.0 + xtrapu), dtype),
            jnp.bool_(False), jnp.bool_(False), jnp.int32(0))

    def cond(c):
        done, it = c[13], c[15]
        return (~done) & (it < cfg.maxiters)

    def body(c):
        (stage, stx, fx, dx, sty, fy, dy, stp, brackt, width, width1,
         stmin, stmax, done, success, it) = c
        fp, dp = ev(stp)
        ftest = phi0 + stp * gtest

        # Convergence / termination tests (dcsrch).
        conv = (fp <= ftest) & (jnp.abs(dp) <= cfg.gtol * (-dphi0))
        warn_round = brackt & ((stp <= stmin) | (stp >= stmax))
        warn_xtol = brackt & ((stmax - stmin) <= cfg.x_tol * stmax)
        warn_max = (stp == cfg.alpha_max) & (fp <= ftest) & (dp <= gtest)
        warn_min = (stp == cfg.alpha_min) & ((fp > ftest) | (dp >= gtest))
        new_done = conv | warn_round | warn_xtol | warn_max | warn_min \
            | ~jnp.isfinite(fp)
        # dcsrch's WARN exits return the best step found; count them
        # successful only with sufficient decrease at the frozen stp.
        # Exhausting maxiters WITHOUT done is a line-search failure
        # (module contract), as is stalling at alpha_min (warn_min).
        new_success = conv | ((warn_round | warn_xtol | warn_max)
                              & (fp <= ftest) & jnp.isfinite(fp)
                              & (stp > 0.0))

        # Stage switch: ψ(stp) ≤ 0 and φ'(stp) ≥ 0 → stage 2.
        stage_n = jnp.where((stage == 1) & (fp <= ftest)
                            & (dp >= jnp.minimum(cfg.f_tol, cfg.gtol)
                               * dphi0),
                            jnp.int32(2), stage)

        # Modified-function trick in stage 1 while above the ψ line.
        use_mod = (stage_n == 1) & (fp <= fx) & (fp > ftest)
        fm = jnp.where(use_mod, fp - stp * gtest, fp)
        fxm = jnp.where(use_mod, fx - stx * gtest, fx)
        fym = jnp.where(use_mod, fy - sty * gtest, fy)
        dm = jnp.where(use_mod, dp - gtest, dp)
        dxm = jnp.where(use_mod, dx - gtest, dx)
        dym = jnp.where(use_mod, dy - gtest, dy)

        (stxm, fxm, dxm, stym, fym, dym, stp_n, brackt_n) = _dcstep(
            stx, fxm, dxm, sty, fym, dym, stp, fm, dm, brackt, stmin, stmax)

        fx_n = jnp.where(use_mod, fxm + stxm * gtest, fxm)
        fy_n = jnp.where(use_mod, fym + stym * gtest, fym)
        dx_n = jnp.where(use_mod, dxm + gtest, dxm)
        dy_n = jnp.where(use_mod, dym + gtest, dym)

        # Forced bisection when the bracketed interval shrinks too slowly.
        force = brackt_n & (jnp.abs(stym - stxm)
                            >= 0.66 * width1)
        stp_n = jnp.where(force, stxm + 0.5 * (stym - stxm), stp_n)
        width1_n = jnp.where(brackt_n, width, width1)
        width_n = jnp.where(brackt_n, jnp.abs(stym - stxm), width)

        stmin_n = jnp.where(brackt_n, jnp.minimum(stxm, stym),
                            stp_n + xtrapl * (stp_n - stxm))
        stmax_n = jnp.where(brackt_n, jnp.maximum(stxm, stym),
                            stp_n + xtrapu * (stp_n - stxm))
        stp_n = jnp.clip(stp_n, cfg.alpha_min, cfg.alpha_max)
        # Degenerate bracket → park at the best point and stop next round.
        bad = brackt_n & ((stp_n <= stmin_n) | (stp_n >= stmax_n))
        stp_n = jnp.where(bad, stxm, stp_n)

        stp_out = jnp.where(new_done, stp, stp_n)
        return (stage_n, stxm, fx_n, dx_n, stym, fy_n, dy_n, stp_out,
                brackt_n, width_n, width1_n, stmin_n, stmax_n,
                new_done, new_success, it + 1)

    out = jax.lax.while_loop(cond, body, init)
    stp, success, it = out[7], out[14], out[15]
    return stp, success, it + 1


def wolfe_ls_solve(cfg, ctx, u, du, fu):
    """Dispatch used by ``core.linesearch.ls_solve``."""
    from .linesearch import LSResult
    if isinstance(cfg, StaticLineSearch):
        dtype = _real_dtype(jax.tree_util.tree_leaves(u)[0])
        alpha = jnp.asarray(cfg.alpha, dtype)
        fu_new = ctx.f_flat(u + alpha * du)
        ok = jnp.all(jnp.isfinite(fu_new))
        return LSResult(alpha=alpha, success=ok, state=None, nf=1)
    if isinstance(cfg, StrongWolfe):
        a, ok, nf = _strong_wolfe(cfg, ctx, u, du, fu)
    elif isinstance(cfg, HagerZhang):
        a, ok, nf = _hager_zhang(cfg, ctx, u, du, fu)
    elif isinstance(cfg, MoreThuente):
        a, ok, nf = _more_thuente(cfg, ctx, u, du, fu)
    else:  # pragma: no cover
        raise ValueError(f"unknown Wolfe linesearch {cfg!r}")
    return LSResult(alpha=a, success=ok, state=None, nf=nf)
