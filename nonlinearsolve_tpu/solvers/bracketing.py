"""Bracketing tier — scalar interval methods.

TPU-native redesign of /root/reference/lib/BracketingNonlinearSolve/:
Bisection (bisection.jl:22-88), Falsi, Ridder, Brent (brent.jl:20-119),
ITP (itp.jl:43-140), Alefeld (Alefeld–Potra–Shi 1995 alg. 4.2), Muller
(muller.jl:30-85) and the default ModAB (modAB.jl; default wiring
BracketingNonlinearSolve.jl:46-52).

All are scalar ``lax.while_loop``s — jit-able and vmap-able, which is the TPU
analogue of the reference's "runs inside GPU kernels" claim for this tier.
Retcodes mirror the reference: ExactSolutionLeft/Right for endpoint roots,
InitialFailure for a non-enclosing interval, FloatingPointLimit when the
bracket collapses to adjacent floats, Success on |bracket|/2 < abstol.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.problems import IntervalNonlinearProblem
from ..core.returncode import ReturnCode
from ..core.solution import NLStats, NonlinearSolution
from ..utils.norms import get_tolerance
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class Bisection:
    exact_left: bool = False
    exact_right: bool = False
    name: str = "Bisection"


@static_config
class Falsi:
    name: str = "Falsi"


@static_config
class Ridder:
    name: str = "Ridder"


@static_config
class Brent:
    name: str = "Brent"


@static_config
class ITP:
    scaled_k1: float = 0.2
    k2: float = 2.0
    n0: int = 10
    name: str = "ITP"

    def __post_init__(self):
        if self.scaled_k1 < 0:
            raise ValueError("scaled_k1 must be non-negative")
        if not (1 <= self.k2 <= 1.5 + 5 ** 0.5 / 2):
            raise ValueError("k2 must be in [1, 1+phi)")
        if self.n0 < 0:
            raise ValueError("n0 must be non-negative")


@static_config
class Alefeld:
    name: str = "Alefeld"


@static_config
class Muller:
    middle: Optional[float] = None
    name: str = "Muller"


@static_config
class ModAB:
    name: str = "ModAB"


BRACKETING_ALGS = (Bisection, Falsi, Ridder, Brent, ITP, Alefeld, Muller,
                   ModAB)


@pytree_dataclass
class BracketCarry:
    left: Any
    right: Any
    fl: Any
    fr: Any
    u: Any
    fu: Any
    extra: Any
    i: Any
    done: Any
    retcode: Any
    nf: Any


def _mid_is_degenerate(mid, left, right):
    return (mid == left) | (mid == right)


def _run_bracketing(f, alg, left, right, abstol, maxiters):
    """Shared driver: pre-checks + method loop.  Returns a BracketCarry."""
    dtype = jnp.result_type(left, right)
    left = jnp.asarray(left, dtype)
    right = jnp.asarray(right, dtype)
    lo = jnp.minimum(left, right)
    hi = jnp.maximum(left, right)
    if not isinstance(alg, (Muller,)):
        left, right = lo, hi
    fl, fr = f(left), f(right)

    exact_l = fl == 0
    exact_r = (fr == 0) & ~exact_l
    non_enclosing = (jnp.sign(fl) == jnp.sign(fr)) & ~exact_l & ~exact_r
    if isinstance(alg, Muller):
        non_enclosing = jnp.bool_(False)  # Muller needs no bracket

    pre_done = exact_l | exact_r | non_enclosing
    pre_retcode = jnp.where(
        exact_l, jnp.int32(ReturnCode.ExactSolutionLeft),
        jnp.where(exact_r, jnp.int32(ReturnCode.ExactSolutionRight),
                  jnp.int32(ReturnCode.InitialFailure)))
    pre_u = jnp.where(exact_r, right, left)
    pre_fu = jnp.where(exact_r, fr, fl)

    step, extra0 = _make_step(f, alg, left, right, fl, fr, abstol)

    carry0 = BracketCarry(
        left=left, right=right, fl=fl, fr=fr, u=pre_u, fu=pre_fu,
        extra=extra0, i=jnp.int32(0), done=pre_done, retcode=pre_retcode,
        nf=jnp.int32(2))

    def cond(c):
        return (~c.done) & (c.i < maxiters)

    def body(c):
        c = step(c)
        return c.replace(i=c.i + 1)

    final = jax.lax.while_loop(cond, body, carry0)
    retcode = jnp.where(
        final.done, final.retcode,
        jnp.int32(ReturnCode.MaxIters))
    u = jnp.where(final.done, final.u, final.left)
    fu = jnp.where(final.done, final.fu, final.fl)
    return final.replace(retcode=retcode, u=u, fu=fu)


def _finish(c, u, fu, retcode):
    return c.replace(u=u, fu=fu, retcode=jnp.int32(retcode),
                     done=jnp.bool_(True))


def _sel(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _make_step(f, alg, left0, right0, fl0, fr0, abstol):
    """Build the per-iteration step function for ``alg``; returns
    (step, extra0)."""
    dtype = left0.dtype
    eps = jnp.finfo(dtype).eps

    if isinstance(alg, Bisection) or isinstance(alg, Falsi):
        is_falsi = isinstance(alg, Falsi)

        def step(c):
            if is_falsi:
                # Regula falsi with midpoint fallback on stall.
                denom = c.fr - c.fl
                mid_f = c.left - c.fl * (c.right - c.left) / jnp.where(
                    denom == 0, jnp.ones_like(denom), denom)
                stalled = (~jnp.isfinite(mid_f)) | (mid_f <= c.left) | \
                    (mid_f >= c.right)
                mid = jnp.where(stalled, (c.left + c.right) / 2, mid_f)
            else:
                mid = (c.left + c.right) / 2
            degenerate = _mid_is_degenerate(mid, c.left, c.right)
            fm = f(mid)
            exact = fm == 0
            converged = jnp.abs((c.right - c.left) / 2) < abstol
            move_left = jnp.sign(c.fl) == jnp.sign(fm)
            new = c.replace(
                left=jnp.where(move_left, mid, c.left),
                fl=jnp.where(move_left, fm, c.fl),
                right=jnp.where(move_left, c.right, mid),
                fr=jnp.where(move_left, c.fr, fm),
                nf=c.nf + 1)
            new = _sel(degenerate,
                       _finish(c, c.left, c.fl, ReturnCode.FloatingPointLimit),
                       _sel(exact, _finish(new, mid, fm, ReturnCode.Success),
                            _sel(converged,
                                 _finish(new, mid, fm, ReturnCode.Success),
                                 new)))
            return new

        return step, None

    if isinstance(alg, Ridder):
        def step(c):
            mid = (c.left + c.right) / 2
            degenerate = _mid_is_degenerate(mid, c.left, c.right)
            fm = f(mid)
            s = jnp.sqrt(jnp.maximum(fm * fm - c.fl * c.fr, 0.0))
            bad = s == 0
            x = mid + (mid - c.left) * jnp.sign(c.fl - c.fr) * fm / \
                jnp.where(bad, jnp.ones_like(s), s)
            x = jnp.clip(x, jnp.minimum(c.left, c.right),
                         jnp.maximum(c.left, c.right))
            fx = f(x)
            exact = fx == 0
            converged = jnp.abs((c.right - c.left) / 2) < abstol
            # Rebracket with (mid, x) pairs.
            use_mx = jnp.sign(fm) != jnp.sign(fx)
            l1 = jnp.where(use_mx, jnp.minimum(mid, x), c.left)
            f1 = jnp.where(use_mx, jnp.where(mid < x, fm, fx), c.fl)
            r1 = jnp.where(use_mx, jnp.maximum(mid, x), c.right)
            f2 = jnp.where(use_mx, jnp.where(mid < x, fx, fm), c.fr)
            # else keep the sign-change side with x
            keep_left = jnp.sign(c.fl) != jnp.sign(fx)
            l2 = jnp.where(keep_left, c.left, x)
            fl2 = jnp.where(keep_left, c.fl, fx)
            r2 = jnp.where(keep_left, x, c.right)
            fr2 = jnp.where(keep_left, fx, c.fr)
            new_left = jnp.where(use_mx, l1, l2)
            new_fl = jnp.where(use_mx, f1, fl2)
            new_right = jnp.where(use_mx, r1, r2)
            new_fr = jnp.where(use_mx, f2, fr2)
            new = c.replace(left=new_left, fl=new_fl, right=new_right,
                            fr=new_fr, nf=c.nf + 2)
            new = _sel(degenerate,
                       _finish(c, c.left, c.fl, ReturnCode.FloatingPointLimit),
                       _sel(exact | bad,
                            _finish(new, x, fx, ReturnCode.Success),
                            _sel(converged,
                                 _finish(new, x, fx, ReturnCode.Success),
                                 new)))
            return new

        return step, None

    if isinstance(alg, Brent):
        # extra = (c, d, cond_flag) per brent.jl:55-119; left/right are
        # maintained so that |f(right)| ≤ |f(left)| is NOT enforced — we
        # follow the reference's swapped convention below.
        swap0 = jnp.abs(fl0) < jnp.abs(fr0)
        left_i = jnp.where(swap0, right0, left0)
        right_i = jnp.where(swap0, left0, right0)

        def step(c):
            cc, d, bisected = c.extra
            fc = f(cc)
            use_iqi = (c.fl != fc) & (c.fr != fc)
            s_iqi = (c.left * c.fr * fc / ((c.fl - c.fr) * (c.fl - fc))
                     + c.right * c.fl * fc / ((c.fr - c.fl) * (c.fr - fc))
                     + cc * c.fl * c.fr / ((fc - c.fl) * (fc - c.fr)))
            s_sec = c.right - c.fr * (c.right - c.left) / (c.fr - c.fl)
            s = jnp.where(use_iqi, s_iqi, s_sec)
            lo = jnp.minimum((3 * c.left + c.right) / 4, c.right)
            hi = jnp.maximum((3 * c.left + c.right) / 4, c.right)
            need_bisect = ((s < lo) | (s > hi)
                           | (bisected & (jnp.abs(s - c.right)
                                          >= jnp.abs(c.right - cc) / 2))
                           | (~bisected & (jnp.abs(s - c.right)
                                           >= jnp.abs(cc - d) / 2))
                           | (bisected & (jnp.abs(c.right - cc) <= eps))
                           | (~bisected & (jnp.abs(cc - d) <= eps))
                           | ~jnp.isfinite(s))
            s_b = (c.left + c.right) / 2
            degenerate = need_bisect & _mid_is_degenerate(s_b, c.left, c.right)
            s = jnp.where(need_bisect, s_b, s)
            bisected_new = need_bisect
            fs = f(s)
            exact = fs == 0
            converged = jnp.abs((c.right - c.left) / 2) < abstol
            sign_change = c.fl * fs < 0
            d_new = jnp.where(sign_change, cc, d)
            c_new = jnp.where(sign_change, c.right, cc)
            right_new = jnp.where(sign_change, s, c.right)
            fr_new = jnp.where(sign_change, fs, c.fr)
            left_new = jnp.where(sign_change, c.left, s)
            fl_new = jnp.where(sign_change, c.fl, fs)
            # maintain |fl| ≥ |fr| by swapping (brent.jl:107-114)
            swap = jnp.abs(fl_new) < jnp.abs(fr_new)
            d_new = jnp.where(swap, c_new, d_new)
            c_new2 = jnp.where(swap, right_new, c_new)
            l2 = jnp.where(swap, right_new, left_new)
            r2 = jnp.where(swap, left_new, right_new)
            fl2 = jnp.where(swap, fr_new, fl_new)
            fr2 = jnp.where(swap, fl_new, fr_new)
            new = c.replace(left=l2, fl=fl2, right=r2, fr=fr2,
                            extra=(c_new2, d_new, bisected_new), nf=c.nf + 2)
            new = _sel(degenerate,
                       _finish(c, c.left, c.fl, ReturnCode.FloatingPointLimit),
                       _sel(exact, _finish(new, s, fs, ReturnCode.Success),
                            _sel(converged,
                                 _finish(new, s, fs, ReturnCode.Success),
                                 new)))
            return new

        def make_extra():
            return (left_i, left_i, jnp.bool_(True))

        step.override_bracket = (left_i, right_i)
        return step, make_extra()

    if isinstance(alg, ITP):
        span0 = right0 - left0
        k1 = alg.scaled_k1 * span0 ** (1 - alg.k2)
        # ε_s init (itp.jl:98-105)
        n_h = jnp.ceil(jnp.log2(jnp.maximum(span0 / (2 * abstol), 1.0)))
        eps_s0 = abstol * jnp.exp2(n_h) * jnp.exp2(float(alg.n0))

        def step(c):
            eps_s = c.extra
            span = c.right - c.left
            mid = (c.left + c.right) / 2
            r = eps_s - span / 2
            denom = c.fl - c.fr
            x_f = c.left + span * (c.fl / jnp.where(denom == 0,
                                                    jnp.ones_like(denom),
                                                    denom))
            delta = jnp.maximum(k1 * span ** alg.k2, jnp.abs(x_f) * eps + eps)
            diff = mid - x_f
            xt = jnp.where(delta <= jnp.abs(diff),
                           x_f + jnp.sign(diff) * delta, mid)
            xp = jnp.where(jnp.abs(xt - mid) <= r, xt,
                           mid - jnp.sign(diff) * r)
            small = span < 2 * abstol
            yp = f(xp)
            yps = yp * jnp.sign(c.fr)
            go_right = yps > 0
            go_left = yps < 0
            exact = yps == 0
            new = c.replace(
                left=jnp.where(go_left, xp, c.left),
                fl=jnp.where(go_left, yp, c.fl),
                right=jnp.where(go_right, xp, c.right),
                fr=jnp.where(go_right, yp, c.fr),
                extra=eps_s / 2, nf=c.nf + 1)
            fp_limit = jnp.nextafter(new.left, new.right) == new.right
            new = _sel(small, _finish(c, xt, f(xt), ReturnCode.Success),
                       _sel(exact, _finish(new, xp, yps, ReturnCode.Success),
                            _sel(fp_limit,
                                 _finish(new, new.right, new.fr,
                                         ReturnCode.FloatingPointLimit),
                                 new)))
            return new

        return step, eps_s0

    if isinstance(alg, Alefeld):
        # Alefeld–Potra–Shi (1995) algorithm 4.2-style: two interpolation
        # substeps + double-secant + safeguarded bisection when the bracket
        # fails to shrink by μ = 1/2.
        mu = 0.5

        def nq(a, b, d, fa, fb, fd):
            """Newton-quadratic step on the quadratic through (a,b,d)."""
            B = (fb - fa) / (b - a)
            A = ((fd - fb) / (d - b) - B) / (d - a)
            r = a - fa / B
            safe_A = jnp.where(A == 0, jnp.ones_like(A), A)

            def newton_iter(r, _):
                P = fa + B * (r - a) + A * (r - a) * (r - b)
                Pp = B + A * (2 * r - a - b)
                r_new = r - P / jnp.where(Pp == 0, jnp.ones_like(Pp), Pp)
                return jnp.where(jnp.isfinite(r_new), r_new, r), None

            r2, _ = jax.lax.scan(newton_iter, r, None, length=2)
            return jnp.where((A == 0) | ~jnp.isfinite(r2), r, r2)

        def bracket(a, b, fa, fb, x, fx):
            """Keep the sign-changing half; returns a,b,d,fa,fb,fd."""
            left_keeps = jnp.sign(fa) != jnp.sign(fx)
            an = jnp.where(left_keeps, a, x)
            fan = jnp.where(left_keeps, fa, fx)
            bn = jnp.where(left_keeps, x, b)
            fbn = jnp.where(left_keeps, fx, fb)
            dn = jnp.where(left_keeps, b, a)
            fdn = jnp.where(left_keeps, fb, fa)
            return an, bn, dn, fan, fbn, fdn

        def step(c):
            d, fd = c.extra
            a, b, fa, fb = c.left, c.right, c.fl, c.fr
            span_in = b - a
            # substep 1: newton-quadratic
            x1 = nq(a, b, d, fa, fb, fd)
            x1 = jnp.clip(x1, jnp.nextafter(a, b), jnp.nextafter(b, a))
            fx1 = f(x1)
            a1, b1, d1, fa1, fb1, fd1 = bracket(a, b, fa, fb, x1, fx1)
            # substep 2: newton-quadratic again
            x2 = nq(a1, b1, d1, fa1, fb1, fd1)
            x2 = jnp.clip(x2, jnp.nextafter(a1, b1), jnp.nextafter(b1, a1))
            fx2 = f(x2)
            a2, b2, d2, fa2, fb2, fd2 = bracket(a1, b1, fa1, fb1, x2, fx2)
            # double-length secant from the smaller-|f| endpoint
            use_a = jnp.abs(fa2) < jnp.abs(fb2)
            u = jnp.where(use_a, a2, b2)
            fu_ = jnp.where(use_a, fa2, fb2)
            denom = fb2 - fa2
            xs = u - 2 * fu_ * (b2 - a2) / jnp.where(denom == 0,
                                                     jnp.ones_like(denom),
                                                     denom)
            xs = jnp.where(jnp.abs(xs - u) > (b2 - a2) / 2,
                           (a2 + b2) / 2, xs)
            xs = jnp.clip(xs, jnp.nextafter(a2, b2), jnp.nextafter(b2, a2))
            fxs = f(xs)
            a3, b3, d3, fa3, fb3, fd3 = bracket(a2, b2, fa2, fb2, xs, fxs)
            # safeguarded bisection if bracket didn't shrink enough
            need_bisect = (b3 - a3) >= mu * span_in
            mid = (a3 + b3) / 2
            fmid = f(mid)
            am, bm, dm, fam, fbm, fdm = bracket(a3, b3, fa3, fb3, mid, fmid)
            a4 = jnp.where(need_bisect, am, a3)
            b4 = jnp.where(need_bisect, bm, b3)
            d4 = jnp.where(need_bisect, dm, d3)
            fa4 = jnp.where(need_bisect, fam, fa3)
            fb4 = jnp.where(need_bisect, fbm, fb3)
            fd4 = jnp.where(need_bisect, fdm, fd3)
            exact = (fx1 == 0) | (fx2 == 0) | (fxs == 0) | \
                (need_bisect & (fmid == 0))
            exact_u = jnp.where(fx1 == 0, x1,
                                jnp.where(fx2 == 0, x2,
                                          jnp.where(fxs == 0, xs, mid)))
            converged = jnp.abs((b4 - a4) / 2) < abstol
            fp_limit = jnp.nextafter(a4, b4) >= b4
            best = jnp.where(jnp.abs(fa4) < jnp.abs(fb4), a4, b4)
            fbest = jnp.where(jnp.abs(fa4) < jnp.abs(fb4), fa4, fb4)
            new = c.replace(left=a4, right=b4, fl=fa4, fr=fb4,
                            extra=(d4, fd4), nf=c.nf + 4)
            new = _sel(exact,
                       _finish(new, exact_u, jnp.zeros_like(fx1),
                               ReturnCode.Success),
                       _sel(converged,
                            _finish(new, best, fbest, ReturnCode.Success),
                            _sel(fp_limit,
                                 _finish(new, best, fbest,
                                         ReturnCode.FloatingPointLimit),
                                 new)))
            return new

        # initial d: the secant point of (left, right)
        d0 = (left0 + right0) / 2
        return step, (d0, f(d0))

    if isinstance(alg, Muller):
        xm0 = ((left0 + right0) / 2 if alg.middle is None
               else jnp.asarray(alg.middle, dtype))

        def step(c):
            x0, x1, x2, f0, f1, f2 = c.extra
            q = (x2 - x1) / (x1 - x0)
            A = q * f2 - q * (1 + q) * f1 + q * q * f0
            B = (2 * q + 1) * f2 - (1 + q) ** 2 * f1 + q * q * f0
            C = (1 + q) * f2
            disc = jnp.sqrt(jnp.maximum(B * B - 4 * A * C, 0.0))
            denom_p = B + disc
            denom_m = B - disc
            denom = jnp.where(jnp.abs(denom_p) >= jnp.abs(denom_m), denom_p,
                              denom_m)
            x3 = x2 - (x2 - x1) * 2 * C / jnp.where(denom == 0,
                                                    jnp.ones_like(denom),
                                                    denom)
            f3 = f(x3)
            converged = jnp.abs(f3) <= abstol
            new = c.replace(extra=(x1, x2, x3, f1, f2, f3), u=x3, fu=f3,
                            nf=c.nf + 1)
            return _sel(converged, _finish(new, x3, f3, ReturnCode.Success),
                        new)

        return step, (left0, xm0, right0, fl0, f(xm0), fr0)

    if isinstance(alg, ModAB):
        C = 16.0

        def step(c):
            bisecting, side, threshold = c.extra
            # --- bisection branch
            x3_b = (c.left + c.right) / 2
            y3_b = f(x3_b)
            ym = (c.fl + c.fr) / 2
            r = 1 - jnp.abs(ym / (c.fr - c.fl))
            k = r * r
            switch_to_ab = jnp.abs(ym - y3_b) < k * (jnp.abs(ym)
                                                     + jnp.abs(y3_b))
            # --- Anderson-Björck branch
            denom = c.fr - c.fl
            x3_ab = (c.left * c.fr - c.fl * c.right) / jnp.where(
                denom == 0, jnp.ones_like(denom), denom)
            x3_ab = jnp.clip(x3_ab, jnp.nextafter(c.left, c.right),
                             jnp.nextafter(c.right, c.left))
            x3 = jnp.where(bisecting, x3_b, x3_ab)
            y3 = jnp.where(bisecting, y3_b, f(x3_ab))
            threshold = jnp.where(
                bisecting,
                jnp.where(switch_to_ab, (c.right - c.left) * C, threshold),
                threshold / 2)
            bisecting_new = jnp.where(bisecting, ~switch_to_ab,
                                      jnp.bool_(False))
            exact = y3 == 0
            converged = (c.right - c.left) < 2 * abstol
            same_side_left = jnp.sign(c.fl) == jnp.sign(y3)
            # Anderson-Björck corrections
            m_r = 1 - y3 / c.fl
            corr_r = jnp.where(m_r <= 0, 0.5, m_r)
            fr_corr = jnp.where(same_side_left & (side == 1), c.fr * corr_r,
                                c.fr)
            m_l = 1 - y3 / c.fr
            corr_l = jnp.where(m_l <= 0, 0.5, m_l)
            fl_corr = jnp.where(~same_side_left & (side == -1), c.fl * corr_l,
                                c.fl)
            side_new = jnp.where(
                bisecting_new | bisecting,
                side,
                jnp.where(same_side_left, jnp.int32(1), jnp.int32(-1)))
            # accept x3 into the bracket
            new_left = jnp.where(same_side_left, x3, c.left)
            new_fl = jnp.where(same_side_left, y3, fl_corr)
            new_right = jnp.where(same_side_left, c.right, x3)
            new_fr = jnp.where(same_side_left, fr_corr, y3)
            fp_limit = jnp.nextafter(new_left, new_right) == new_right
            # reset to bisection if AB fails to shrink
            reset = (new_right - new_left) > threshold
            bisecting_new = bisecting_new | reset
            side_new = jnp.where(reset, jnp.int32(0), side_new)
            new = c.replace(left=new_left, fl=new_fl, right=new_right,
                            fr=new_fr,
                            extra=(bisecting_new, side_new, threshold),
                            nf=c.nf + 1)
            new = _sel(exact, _finish(new, x3, y3, ReturnCode.Success),
                       _sel(converged, _finish(new, x3, y3,
                                               ReturnCode.Success),
                            _sel(fp_limit,
                                 _finish(new, new.right, new.fr,
                                         ReturnCode.FloatingPointLimit),
                                 new)))
            return new

        return step, (jnp.bool_(True), jnp.int32(0), right0 - left0)

    raise ValueError(f"unknown bracketing algorithm {alg!r}")


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _bracket_root(f, alg, left, right, p, abstol, maxiters):
    return _run_bracketing(lambda x: f(x, p), alg, left, right, abstol,
                           maxiters)


@_bracket_root.defjvp
def _bracket_root_jvp(f, alg, primals, tangents):
    """Scalar IFT through the bracketing solve: u̇ = −(∂f/∂p·ṗ)/(∂f/∂u).

    The bisection-family iterations use non-differentiable primitives
    (nextafter, sign tests), so — like the reference's ForwardDiff
    extension (lib/BracketingNonlinearSolve ext) — the solve runs on
    primals and the sensitivity is attached analytically at the root.
    Tangents w.r.t. the bracket endpoints and tolerances are zero."""
    left, right, p, abstol, maxiters = primals
    _, _, p_dot, _, _ = tangents
    final = _bracket_root(f, alg, left, right, p, abstol, maxiters)
    u = final.u

    dfdu = jax.grad(lambda x: f(x, p))(u)
    _, dfp = jax.jvp(lambda pp: f(u, pp), (p,), (p_dot,))
    u_dot = -dfp / jnp.where(dfdu == 0, jnp.ones_like(dfdu), dfdu)

    def zeros_like_leaf(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros_like(x)
        return jnp.zeros(x.shape, dtype=jax.dtypes.float0)

    final_dot = jax.tree_util.tree_map(zeros_like_leaf, final)
    final_dot = final_dot.replace(u=u_dot)
    return final, final_dot


@functools.partial(jax.jit, static_argnums=(0, 1))
def _jitted_bracket(f, alg, left, right, p, abstol, maxiters):
    return _bracket_root(f, alg, left, right, p, abstol, maxiters)


def solve_bracketing(prob: IntervalNonlinearProblem, alg=None, *, abstol=None,
                     maxiters=1000, verbose=None, **_ignored
                     ) -> NonlinearSolution:
    """Entry point for IntervalNonlinearProblem (default: ModAB)."""
    if alg is None:
        alg = ModAB()
    left, right = prob.tspan
    dtype = jnp.result_type(jnp.asarray(left).dtype, jnp.asarray(right).dtype,
                            jnp.float32)
    abstol_v = jnp.asarray(get_tolerance(abstol, dtype), dtype)
    final = _jitted_bracket(prob.f, alg, jnp.asarray(left, dtype),
                            jnp.asarray(right, dtype), prob.p, abstol_v,
                            jnp.int32(maxiters))
    from ..core.verbosity import normalize_verbosity
    vrb = normalize_verbosity(verbose)
    if vrb is not None and int(final.retcode) == int(ReturnCode.InitialFailure):
        vrb.emit("non_enclosing_interval",
                 f"the interval ({float(left)}, {float(right)}) does not "
                 "enclose a sign change; returning InitialFailure "
                 "(BracketingNonlinearSolve pre-check)")
    return NonlinearSolution(
        u=final.u, resid=final.fu, retcode=final.retcode,
        stats=NLStats(nf=final.nf, njacs=jnp.int32(0),
                      nfactors=jnp.int32(0), nsolve=jnp.int32(0),
                      nsteps=final.i),
        original=(final.left, final.right),
    )
