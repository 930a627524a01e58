"""Line-search globalization.

TPU-native equivalents of the LineSearch.jl algorithms the reference composes
(SURVEY.md §1: globalization = linesearch | trustregion | none):

* ``BackTracking`` — Armijo backtracking with quadratic interpolation
  (LineSearches.jl-style; c₁=1e-4, ρ ∈ [0.1, 0.5]).
* ``LiFukushimaLineSearch`` — derivative-free line search of Li & Fukushima
  (2000): ``‖F(x+λd)‖ ≤ ρ‖F(x)‖ - σ₂‖λd‖²`` with geometric backtracking;
  the default line search for quasi-Newton resets in the reference.
* ``RobustNonMonotoneLineSearch`` — the DF-SANE line search (La Cruz,
  Martínez & Raydan 2006): nonmonotone condition over an M-history of merit
  values with forward/backward steps and quadratic-interpolation clipping to
  ``[τ_min, τ_max]·α`` (parameters from
  /root/reference/lib/NonlinearSolveSpectralMethods/src/dfsane.jl:22-35).

Everything runs inside jit as ``lax.while_loop``s with static iteration caps.
Protocol: ``ls_init(cfg, ctx, fu, u) -> state``;
``ls_solve(cfg, state, ctx, u, du, fu, J, nsteps) -> LSResult``;
``ls_post_step(cfg, state, fu_new) -> state``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.norms import l2_norm, tree_dot
from ..utils.pytree import pytree_dataclass, static_config
from .descent import DescentCtx


@static_config
class BackTracking:
    c_1: float = 1e-4
    rho_hi: float = 0.5
    rho_lo: float = 0.1
    initial_alpha: float = 1.0
    maxiters: int = 100


@static_config
class LiFukushimaLineSearch:
    lambda_0: float = 1.0
    beta: float = 0.5
    sigma_1: float = 1e-3
    sigma_2: float = 1e-3
    eta: float = 0.1
    rho: float = 0.9
    nan_maxiters: int = 5
    maxiters: int = 100


@static_config
class RobustNonMonotoneLineSearch:
    gamma: float = 1e-4
    sigma_1: float = 1.0
    M: int = 10
    tau_min: float = 0.1
    tau_max: float = 0.5
    n_exp: int = 2
    maxiters: int = 100


@pytree_dataclass
class LSResult:
    alpha: Any
    success: Any
    state: Any
    nf: Any


@pytree_dataclass
class RNMLSState:
    history: Any       # (M,) merit ring buffer
    f_1: Any           # merit of the initial iterate (η strategy numerator)
    nsteps: Any        # outer steps seen (η strategy denominator)


def _real_dtype(x):
    return jnp.zeros((), jnp.asarray(x).dtype).real.dtype


def ls_init(cfg, ctx: DescentCtx, fu, u):
    if isinstance(cfg, RobustNonMonotoneLineSearch):
        merit = l2_norm(fu) ** cfg.n_exp
        history = jnp.full((cfg.M,), merit,
                           _real_dtype(jax.tree_util.tree_leaves(fu)[0]))
        return RNMLSState(history=history, f_1=merit, nsteps=jnp.int32(0))
    return None


def _merit(fu):
    return 0.5 * tree_dot(fu, fu)


def ls_solve(cfg, state, ctx: DescentCtx, u, du, fu, J, nsteps) -> LSResult:
    if isinstance(cfg, BackTracking):
        return _backtracking(cfg, ctx, u, du, fu, J)
    if isinstance(cfg, LiFukushimaLineSearch):
        return _li_fukushima(cfg, state, ctx, u, du, fu, nsteps)
    if isinstance(cfg, RobustNonMonotoneLineSearch):
        return _robust_nonmonotone(cfg, state, ctx, u, du, fu)
    from .wolfe_linesearch import _WOLFE_TYPES, wolfe_ls_solve
    if isinstance(cfg, _WOLFE_TYPES):
        return wolfe_ls_solve(cfg, ctx, u, du, fu)
    raise ValueError(f"unknown linesearch {cfg!r}")


def _backtracking(cfg: BackTracking, ctx: DescentCtx, u, du, fu, J) -> LSResult:
    from ..ops.operators import mv
    phi0 = _merit(fu)
    if J is not None:
        slope = tree_dot(fu, mv(J, du))
    else:
        _, jvp_val = jax.jvp(ctx.f_flat, (u,), (du,))
        slope = tree_dot(fu, jvp_val)
    dtype = _real_dtype(jax.tree_util.tree_leaves(u)[0])
    alpha0 = jnp.asarray(cfg.initial_alpha, dtype)

    def phi(alpha):
        return _merit(ctx.f_flat(u + alpha * du))

    def cond(carry):
        alpha, phival, it, done = carry
        return (~done) & (it < cfg.maxiters)

    def body(carry):
        alpha, phival, it, done = carry
        ok = phival <= phi0 + cfg.c_1 * alpha * slope
        # Quadratic interpolation minimizer, clipped to [ρ_lo, ρ_hi]·α.
        denom = 2.0 * (phival - phi0 - alpha * slope)
        alpha_q = -slope * alpha * alpha / jnp.where(denom == 0,
                                                     jnp.ones_like(denom), denom)
        alpha_new = jnp.clip(alpha_q, cfg.rho_lo * alpha, cfg.rho_hi * alpha)
        alpha_new = jnp.where(jnp.isfinite(alpha_new), alpha_new,
                              cfg.rho_hi * alpha)
        alpha_next = jnp.where(ok, alpha, alpha_new)
        phi_next = jnp.where(ok, phival, phi(alpha_new))
        return alpha_next, phi_next, it + 1, done | ok

    alpha, phival, it, done = jax.lax.while_loop(
        cond, body, (alpha0, phi(alpha0), jnp.int32(0), jnp.bool_(False)))
    # Success requires the Armijo condition to actually hold (exhausting
    # maxiters without satisfying it is a line-search FAILURE, which the
    # engines map to InternalLineSearchFailed / a Jacobian reset).
    success = (phival <= phi0 + cfg.c_1 * alpha * slope) \
        & jnp.isfinite(alpha) & jnp.isfinite(phival)
    return LSResult(alpha=alpha, success=success, state=None, nf=it + 1)


def _li_fukushima(cfg: LiFukushimaLineSearch, state, ctx: DescentCtx, u, du,
                  fu, nsteps) -> LSResult:
    """Li & Fukushima (2000) derivative-free line search, two-condition
    form: the strong test ``‖F(x+λd)‖ ≤ ρ‖F(x)‖ − σ₂λ²‖d‖²`` accepts the
    (nan-guarded) full step; failed full steps backtrack under the RELAXED
    nonmonotone condition ``‖F(x+λd)‖ ≤ (1+η_k)‖F(x)‖ − σ₁λ²‖d‖²`` with
    the summable sequence η_k = η/(k+1)² (k = outer iteration).
    Exhausting maxiters (or the NaN guard) is a FAILURE."""
    dtype = _real_dtype(jax.tree_util.tree_leaves(u)[0])
    fu_norm = l2_norm(fu)
    d_norm2 = tree_dot(du, du)
    k = jnp.asarray(nsteps, dtype)
    eta_k = cfg.eta / (k + 1.0) ** 2

    # NaN guard: shrink λ until f(u + λ d) is finite (nan_maxiters rounds).
    def nan_cond(carry):
        lam, it = carry
        finite = jnp.all(jnp.isfinite(ctx.f_flat(u + lam * du)))
        return (~finite) & (it < cfg.nan_maxiters)

    def nan_body(carry):
        lam, it = carry
        return lam * cfg.beta, it + 1

    lam0, nan_iters = jax.lax.while_loop(
        nan_cond, nan_body, (jnp.asarray(cfg.lambda_0, dtype), jnp.int32(0)))
    nan_ok = jnp.all(jnp.isfinite(ctx.f_flat(u + lam0 * du)))

    # Strong full-step test (ρ, σ₂).
    f_full = l2_norm(ctx.f_flat(u + lam0 * du))
    full_ok = f_full <= cfg.rho * fu_norm - cfg.sigma_2 * lam0 * lam0 * d_norm2

    def cond(carry):
        lam, it, done = carry
        return (~done) & (it < cfg.maxiters)

    def body(carry):
        lam, it, done = carry
        fnew = l2_norm(ctx.f_flat(u + lam * du))
        ok = fnew <= (1.0 + eta_k) * fu_norm \
            - cfg.sigma_1 * lam * lam * d_norm2
        lam_next = jnp.where(ok, lam, lam * cfg.beta)
        return lam_next, it + 1, done | ok

    lam_bt, it, bt_ok = jax.lax.while_loop(
        cond, body, (lam0 * cfg.beta, jnp.int32(0), jnp.bool_(False)))
    lam = jnp.where(full_ok, lam0, lam_bt)
    it = jnp.where(full_ok, jnp.int32(0), it)
    success = nan_ok & (full_ok | bt_ok)
    return LSResult(alpha=lam, success=success, state=state,
                    nf=it + nan_iters + 2)


def _robust_nonmonotone(cfg: RobustNonMonotoneLineSearch, state: RNMLSState,
                        ctx: DescentCtx, u, du, fu) -> LSResult:
    """DF-SANE line search (la2006spectral, Alg. 1 step 3)."""
    dtype = _real_dtype(jax.tree_util.tree_leaves(u)[0])
    f_cur = l2_norm(fu) ** cfg.n_exp
    f_bar = jnp.max(state.history)
    n = state.nsteps + 1
    eta = state.f_1 / (n.astype(dtype) ** 2)

    def merit_at(alpha):
        return l2_norm(ctx.f_flat(u + alpha * du)) ** cfg.n_exp

    def cond(carry):
        ap, am, it, alpha_found, _ = carry
        return (~alpha_found) & (it < cfg.maxiters)

    def body(carry):
        ap, am, it, _, _ = carry
        fp = merit_at(ap)
        ok_p = fp <= f_bar + eta - cfg.gamma * ap * ap * f_cur
        fm = merit_at(-am)
        ok_m = fm <= f_bar + eta - cfg.gamma * am * am * f_cur
        alpha = jnp.where(ok_p, ap, -am)
        found = ok_p | ok_m
        # Quadratic-interpolation update clipped to [τ_min, τ_max]·α.
        ap_new = jnp.clip(ap * ap * f_cur / (fp + (2.0 * ap - 1.0) * f_cur),
                          cfg.tau_min * ap, cfg.tau_max * ap)
        am_new = jnp.clip(am * am * f_cur / (fm + (2.0 * am - 1.0) * f_cur),
                          cfg.tau_min * am, cfg.tau_max * am)
        ap_new = jnp.where(jnp.isfinite(ap_new), ap_new, cfg.tau_min * ap)
        am_new = jnp.where(jnp.isfinite(am_new), am_new, cfg.tau_min * am)
        return (jnp.where(found, ap, ap_new), jnp.where(found, am, am_new),
                it + 1, found, alpha)

    one = jnp.asarray(cfg.sigma_1, dtype)
    ap, am, it, found, alpha = jax.lax.while_loop(
        cond, body, (one, one, jnp.int32(0), jnp.bool_(False),
                     jnp.zeros((), dtype)))
    return LSResult(alpha=alpha, success=found, state=state, nf=2 * it)


def ls_post_step(cfg, state, fu_new):
    """Push the accepted iterate's merit into the nonmonotone history ring.
    Callers invoke this only at commit points, so every merit pushed
    belongs to an accepted iterate."""
    if isinstance(cfg, RobustNonMonotoneLineSearch) and state is not None:
        merit = l2_norm(fu_new) ** cfg.n_exp
        nsteps = state.nsteps + 1
        slot = jnp.mod(nsteps - 1, cfg.M)
        return state.replace(history=state.history.at[slot].set(merit),
                             nsteps=nsteps)
    return state
