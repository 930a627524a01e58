"""Polynomial-system solving by total-degree homotopy continuation.

TPU-native analogue of NonlinearSolveHomotopyContinuation
(/root/reference/lib/NonlinearSolveHomotopyContinuation/, which wraps
HomotopyContinuation.jl): find ALL isolated complex roots of a square
polynomial system, or the root closest to a guess.

Method (the classical total-degree construction):
  start system   g_i(x) = x_i^{d_i} - 1        (roots: roots of unity grid)
  homotopy       H(x, t) = (1-t)·γ·g(x) + t·f(x),  γ random complex
                 (the "gamma trick": for almost every γ the ∏d_i paths are
                 nonsingular for t ∈ [0, 1))
  tracking       adaptive-step predictor–corrector per path: Euler predictor
                 x += dt·ẋ with ẋ from H_x ẋ = -H_t, then complex Newton
                 correction at fixed t; dt halves on corrector failure and
                 grows on streaks.

**Every path is tracked in a single ``lax.while_loop`` and all ∏d_i paths
run under one ``vmap``** — path tracking is embarrassingly parallel and maps
onto the TPU's batched complex linear algebra (c64 LU is MXU-supported).

Unlike the reference wrapper, polynomialization of arbitrary Julia functions
(taylor_polynomialize.jl) is out of scope: callers pass a polynomial
residual plus its per-variable degrees.
"""

from __future__ import annotations

import functools
import itertools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.returncode import ReturnCode
from ..core.solution import NLStats, NonlinearSolution
from ..ops.linear_solve import _square_solve
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class PolynomialHomotopy:
    """All-roots (or nearest-root) polynomial solver.

    degrees: per-equation total degrees d_i (Bézout bound ∏ d_i paths).
    """

    degrees: Tuple[int, ...] = ()
    gamma_seed: int = 0
    corrector_iters: int = 8
    corrector_tol: float = 1e-8
    dt_initial: float = 0.05
    dt_min: float = 1e-7
    maxsteps: int = 2000
    endgame_tol: float = 1e-8
    name: str = "PolynomialHomotopy"


def _start_roots(degrees: Sequence[int], dtype=jnp.complex64) -> jnp.ndarray:
    """All combinations of d_i-th roots of unity: (∏d_i, n) complex."""
    roots_per_var = [np.exp(2j * np.pi * np.arange(d) / d) for d in degrees]
    combos = list(itertools.product(*roots_per_var))
    return jnp.asarray(np.array(combos), dtype)


def _track_paths(f_cplx: Callable, degrees, alg: PolynomialHomotopy,
                 dtype=jnp.complex64):
    """Track all total-degree paths; returns (endpoints, success)."""
    n = len(degrees)
    rng = np.random.default_rng(alg.gamma_seed)
    theta = rng.uniform(0, 2 * np.pi)
    gamma = jnp.asarray(np.exp(1j * theta), dtype)
    degs = jnp.asarray(np.array(degrees), dtype)

    def g(x):
        return x ** degs - 1.0

    def H(x, t):
        return (1.0 - t) * gamma * g(x) + t * f_cplx(x)

    def H_x(x, t):
        return jax.jacfwd(lambda y: H(y, t), holomorphic=True)(x)

    def H_t(x, t):
        return f_cplx(x) - gamma * g(x)

    real_dtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64

    def corrector(x, t):
        def body(k, carry):
            x, ok, dx_norm = carry
            r = H(x, t)
            J = H_x(x, t)
            dx = _square_solve(J, r)
            finite = jnp.all(jnp.isfinite(dx.real) & jnp.isfinite(dx.imag))
            x = jnp.where(finite, x - dx, x)
            dx_norm = jnp.where(finite, jnp.max(jnp.abs(dx)), dx_norm)
            return x, ok & finite, dx_norm

        big = jnp.asarray(jnp.inf, real_dtype)
        x, ok, dx_norm = jax.lax.fori_loop(0, alg.corrector_iters, body,
                                           (x, jnp.bool_(True), big))
        # Newton-increment convergence: robust to wildly scaled polynomial
        # values (a residual test fails on e.g. Wilkinson-type products).
        scale = 1.0 + jnp.max(jnp.abs(x))
        return x, ok & (dx_norm <= alg.corrector_tol * scale)

    def track_one(x0):
        def cond(c):
            x, t, dt, steps, done, failed = c
            return ~(done | failed)

        def body(c):
            x, t, dt, steps, done, failed = c
            t_next = jnp.minimum(t + dt, 1.0)
            # Euler predictor: H_x ẋ = -H_t
            J = H_x(x, t)
            xdot = -_square_solve(J, H_t(x, t))
            finite = jnp.all(jnp.isfinite(xdot.real))
            x_pred = jnp.where(finite, x + (t_next - t) * xdot, x)
            x_corr, ok = corrector(x_pred, t_next)
            ok = ok & finite
            x_new = jnp.where(ok, x_corr, x)
            t_new = jnp.where(ok, t_next, t)
            # Slow down in the endgame region: paths cluster as t → 1,
            # so the step is additionally capped by a fraction of (1 - t).
            dt_cap = jnp.maximum(0.25 * (1.0 - t_next), 5e-3)
            dt_new = jnp.where(ok, jnp.minimum(jnp.minimum(dt * 1.5, 0.1),
                                               dt_cap), dt / 2.0)
            steps = steps + 1
            done = ok & (t_next >= 1.0)
            failed = (~ok & (dt_new < alg.dt_min)) | (steps >= alg.maxsteps)
            return x_new, t_new, dt_new, steps, done, failed

        x, t, dt, steps, done, failed = jax.lax.while_loop(
            cond, body,
            (x0, jnp.zeros((), real_dtype),
             jnp.asarray(alg.dt_initial, real_dtype), jnp.int32(0),
             jnp.bool_(False), jnp.bool_(False)))
        # endgame: polish at t = 1 on the target system
        x, polished = corrector(x, jnp.ones((), real_dtype))
        return x, done & polished, steps

    starts = _start_roots(degrees, dtype)
    return jax.vmap(track_one)(starts)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _jitted_track(f_static, alg, dtype, p):
    def f_cplx(x):
        return f_static(x, p)

    return _track_paths(f_cplx, alg.degrees, alg, dtype)


def solve_polynomial(prob, alg: PolynomialHomotopy, *, all_roots: bool = True,
                     real_only: bool = False, imag_tol: float = 1e-6,
                     dedupe_tol: float = 1e-6, gamma_retries: int = 4,
                     **_ignored):
    """Solve a polynomial NonlinearProblem.

    all_roots=True → ``sol.u`` is an (n_roots, n) array of distinct roots
    (``sol.original`` holds every tracked endpoint); otherwise the root
    closest to ``prob.u0`` is returned (the reference's guess-root
    selection, lib/NonlinearSolveHomotopyContinuation/src/solve.jl).
    """
    if not alg.degrees:
        raise ValueError("PolynomialHomotopy requires per-equation degrees")
    u0 = jnp.asarray(prob.u0)
    real_dtype = u0.dtype
    dtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64

    f = prob.f.f
    bezout = int(np.prod(alg.degrees))
    total_steps = 0

    # Path jumping (two paths landing on the same root) loses roots for a
    # single γ; rerunning with fresh random γ values and taking the union is
    # the standard remedy (each run is one vmapped track).  Stops early once
    # the Bézout count is reached.
    uniq = []
    endpoints = ok = None
    for attempt in range(max(1, int(gamma_retries))):
        alg_a = alg if attempt == 0 else alg.replace(
            gamma_seed=alg.gamma_seed + 7919 * attempt)
        endpoints, ok, steps = _jitted_track(f, alg_a, dtype, prob.p)
        total_steps += int(np.asarray(steps).sum())
        roots = np.asarray(endpoints)[np.asarray(ok)]
        for r in roots:
            if not any(np.max(np.abs(r - q))
                       < dedupe_tol * (1 + np.max(np.abs(q))) for q in uniq):
                uniq.append(r)
        if len(uniq) >= bezout:
            break
    uniq = np.array(uniq) if uniq else np.zeros((0, u0.size), np.complex128)

    if real_only:
        mask = np.all(np.abs(uniq.imag) < imag_tol, axis=1)
        uniq = uniq[mask].real.astype(real_dtype)

    n_found = len(uniq)
    retcode = jnp.int32(ReturnCode.Success if n_found > 0
                        else ReturnCode.Failure)
    stats = NLStats.zeros().incr(nsteps=total_steps)

    if all_roots:
        return NonlinearSolution(
            u=jnp.asarray(uniq), resid=jnp.zeros((n_found,), real_dtype),
            retcode=retcode, stats=stats,
            original=(endpoints, ok))
    if n_found == 0:
        return NonlinearSolution(u=u0, resid=jnp.asarray(f(u0, prob.p)),
                                 retcode=jnp.int32(ReturnCode.Failure),
                                 stats=stats)
    if np.iscomplexobj(uniq):
        dists = np.max(np.abs(uniq - np.asarray(u0)[None]), axis=1)
    else:
        dists = np.max(np.abs(uniq - np.asarray(u0)[None]), axis=1)
    best = uniq[int(np.argmin(dists))]
    u_best = jnp.asarray(best.real if np.iscomplexobj(best) else best,
                         real_dtype)
    return NonlinearSolution(
        u=u_best, resid=jnp.asarray(f(u_best, prob.p)), retcode=retcode,
        stats=stats, original=(endpoints, ok))
