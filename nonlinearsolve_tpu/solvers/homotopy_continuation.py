"""All-roots solving for polynomial / rational / transformed systems.

TPU-native replacement for the reference's HomotopyContinuation.jl bridge
(/root/reference/lib/NonlinearSolveHomotopyContinuation/src/solve.jl and
taylor_polynomialize.jl): the same user contract — a
``HomotopyNonlinearFunction`` carrying ``polynomialize`` /
``unpolynomialize`` / ``denominator`` transforms around a polynomial-space
residual — driven by the in-repo vmapped total-degree path tracker
(``solvers/poly_homotopy.py``) instead of the external HC.jl binary.

Two algorithms, mirroring the reference's exports:

* ``HomotopyContinuationJL`` — the residual *is* polynomial; per-equation
  degrees are taken from ``degrees`` or measured exactly along a random ray
  (finite differences of a polynomial terminate).  All Bézout paths are
  tracked in one vmap.
* ``TaylorHomotopyContinuationJL`` — smooth residuals: a degree-``degree``
  Taylor surrogate is built with nested ``jax.jacfwd`` (exact AD, the
  analogue of the reference's TaylorDiff expansion,
  taylor_polynomialize.jl:257-299), its roots tracked, and every candidate
  polished against the TRUE residual with a vmapped Newton
  (newton_polish, taylor_polynomialize.jl:230-255).

Both filter roots where ``denominator`` vanishes (denominator_abstol,
solve.jl:60-96), map survivors through ``unpolynomialize``, and return
either all distinct real roots (``all_roots=True``, the reference's
``HomotopyContinuationJL{true}`` EnsembleSolution) or the root closest to
``u0`` (``{false}``, single-path mode).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.problems import NonlinearFunction, NonlinearProblem, _wrap_function
from ..core.returncode import ReturnCode
from ..core.solution import NLStats, NonlinearSolution


def _identity_polynomialize(u, p):
    return u


def _identity_unpolynomialize(u, p):
    return [u]


def _unit_denominator(u, p):
    return jnp.ones((), jnp.asarray(u).dtype if hasattr(u, "dtype")
                    else jnp.float64)


@dataclasses.dataclass(frozen=True, eq=True)
class HomotopyNonlinearFunction:
    """Wrapper declaring how a (possibly rational / transformed) system maps
    to polynomial space (SciMLBase.HomotopyNonlinearFunction as consumed at
    solve.jl:10-15).

    - ``f``: the polynomial-space residual (a ``NonlinearFunction``).
    - ``polynomialize(u, p)``: user space → polynomial space.
    - ``unpolynomialize(v, p)``: polynomial root → list of user-space
      preimages (may be several, e.g. for ``u = exp(v)`` branches).
    - ``denominator(v, p)``: denominators of a rational system; roots where
      any entry is ~0 are spurious and dropped (solve.jl:84-88).
    """

    f: NonlinearFunction
    polynomialize: Callable = _identity_polynomialize
    unpolynomialize: Callable = _identity_unpolynomialize
    denominator: Callable = _unit_denominator

    def __post_init__(self):
        object.__setattr__(self, "f", _wrap_function(self.f))

    def __call__(self, u, p=None):
        return self.f(u, p)

    def __hash__(self):
        return hash((self.f, self.polynomialize, self.unpolynomialize,
                     self.denominator))


@dataclasses.dataclass(frozen=True, eq=True)
class HomotopyContinuationJL:
    """Native all-roots polynomial solve (the reference's
    ``HomotopyContinuationJL{AllRoots}``; NonlinearSolveHomotopyContinuation.jl:50-66).

    ``degrees``: per-equation total degrees; measured along a random ray
    when omitted (the residual must then be exactly polynomial of total
    degree ≤ 8 per equation)."""

    all_roots: bool = False
    degrees: Optional[Sequence[int]] = None
    denominator_abstol: float = 1e-7
    gamma_seed: int = 0
    name: str = "HomotopyContinuationJL"

    def __post_init__(self):
        if self.degrees is not None:
            object.__setattr__(self, "degrees",
                               tuple(int(d) for d in self.degrees))


@dataclasses.dataclass(frozen=True, eq=True)
class TaylorHomotopyContinuationJL:
    """Smooth-residual variant: Taylor-surrogate tracking + Newton polish
    (the reference's TaylorHomotopyContinuationJL,
    taylor_polynomialize.jl:257-330)."""

    all_roots: bool = False
    degree: int = 2
    denominator_abstol: float = 1e-7
    name: str = "TaylorHomotopyContinuationJL"


def measure_polynomial_degrees(f_np: Callable, n: int, max_degree: int = 8,
                               seed: int = 0, rtol: float = 1e-7
                               ) -> tuple:
    """Exact per-equation total degree of a polynomial residual, measured by
    finite differences along a random ray: for ``g(t) = f(a + t·b)`` the
    (d+1)-th forward difference of a degree-d polynomial is identically 0.
    Host-side float64; degrees ≤ ``max_degree``."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal(n) * 0.37
    b = rng.standard_normal(n)
    b /= np.linalg.norm(b)
    ts = np.arange(max_degree + 2, dtype=np.float64)
    samples = np.stack([np.atleast_1d(np.asarray(f_np(a + t * b),
                                                 np.float64)) for t in ts])
    m = samples.shape[1]
    degrees = []
    for i in range(m):
        col = samples[:, i]
        scale = max(np.max(np.abs(col)), 1.0)
        diffs = col.copy()
        deg = 0
        for k in range(1, max_degree + 2):
            diffs = np.diff(diffs)
            if np.max(np.abs(diffs)) > rtol * scale * (2.0 ** k):
                deg = k
        if deg >= max_degree + 1:
            raise ValueError(
                f"equation {i}: residual is not polynomial of degree ≤ "
                f"{max_degree} along a random ray; pass degrees= explicitly "
                "or use TaylorHomotopyContinuationJL")
        degrees.append(max(deg, 1))
    return tuple(degrees)


def _filter_and_unpolynomialize(hf: HomotopyNonlinearFunction, roots_poly,
                                p, denominator_abstol, dedupe_tol=1e-8):
    """Denominator filter + unpolynomialize + user-space dedupe
    (solve.jl:80-96)."""
    valid = []
    for r in np.atleast_2d(np.asarray(roots_poly)):
        r_j = jnp.asarray(r)
        den = np.atleast_1d(np.asarray(hf.denominator(r_j, p)))
        if np.any(np.abs(den) <= denominator_abstol):
            continue
        for sol in hf.unpolynomialize(r_j, p):
            s = np.atleast_1d(np.asarray(sol))
            if np.any(np.isnan(s)):
                continue
            if not any(np.max(np.abs(s - q)) <= dedupe_tol * (1 + np.max(np.abs(q)))
                       for q in valid):
                valid.append(s)
    return valid


def solve_homotopy_continuation(prob, alg, *, abstol=None, maxiters=100,
                                **_ignored) -> NonlinearSolution:
    """__solve for HomotopyContinuationJL / TaylorHomotopyContinuationJL
    (reference CommonSolve.solve methods, solve.jl:59-175)."""
    from .multistart import polynomialize as taylor_polynomialize
    from .multistart import solve_multistart
    from .poly_homotopy import PolynomialHomotopy, solve_polynomial

    import jax
    if not jax.config.read("jax_enable_x64"):
        raise RuntimeError(
            "HomotopyContinuationJL / TaylorHomotopyContinuationJL track "
            "paths in complex128 and need float64 enabled: run on the CPU "
            "backend with jax.config.update('jax_enable_x64', True) "
            "(complex128 is unsupported on TPU; see "
            "examples/06_all_roots_rational.py)")

    inner = prob.f.f if isinstance(prob.f, NonlinearFunction) else prob.f
    hf = inner if isinstance(inner, HomotopyNonlinearFunction) else \
        HomotopyNonlinearFunction(f=prob.f)
    p = prob.p
    u0 = jnp.atleast_1d(jnp.asarray(prob.u0))
    scalar_input = jnp.ndim(prob.u0) == 0
    u0_poly = jnp.atleast_1d(jnp.asarray(hf.polynomialize(prob.u0, p)))
    n = int(u0_poly.size)
    f_poly = hf.f.f

    def f_vec(u, p_):
        return jnp.atleast_1d(jnp.asarray(
            f_poly(u[0] if scalar_input and u.shape == (1,) else u, p_)))

    poly_prob = NonlinearProblem(f_vec, u0_poly, p)

    if isinstance(alg, HomotopyContinuationJL):
        degrees = alg.degrees
        if degrees is None:
            f_np = lambda x: f_vec(jnp.asarray(x, jnp.float64), p)
            degrees = measure_polynomial_degrees(f_np, n, seed=alg.gamma_seed)
        sol = solve_polynomial(
            poly_prob, PolynomialHomotopy(degrees=tuple(degrees),
                                          gamma_seed=alg.gamma_seed),
            all_roots=True, real_only=True)
        roots_poly = np.atleast_2d(np.asarray(sol.u, np.float64)) \
            if sol.u.size else np.zeros((0, n))
        stats = sol.stats
    else:
        roots = solve_multistart(poly_prob, order=int(alg.degree),
                                 maxiters=maxiters)
        roots_poly = np.atleast_2d(np.asarray(roots, np.float64)) \
            if roots.size else np.zeros((0, n))
        stats = NLStats.zeros().incr(nsteps=len(roots_poly))

    valid = _filter_and_unpolynomialize(hf, roots_poly, p,
                                        alg.denominator_abstol)

    dtype = u0.dtype

    def _resid_user(u_user):
        v = hf.polynomialize(u_user, p)
        return jnp.asarray(f_poly(v, p))

    if not valid:
        retcode = (ReturnCode.ConvergenceFailure if len(roots_poly) == 0
                   else ReturnCode.Infeasible)
        u_fail = prob.u0
        return NonlinearSolution(
            u=u_fail, resid=_resid_user(u_fail),
            retcode=jnp.int32(retcode), stats=stats, original=roots_poly)

    valid_arr = jnp.asarray(np.stack(valid), dtype)
    if scalar_input and valid_arr.shape[-1] == 1:
        valid_arr = valid_arr[..., 0]

    if alg.all_roots:
        resids = jax.vmap(lambda v: jnp.max(jnp.abs(_resid_user(v))))(
            valid_arr)
        return NonlinearSolution(
            u=valid_arr, resid=resids,
            retcode=jnp.int32(ReturnCode.Success), stats=stats,
            original=roots_poly)

    flat = np.atleast_2d(np.asarray(valid_arr, np.float64).reshape(
        len(valid), -1))
    ref = np.asarray(u0, np.float64).reshape(-1)
    best = int(np.argmin(np.max(np.abs(flat - ref[None]), axis=1)))
    u_best = valid_arr[best]
    return NonlinearSolution(
        u=u_best, resid=_resid_user(u_best),
        retcode=jnp.int32(ReturnCode.Success), stats=stats,
        original=roots_poly)
