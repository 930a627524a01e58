"""External-solver bridges (the L5 layer).

TPU-native analogue of the reference's extension algorithms
(/root/reference/src/extension_algs.jl + ext/): each wrapper flattens the
problem into the ``f(x) -> resid`` host-callback shape external solvers
expect (construct_extension_function_wrapper, wrappers.jl:35-70) and rebuilds
a NonlinearSolution.

Available here:
* ``SciPyRoot`` / ``SciPyRootScalar`` / ``SciPyLeastSquares`` — the
  NonlinearSolveSciPy equivalents (scipy is in-image).  These run on HOST
  (numpy), outside jit — exactly like the reference's PythonCall bridge;
  useful for cross-validation and benchmarking against the native engines.
* The reference's other bridges (PETSc SNES, Sundials KINSOL, MINPACK,
  NLsolve.jl, …) wrap binaries that do not exist in this image; requesting
  them raises a clear error naming the native replacement
  (``native_alternative``), mirroring how the reference errors when an
  extension package is not loaded.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from ..core.returncode import ReturnCode
from ..core.solution import NLStats, NonlinearSolution


@dataclasses.dataclass(frozen=True)
class SciPyRoot:
    """scipy.optimize.root bridge (NonlinearSolveSciPy.jl:27-60 analogue).

    method: hybr | lm | broyden1 | broyden2 | anderson | krylov | df-sane ...
    """

    method: str = "hybr"
    name: str = "SciPyRoot"


@dataclasses.dataclass(frozen=True)
class SciPyRootScalar:
    method: str = "brentq"
    name: str = "SciPyRootScalar"


@dataclasses.dataclass(frozen=True)
class SciPyLeastSquares:
    """scipy.optimize.least_squares bridge: trf/dogbox/lm × robust losses."""

    method: str = "trf"
    loss: str = "linear"
    name: str = "SciPyLeastSquares"


def SciPyLeastSquaresTRF(**kwargs):
    """Preset for the trust-region-reflective method
    (NonlinearSolveSciPy.jl's SciPyLeastSquaresTRF export)."""
    return SciPyLeastSquares(method="trf", **kwargs)


def SciPyLeastSquaresDogbox(**kwargs):
    """Preset for the dogleg-with-box method."""
    return SciPyLeastSquares(method="dogbox", **kwargs)


_UNAVAILABLE = {
    "PETScSNES": "NewtonRaphson(linsolve=LinearSolver(method='gmres')) with "
                 "parallel.distributed_solve — the TPU-native distributed "
                 "Newton-Krylov replacing PETSc's MPI SNES",
    "KINSOL": "NewtonRaphson / TrustRegion (line-search and fixed-point "
              "strategies map to linesearch=BackTracking())",
    "CMINPACK": "TrustRegion() (hybr) / LevenbergMarquardt() (lm)",
    "NLsolveJL": "NewtonRaphson / TrustRegion",
    "NLSolversJL": "NewtonRaphson(linesearch=BackTracking())",
    "SIAMFANLEquationsJL": "NewtonRaphson / PseudoTransient / Broyden",
    "LeastSquaresOptimJL": "LevenbergMarquardt / GaussNewton",
    "FastLevenbergMarquardtJL": "LevenbergMarquardt",
    "SpeedMappingJL": "DFSane (spectral fixed-point acceleration)",
    "FixedPointAccelerationJL": "DFSane / Broyden",
}


def _unavailable(name):
    def ctor(*a, **k):
        raise NotImplementedError(
            f"{name} wraps an external binary not present in this "
            f"environment. Native TPU replacement: {_UNAVAILABLE[name]}.")
    ctor.__name__ = name
    return ctor


PETScSNES = _unavailable("PETScSNES")
KINSOL = _unavailable("KINSOL")
CMINPACK = _unavailable("CMINPACK")
NLsolveJL = _unavailable("NLsolveJL")
NLSolversJL = _unavailable("NLSolversJL")
SIAMFANLEquationsJL = _unavailable("SIAMFANLEquationsJL")
LeastSquaresOptimJL = _unavailable("LeastSquaresOptimJL")
FastLevenbergMarquardtJL = _unavailable("FastLevenbergMarquardtJL")
SpeedMappingJL = _unavailable("SpeedMappingJL")
FixedPointAccelerationJL = _unavailable("FixedPointAccelerationJL")

WRAPPER_ALGS = (SciPyRoot, SciPyRootScalar, SciPyLeastSquares)


def is_wrapper_alg(alg) -> bool:
    return isinstance(alg, WRAPPER_ALGS)


def construct_extension_function_wrapper(prob):
    """Flatten to the f(x: ndarray) -> ndarray shape external solvers expect
    (wrappers.jl:35-70), plus a dense jacobian callback."""
    u0_flat, unravel = ravel_pytree(prob.u0)
    p = prob.p
    f = prob.f

    def f_np(x):
        return np.asarray(ravel_pytree(f(unravel(jnp.asarray(x, u0_flat.dtype)), p))[0])

    jac_jax = jax.jit(jax.jacfwd(
        lambda v: ravel_pytree(f(unravel(v), p))[0]))

    def jac_np(x):
        return np.asarray(jac_jax(jnp.asarray(x, u0_flat.dtype)))

    return np.asarray(u0_flat), unravel, f_np, jac_np


def solve_wrapper(prob, alg, *, abstol=None, maxiters=1000, **_ignored
                  ) -> NonlinearSolution:
    from scipy import optimize

    if isinstance(alg, SciPyRootScalar):
        from ..core.problems import IntervalNonlinearProblem
        assert isinstance(prob, IntervalNonlinearProblem), \
            "SciPyRootScalar needs an IntervalNonlinearProblem"
        fn = lambda x: float(prob.f(jnp.asarray(x), prob.p))
        res = optimize.root_scalar(fn, bracket=tuple(map(float, prob.tspan)),
                                   method=alg.method)
        u = jnp.asarray(res.root)
        return NonlinearSolution(
            u=u, resid=jnp.asarray(fn(res.root)),
            retcode=jnp.int32(ReturnCode.Success if res.converged
                              else ReturnCode.Failure),
            stats=NLStats.zeros().incr(nf=getattr(res, "function_calls", 0)))

    u0, unravel, f_np, jac_np = construct_extension_function_wrapper(prob)

    if isinstance(alg, SciPyLeastSquares):
        res = optimize.least_squares(f_np, u0, jac=jac_np, method=alg.method,
                                     loss=alg.loss, max_nfev=maxiters)
        ok = res.success
        u, resid = res.x, res.fun
        nf = res.nfev
    else:
        use_jac = alg.method in ("hybr", "lm")
        res = optimize.root(f_np, u0, jac=jac_np if use_jac else None,
                            method=alg.method, tol=abstol)
        ok = res.success
        u, resid = res.x, np.atleast_1d(res.fun)
        nf = getattr(res, "nfev", 0)

    return NonlinearSolution(
        u=unravel(jnp.asarray(u)), resid=jnp.asarray(resid),
        retcode=jnp.int32(ReturnCode.Success if ok else ReturnCode.Failure),
        stats=NLStats.zeros().incr(nf=int(nf)),
        original=res)
