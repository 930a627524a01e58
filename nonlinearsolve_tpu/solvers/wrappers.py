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
  NLsolve.jl, NLSolvers.jl, SIAMFANLEquations.jl, LeastSquaresOptim.jl,
  FastLevenbergMarquardt.jl, SpeedMapping.jl, FixedPointAcceleration.jl)
  wrap external binaries that do not exist in this image.  Their
  constructors accept the reference's signatures
  (/root/reference/src/extension_algs.jl) and **delegate to the native
  TPU algorithm implementing the same method** — e.g.
  ``CMINPACK(method=:hybr)`` is Powell's hybrid = dogleg trust region →
  ``TrustRegion()``; ``NLsolveJL(method=:anderson, m=8)`` →
  ``AndersonAcceleration(m=8)``.  The returned object IS the native
  config, so solves jit/vmap and report native stats; the per-method
  mapping is documented on each constructor.
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


# ---------------------------------------------------------------------------
# Reference extension-algorithm constructors → native delegation.
# Signatures follow /root/reference/src/extension_algs.jl; each returns the
# native config implementing the requested method, so the reference user's
# `solve(prob, NLsolveJL(method=:newton))` runs unchanged — natively.
# Symbols may be passed as Julia-style strings with or without a leading
# colon (":newton" or "newton").
# ---------------------------------------------------------------------------

def _sym(x, default):
    if x is None:
        return default
    s = str(x).lstrip(":").lower()
    return s or default


def _warn_dropped(constructor: str, dropped, **named):
    """Emit a visible notice when a delegating bridge constructor is handed
    reference kwargs the native delegation cannot honor (the reference's
    wrappers forward these to the external binary; here they'd be silently
    meaningless).  Routed through the ``dropped_extension_kwarg`` verbosity
    class (on in the minimal/standard presets) so
    ``NonlinearVerbosity("none")``-style global silencing stays possible via
    ``nonlinearsolve_tpu.solvers.wrappers.CONSTRUCTOR_VERBOSITY``.

    ``dropped``: everything that arrived via ``**ignored`` — reported
    REGARDLESS of value (an explicit ``KINSOL(foo=None)`` is still a user
    intent the delegation drops; ADVICE r2).  ``named``: the constructor's
    declared parameters that default to None — only reported when set."""
    names = set(dropped)
    names |= {k for k, v in named.items() if v is not None}
    if not names:
        return
    CONSTRUCTOR_VERBOSITY.emit(
        "dropped_extension_kwarg",
        f"{constructor}: native delegation ignores kwargs "
        f"{sorted(names)} (no external binary in this build)")


from ..core.verbosity import NonlinearVerbosity as _NV  # noqa: E402

#: verbosity used for constructor-time notices (constructors run before
#: ``solve()`` sees a ``verbose=`` kwarg).  Reassign to silence:
#: ``wrappers.CONSTRUCTOR_VERBOSITY = NonlinearVerbosity("none")``.
CONSTRUCTOR_VERBOSITY = _NV("standard")


def CMINPACK(*, method=None, autodiff=None, **ignored):
    """MINPACK bridge (extension_algs.jl; ext/NonlinearSolveMINPACKExt.jl).

    Mapping: ``hybr``/``hybrd`` (Powell hybrid = dogleg trust region) →
    ``TrustRegion()``; ``lm``/``lmdif`` → ``LevenbergMarquardt()``;
    ``auto`` → ``TrustRegion()`` (MINPACK's hybr default; LM is selected
    for NLLS problems by the solve-level default polyalgorithm anyway).
    """
    _warn_dropped("CMINPACK", ignored, autodiff=autodiff)
    from .first_order import LevenbergMarquardt, TrustRegion
    m = _sym(method, "auto")
    if m in ("lm", "lmdif"):
        return LevenbergMarquardt()
    return TrustRegion()


def NLsolveJL(*, method=None, linesearch=None, m=10, beta=1.0, **ignored):
    """NLsolve.jl bridge.  ``trust_region`` → ``TrustRegion`` with the
    NLsolve radius-update scheme; ``newton`` → ``NewtonRaphson`` (with the
    requested line search); ``anderson`` → ``AndersonAcceleration(m, beta)``;
    ``broyden`` → ``Broyden``."""
    _warn_dropped("NLsolveJL", ignored)
    from .anderson import AndersonAcceleration
    from .first_order import NewtonRaphson, TrustRegion
    from .quasi_newton import Broyden
    meth = _sym(method, "trust_region")
    if meth == "newton":
        return NewtonRaphson(linesearch=linesearch)
    if meth == "anderson":
        return AndersonAcceleration(m=int(m), beta=float(beta))
    if meth == "broyden":
        return Broyden()
    return TrustRegion(radius_update_scheme="nlsolve")


def NLSolversJL(method=None, **ignored):
    """NLSolvers.jl bridge.  The reference passes an NLSolvers method
    object; here a string preset: ``newton`` → ``NewtonRaphson``;
    ``newton_hagerzhang``/``newton_backtracking``/``newton_strongwolfe``/
    ``newton_morethuente`` → Newton with that line search."""
    _warn_dropped("NLSolversJL", ignored)
    from ..core.linesearch import BackTracking
    from ..core.wolfe_linesearch import (HagerZhang, MoreThuente,
                                         StrongWolfe)
    from .first_order import NewtonRaphson
    meth = _sym(method, "newton")
    presets = {"newton": None,
               "newton_backtracking": BackTracking(),
               "newton_hagerzhang": HagerZhang(),
               "newton_strongwolfe": StrongWolfe(),
               "newton_morethuente": MoreThuente()}
    if meth not in presets:
        raise ValueError(f"unknown NLSolversJL method {method!r}; "
                         f"expected one of {sorted(presets)}")
    return NewtonRaphson(linesearch=presets[meth])


def SIAMFANLEquationsJL(*, method=None, delta=1e-3, m=0, beta=1.0,
                        **ignored):
    """SIAMFANLEquations.jl bridge: ``newton`` → ``NewtonRaphson``;
    ``pseudotransient`` → ``PseudoTransient(alpha_initial=delta)``;
    ``secant``/``broyden`` → ``Broyden``; ``anderson`` →
    ``AndersonAcceleration(m, beta)``."""
    _warn_dropped("SIAMFANLEquationsJL", ignored)
    from .anderson import AndersonAcceleration
    from .first_order import NewtonRaphson, PseudoTransient
    from .quasi_newton import Broyden
    meth = _sym(method, "newton")
    if meth == "pseudotransient":
        return PseudoTransient(alpha_initial=float(delta))
    if meth in ("secant", "broyden"):
        return Broyden()
    if meth == "anderson":
        return AndersonAcceleration(m=max(int(m), 1), beta=float(beta))
    return NewtonRaphson()


def LeastSquaresOptimJL(alg=None, *, linsolve=None, autodiff=None,
                        **ignored):
    """LeastSquaresOptim.jl bridge: ``lm`` → ``LevenbergMarquardt``;
    ``dogleg`` → ``TrustRegion`` (dogleg descent)."""
    _warn_dropped("LeastSquaresOptimJL", ignored,
                  linsolve=linsolve, autodiff=autodiff)
    from .first_order import LevenbergMarquardt, TrustRegion
    if _sym(alg, "lm") == "dogleg":
        return TrustRegion()
    return LevenbergMarquardt()


def FastLevenbergMarquardtJL(linsolve=None, **kwargs):
    """FastLevenbergMarquardt.jl bridge → ``LevenbergMarquardt`` with the
    reference's damping factors when given."""
    from .first_order import LevenbergMarquardt
    lm_kwargs = {}
    if "factor" in kwargs:
        lm_kwargs["damping_initial"] = float(kwargs.pop("factor"))
    _warn_dropped("FastLevenbergMarquardtJL", kwargs,
                  linsolve=linsolve)
    return LevenbergMarquardt(**lm_kwargs)


def SpeedMappingJL(**ignored):
    """SpeedMapping.jl bridge (ACX extrapolation of fixed-point maps) →
    ``AndersonAcceleration`` (the native accelerated-fixed-point role)."""
    _warn_dropped("SpeedMappingJL", ignored)
    from .anderson import AndersonAcceleration
    return AndersonAcceleration()


def FixedPointAccelerationJL(*, algorithm=None, m=None, **ignored):
    """FixedPointAcceleration.jl bridge: ``Anderson`` →
    ``AndersonAcceleration(m)``; ``Newton`` → ``NewtonRaphson``; the
    epsilon-extrapolation variants (``Aitken``/``VEA``/``SEA``/``Simple``)
    → ``AndersonAcceleration`` with a short window (their natural
    Anderson-equivalent depth)."""
    _warn_dropped("FixedPointAccelerationJL", ignored)
    from .anderson import AndersonAcceleration
    from .first_order import NewtonRaphson
    algo = _sym(algorithm, "anderson")
    if algo == "newton":
        return NewtonRaphson()
    if algo in ("aitken", "vea", "sea", "simple"):
        return AndersonAcceleration(m=2 if m is None else int(m))
    return AndersonAcceleration(m=5 if m is None else int(m))


def PETScSNES(*, petsclib=None, autodiff=None, mpi_comm=None,
              **snes_options):
    """PETSc SNES bridge.  ``snes_type`` maps to the native engine:
    ``newtonls`` (SNES default: Newton + cubic backtracking) →
    ``NewtonRaphson(linesearch=BackTracking())``; ``newtontr`` →
    ``TrustRegion``; ``anderson``/``ngmres`` → ``AndersonAcceleration``;
    ``qn`` → ``Broyden``; ``ksponly`` → plain ``NewtonRaphson``.

    PETSc's MPI distribution role (``mpi_comm``) is covered natively by
    ``parallel.distributed_solve`` (GSPMD row-partitioned Newton–Krylov
    over a jax Mesh) — pass a mesh there instead of an MPI communicator.
    """
    snes_type = _sym(snes_options.pop("snes_type", None), "newtonls")
    _warn_dropped("PETScSNES", snes_options, petsclib=petsclib,
                  autodiff=autodiff, mpi_comm=mpi_comm)
    from ..core.linesearch import BackTracking
    from .anderson import AndersonAcceleration
    from .first_order import NewtonRaphson, TrustRegion
    from .quasi_newton import Broyden
    if snes_type == "newtontr":
        return TrustRegion()
    if snes_type in ("anderson", "ngmres"):
        return AndersonAcceleration()
    if snes_type == "qn":
        return Broyden()
    if snes_type == "ksponly":
        return NewtonRaphson()
    return NewtonRaphson(linesearch=BackTracking())


def KINSOL(*, linear_solver=None, globalization_strategy=None,
           strategy=None, m=0, **ignored):
    """Sundials KINSOL bridge (ext/NonlinearSolveSundialsExt.jl):
    ``none`` → ``NewtonRaphson``; ``linesearch`` →
    ``NewtonRaphson(linesearch=BackTracking())``; ``fixedpoint``/
    ``picard`` → ``AndersonAcceleration(m)`` (KINSOL's Anderson-accelerated
    fixed-point mode)."""
    _warn_dropped("KINSOL", ignored, linear_solver=linear_solver)
    from ..core.linesearch import BackTracking
    from .anderson import AndersonAcceleration
    from .first_order import NewtonRaphson
    strat = _sym(globalization_strategy if globalization_strategy is not None
                 else strategy, "none")
    if strat == "linesearch":
        return NewtonRaphson(linesearch=BackTracking())
    if strat in ("fixedpoint", "picard"):
        return AndersonAcceleration(m=max(int(m), 1))
    return NewtonRaphson()

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
