"""Problem types — the L0 contract.

TPU-native re-design of the SciMLBase problem types the reference consumes
(SURVEY.md §1 L0; imported at
/root/reference/lib/NonlinearSolveBase/src/NonlinearSolveBase.jl:43-51):
``NonlinearProblem``, ``NonlinearLeastSquaresProblem``,
``IntervalNonlinearProblem``, ``SteadyStateProblem``, ``HomotopyProblem``,
``SCCNonlinearProblem`` and the ``NonlinearFunction`` carrier of analytic
jacobian / jvp / vjp / sparsity information.

Functions are **out-of-place, pure JAX**: ``f(u, p) -> resid``.  The in-place
variants of the reference have no analogue under XLA (buffers are managed by
the compiler); ``u`` may be a scalar, an array, or any pytree of arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True, eq=True)
class NonlinearFunction:
    """Residual function plus optional analytic derivative information.

    Mirrors ``SciMLBase.NonlinearFunction``'s fields used by the reference
    (jac / jvp / vjp / jac_prototype / sparsity / colorvec; consumed at
    /root/reference/lib/NonlinearSolveBase/src/jacobian.jl:33-130).

    - ``f(u, p) -> resid``
    - ``jac(u, p) -> J`` (dense array or sparse ``CSR``)
    - ``jvp(v, u, p) -> J @ v``
    - ``vjp(v, u, p) -> J.T @ v``
    - ``sparsity``: a sparsity pattern (``CSR`` bool pattern or dense mask)
      enabling colored sparse-AD jacobians
    - ``colorvec``: precomputed column coloring for the sparsity pattern
    """

    f: Callable
    jac: Optional[Callable] = None
    jvp: Optional[Callable] = None
    vjp: Optional[Callable] = None
    jac_prototype: Any = None
    sparsity: Any = None
    colorvec: Any = None
    resid_prototype: Any = None
    initialization_data: Any = None

    def __call__(self, u, p=None):
        return self.f(u, p)

    def __hash__(self):
        return hash((self.f, self.jac, self.jvp, self.vjp, id(self.jac_prototype),
                     id(self.sparsity), id(self.colorvec),
                     id(self.initialization_data)))


def _wrap_function(f) -> NonlinearFunction:
    if isinstance(f, NonlinearFunction):
        return f
    return NonlinearFunction(f=f)


@dataclasses.dataclass(frozen=True)
class NonlinearProblem:
    """Find ``u`` with ``f(u, p) = 0`` (square system).

    ``lb``/``ub`` trigger the logit/log bounds transform of the reference
    (/root/reference/lib/NonlinearSolveBase/src/bounds_transform.jl).
    ``kwargs`` are default solve options merged below call-site kwargs
    (solve.jl:174-177).
    """

    f: NonlinearFunction
    u0: Any
    p: Any = None
    lb: Any = None
    ub: Any = None
    kwargs: dict = dataclasses.field(default_factory=dict)

    def __init__(self, f, u0, p=None, *, lb=None, ub=None, **kwargs):
        object.__setattr__(self, "f", _wrap_function(f))
        object.__setattr__(self, "u0", u0)
        object.__setattr__(self, "p", p)
        object.__setattr__(self, "lb", lb)
        object.__setattr__(self, "ub", ub)
        object.__setattr__(self, "kwargs", kwargs)

    @property
    def is_least_squares(self) -> bool:
        return False

    def remake(self, *, u0=None, p=None, f=None, **kwargs):
        new_kwargs = {**self.kwargs, **kwargs}
        return type(self)(
            f if f is not None else self.f,
            u0 if u0 is not None else self.u0,
            p if p is not None else self.p,
            lb=self.lb, ub=self.ub, **new_kwargs,
        )


class NonlinearLeastSquaresProblem(NonlinearProblem):
    """Minimize ``‖f(u, p)‖₂``; residual may be non-square (m ≠ n)."""

    @property
    def is_least_squares(self) -> bool:
        return True


class SteadyStateProblem(NonlinearProblem):
    """Steady state of ``du/dt = f(u, p)``: solved as ``f(u, p) = 0``.

    Mirrors ``SciMLBase.SteadyStateProblem``; the reference converts it to a
    ``NonlinearProblem`` before solving."""

    def to_nonlinear(self) -> NonlinearProblem:
        return NonlinearProblem(self.f, self.u0, self.p, lb=self.lb, ub=self.ub,
                                **self.kwargs)


@dataclasses.dataclass(frozen=True)
class IntervalNonlinearProblem:
    """Scalar root find on a bracket: ``f(u, p) = 0`` for ``u in tspan``.

    Consumed by the bracketing tier (reference:
    /root/reference/lib/BracketingNonlinearSolve/).
    """

    f: NonlinearFunction
    tspan: tuple
    p: Any = None
    kwargs: dict = dataclasses.field(default_factory=dict)

    def __init__(self, f, tspan, p=None, **kwargs):
        object.__setattr__(self, "f", _wrap_function(f))
        object.__setattr__(self, "tspan", tuple(tspan))
        object.__setattr__(self, "p", p)
        object.__setattr__(self, "kwargs", kwargs)


@dataclasses.dataclass(frozen=True)
class HomotopyProblem:
    """Continuation problem ``f(u, p, λ) = 0`` over ``λ ∈ lambdaspan``.

    Mirrors ``SciMLBase.HomotopyProblem`` driven by the reference's
    HomotopySweep / ArcLengthContinuation
    (/root/reference/lib/NonlinearSolveBase/src/homotopy_sweep.jl:151-168).
    ``f(u, p, lam) -> resid``.
    """

    f: NonlinearFunction
    u0: Any
    p: Any = None
    lambdaspan: tuple = (0.0, 1.0)
    kwargs: dict = dataclasses.field(default_factory=dict)

    def __init__(self, f, u0, p=None, lambdaspan=(0.0, 1.0), **kwargs):
        object.__setattr__(self, "f", _wrap_function(f))
        object.__setattr__(self, "u0", u0)
        object.__setattr__(self, "p", p)
        object.__setattr__(self, "lambdaspan", tuple(lambdaspan))
        object.__setattr__(self, "kwargs", kwargs)

    def remake(self, *, u0=None, p=None, f=None, lambdaspan=None, **kwargs):
        new_kwargs = {**self.kwargs, **kwargs}
        return type(self)(
            f if f is not None else self.f,
            u0 if u0 is not None else self.u0,
            p if p is not None else self.p,
            lambdaspan if lambdaspan is not None else self.lambdaspan,
            **new_kwargs,
        )


@dataclasses.dataclass(frozen=True)
class SCCNonlinearProblem:
    """Sequence of strongly-connected-component subproblems solved in order,
    threading earlier solutions to later blocks
    (reference: /root/reference/lib/SCCNonlinearSolve/src/SCCNonlinearSolve.jl:24-207).

    ``probs``: sequence of NonlinearProblem (or LinearSCCBlock);
    ``explicitfuns``: per-block ``fn(p, sols_so_far) -> p_block`` parameter
    injectors run before each block's solve.
    """

    probs: Sequence[Any]
    explicitfuns: Optional[Sequence[Callable]] = None
    p: Any = None
    kwargs: dict = dataclasses.field(default_factory=dict)

    def __init__(self, probs, explicitfuns=None, p=None, **kwargs):
        object.__setattr__(self, "probs", tuple(probs))
        object.__setattr__(self, "explicitfuns",
                           tuple(explicitfuns) if explicitfuns is not None else None)
        object.__setattr__(self, "p", p)
        object.__setattr__(self, "kwargs", kwargs)
