"""Matrix-free Jacobian operators.

TPU-native redesign of SciMLJacobianOperators
(/root/reference/lib/SciMLJacobianOperators/src/SciMLJacobianOperators.jl:86-291):
``jax.jvp``/``jax.vjp`` closures standing in for DifferentiationInterface
pushforward/pullback tapes.  Analytic ``f.jvp``/``f.vjp`` win when supplied
(mirroring prepare_jvp/prepare_vjp priority, :296-431); ``transpose`` flips
JVP↔VJP mode (:107-114); ``StatefulJacobianNormalFormOperator`` is the lazy
``JᵀJ`` product for normal-form Krylov NLLS (:252-291).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


class JacobianOperator:
    """Lazy Jacobian of ``f_flat`` providing JVP and VJP without
    materializing J."""

    def __init__(self, f_flat: Callable, analytic_jvp: Optional[Callable] = None,
                 analytic_vjp: Optional[Callable] = None):
        self.f_flat = f_flat
        self.analytic_jvp = analytic_jvp
        self.analytic_vjp = analytic_vjp

    def jvp(self, u, v):
        if self.analytic_jvp is not None:
            return self.analytic_jvp(v, u)
        return jax.jvp(self.f_flat, (u,), (v,))[1]

    def vjp(self, u, v):
        if self.analytic_vjp is not None:
            return self.analytic_vjp(v, u)
        _, pullback = jax.vjp(self.f_flat, u)
        return pullback(v)[0]

    def at(self, u) -> "StatefulJacobianOperator":
        return StatefulJacobianOperator(self, u)

    @property
    def T(self) -> "TransposedJacobianOperator":
        return TransposedJacobianOperator(self)


class TransposedJacobianOperator:
    def __init__(self, op: JacobianOperator):
        self.op = op

    def jvp(self, u, v):
        return self.op.vjp(u, v)

    def vjp(self, u, v):
        return self.op.jvp(u, v)

    def at(self, u):
        return StatefulJacobianOperator(self, u)

    @property
    def T(self):
        return self.op


class StatefulJacobianOperator:
    """Operator bound to a linearization point — a drop-in ``matvec``."""

    def __init__(self, op, u):
        self.op = op
        self.u = u

    def __call__(self, v):
        return self.op.jvp(self.u, v)

    def matvec(self, v):
        return self(v)

    def rmatvec(self, v):
        return self.op.vjp(self.u, v)

    def __matmul__(self, v):
        return self(v)

    @property
    def T(self):
        return StatefulJacobianOperator(self.op.T, self.u)


class StatefulJacobianNormalFormOperator:
    """Lazy ``JᵀJ`` (vjp ∘ jvp) for normal-form Krylov least squares."""

    def __init__(self, op: JacobianOperator, u):
        self.op = op
        self.u = u

    def __call__(self, v):
        return self.op.vjp(self.u, self.op.jvp(self.u, v))

    def __matmul__(self, v):
        return self(v)


def JacVecOperator(f_flat: Callable, u=None, *, analytic_jvp=None
                   ) -> Any:
    """``v ↦ J(u)·v`` operator (SciMLJacobianOperators.jl JacVecOperator,
    :446-474): a JacobianOperator restricted to JVP mode, optionally bound
    at ``u`` (returns the stateful matvec when ``u`` is given)."""
    op = JacobianOperator(f_flat, analytic_jvp=analytic_jvp)
    return op if u is None else op.at(u)


def VecJacOperator(f_flat: Callable, u=None, *, analytic_vjp=None
                   ) -> Any:
    """``v ↦ J(u)ᵀ·v`` operator (the reference's VecJacOperator): the
    transposed JacobianOperator, optionally bound at ``u``."""
    op = JacobianOperator(f_flat, analytic_vjp=analytic_vjp).T
    return op if u is None else op.at(u)


def as_matvec(A) -> Callable:
    """Normalize a matrix / sparse container / operator to ``v -> A@v``.

    AD-safe (CSR routes through the custom-vjp matvec).  For repeated
    forward-only application (Krylov loops) prefer ``A.matvec_fn()`` —
    the staged closure that hoists the Pallas packing out of the loop."""
    from .sparse import CSR, DIA, ELL
    if isinstance(A, (CSR, DIA, ELL)):
        return A.matvec
    if callable(A) and not isinstance(A, jnp.ndarray):
        return A
    return lambda v: A @ v


def mv(A, v):
    """``A @ v`` for dense / sparse / operator J.

    Dense/sparse A with a non-1D ``v`` (shape-native iterate) flattens
    locally and restores the shape — the shaped fast path only avoids
    relayouts for operator (jvp) J; matrix J pays them at this boundary.
    """
    from .sparse import CSR, DIA, ELL
    if isinstance(A, (CSR, DIA, ELL)):
        if jnp.ndim(v) != 1:
            return A.matvec(jnp.ravel(v)).reshape(jnp.shape(v))
        return A.matvec(v)
    if isinstance(A, StatefulJacobianOperator):
        return A(v)
    if jnp.ndim(v) != 1:
        return (A @ jnp.ravel(v)).reshape(jnp.shape(v))
    return A @ v


def rmv(A, v):
    """``Aᵀ @ v`` for dense / sparse / operator J."""
    from .sparse import CSR, ELL, DIA
    if isinstance(A, CSR):
        if jnp.ndim(v) != 1:
            return A.rmatvec(jnp.ravel(v)).reshape(jnp.shape(v))
        return A.rmatvec(v)
    if isinstance(A, (ELL, DIA)):
        # ELL/DIA transpose matvec via dense fallback is wasteful; DIA has
        # a native path below.
        if isinstance(A, DIA):
            # Aᵀ has negated offsets with shifted diagonals.
            n = A.shape[0]
            out = jnp.zeros_like(v, shape=(A.shape[1],))
            for d, off in enumerate(A.offsets):
                if off == 0:
                    out = out + A.data[d] * v
                elif off > 0:
                    out = out.at[off:].add(A.data[d, :n - off] * v[:n - off])
                else:
                    k = -off
                    out = out.at[:n - k].add(A.data[d, k:] * v[k:])
            return out
        return A.todense().T @ v
    if isinstance(A, StatefulJacobianOperator):
        return A.rmatvec(v)
    if jnp.ndim(v) != 1:
        return (A.T @ jnp.ravel(v)).reshape(jnp.shape(v))
    return A.T @ v


def is_materialized(A) -> bool:
    from .sparse import CSR, DIA, ELL
    return isinstance(A, (CSR, DIA, ELL)) or hasattr(A, "shape") and \
        not isinstance(A, StatefulJacobianOperator)
