"""Jacobian policies — the AD selection layer.

TPU-native replacement for the reference's AD-backend selection + jacobian
cache construction (/root/reference/lib/NonlinearSolveBase/src/autodiff.jl and
jacobian.jl:33-130).  JAX collapses the backend zoo: forward mode is
``jax.jacfwd``, reverse is ``jax.jacrev``, JVP/VJP are ``jax.jvp``/``jax.vjp``.
What remains is the *policy*: analytic ``f.jac`` > sparse colored AD (when a
sparsity pattern is available) > dense AD with mode selection by shape.

All jacobians here operate on the **flattened** residual function
``f_flat(u_vec) -> fu_vec`` the engine builds via ``ravel_pytree``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import static_config


def pickchunksize(n: int, threshold: int = 12) -> int:
    """ForwardDiff.pickchunksize's heuristic (the reference re-exports it
    from NonlinearSolveBase): the smallest chunk ≤ ``threshold`` that
    divides ``n`` into equal-ish batches.  Here it sizes the tangent
    batches of the chunked ``jacfwd`` (JacobianPolicy.chunk_size), which
    bounds peak memory at ``chunk × n_out`` instead of ``n_in × n_out``."""
    if n <= threshold:
        return n
    nchunks = -(-n // threshold)
    return -(-n // nchunks)


@static_config
class JacobianPolicy:
    """mode: 'auto' | 'forward' | 'reverse' | 'finite' | 'analytic'.

    'auto' mirrors select_jacobian_autodiff (autodiff.jl:139-160): prefer
    forward mode (the reference's ForwardDiff-first priority list); reverse
    is picked when the output dim is much smaller than the input dim.
    ``fd_rel_step``: relative step for 'finite' (central differences).
    ``chunk_size``: batch the forward-mode tangents ``chunk_size`` at a
    time through ``lax.map`` (the ForwardDiff chunking analogue) — peak
    tangent memory drops from n_in×n_out to chunk_size×n_out.
    """

    mode: str = "auto"
    fd_rel_step: Optional[float] = None
    chunk_size: Optional[int] = None

    def resolve(self, n_in: int, n_out: int) -> str:
        if self.mode != "auto":
            return self.mode
        # Forward-mode cost ~ n_in passes, reverse ~ n_out passes.
        if n_out * 4 < n_in:
            return "reverse"
        return "forward"


def _chunked_jacfwd(f_flat: Callable, u: jnp.ndarray, chunk: int,
                    n_out: int) -> jnp.ndarray:
    """Forward-mode jacobian in tangent batches of ``chunk`` via
    ``lax.map`` — the ForwardDiff-chunking analogue.  Peak live tangents:
    (chunk, n) instead of (n, n)."""
    n = u.shape[0]
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    basis = jnp.eye(n, dtype=u.dtype)
    if pad:
        basis = jnp.concatenate(
            [basis, jnp.zeros((pad, n), u.dtype)], axis=0)
    basis = basis.reshape(nchunks, chunk, n)

    def one_chunk(tangents):
        return jax.vmap(lambda t: jax.jvp(f_flat, (u,), (t,))[1])(tangents)

    cols = jax.lax.map(one_chunk, basis)          # (nchunks, chunk, n_out)
    return cols.reshape(nchunks * chunk, n_out)[:n].T


def _finite_diff_jacobian(f_flat: Callable, u: jnp.ndarray, rel_step):
    """Forward-difference jacobian (the AutoFiniteDiff fallback of
    autodiff.jl's priority lists), vectorized with vmap over columns."""
    fu = f_flat(u)
    eps = jnp.finfo(u.dtype).eps
    h = jnp.sqrt(eps) if rel_step is None else rel_step
    step = h * jnp.maximum(jnp.abs(u), 1.0)

    def col(i):
        du = jnp.zeros_like(u).at[i].set(step[i])
        return (f_flat(u + du) - fu) / step[i]

    return jax.vmap(col, out_axes=1)(jnp.arange(u.shape[0]))


def construct_dense_jacobian_fn(
    f_flat: Callable, policy: JacobianPolicy, n_in: int, n_out: int,
    analytic_jac_flat: Optional[Callable] = None,
) -> Callable:
    """Return ``jac_fn(u_vec) -> (n_out, n_in) dense J``.

    Mirrors construct_jacobian_cache's concrete-AD branch
    (jacobian.jl:33-130): analytic jac wins; otherwise AD by resolved mode.
    """
    if analytic_jac_flat is not None:
        return analytic_jac_flat
    mode = policy.resolve(n_in, n_out)
    if mode == "forward":
        if policy.chunk_size is not None:
            chunk = max(1, min(int(policy.chunk_size), n_in))
            return lambda u: _chunked_jacfwd(f_flat, u, chunk, n_out)

        def jac_forward(u):
            holo = jnp.iscomplexobj(u)
            return jax.jacfwd(f_flat, holomorphic=holo)(u)
        return jac_forward
    if mode == "reverse":
        def jac_reverse(u):
            holo = jnp.iscomplexobj(u)
            return jax.jacrev(f_flat, holomorphic=holo)(u)
        return jac_reverse
    if mode == "finite":
        return lambda u: _finite_diff_jacobian(f_flat, u, policy.fd_rel_step)
    raise ValueError(f"unknown jacobian mode {mode!r}")


def make_flat_fn(f, p, unravel, example_out=None):
    """Wrap ``f(u_pytree, p) -> resid_pytree`` into ``f_flat(u_vec) -> vec``."""

    def f_flat(u_vec):
        out = f(unravel(u_vec), p)
        leaves = jax.tree_util.tree_leaves(out)
        if len(leaves) == 1:
            return jnp.atleast_1d(jnp.ravel(jnp.asarray(leaves[0])))
        return jnp.concatenate([jnp.ravel(jnp.asarray(l)) for l in leaves])

    return f_flat
