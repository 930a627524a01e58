"""Ensemble solves — batch parallelism over whole solves.

The reference's ``EnsembleProblem`` of nonlinear solves (SURVEY §2.10;
test/PolyAlgorithms "Ensemble Nonlinear Problems") maps to ``jax.vmap`` over
the entire solver: every trajectory runs the full while_loop in lockstep on
the VPU/MXU lanes.  ``solve_ensemble`` batches over ``u0`` and/or ``p``
leaves with a leading trajectory axis; under ``shard_map``/sharded inputs the
batch axis distributes across devices (ensemble = data parallelism).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .problems import NonlinearProblem
from .solution import NonlinearSolution


@dataclasses.dataclass(frozen=True)
class EnsembleProblem:
    """Family of problems generated from a base problem — the
    SciMLBase.EnsembleProblem contract the reference's ensemble tests use
    (test/PolyAlgorithms "Ensemble Nonlinear Problems").

    ``prob_func(prob, i) -> prob_i`` builds trajectory ``i``'s problem
    (typically ``prob.remake(u0=...)``); identity when omitted.  Solve
    with ``nls.solve(eprob, alg, trajectories=N)`` — when every
    trajectory shares the base structure (same shapes/treedefs), the
    batch runs as ONE vmapped solve (lockstep on the VPU/MXU lanes;
    optionally sharded over a mesh), else trajectories run sequentially
    and a list of solutions is returned.
    """

    prob: Any
    prob_func: Optional[Callable] = None


def solve_ensemble_problem(eprob: EnsembleProblem, alg=None, *,
                           trajectories: int, mesh=None,
                           batch_axis: str = "batch", **kwargs):
    """__solve for EnsembleProblem: materialize per-trajectory problems
    host-side, then batch (vmap) when uniform, else loop."""
    base = eprob.prob
    pf = eprob.prob_func or (lambda prob, i: prob)
    probs = [pf(base, i) for i in range(int(trajectories))]

    def leafshapes(tree):
        return jax.tree_util.tree_structure(tree), [
            jnp.shape(l) for l in jax.tree_util.tree_leaves(tree)]

    uniform = (
        all(p_i.f is base.f for p_i in probs)
        and all(leafshapes(p_i.u0) == leafshapes(base.u0) for p_i in probs)
        and all(leafshapes(p_i.p) == leafshapes(base.p) for p_i in probs)
    )
    if uniform:
        u0s = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls),
                                     *[p_i.u0 for p_i in probs])
        if base.p is None:
            return solve_ensemble(base, alg, u0s=u0s, mesh=mesh,
                                  batch_axis=batch_axis, **kwargs)
        ps = jax.tree_util.tree_map(lambda *ls: jnp.stack(
            [jnp.asarray(l) for l in ls]), *[p_i.p for p_i in probs])
        return solve_ensemble(base, alg, u0s=u0s, ps=ps, mesh=mesh,
                              batch_axis=batch_axis, **kwargs)

    from .solve import solve
    return [solve(p_i, alg, **kwargs) for p_i in probs]


def solve_ensemble(prob, alg=None, *, u0s=None, ps=None, mesh=None,
                   batch_axis: str = "batch", **kwargs) -> NonlinearSolution:
    """Solve one problem family over a batch of initial conditions and/or
    parameters.

    ``u0s``: pytree like ``prob.u0`` with a leading batch axis (optional).
    ``ps``: pytree like ``prob.p`` with a leading batch axis (optional).
    ``mesh``: optional ``jax.sharding.Mesh``; when given, the batch axis
    is sharded over ``mesh[batch_axis]`` so trajectories distribute
    across devices (ensemble = data parallelism over ICI).  Batch size
    must divide the axis size.
    Returns a NonlinearSolution whose fields carry the batch axis.
    """
    from .solve import solve_nonlinear, _default_algorithm

    if kwargs.pop("maxtime", None) is not None:
        raise NotImplementedError(
            "maxtime is not supported for ensemble solves: the budget is "
            "enforced by host-clock chunked advances, which cannot run "
            "inside vmap.  Batch with maxtime by looping nls.solve(..., "
            "maxtime=...) per trajectory instead.")
    if u0s is None and ps is None:
        raise ValueError("solve_ensemble needs u0s and/or ps batches")
    if alg is None:
        alg = _default_algorithm(prob)

    def solve_one(u0, p):
        prob_i = prob.remake(u0=u0, p=p)
        return solve_nonlinear(prob_i, alg, **kwargs)

    if u0s is not None and ps is not None:
        batched = lambda: jax.vmap(solve_one)(u0s, ps)
    elif u0s is not None:
        batched = lambda: jax.vmap(lambda u0: solve_one(u0, prob.p))(u0s)
    else:
        batched = lambda: jax.vmap(lambda p: solve_one(prob.u0, p))(ps)

    if mesh is None:
        return batched()

    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(batch_axis))

    def shard_leaves(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding)
            if hasattr(x, "ndim") and x.ndim >= 1 else x, tree)

    u0s = shard_leaves(u0s) if u0s is not None else None
    ps = shard_leaves(ps) if ps is not None else None
    return jax.jit(batched)()
