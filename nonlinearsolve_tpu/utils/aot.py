"""AOT export / serving of compiled solvers (``jax.export``).

The reference's deployment story is Julia precompilation: the meta-package
compiles solver workloads ahead of time so user processes hit no JIT latency
(/root/reference/src/NonlinearSolve.jl:49-181 precompile workloads, plus the
AutoSpecialize no-recompile subsystem, SURVEY.md §2.1).  The TPU-native
analogue is ahead-of-time lowering: serialize the fully-jitted solve as a
StableHLO artifact that a serving process can deserialize and call with no
tracing, no Python solver stack on the hot path, and a stable compile cache.

``export_solver`` closes the solver configuration (problem structure,
algorithm, tolerances) over the residual and lowers ``(u0, p) -> solution``
once; the returned bytes are self-contained and platform-checked by
jax.export at call time.  ``deserialize_solver`` rebuilds a callable that
returns a regular :class:`~..core.solution.NonlinearSolution`.

Outputs cross the serialization boundary as plain dicts (standard containers
round-trip through jax.export without custom pytree registration); the
loader re-wraps them.
"""

from __future__ import annotations

import jax
from jax import export as _jax_export

from ..core.solution import NLStats, NonlinearSolution


def _spec_of(x):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        jax.tree_util.tree_map(jax.numpy.asarray, x),
    )


def export_solver(prob, alg=None, *, platforms=None, batch=None,
                  **solve_kwargs) -> bytes:
    """Lower ``solve(prob.remake(u0, p), alg, **solve_kwargs)`` AOT.

    Parameters
    ----------
    prob : NonlinearProblem
        Template problem; its ``u0``/``p`` fix the input shapes and dtypes.
    alg : algorithm or None
        ``None`` selects the default polyalgorithm, as in ``solve``.
    platforms : sequence of str, optional
        jax.export lowering platforms (e.g. ``("tpu", "cpu")`` for a
        multi-platform artifact).  Default: the current backend.
    batch : str, optional
        Name of a symbolic batch dimension (shape polymorphism).  The solve
        is vmapped and every input/output leaf gains a leading axis of that
        size; one artifact then serves ANY batch size at call time — the
        serving-side EnsembleProblem analogue.
    solve_kwargs :
        Frozen solve options (abstol, maxiters, ...).  Trace-producing
        options (``store_trace``/``show_trace``/``trace_level``) are
        rejected: the exported artifact serializes only
        ``u/resid/retcode/stats`` and would silently drop the trace.

    Returns
    -------
    bytes — a serialized ``jax.export.Exported`` artifact.  Calling
    convention: ``f(u0)`` if the template problem has ``p is None``,
    else ``f(u0, p)``.
    """
    from ..core.solve import solve

    bad = sorted(k for k in ("store_trace", "show_trace", "trace_level")
                 if solve_kwargs.get(k))
    if bad:
        raise ValueError(
            f"export_solver does not support trace options {bad}: the "
            "exported artifact serializes only u/resid/retcode/stats, so "
            "the trace would be computed and silently dropped")

    has_p = prob.p is not None

    def run(u0, p):
        sol = solve(prob.remake(u0=u0, p=p), alg, **solve_kwargs)
        st = sol.stats if sol.stats is not None else NLStats.zeros()
        return {
            "u": sol.u,
            "resid": sol.resid,
            "retcode": sol.retcode,
            "stats": {"nf": st.nf, "njacs": st.njacs,
                      "nfactors": st.nfactors, "nsolve": st.nsolve,
                      "nsteps": st.nsteps},
        }

    if has_p:
        fn, specs = run, (_spec_of(prob.u0), _spec_of(prob.p))
    else:
        fn = lambda u0: run(u0, None)  # noqa: E731
        specs = (_spec_of(prob.u0),)

    if batch is not None:
        fn = jax.vmap(fn)
        (b,) = _jax_export.symbolic_shape(batch)
        specs = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct((b,) + s.shape, s.dtype), specs)

    kw = {} if platforms is None else {"platforms": list(platforms)}
    exported = _jax_export.export(jax.jit(fn), **kw)(*specs)
    return exported.serialize()


def deserialize_solver(data: bytes):
    """Rebuild a callable solver from :func:`export_solver` bytes.

    The returned function takes the same ``(u0[, p])`` arguments the
    artifact was exported with and returns a ``NonlinearSolution``.  It is
    itself jittable (``jax.jit(f)``) — the artifact is invoked via
    ``Exported.call``, which inlines the StableHLO into the outer
    computation.
    """
    exported = _jax_export.deserialize(
        data if isinstance(data, bytearray) else bytearray(data))

    def call(*args):
        out = exported.call(*args)
        stats = NLStats(**out["stats"])
        return NonlinearSolution(u=out["u"], resid=out["resid"],
                                 retcode=out["retcode"], stats=stats)

    call.exported = exported
    return call
