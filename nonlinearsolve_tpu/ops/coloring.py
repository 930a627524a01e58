"""Sparsity detection + graph coloring for compressed Jacobians.

TPU-native replacement for the reference's SparseConnectivityTracer +
SparseMatrixColorings stack (construct_concrete_adtype,
/root/reference/lib/NonlinearSolveBase/src/jacobian.jl:286-371).

* ``detect_sparsity`` — probe-based detector: union of |J| > 0 patterns from
  a few randomized evaluation points (jacfwd is exact per point; the union
  over randomized points makes accidental cancellation astronomically
  unlikely).  Users with exact structure pass ``sparsity``/``jac_prototype``
  on the NonlinearFunction instead, as in the reference.
* ``greedy_column_coloring`` — distance-2 greedy coloring of the column
  graph (two columns conflict iff they share a row), the same algorithm
  family as SparseMatrixColorings' GreedyColoringAlgorithm.

Both run on host at trace time (the pattern is static, like the reference's
symbolic sparsity detection pass).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import CSR


def detect_sparsity(f_flat: Callable, n: int, *, n_probes: int = 2,
                    seed: int = 0, dtype=np.float64) -> CSR:
    """Return a CSR *pattern* (data zeros) of the Jacobian of ``f_flat``.

    Tries the EXACT jaxpr-interpretation tracer first (the
    SparseConnectivityTracer role — no probabilistic misses); falls back
    to random-probe jacfwd when the trace uses unsupported primitives."""
    from .sparsity_trace import detect_sparsity_exact
    exact = detect_sparsity_exact(f_flat, n, dtype=dtype)
    if exact is not None:
        return exact
    # Probe fallback builds DENSE (n_out, n) jacobians on device — guard
    # with an informative error instead of an opaque device OOM (a 65k²
    # f32 jacobian is 17 GB; observed as RESOURCE_EXHAUSTED on-chip when
    # a large residual used a tracer-unsupported primitive).
    n_out = int(np.prod(jax.eval_shape(
        f_flat, jax.ShapeDtypeStruct((n,), dtype)).shape, dtype=np.int64))
    if n * max(n_out, 1) > 16_777_216:
        raise ValueError(
            "sparsity detection fell back to dense jacobian probing (the "
            "residual uses a primitive the exact jaxpr tracer does not "
            f"support), but a dense ({n_out}, {n}) probe is infeasible at "
            "this size.  Pass the pattern explicitly via "
            "NonlinearFunction(sparsity=...) or jac_prototype=..., or use "
            "a matrix-free Krylov linear solver instead of a concrete "
            "sparse jacobian.")
    rng = np.random.default_rng(seed)
    mask = None
    for _ in range(n_probes):
        u = jnp.asarray(rng.standard_normal(n) * 0.5 + 0.3, dtype)
        J = np.asarray(jax.jacfwd(f_flat)(u))
        m = J != 0
        mask = m if mask is None else (mask | m)
    rows, cols = np.nonzero(mask)
    return CSR.from_pattern(rows, cols, mask.shape)


def pattern_from(obj, n_out: int, n_in: int) -> CSR:
    """Normalize a user-provided sparsity spec (CSR, COO (rows, cols)
    tuple, or dense mask/array) to a CSR pattern."""
    if isinstance(obj, CSR):
        return obj
    if isinstance(obj, tuple) and len(obj) == 2:
        rows = np.asarray(obj[0], np.int64)
        cols = np.asarray(obj[1], np.int64)
        if rows.ndim == 1 and cols.ndim == 1 and rows.shape == cols.shape:
            if (rows.size and (rows.min() < 0 or rows.max() >= n_out
                               or cols.min() < 0 or cols.max() >= n_in)):
                raise ValueError(
                    f"COO sparsity indices out of range for a "
                    f"({n_out}, {n_in}) jacobian")
            return CSR.from_pattern(rows, cols, (n_out, n_in))
    arr = np.asarray(obj)
    if arr.shape != (n_out, n_in):
        raise ValueError(
            f"sparsity spec shape {arr.shape} does not match the "
            f"({n_out}, {n_in}) jacobian; pass a dense mask, a CSR "
            f"pattern, or a (rows, cols) COO tuple")
    mask = arr != 0
    rows, cols = np.nonzero(mask)
    return CSR.from_pattern(rows, cols, (n_out, n_in))


def greedy_column_coloring(pattern: CSR) -> np.ndarray:
    """Greedy distance-2 column coloring: columns j, k conflict iff some row
    contains both.  Returns an int array color[j] ∈ [0, n_colors).

    Uses the native sparsetools library (csrc/sparsetools.cpp) when
    available — the pure-Python path below is the fallback and the
    executable specification."""
    n_rows, n_cols = pattern.shape
    from ..native import greedy_column_coloring as native_coloring
    native = native_coloring(pattern.indptr, pattern.indices, n_rows, n_cols)
    if native is not None:
        return native
    indptr, indices = pattern.indptr, pattern.indices
    # column -> rows adjacency
    rows_of_col = [[] for _ in range(n_cols)]
    row_ids = pattern.row_ids
    for k in range(len(indices)):
        rows_of_col[indices[k]].append(row_ids[k])
    cols_in_row = [[] for _ in range(n_rows)]
    for k in range(len(indices)):
        cols_in_row[row_ids[k]].append(indices[k])

    colors = np.full(n_cols, -1, np.int32)
    for j in range(n_cols):
        forbidden = set()
        for r in rows_of_col[j]:
            for k in cols_in_row[r]:
                if colors[k] >= 0:
                    forbidden.add(int(colors[k]))
        c = 0
        while c in forbidden:
            c += 1
        colors[j] = c
    return colors
