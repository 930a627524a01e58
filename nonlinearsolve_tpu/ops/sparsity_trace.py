"""Exact sparsity detection by abstract interpretation of the jaxpr.

The reference gets Jacobian sparsity from SparseConnectivityTracer
(operator-overloading index-set propagation, SURVEY §2.9).  The JAX-native
equivalent interprets the residual's jaxpr once, propagating a boolean
dependency matrix ``deps[element, input_index]`` through every primitive:

* elementwise ops union their operands' dependencies,
* structural ops (slice/concatenate/reshape/transpose/pad/rev/broadcast)
  permute rows,
* contractions/reductions OR over the contracted axes (conservative:
  no value-level cancellation is assumed, exactly like the tracer).

The result is EXACT for the supported primitive set (no probabilistic
misses, unlike random-probe detection); unsupported primitives raise and
the caller falls back to probing.  Host-side numpy throughout — this is
a once-per-problem symbolic pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.extend import core as jex_core


class UnsupportedPrimitive(Exception):
    pass


_ELEMENTWISE = {
    "add", "sub", "mul", "div", "rem", "pow", "atan2", "max", "min",
    "and", "or", "xor", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "nextafter",
    "neg", "sign", "floor", "ceil", "round", "abs", "exp", "exp2", "expm1",
    "log", "log1p", "sqrt", "rsqrt", "cbrt", "sin", "cos", "tan", "asin",
    "acos", "atan", "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
    "logistic", "erf", "erfc", "erf_inv", "integer_pow", "square",
    "reciprocal", "is_finite", "not", "clamp", "eq", "ne", "lt", "le",
    "gt", "ge", "select_n", "convert_element_type", "copy",
    "stop_gradient", "real", "imag", "conj", "complex",
}

_ZERO_DEP = {"iota", "rng_bit_generator", "eq_to", "broadcasted_iota"}


def _eval_sparsity_jaxpr(jaxpr, consts, in_deps, n_in):
    """Interpret ``jaxpr`` propagating per-element dependency matrices.

    Each value's entry is a numpy bool array of shape
    ``aval.shape + (n_in,)`` (scalars: ``(n_in,)``)."""
    env = {}

    def read(atom):
        if isinstance(atom, jex_core.Literal):
            return np.zeros(np.shape(atom.val) + (n_in,), bool)
        return env[atom]

    def write(var, val):
        env[var] = val

    for var, const in zip(jaxpr.constvars, consts):
        shape = tuple(getattr(var.aval, "shape", ()))
        write(var, np.zeros(shape + (n_in,), bool))
    for var, dep in zip(jaxpr.invars, in_deps):
        write(var, dep)

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        ins = [read(a) for a in eqn.invars]
        out_shapes = [tuple(getattr(v.aval, "shape", ()))
                      for v in eqn.outvars]

        if name in ("pjit", "jit", "closed_call", "core_call", "custom_jvp_call",
                    "custom_vjp_call", "custom_vjp_call_jaxpr", "remat",
                    "checkpoint", "custom_jvp_call_jaxpr"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr") \
                or eqn.params.get("fun_jaxpr")
            if inner is None:
                raise UnsupportedPrimitive(name)
            closed = inner if hasattr(inner, "jaxpr") else None
            if closed is not None:
                outs = _eval_sparsity_jaxpr(closed.jaxpr, closed.consts and
                                            closed.consts or [],
                                            ins, n_in)
            else:
                outs = _eval_sparsity_jaxpr(inner, [], ins, n_in)
            for v, o in zip(eqn.outvars, outs):
                write(v, o)
            continue

        if name in _ZERO_DEP:
            for v, shp in zip(eqn.outvars, out_shapes):
                write(v, np.zeros(shp + (n_in,), bool))
            continue

        if name in _ELEMENTWISE:
            out = ins[0]
            for x in ins[1:]:
                out = out | x
            out = np.broadcast_to(out, out_shapes[0] + (n_in,))
            write(eqn.outvars[0], out)
            continue

        if name == "broadcast_in_dim":
            shp = eqn.params["shape"]
            bdims = eqn.params["broadcast_dimensions"]
            x = ins[0]
            expand = [1] * len(shp)
            for i, d in enumerate(bdims):
                expand[d] = x.shape[i]
            x = x.reshape(tuple(expand) + (n_in,))
            write(eqn.outvars[0], np.broadcast_to(x, tuple(shp) + (n_in,)))
            continue

        if name == "reshape":
            write(eqn.outvars[0],
                  ins[0].reshape(tuple(eqn.params["new_sizes"]) + (n_in,)))
            continue

        if name == "squeeze":
            dims = eqn.params["dimensions"]
            write(eqn.outvars[0], np.squeeze(ins[0], axis=tuple(dims)))
            continue

        if name == "transpose":
            perm = tuple(eqn.params["permutation"]) + (ins[0].ndim - 1,)
            write(eqn.outvars[0], np.transpose(ins[0], perm))
            continue

        if name == "rev":
            write(eqn.outvars[0],
                  np.flip(ins[0], axis=tuple(eqn.params["dimensions"])))
            continue

        if name == "slice":
            idx = tuple(slice(s, l, st) for s, l, st in
                        zip(eqn.params["start_indices"],
                            eqn.params["limit_indices"],
                            eqn.params["strides"] or
                            [1] * len(eqn.params["start_indices"])))
            write(eqn.outvars[0], ins[0][idx])
            continue

        if name == "concatenate":
            write(eqn.outvars[0],
                  np.concatenate(ins, axis=eqn.params["dimension"]))
            continue

        if name == "pad":
            cfg = eqn.params["padding_config"]
            x = ins[0]
            if any(lo < 0 or hi < 0 or interior for lo, hi, interior in cfg):
                raise UnsupportedPrimitive("pad(negative/interior)")
            pads = [(lo, hi) for lo, hi, _ in cfg] + [(0, 0)]
            write(eqn.outvars[0], np.pad(x, pads, constant_values=False))
            continue

        if name in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
                    "reduce_and", "reduce_or", "argmax", "argmin"):
            axes = tuple(eqn.params["axes"])
            write(eqn.outvars[0], np.any(ins[0], axis=axes))
            continue

        if name in ("cumsum", "cumprod", "cummax", "cummin",
                    "cumlogsumexp"):
            ax = eqn.params["axis"]
            out = np.logical_or.accumulate(ins[0], axis=ax)
            if eqn.params.get("reverse"):
                out = np.flip(np.logical_or.accumulate(
                    np.flip(ins[0], ax), axis=ax), ax)
            write(eqn.outvars[0], out)
            continue

        if name == "dot_general":
            ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
            a, b = ins
            # conservative: out element depends on the union over the
            # contracted axes of both operands' dependencies
            a_any = np.any(a, axis=tuple(lc))
            b_any = np.any(b, axis=tuple(rc))
            # batch dims must align; a_any shape = batch+rest_a+(n,),
            # b_any = batch+rest_b+(n,)
            nb = len(lb)
            ra = a_any.shape[nb:-1]
            rbs = b_any.shape[nb:-1]
            batch = a_any.shape[:nb]
            a_e = a_any.reshape(batch + ra + (1,) * len(rbs) + (n_in,))
            b_e = b_any.reshape(batch + (1,) * len(ra) + rbs + (n_in,))
            write(eqn.outvars[0], a_e | b_e)
            continue

        if name == "dynamic_slice":
            raise UnsupportedPrimitive("dynamic_slice (traced start)")

        if name == "gather":
            raise UnsupportedPrimitive("gather")

        raise UnsupportedPrimitive(name)

    return [read(v) for v in jaxpr.outvars]


def detect_sparsity_exact(f_flat, n_in: int, dtype=np.float64,
                          max_n: int = 4096) -> Optional["CSR"]:
    """Exact Jacobian sparsity of ``f_flat(u_vec) -> resid_vec`` by jaxpr
    interpretation, or None if the trace uses unsupported primitives or
    ``n_in > max_n`` (dependency matrices are O(n²) bools)."""
    from .sparse import CSR
    import jax.numpy as jnp

    if n_in > max_n:
        return None
    try:
        closed = jax.make_jaxpr(f_flat)(jnp.zeros((n_in,), dtype))
        in_deps = [np.eye(n_in, dtype=bool)]
        outs = _eval_sparsity_jaxpr(closed.jaxpr, closed.consts, in_deps,
                                    n_in)
    except UnsupportedPrimitive:
        return None
    except Exception:  # noqa: BLE001 — any trace failure → probe fallback
        return None
    dep = outs[0]
    dep = dep.reshape(-1, n_in)
    rows, cols = np.nonzero(dep)
    return CSR.from_pattern(rows, cols, dep.shape)
