"""Structured, toggleable logging.

Port of the reference's SciMLLogging-based NonlinearVerbosity
(/root/reference/lib/NonlinearSolveBase/src/verbosity.jl:1-143): the full
per-message-class toggle matrix grouped into error_control / numerical /
sensitivity, group-level control, a nested ``linear_verbosity``
sub-specifier (the LinearSolve verbosity role), and presets
None/Minimal/Standard/Detailed/All.  Messages outside jit go through
``print``-to-stderr; messages at traced sites use ``jax.debug.print``
(compiled to nothing when the class is off — the @SciMLMessage zero-cost
property).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any

# message-class matrix (verbosity.jl toggles list)
_GROUPS = {
    "error_control": ("non_enclosing_interval", "alias_u0_immutable",
                      "linsolve_failed_noncurrent", "termination_condition",
                      "unsupported_postcondition", "dropped_extension_kwarg"),
    "numerical": ("threshold_state", "forcing"),
    "sensitivity": ("sensitivity_vjp_choice",),
}
_CLASSES = tuple(c for grp in _GROUPS.values() for c in grp)

_PRESETS = {
    "none": frozenset(),
    "minimal": frozenset({"non_enclosing_interval",
                          "linsolve_failed_noncurrent",
                          "dropped_extension_kwarg"}),
    "standard": frozenset({"non_enclosing_interval",
                           "linsolve_failed_noncurrent",
                           "termination_condition",
                           "unsupported_postcondition",
                           "dropped_extension_kwarg"}),
    "detailed": frozenset(set(_CLASSES) - {"forcing"}),
    "all": frozenset(_CLASSES),
}

# nested linear-solver message classes (the reference forwards a
# LinearVerbosity to LinearSolve; ours feeds ops/linear_solve + ops/krylov)
_LINEAR_CLASSES = ("rank_deficient_fallback", "krylov_breakdown",
                   "krylov_unconverged", "precond_unavailable")
_LINEAR_PRESETS = {
    "none": frozenset(),
    "minimal": frozenset({"rank_deficient_fallback"}),
    "standard": frozenset({"rank_deficient_fallback", "krylov_unconverged",
                           "precond_unavailable"}),
    "detailed": frozenset(_LINEAR_CLASSES),
    "all": frozenset(_LINEAR_CLASSES),
}


@dataclasses.dataclass(frozen=True)
class LinearVerbosity:
    """Nested linear-solver verbosity (the LinearSolve.jl sub-specifier
    slot in the reference's matrix, verbosity.jl sub_specifiers)."""

    preset: str = "none"
    overrides: Any = ()

    def __init__(self, preset="none", **class_toggles):
        if isinstance(preset, bool):
            preset = "standard" if preset else "none"
        if preset not in _LINEAR_PRESETS:
            raise ValueError(f"unknown linear verbosity preset {preset!r}")
        for k in class_toggles:
            if k not in _LINEAR_CLASSES:
                raise ValueError(f"unknown linear message class {k!r}; "
                                 f"known: {_LINEAR_CLASSES}")
        object.__setattr__(self, "preset", preset)
        object.__setattr__(self, "overrides",
                           tuple(sorted(class_toggles.items())))

    def enabled(self, message_class: str) -> bool:
        for k, v in self.overrides:
            if k == message_class:
                return bool(v)
        return message_class in _LINEAR_PRESETS[self.preset]

    def emit(self, message_class: str, message: str):
        if self.enabled(message_class):
            print(f"[nonlinearsolve_tpu:linear:{message_class}] {message}",
                  file=sys.stderr)


@dataclasses.dataclass(frozen=True)
class NonlinearVerbosity:
    """Per-class message toggles.

    Construct from a preset name, set whole groups
    (``error_control=True``), override individual classes
    (``forcing=True``), and/or nest a linear sub-specifier
    (``linear_verbosity=LinearVerbosity("all")``) — individual class
    settings win over group settings, which win over the preset
    (verbosity.jl constructor semantics).
    """

    preset: str = "standard"
    overrides: Any = None          # tuple of (class, bool)
    linear_verbosity: Any = None   # LinearVerbosity or None

    def __init__(self, preset="standard", *, linear_verbosity=None,
                 **toggles):
        if isinstance(preset, bool):
            preset = "standard" if preset else "none"
        if preset not in _PRESETS:
            raise ValueError(f"unknown verbosity preset {preset!r}")
        resolved = {}
        # group-level settings first (lower priority)
        for group, members in _GROUPS.items():
            if group in toggles:
                val = bool(toggles.pop(group))
                for m in members:
                    resolved[m] = val
        # individual classes override groups
        for k, v in toggles.items():
            if k not in _CLASSES:
                raise ValueError(
                    f"unknown message class or group {k!r}; known classes: "
                    f"{_CLASSES}, groups: {tuple(_GROUPS)}")
            resolved[k] = bool(v)
        if linear_verbosity is None and preset != "none":
            # every preset carries its matching linear sub-specifier —
            # 'standard' includes precond_unavailable/krylov_unconverged,
            # so verbose=True surfaces linear-layer degradations (a
            # detailed/all-only sub-spec left those classes dead at the
            # advertised verbose=True configuration)
            linear_verbosity = LinearVerbosity(preset)
        elif isinstance(linear_verbosity, str):
            linear_verbosity = LinearVerbosity(linear_verbosity)
        object.__setattr__(self, "preset", preset)
        object.__setattr__(self, "overrides",
                           tuple(sorted(resolved.items())))
        object.__setattr__(self, "linear_verbosity", linear_verbosity)

    def enabled(self, message_class: str) -> bool:
        for k, v in (self.overrides or ()):
            if k == message_class:
                return bool(v)
        return message_class in _PRESETS[self.preset]

    @property
    def linear(self) -> "LinearVerbosity | None":
        return self.linear_verbosity

    def emit(self, message_class: str, message: str):
        """@SciMLMessage analogue (host-side sites)."""
        if self.enabled(message_class):
            print(f"[nonlinearsolve_tpu:{message_class}] {message}",
                  file=sys.stderr)


VERBOSITY_NONE = NonlinearVerbosity("none")
VERBOSITY_ALL = NonlinearVerbosity("all")


def normalize_verbosity(verbose) -> "NonlinearVerbosity | None":
    """Accept None | bool | preset str | NonlinearVerbosity (the reference's
    verbose-kwarg normalization, solve.jl:84-95)."""
    if verbose is None or isinstance(verbose, NonlinearVerbosity):
        return verbose
    return NonlinearVerbosity(verbose)


def traced_emit(verbosity, message_class: str, pred, fmt: str, **kwargs):
    """@SciMLMessage analogue at a TRACED site: compiles to nothing unless
    the class is enabled (static check), in which case it lowers to a
    predicated ``jax.debug.print``."""
    if verbosity is None or not verbosity.enabled(message_class):
        return
    import jax

    jax.lax.cond(
        pred,
        lambda: jax.debug.print(
            f"[nonlinearsolve_tpu:{message_class}] {fmt}", **kwargs),
        lambda: None)


def traced_emit_linear(verbosity, message_class: str, pred, fmt: str,
                       **kwargs):
    """Traced emission through the nested linear sub-specifier."""
    if verbosity is None:
        return
    lin = getattr(verbosity, "linear", None) \
        if isinstance(verbosity, NonlinearVerbosity) else verbosity
    if lin is None or not lin.enabled(message_class):
        return
    import jax

    jax.lax.cond(
        pred,
        lambda: jax.debug.print(
            f"[nonlinearsolve_tpu:linear:{message_class}] {fmt}", **kwargs),
        lambda: None)
