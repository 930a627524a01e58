"""Structured, toggleable logging.

Port of the reference's SciMLLogging-based NonlinearVerbosity
(/root/reference/lib/NonlinearSolveBase/src/verbosity.jl:1-143): per-message-
class toggles grouped into error_control / numerical / sensitivity, with
presets None/Minimal/Standard/Detailed/All.  Messages outside jit go through
``warnings``/``print``; messages at traced sites use ``jax.debug.print``.
"""

from __future__ import annotations

import dataclasses
import sys
import warnings
from typing import Any

_CLASSES = (
    "non_enclosing_interval", "alias_u0_immutable",
    "linsolve_failed_noncurrent", "termination_condition", "threshold_state",
    "forcing", "sensitivity_vjp_choice", "unsupported_postcondition",
)

_PRESETS = {
    "none": frozenset(),
    "minimal": frozenset({"non_enclosing_interval",
                          "linsolve_failed_noncurrent"}),
    "standard": frozenset({"non_enclosing_interval",
                           "linsolve_failed_noncurrent",
                           "termination_condition",
                           "unsupported_postcondition"}),
    "detailed": frozenset(set(_CLASSES) - {"forcing"}),
    "all": frozenset(_CLASSES),
}


@dataclasses.dataclass(frozen=True)
class NonlinearVerbosity:
    """Per-class message toggles; construct from a preset name or override
    individual classes as keyword booleans."""

    preset: str = "standard"
    overrides: Any = None    # tuple of (class, bool)

    def __init__(self, preset="standard", **class_toggles):
        if isinstance(preset, bool):
            preset = "standard" if preset else "none"
        if preset not in _PRESETS:
            raise ValueError(f"unknown verbosity preset {preset!r}")
        for k in class_toggles:
            if k not in _CLASSES:
                raise ValueError(f"unknown message class {k!r}")
        object.__setattr__(self, "preset", preset)
        object.__setattr__(self, "overrides",
                           tuple(sorted(class_toggles.items())))

    def enabled(self, message_class: str) -> bool:
        for k, v in (self.overrides or ()):
            if k == message_class:
                return bool(v)
        return message_class in _PRESETS[self.preset]

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
