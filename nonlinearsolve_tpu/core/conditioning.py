"""Nonlinear pre/postconditioning public types.

Port of /root/reference/lib/NonlinearSolveBase/src/conditioning.jl:
``precondition`` is a left residual transform ``G(fu, u, p)`` composed before
the cache is built (AD/termination see the composed map); ``postcondition``
is an iterate corrector ``H(u_proposed, u_prev, p)`` applied at every commit
point.  ``PostconditionSpecifier`` declares which coordinates H is written in
when the problem also carries lb/ub bounds (conditioning.jl:46-66).
"""

from __future__ import annotations

import dataclasses
from typing import Callable


class PostconditionSpace:
    """Coordinate space the postcondition corrector is written in
    (the reference's ``PostconditionSpace.Original|Transformed`` EnumX,
    conditioning.jl:46-66)."""

    Original = "original"
    Transformed = "transformed"


@dataclasses.dataclass(frozen=True)
class PostconditionSpecifier:
    corrector: Callable
    space: str = "original"     # 'original' | 'transformed'

    def __post_init__(self):
        if self.space not in ("original", "transformed"):
            raise ValueError("space must be 'original' or 'transformed'")

    def __call__(self, u_prop, u_prev, p):
        return self.corrector(u_prop, u_prev, p)
