"""Damping functions for DampedNewtonDescent.

Functional ports of the reference damping policies:

* ``LevenbergMarquardtDamping`` — Transtrum–Sethna 2012 diagonal damping with
  the running elementwise max of ``diag(JᵀJ)``
  (/root/reference/lib/NonlinearSolveFirstOrder/src/levenberg_marquardt.jl:66-175).
* ``SwitchedEvolutionRelaxation`` — SER pseudo-timestep damping for
  PseudoTransient (/root/reference/lib/NonlinearSolveFirstOrder/src/pseudo_transient.jl).

Protocol: static config + state pytree.
  ``init(cfg, initial, J, fu, u)  -> state``   (state.D is the damping term)
  ``update(cfg, state, jac_damp, rhs_damp) -> (D, state)``  (per descent solve)
  ``post_step(cfg, state, accepted, fu_norm) -> state``     (per outer step)
Traits mirror requires_normal_form_jacobian / _rhs / returns_norm_form_damping.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..utils.norms import l2_norm
from ..utils.pytree import pytree_dataclass, static_config


@static_config
class LevenbergMarquardtDamping:
    increase_factor: float = 2.0
    decrease_factor: float = 3.0
    min_damping: float = 1e-8

    requires_normal_form_jacobian = False
    requires_normal_form_rhs = False
    returns_norm_form_damping = True


@pytree_dataclass
class LMDampingState:
    lam: Any        # current λ
    DtD: Any        # running max of diag(JᵀJ): vector (diagonal damping)


def lm_damping_init(cfg: LevenbergMarquardtDamping, initial_damping, n: int,
                    dtype) -> LMDampingState:
    DtD = jnp.full((n,), jnp.asarray(cfg.min_damping, dtype))
    return LMDampingState(lam=jnp.asarray(initial_damping, dtype), DtD=DtD)


def lm_damping_update(cfg: LevenbergMarquardtDamping, state: LMDampingState,
                      jac_damp, *, is_normal_form: bool):
    """levenberg_marquardt.jl:141-165: DᵀD ← max(DᵀD, diag(JᵀJ));
    damping = λ·DᵀD (a diagonal, returned as a vector)."""
    if is_normal_form:
        j_diag = jnp.diagonal(jac_damp)
    else:
        j_diag = jnp.sum(jac_damp * jac_damp, axis=0)  # diag(JᵀJ) from J
    DtD = jnp.maximum(state.DtD, j_diag)
    return state.lam * DtD, state.replace(DtD=DtD)


def lm_damping_post_step(cfg: LevenbergMarquardtDamping, state: LMDampingState,
                         accepted):
    """callback_into_cache! (levenberg_marquardt.jl:169-175):
    λ ← λ/decrease if the step was accepted, λ·increase otherwise."""
    factor = jnp.where(accepted,
                       1.0 / cfg.decrease_factor, cfg.increase_factor)
    return state.replace(lam=state.lam * factor)


@static_config
class SwitchedEvolutionRelaxation:
    """SER damping: α⁻¹ₙ₊₁ = α⁻¹ₙ·‖fuₙ‖/‖fuₙ₋₁‖, damping α⁻¹ added to
    diag(J) (pseudo_transient.jl).  ``mass_matrix`` generalizes the damped
    step to ``(J + α⁻¹ M) δu = -F`` for DAE steady states
    (pseudo_transient.jl:55-64); pass a dense (n, n) array or a diagonal
    vector; None recovers the identity-damped classic method exactly."""

    mass_matrix: Any = None

    requires_normal_form_jacobian = False
    requires_normal_form_rhs = False
    returns_norm_form_damping = False

    def __hash__(self):
        return hash(id(self.mass_matrix))

    def __eq__(self, other):
        return (isinstance(other, SwitchedEvolutionRelaxation)
                and self.mass_matrix is other.mass_matrix)


@pytree_dataclass
class SERDampingState:
    alpha_inv: Any  # α⁻¹, the damping added to diag(J)
    res_norm: Any   # ‖fu‖ at the previous damping computation


def ser_damping_init(cfg: SwitchedEvolutionRelaxation, initial_damping, fu,
                     dtype) -> SERDampingState:
    # pseudo_transient.jl: α⁻¹ = inv(initial_damping); res_norm = ‖fu‖.
    return SERDampingState(
        alpha_inv=jnp.asarray(1.0 / initial_damping, dtype),
        res_norm=jnp.asarray(l2_norm(fu), dtype),
    )


def ser_damping_update(cfg: SwitchedEvolutionRelaxation, state: SERDampingState,
                       fu):
    """SER update (pseudo_transient.jl InternalAPI.solve!):
    α⁻¹ ← α⁻¹ · ‖fuₙ‖/‖fuₙ₋₁‖; damping term is α⁻¹ (added to diag(J))."""
    res_norm = l2_norm(fu)
    new_alpha_inv = state.alpha_inv * res_norm / jnp.where(
        state.res_norm == 0, jnp.ones_like(state.res_norm), state.res_norm)
    new_alpha_inv = jnp.where(jnp.isfinite(new_alpha_inv), new_alpha_inv,
                              state.alpha_inv)
    new_state = SERDampingState(alpha_inv=new_alpha_inv, res_norm=res_norm)
    return new_alpha_inv, new_state
