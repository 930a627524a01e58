"""Trust-region globalization.

Functional port of the reference's trust-region layer
(/root/reference/lib/NonlinearSolveFirstOrder/src/trust_region.jl:150-514 and
levenberg_marquardt.jl:179-268):

* ``GenericTrustRegionScheme`` with the seven radius-update schemes
  Simple / NLsolve / NocedalWright / Hei / Yuan / Fan / Bastin, including the
  per-scheme default thresholds (trust_region.jl:330-384) and per-scheme
  parameters p1–p4 (trust_region.jl:373-381).
* ``LevenbergMarquardtTrustRegion`` — Transtrum–Sethna b_uphill accept rule.
  NOTE: the reference initializes ``loss_old = Inf`` and never updates it
  (levenberg_marquardt.jl:245-268), which accepts every finite step; here
  ``loss_old`` is updated on acceptance, matching Transtrum 2012 eq. (4.1)
  ``(1-β)^b C_{i+1} ≤ C_i``.

Protocol: ``tr_init(cfg, ctx, fu, u) -> state``;
``tr_solve(cfg, state, ctx, J, fu, u, du, descent_result)
-> (accepted, u_new, fu_new, state)``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.norms import l2_norm, tree_dot
from ..ops.operators import mv, rmv
from ..utils.pytree import pytree_dataclass, static_config
from .descent import DescentCtx, DescentResult

SCHEMES = ("simple", "nlsolve", "nocedalwright", "hei", "yuan", "fan", "bastin")


class RadiusUpdateSchemes:
    """Named radius-update schemes (the reference's
    ``RadiusUpdateSchemes`` EnumX namespace, trust_region.jl:59-147) — pass
    one as ``TrustRegion(radius_update_scheme=RadiusUpdateSchemes.Fan)``."""

    Simple = "simple"
    NLsolve = "nlsolve"
    NocedalWright = "nocedalwright"
    Hei = "hei"
    Yuan = "yuan"
    Fan = "fan"
    Bastin = "bastin"


@static_config
class GenericTrustRegionScheme:
    method: str = "simple"
    step_threshold: Optional[float] = None
    shrink_threshold: Optional[float] = None
    expand_threshold: Optional[float] = None
    shrink_factor: Optional[float] = None
    expand_factor: Optional[float] = None
    max_trust_radius: Optional[float] = None
    initial_trust_radius: Optional[float] = None

    def __post_init__(self):
        if self.method not in SCHEMES:
            raise ValueError(f"unknown radius update scheme {self.method!r}")

    # Per-scheme default thresholds (trust_region.jl:346-384).
    def resolved_step_threshold(self) -> float:
        if self.step_threshold is not None:
            return self.step_threshold
        return {"hei": 0.0, "yuan": 1e-3, "bastin": 1 / 20}.get(
            self.method, 1e-4)

    def resolved_shrink_threshold(self) -> float:
        if self.shrink_threshold is not None:
            return self.shrink_threshold
        return {"hei": 0.0, "nlsolve": 1 / 20, "bastin": 1 / 20}.get(
            self.method, 0.25)

    def resolved_expand_threshold(self) -> float:
        if self.expand_threshold is not None:
            return self.expand_threshold
        return {"nlsolve": 0.9, "hei": 0.0, "bastin": 0.9}.get(
            self.method, 0.75)

    def resolved_shrink_factor(self) -> float:
        if self.shrink_factor is not None:
            return self.shrink_factor
        return {"nlsolve": 0.5, "hei": 0.0, "bastin": 1 / 20}.get(
            self.method, 0.25)

    def resolved_expand_factor(self) -> float:
        return 2.0 if self.expand_factor is None else self.expand_factor

    def parameters(self) -> tuple:
        """p1–p4 (trust_region.jl:373-381)."""
        return {
            "nlsolve": (0.5, 0.0, 0.0, 0.0),
            "hei": (5.0, 0.1, 0.15, 0.15),
            "yuan": (2.0, 1 / 6, 6.0, 0.0),
            "fan": (0.1, 0.25, 12.0, 1.0e18),
            "bastin": (2.5, 0.25, 0.0, 0.0),
        }.get(self.method, (0.0, 0.0, 0.0, 0.0))


@static_config
class LevenbergMarquardtTrustRegion:
    b_uphill: float = 1.0


@pytree_dataclass
class TRState:
    trust_region: Any
    max_trust_radius: Any
    p1: Any
    p2: Any
    p3: Any
    p4: Any
    shrink_counter: Any          # int32
    last_step_accepted: Any      # bool


@pytree_dataclass
class LMTRState:
    loss_old: Any
    v_cache: Any
    norm_v_old: Any
    last_step_accepted: Any


def tr_init(cfg, ctx: DescentCtx, fu, u):
    if isinstance(cfg, LevenbergMarquardtTrustRegion):
        dtype = u.dtype
        return LMTRState(
            loss_old=jnp.asarray(jnp.inf, dtype),
            v_cache=jnp.array(u),
            norm_v_old=jnp.asarray(jnp.inf, dtype),
            last_step_accepted=jnp.bool_(False),
        )

    dtype = u.dtype
    u0_norm = l2_norm(u)
    fu_norm = l2_norm(fu)

    # max_trust_radius default (trust_region.jl:330-337): Inf except
    # Simple/NocedalWright → max(‖fu‖, max(u) - min(u)).
    if cfg.max_trust_radius is not None:
        mtr = jnp.asarray(cfg.max_trust_radius, dtype)
    elif cfg.method in ("simple", "nocedalwright"):
        mtr = jnp.maximum(fu_norm, jnp.max(u) - jnp.min(u))
    else:
        mtr = jnp.asarray(jnp.inf, dtype)

    p1, p2, p3, p4 = (jnp.asarray(p, dtype) for p in cfg.parameters())

    # initial_trust_radius defaults (trust_region.jl:339-345).
    if cfg.initial_trust_radius is not None:
        itr = jnp.asarray(cfg.initial_trust_radius, dtype)
    elif cfg.method == "nlsolve":
        itr = jnp.where(u0_norm > 0, u0_norm, jnp.ones_like(u0_norm))
    elif cfg.method in ("hei", "bastin"):
        itr = jnp.ones((), dtype)
    elif cfg.method == "fan":
        itr = (fu_norm ** 0.99) / 10.0
    else:
        itr = mtr / 11.0
    if cfg.method == "yuan":
        # Yuan ALWAYS starts from p1·‖Jᵀfu‖ at u0 — the reference
        # overrides even a user-supplied initial radius
        # (trust_region.jl:234-240, after the default resolution).
        _, vjp_fn = jax.vjp(ctx.f_flat, u)
        jtfu = vjp_fn(fu)[0]
        itr = p1 * l2_norm(jtfu)

    return TRState(
        trust_region=itr, max_trust_radius=mtr, p1=p1, p2=p2, p3=p3, p4=p4,
        shrink_counter=jnp.int32(0), last_step_accepted=jnp.bool_(False),
    )


def _rfunc_hei(r, c2, M, gamma1, gamma2, beta):
    """rfunc_adaptive_trust_region (trust_region.jl:388-395)."""
    branch_hi = (2.0 * (M - 1.0 - gamma2) * jnp.arctan(r - c2)
                 + (1.0 + gamma2)) / jnp.pi
    branch_lo = (1.0 - gamma1 - beta) * (jnp.exp(r - c2)
                                         + beta / (1.0 - gamma1 - beta))
    return jnp.where(r >= c2, branch_hi, branch_lo)


def tr_solve(cfg, state, ctx: DescentCtx, J, fu, u, du,
             descent_result: DescentResult):
    """One trust-region accept/reject + radius update.  Returns
    ``(accepted, u_new, fu_new, new_state)``."""
    if isinstance(cfg, LevenbergMarquardtTrustRegion):
        return _lm_tr_solve(cfg, state, ctx, J, fu, u, du, descent_result)

    dtype = u.dtype
    u_new = u + du
    fu_new = ctx.f_flat(u_new)

    # ρ = (‖fu_new‖² - ‖fu‖²)/2 / (⟨δu, Jᵀfu⟩ + δuᵀJᵀJδu/2)
    # NaN is a *dynamic* not-provided sentinel: Dogleg supplies δuᵀJᵀJδu
    # only on its radius-clipped branch (descent.py:385-388), so which
    # branch ran is data-dependent and a static None cannot express it.
    Jdu = mv(J, du)
    duJtJdu = jnp.where(jnp.isnan(descent_result.duJtJdu),
                        tree_dot(Jdu, Jdu), descent_result.duJtJdu)
    jtfu = rmv(J, fu)
    num = (l2_norm(fu_new) ** 2 - l2_norm(fu) ** 2) / 2.0
    denom = tree_dot(du, jtfu) + duJtJdu / 2.0
    rho = num / denom

    stt = jnp.asarray(cfg.resolved_step_threshold(), dtype)
    sht = jnp.asarray(cfg.resolved_shrink_threshold(), dtype)
    et = jnp.asarray(cfg.resolved_expand_threshold(), dtype)
    shf = jnp.asarray(cfg.resolved_shrink_factor(), dtype)
    ef = jnp.asarray(cfg.resolved_expand_factor(), dtype)

    accepted = rho > stt
    tr = state.trust_region
    du_norm = l2_norm(du)
    shrink = rho < sht
    shrink_counter = jnp.where(shrink, state.shrink_counter + 1, jnp.int32(0))
    p1, p2, p3, p4 = state.p1, state.p2, state.p3, state.p4

    method = cfg.method
    if method == "simple":
        tr = jnp.where(shrink, tr * shf,
                       jnp.where((rho > et) & (rho > stt), ef * tr, tr))
    elif method == "nlsolve":
        grown = jnp.where(rho >= et, ef * du_norm,
                          jnp.where(rho >= p1,
                                    jnp.maximum(tr, ef * du_norm), tr))
        tr = jnp.where(shrink, tr * shf, grown)
    elif method == "nocedalwright":
        expand_ok = (rho > et) & (jnp.abs(du_norm - tr) < 1e-6 * tr)
        tr = jnp.where(shrink, shf * du_norm,
                       jnp.where(expand_ok, ef * tr, tr))
    elif method == "hei":
        tr_new = _rfunc_hei(rho, sht, p1, p3, p4, p2) * du_norm
        shrink_counter = jnp.where(tr_new < tr, state.shrink_counter + 1,
                                   jnp.int32(0))
        tr = tr_new
    elif method == "yuan":
        grow_p1 = (rho >= et) & (2.0 * du_norm > tr)
        p1 = jnp.where(shrink, p2 * p1, jnp.where(grow_p1, p3 * p1, p1))
        _, vjp_fn = jax.vjp(ctx.f_flat, u_new)
        jtfu_new = vjp_fn(fu_new)[0]
        tr = p1 * l2_norm(jtfu_new)
    elif method == "fan":
        p1 = jnp.where(shrink, p1 * p2,
                       jnp.where(rho > et, jnp.minimum(p1 * p3, p4), p1))
        tr = p1 * (l2_norm(fu_new) ** jnp.asarray(0.99, dtype))
    elif method == "bastin":
        # Re-estimate ρ with jvp/vjp operators at u_NEW — the reference
        # binds StatefulJacobianOperators at u_cache = u+δu
        # (trust_region.jl:491-499), not the stale J at u.
        _, vjp_new = jax.vjp(ctx.f_flat, u_new)
        _, Jdu_new = jax.jvp(ctx.f_flat, (u_new,), (du,))
        jtfu_new2 = vjp_new(fu_new)[0]
        denom_1 = tree_dot(jtfu_new2, jtfu_new2)
        jt_jdu = vjp_new(Jdu_new)[0]
        denom_2 = tree_dot(jt_jdu, jt_jdu)
        rho_b = num / (denom_1 + denom_2 / 2.0)
        tr = jnp.where(accepted,
                       jnp.where(rho_b >= et, p1 * du_norm, tr),
                       tr * p2)
        shrink_counter = jnp.where(accepted, jnp.int32(0),
                                   state.shrink_counter + 1)
    else:
        raise AssertionError(method)

    tr = jnp.minimum(tr, state.max_trust_radius)

    new_state = TRState(
        trust_region=tr, max_trust_radius=state.max_trust_radius,
        p1=p1, p2=p2, p3=p3, p4=p4, shrink_counter=shrink_counter,
        last_step_accepted=accepted,
    )
    return accepted, u_new, fu_new, new_state


def _lm_tr_solve(cfg: LevenbergMarquardtTrustRegion, state: LMTRState,
                 ctx: DescentCtx, J, fu, u, du, descent_result):
    v = descent_result.v if descent_result.v is not None else du
    norm_v = l2_norm(v)
    beta = tree_dot(v, state.v_cache) / (norm_v * state.norm_v_old)
    # Inf·0 guards: first step has norm_v_old = Inf → β = 0.
    beta = jnp.where(jnp.isfinite(beta), beta, jnp.zeros_like(beta))

    u_new = u + du
    fu_new = ctx.f_flat(u_new)
    loss = l2_norm(fu_new)
    accepted = (1.0 - beta) ** cfg.b_uphill * loss <= state.loss_old

    new_state = LMTRState(
        loss_old=jnp.where(accepted, loss, state.loss_old),
        v_cache=jnp.where(accepted, v, state.v_cache),
        norm_v_old=jnp.where(accepted, norm_v, state.norm_v_old),
        last_step_accepted=accepted,
    )
    return accepted, u_new, fu_new, new_state


def tr_shrink_counter(state) -> Any:
    """shrink_counter for the engine's ShrinkThresholdExceeded check; the LM
    trust region has none (reference checks hasfield)."""
    if isinstance(state, TRState):
        return state.shrink_counter
    return None
