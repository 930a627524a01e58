"""Wolfe-family line searches (core/wolfe_linesearch.py).

Mirrors the reference's line-search matrix: the first-order rootfind sweep
(/root/reference/lib/NonlinearSolveFirstOrder/test/rootfind_tests__item2.jl:41-46
— LineSearchesJL Static/BackTracking/MoreThuente/StrongWolfe/HagerZhang) and
the quasi-Newton sweep
(/root/reference/lib/NonlinearSolveQuasiNewton/test/core_tests__item1.jl:25-31),
plus direct acceptance-condition checks on the returned step length.
"""

import jax
import jax.numpy as jnp
import pytest

import nonlinearsolve_tpu as nls
from nonlinearsolve_tpu.core import linesearch as lsr
from nonlinearsolve_tpu.core.descent import DescentCtx
from nonlinearsolve_tpu.core.wolfe_linesearch import (
    HagerZhang, LineSearchesJL, MoreThuente, StaticLineSearch, StrongWolfe)

WOLFE_SEARCHES = [StaticLineSearch(), StrongWolfe(), HagerZhang(),
                  MoreThuente()]


def quadratic_f(u, p):
    return u**2 - p


def broyden_tridiagonal(u, p):
    up = jnp.pad(u, 1)
    return (3.0 - 2.0 * u) * u - up[:-2] - 2.0 * up[2:] + 1.0


def generalized_rosenbrock(u, p):
    # Rectangular (2(n-1) × n) residual; unique root is the all-ones vector.
    return jnp.concatenate([1.0 - u[:-1], 10.0 * (u[1:] - u[:-1] ** 2)])


@pytest.mark.parametrize("ls", WOLFE_SEARCHES,
                         ids=lambda c: type(c).__name__)
@pytest.mark.parametrize("make_alg", [nls.NewtonRaphson, nls.GaussNewton],
                         ids=["NR", "GN"])
def test_first_order_with_wolfe_searches(ls, make_alg):
    prob = nls.NonlinearProblem(quadratic_f, jnp.array([1.0, 1.0]), 2.0)
    sol = nls.solve(prob, make_alg(linesearch=ls))
    assert int(sol.retcode) == int(nls.ReturnCode.Success)
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-9


@pytest.mark.parametrize("ls", WOLFE_SEARCHES,
                         ids=lambda c: type(c).__name__)
def test_newton_rosenbrock_with_wolfe_searches(ls):
    u0 = jnp.full((8,), -1.2).at[1::2].set(1.0)
    prob = nls.NonlinearProblem(generalized_rosenbrock, u0, None)
    sol = nls.solve(prob, nls.NewtonRaphson(linesearch=ls), maxiters=500)
    assert int(sol.retcode) == int(nls.ReturnCode.Success)
    assert float(jnp.max(jnp.abs(sol.u - 1.0))) < 1e-8


@pytest.mark.parametrize("ls", [StrongWolfe(), HagerZhang(), MoreThuente(),
                                StaticLineSearch()],
                         ids=lambda c: type(c).__name__)
@pytest.mark.parametrize("make_alg", [nls.Broyden, nls.Klement],
                         ids=["Broyden", "Klement"])
def test_quasi_newton_with_wolfe_searches(make_alg, ls):
    if isinstance(ls, StaticLineSearch) and make_alg is nls.Klement:
        pytest.skip("Klement without globalization stalls on this problem "
                    "(reference only runs HagerZhang/BackTracking/LiFukushima)")
    prob = nls.NonlinearProblem(broyden_tridiagonal, -jnp.ones(8), None)
    sol = nls.solve(prob, make_alg(linesearch=ls), maxiters=1000)
    assert int(sol.retcode) == int(nls.ReturnCode.Success)
    assert float(jnp.max(jnp.abs(sol.resid))) < 1e-9


def _ls_result(cfg, f, u, du):
    ctx = DescentCtx(f_flat=f, n_in=u.size, n_out=u.size,
                     is_least_squares=False)
    fu = f(u)
    state = lsr.ls_init(cfg, ctx, fu, u)
    return lsr.ls_solve(cfg, state, ctx, u, du, fu, None, jnp.int32(0))


def _phi_dphi(f, u, du, alpha):
    fa, jdu = jax.jvp(f, (u + alpha * du,), (du,))
    return 0.5 * jnp.vdot(fa, fa), jnp.vdot(fa, jdu)


@pytest.mark.parametrize("cfg", [StrongWolfe(), HagerZhang(), MoreThuente()],
                         ids=lambda c: type(c).__name__)
def test_wolfe_conditions_hold_at_accepted_step(cfg):
    # A merit with curvature along the step so α=1 violates strong Wolfe:
    # the searches must return an interior α satisfying their conditions.
    def f(u):
        return jnp.array([jnp.tanh(4.0 * u[0]) + 0.05 * u[0],
                          u[1] - 1.0])

    u = jnp.array([2.0, 3.0])
    fu = f(u)
    # Newton-ish direction scaled up so the full step overshoots badly.
    du = jnp.array([-30.0, -2.0])
    res = _ls_result(cfg, f, u, du)
    assert bool(res.success)
    alpha = float(res.alpha)
    assert alpha > 0.0
    phi0, dphi0 = _phi_dphi(f, u, du, 0.0)
    phi_a, dphi_a = _phi_dphi(f, u, du, alpha)
    assert float(dphi0) < 0.0
    if isinstance(cfg, StrongWolfe):
        c1, c2 = cfg.c_1, cfg.c_2
        assert float(phi_a) <= float(phi0) + c1 * alpha * float(dphi0) + 1e-12
        assert abs(float(dphi_a)) <= -c2 * float(dphi0) + 1e-12
    elif isinstance(cfg, HagerZhang):
        # original OR approximate Wolfe
        d, s = cfg.delta, cfg.sigma
        eps_k = cfg.epsilon * abs(float(phi0))
        orig = (float(phi_a) - float(phi0) <= d * alpha * float(dphi0) + 1e-12
                and float(dphi_a) >= s * float(dphi0) - 1e-12)
        approx = ((2 * d - 1) * float(dphi0) >= float(dphi_a) - 1e-12
                  and float(dphi_a) >= s * float(dphi0) - 1e-12
                  and float(phi_a) <= float(phi0) + eps_k + 1e-12)
        assert orig or approx
    else:  # MoreThuente
        ft, gt = cfg.f_tol, cfg.gtol
        assert float(phi_a) <= float(phi0) + ft * alpha * float(dphi0) + 1e-12
        assert abs(float(dphi_a)) <= gt * (-float(dphi0)) + 1e-12


def test_static_full_step_and_failure_on_nonfinite():
    def f(u):
        return jnp.array([jnp.exp(u[0]) - 1.0])

    res = _ls_result(StaticLineSearch(), f, jnp.array([0.5]),
                     jnp.array([-0.25]))
    assert bool(res.success) and float(res.alpha) == 1.0
    # A step that lands on a non-finite residual must fail, not succeed.
    res = _ls_result(StaticLineSearch(), f, jnp.array([0.5]),
                     jnp.array([1e6]))
    assert not bool(res.success)


def test_linesearchesjl_shim():
    assert isinstance(LineSearchesJL(), StaticLineSearch)
    assert isinstance(LineSearchesJL(method="static"), StaticLineSearch)
    assert isinstance(LineSearchesJL(method="MoreThuente"), MoreThuente)
    assert isinstance(LineSearchesJL(method="strong_wolfe", autodiff="fwd"),
                      StrongWolfe)
    assert isinstance(LineSearchesJL(method="hagerzhang"), HagerZhang)
    assert isinstance(LineSearchesJL(method="backtracking"),
                      lsr.BackTracking)
    cfg = LineSearchesJL(method=StrongWolfe(c_2=0.5))
    assert cfg.c_2 == 0.5
    with pytest.raises(ValueError):
        LineSearchesJL(method="nope")


def test_wolfe_search_is_jit_and_vmap_compatible():
    prob_f = quadratic_f

    @jax.jit
    def solve_one(p):
        prob = nls.NonlinearProblem(prob_f, jnp.array([1.0, 1.0]), p)
        return nls.solve(prob, nls.NewtonRaphson(linesearch=StrongWolfe())).u

    ps = jnp.array([2.0, 3.0, 4.0])
    us = jax.vmap(solve_one)(ps)
    assert jnp.allclose(us, jnp.sqrt(ps)[:, None], atol=1e-9)
