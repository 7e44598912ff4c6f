"""Dynamics oracles: closed-form trajectories and Jacobian cross-checks.

Mirrors the reference test strategy (tests/test_dynamics.py): integration
against hand-derived truth sequences, linearization against independent
derivatives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dpilqr_tpu as dtl

from oracle import ORACLE_MODELS, rk4


def _single_fleet(model, dt):
    return dtl.homogeneous_fleet(model, 1, dt)


def _integrate_seq(fleet, x0, u, n_steps):
    x = jnp.asarray(x0, dtype=jnp.float64)[None, :]
    u = jnp.asarray(u, dtype=jnp.float64)[None, :]
    out = [np.asarray(x[0])]
    for _ in range(n_steps):
        x = fleet.step(x, u)
        out.append(np.asarray(x[0]))
    return np.stack(out)


class TestDoubleInt4D:
    def test_constant_accel(self):
        # Constant-acceleration truth sequence (reference test_dynamics.py:31-37;
        # note the reference's table is forward-Euler and stale -- RK4 integrates
        # the double integrator exactly: p(t) = p0 + v0 t + a t^2 / 2).
        dt = 0.5
        fleet = _single_fleet(dtl.DOUBLE_INT_4D, dt)
        X = _integrate_seq(fleet, [0.0, 2, 0, -2], [0.0, 2], 4)
        t = dt * np.arange(5)
        X_truth = np.c_[
            np.zeros(5), 2 - 2 * t + t**2, np.zeros(5), -2 + 2 * t
        ]
        assert np.allclose(X, X_truth, atol=1e-9)

    def test_linearize(self):
        fleet = _single_fleet(dtl.DOUBLE_INT_4D, 0.5)
        A, B = fleet.linearize(jnp.ones((1, 4)), jnp.ones((1, 2)))
        A_expect = np.eye(4)
        A_expect[0, 2] = A_expect[1, 3] = 0.5
        B_expect = np.zeros((4, 2))
        B_expect[2, 0] = B_expect[3, 1] = 0.5
        assert np.allclose(A[0], A_expect)
        assert np.allclose(B[0], B_expect)


class TestCar3D:
    def test_diagonal_line(self):
        # 45-degree straight line (reference test_dynamics.py:49-56)
        dt = 0.5
        fleet = _single_fleet(dtl.CAR_3D, dt)
        X = _integrate_seq(fleet, [0, 0, np.pi / 4], [1.0, 0.0], 3)
        X_truth = np.c_[
            dt * np.sqrt(2) / 2 * np.array([[0, 0], [1, 1], [2, 2], [3, 3]]),
            np.full((4, 1), np.pi / 4),
        ]
        assert np.allclose(X, X_truth, atol=1e-9)


class TestUnicycle4D:
    def test_straight(self):
        dt = 1.0
        fleet = _single_fleet(dtl.UNICYCLE_4D, dt)
        X = _integrate_seq(fleet, np.zeros(4), [1.0, 0.0], 3)
        X_truth = dt * np.array(
            [[0, 0, 0, 0], [0.5, 0, 1, 0], [2, 0, 2, 0], [4.5, 0, 3, 0]]
        )
        # px(t) = t^2/2 under unit accel.
        assert np.allclose(X, X_truth, atol=1e-6)

    def test_exact_circle(self):
        # Constant turn rate traces an exact circular arc (reference :81-97;
        # the reference's truth table is calibrated for its commented-out
        # forward-Euler path -- we check the exact continuous-motion arc:
        # p(t) = p0 + (v/w) [sin(th0+wt) - sin th0, cos th0 - cos(th0+wt)]).
        v, r = np.pi, 10.0
        omega = v / r
        theta0 = np.pi / 2 + omega / 2
        fleet = _single_fleet(dtl.UNICYCLE_4D, 1.0)
        n_steps = int(2 * np.pi / omega)
        X = _integrate_seq(fleet, [r, 0, v, theta0], [0.0, omega], n_steps)
        theta = theta0 + omega * np.arange(n_steps + 1)
        px = r + (v / omega) * (np.sin(theta) - np.sin(theta0))
        py = (v / omega) * (np.cos(theta0) - np.cos(theta))
        assert np.allclose(X[:, 0], px, atol=1e-4)
        assert np.allclose(X[:, 1], py, atol=1e-4)
        assert np.allclose(X[:, 2], v)
        assert np.allclose(X[:, 3], theta, atol=1e-9)

    def test_linearize_matches_hand_formula(self):
        rng = np.random.default_rng(0)
        dt = 0.1
        fleet = _single_fleet(dtl.UNICYCLE_4D, dt)
        x = rng.normal(size=(1, 4)) * 10
        u = rng.normal(size=(1, 2)) * 10
        A, B = fleet.linearize(jnp.asarray(x), jnp.asarray(u))
        _, jac, *_ = ORACLE_MODELS["Unicycle4D"]
        A_o, B_o = jac(x[0], u[0], dt)
        assert np.allclose(A[0], A_o)
        assert np.allclose(B[0], B_o)


class TestQuad6D:
    def test_linearize_matches_hand_formula(self):
        rng = np.random.default_rng(1)
        dt = 0.1
        fleet = _single_fleet(dtl.QUAD_6D, dt)
        x = rng.normal(size=(1, 6))
        u = rng.normal(size=(1, 3)) * 0.3
        A, B = fleet.linearize(jnp.asarray(x), jnp.asarray(u))
        _, jac, *_ = ORACLE_MODELS["Quad6D"]
        A_o, B_o = jac(x[0], u[0], dt)
        assert np.allclose(A[0], A_o)
        assert np.allclose(B[0], B_o)

    def test_hover(self):
        # Thrust exactly g holds altitude.
        fleet = _single_fleet(dtl.QUAD_6D, 0.1)
        x = jnp.asarray([[0.0, 0, 1, 0, 0, 0]])
        u = jnp.asarray([[dtl.GRAVITY, 0.0, 0.0]])
        x1 = fleet.step(x, u)
        assert np.allclose(x1, x, atol=1e-12)


@pytest.mark.parametrize(
    "spec,nx,nu",
    [
        (dtl.QUAD_12D, 12, 4),
        (dtl.BIKE_5D, 5, 2),
        (dtl.HUMAN_6D, 6, 3),
        (dtl.HUMAN_LIN_6D, 6, 3),
        (dtl.DOUBLE_INT_6D, 6, 3),
    ],
)
def test_linearize_vs_finite_difference(spec, nx, nu):
    """FD oracle pattern (reference test_dynamics.py:19-24), applied to the
    continuous vector field: the autodiff Jacobians A_c, B_c must match
    central differences of f.  (The Euler discretization convention
    ``A_d = I + dt A_c`` is checked separately against hand formulas.)"""
    rng = np.random.default_rng(2)
    dt = 0.02
    fleet = _single_fleet(spec, dt)
    x0 = rng.normal(size=(nx,)) * 0.3
    u0 = rng.normal(size=(nu,)) * 0.3
    A, B = fleet.linearize(jnp.asarray(x0[None]), jnp.asarray(u0[None]))
    # Undo the Euler discretization to recover the continuous Jacobians.
    A_c = (np.asarray(A[0]) - np.eye(nx)) / dt
    B_c = np.asarray(B[0]) / dt

    eps = 1e-6

    def f1(xv, uv):
        return np.asarray(fleet.f(xv[None], uv[None]))[0]

    A_fd = np.zeros((nx, nx))
    for k in range(nx):
        dxp, dxm = x0.copy(), x0.copy()
        dxp[k] += eps
        dxm[k] -= eps
        A_fd[:, k] = (f1(dxp, u0) - f1(dxm, u0)) / (2 * eps)
    B_fd = np.zeros((nx, nu))
    for k in range(nu):
        dup, dum = u0.copy(), u0.copy()
        dup[k] += eps
        dum[k] -= eps
        B_fd[:, k] = (f1(x0, dup) - f1(x0, dum)) / (2 * eps)

    scale = max(1.0, np.abs(B_fd).max(), np.abs(A_fd).max())
    assert np.allclose(A_c, A_fd, atol=1e-5 * scale)
    assert np.allclose(B_c, B_fd, atol=1e-5 * scale)


class TestHeterogeneousFleet:
    def test_mixed_fleet_matches_singles(self):
        dt = 0.1
        fleet = dtl.Fleet((dtl.DOUBLE_INT_4D, dtl.CAR_3D, dtl.UNICYCLE_4D), dt)
        assert fleet.nx_p == 4 and fleet.nu_p == 2
        rng = np.random.default_rng(3)
        x = rng.normal(size=(3, 4))
        x[1, 3] = 0.0  # Car3D padding
        u = rng.normal(size=(3, 2))
        out = np.asarray(fleet.step(jnp.asarray(x), jnp.asarray(u)))

        f_di, _, *_ = ORACLE_MODELS["DoubleInt4D"]
        f_uni, _, *_ = ORACLE_MODELS["Unicycle4D"]
        assert np.allclose(out[0], rk4(f_di, x[0], u[0], dt))
        assert np.allclose(out[2], rk4(f_uni, x[2], u[2], dt))

        # Car3D occupies the first 3 state slots; padding stays zero.
        def f_car(xc, uc):
            return np.array([uc[0] * np.cos(xc[2]), uc[0] * np.sin(xc[2]), uc[1]])

        assert np.allclose(out[1, :3], rk4(f_car, x[1, :3], u[1], dt))
        assert out[1, 3] == 0.0

    def test_substeps_match_reference_convention(self):
        # C++-backed models use 5 RK4 substeps, Bike5D (sympy path) uses 1.
        assert dtl.UNICYCLE_4D.rk4_substeps == 5
        assert dtl.BIKE_5D.rk4_substeps == 1
