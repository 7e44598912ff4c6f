"""Cost oracles: algebraic expectations and autodiff cross-checks.

Mirrors the reference test strategy (tests/test_cost.py) but upgrades the
finite-difference oracle to exact autodiff: our closed-form proximity
quadraticization must equal jax.grad / jax.hessian of the evaluated cost.
"""

import numpy as np
import jax
import jax.numpy as jnp

import dpilqr_tpu as dtl
from dpilqr_tpu.ops import costs as C

from oracle import OracleGameCost


def _simple_cost(n, nx, nu, radius, n_pos=2, xf=None, mask=None):
    if xf is None:
        xf = np.zeros((n, nx))
    Q = np.tile(np.eye(nx), (n, 1, 1))
    R = np.tile(np.eye(nu), (n, 1, 1))
    Qf = np.tile(np.eye(nx), (n, 1, 1))
    return dtl.make_game_cost(
        xf, Q, R, Qf, radius=radius, n_pos=np.full(n, n_pos), agent_mask=mask
    )


class TestReferenceCostAlgebra:
    def test_stage_and_terminal_values(self):
        rng = np.random.default_rng(0)
        n, nx, nu = 1, 4, 2
        x = rng.normal(size=(n, nx))
        u = rng.normal(size=(n, nu))
        cost = _simple_cost(n, nx, nu, radius=0.0)
        expect = np.sum(x**2) + np.sum(u**2)
        assert np.isclose(float(dtl.stage_cost(cost, jnp.asarray(x), jnp.asarray(u))), expect)
        assert np.isclose(float(dtl.terminal_cost(cost, jnp.asarray(x))), np.sum(x**2))

    def test_quadraticize_expectations(self):
        # L_x = (x-xf)(Q+Q^T), L_xx = Q+Q^T, etc (reference cost.py:85-101).
        rng = np.random.default_rng(1)
        n, nx, nu = 1, 3, 2
        x = rng.integers(0, 10, size=(n, nx)).astype(float)
        u = rng.integers(0, 10, size=(n, nu)).astype(float)
        cost = _simple_cost(n, nx, nu, radius=0.0)
        L_x, L_u, L_xx, L_uu = dtl.quadraticize_stage(cost, jnp.asarray(x), jnp.asarray(u))
        assert np.allclose(L_x[0], 2 * x[0])
        assert np.allclose(L_u[0], 2 * u[0])
        assert np.allclose(L_xx[0, :, 0, :], 2 * np.eye(nx))
        assert np.allclose(L_uu[0], 2 * np.eye(nu))


class TestProximity:
    def test_value_two_agents(self):
        r = 10.0
        x = np.array([[0.0, 0, 0], [1.0, 2, 0]])
        cost = _simple_cost(2, 3, 2, radius=r)
        val = float(dtl.proximity_cost(cost, jnp.asarray(x)))
        assert np.isclose(val, (np.hypot(1, 2) - r) ** 2)

    def test_outside_radius_zero(self):
        cost = _simple_cost(2, 3, 2, radius=0.5)
        x = np.array([[0.0, 0, 0], [9.0, 9, 0]])
        assert float(dtl.proximity_cost(cost, jnp.asarray(x))) == 0.0

    def test_quadraticize_is_exact_derivative(self):
        """Closed form == autodiff of the evaluated penalty (3 agents, 3D)."""
        r = 10.0
        n, nx = 3, 4
        cost = _simple_cost(n, nx, 2, radius=r, n_pos=3)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(n, nx)) * 2)

        def val(xv):
            return C.proximity_cost(cost, xv)

        g_auto = jax.grad(val)(x)
        H_auto = jax.hessian(val)(x)
        L_x, L_xx = C.proximity_quadraticize(cost, x)
        assert np.allclose(L_x, g_auto, atol=1e-10)
        assert np.allclose(L_xx, H_auto, atol=1e-10)

    def test_quadraticize_2d_vs_3d(self):
        # n_pos=2 ignores the z component entirely.
        r = 5.0
        x = np.array([[0.0, 0, 3, 9], [1.0, 1, -3, 9]])
        cost2 = _simple_cost(2, 4, 2, radius=r, n_pos=2)

        def val(xv):
            return C.proximity_cost(cost2, xv)

        x = jnp.asarray(x)
        g_auto = jax.grad(val)(x)
        L_x, L_xx = C.proximity_quadraticize(cost2, x)
        assert np.allclose(L_x, g_auto, atol=1e-10)
        assert np.allclose(L_xx, jax.hessian(val)(x), atol=1e-10)
        assert np.allclose(L_x[:, 2:], 0.0)

    def test_mixed_n_pos_uses_pair_min(self):
        # Pair (3D agent, 2D agent) couples through 2D distance only.
        r = 5.0
        n, nx = 2, 6
        cost = dtl.make_game_cost(
            np.zeros((n, nx)),
            np.tile(np.eye(nx), (n, 1, 1)),
            np.tile(np.eye(3), (n, 1, 1)),
            np.tile(np.eye(nx), (n, 1, 1)),
            radius=r,
            n_pos=np.array([3, 2]),
        )
        x = jnp.asarray([[0.0, 0, 4, 0, 0, 0], [1.0, 1, -7, 0, 0, 0]])
        val = float(C.proximity_cost(cost, x))
        assert np.isclose(val, (np.hypot(1, 1) - r) ** 2)


class TestGameCost:
    def test_matches_oracle_multi_agent(self):
        rng = np.random.default_rng(3)
        n, nx, nu, r = 3, 4, 2, 5.0
        xf = rng.normal(size=(n, nx))
        x = rng.normal(size=(n, nx)) * 2
        u = rng.normal(size=(n, nu))
        cost = _simple_cost(n, nx, nu, radius=r, xf=xf)
        oracle = OracleGameCost(
            xf, [np.eye(nx)] * n, [np.eye(nu)] * n, [np.eye(nx)] * n, r, nx, nu, n
        )
        ours = float(dtl.stage_cost(cost, jnp.asarray(x), jnp.asarray(u)))
        assert np.isclose(ours, oracle(x.flatten(), u.flatten()), rtol=1e-12)
        ours_T = float(dtl.terminal_cost(cost, jnp.asarray(x)))
        assert np.isclose(
            ours_T, oracle(x.flatten(), u.flatten(), terminal=True), rtol=1e-12
        )

    def test_quadraticize_matches_oracle(self):
        rng = np.random.default_rng(4)
        n, nx, nu, r = 3, 4, 2, 5.0
        xf = rng.normal(size=(n, nx))
        x = rng.normal(size=(n, nx)) * 2
        u = rng.normal(size=(n, nu))
        cost = _simple_cost(n, nx, nu, radius=r, xf=xf)
        oracle = OracleGameCost(
            xf, [np.eye(nx)] * n, [np.eye(nu)] * n, [np.eye(nx)] * n, r, nx, nu, n
        )
        L_x, L_u, L_xx, L_uu = dtl.quadraticize_stage(
            cost, jnp.asarray(x), jnp.asarray(u)
        )
        Lx_o, Lu_o, Lxx_o, Luu_o = oracle.quadraticize(x.flatten(), u.flatten())
        assert np.allclose(np.asarray(L_x).reshape(-1), Lx_o)
        assert np.allclose(np.asarray(L_u).reshape(-1), Lu_o)
        assert np.allclose(np.asarray(L_xx).reshape(n * nx, n * nx), Lxx_o)
        # our L_uu is block-diagonal (n, nu, nu)
        for i in range(n):
            assert np.allclose(
                np.asarray(L_uu)[i], Luu_o[i * nu : (i + 1) * nu, i * nu : (i + 1) * nu]
            )

    def test_masked_slot_contributes_nothing(self):
        n, nx, nu, r = 3, 4, 2, 100.0  # huge radius: all pairs active
        rng = np.random.default_rng(5)
        x = rng.normal(size=(n, nx))
        u = rng.normal(size=(n, nu))
        u[2] = 0.0  # masked slot controls are zero by construction
        mask = np.array([1.0, 1.0, 0.0])
        cost_m = _simple_cost(n, nx, nu, radius=r, mask=mask)
        cost_2 = _simple_cost(2, nx, nu, radius=r)
        ours = float(dtl.stage_cost(cost_m, jnp.asarray(x), jnp.asarray(u)))
        ref = float(dtl.stage_cost(cost_2, jnp.asarray(x[:2]), jnp.asarray(u[:2])))
        assert np.isclose(ours, ref, rtol=1e-12)
