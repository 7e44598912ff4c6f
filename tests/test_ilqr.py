"""Solver-level parity: the jitted block-structured iLQR must reproduce the
dense numpy oracle (a literal transcription of the reference algorithm)
trajectory-for-trajectory in float64.
"""

import numpy as np
import jax.numpy as jnp

import dpilqr_tpu as dtl

from oracle import OracleGameCost, OracleMultiModel, oracle_ilqr


def _setup_unicycle_single():
    # scripts/examples.py single_unicycle scenario.
    dt, N = 0.05, 50
    fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, 1, dt)
    x0 = np.array([-10.0, 10, 10, 0])
    Q = np.diag([1.0, 1, 0, 0])
    Qf = 1000 * np.eye(4)
    R = np.eye(2)
    cost = dtl.make_game_cost(np.zeros((1, 4)), Q[None], R[None], Qf[None], radius=0.0)
    model_o = OracleMultiModel("Unicycle4D", 1, dt)
    cost_o = OracleGameCost(
        np.zeros(4), [Q], [R], [Qf], 0.0, 4, 2, 1
    )
    return fleet, cost, model_o, cost_o, x0, N


def test_single_unicycle_matches_oracle():
    fleet, cost, model_o, cost_o, x0, N = _setup_unicycle_single()
    res = dtl.ilqr_solve(fleet, cost, jnp.asarray(x0[None]), N=N)
    X_o, U_o, J_o, iters_o, conv_o = oracle_ilqr(model_o, cost_o, x0, N=N)

    assert bool(res.converged) == conv_o
    assert int(res.iters) == iters_o
    assert np.isclose(float(res.J), J_o, rtol=1e-8)
    assert np.allclose(np.asarray(res.X)[:, 0, :], X_o, atol=1e-6)
    assert np.allclose(np.asarray(res.U)[:, 0, :], U_o, atol=1e-6)


def test_multi_agent_game_matches_oracle():
    """3 double-integrators crossing with active proximity coupling."""
    dt, N, radius = 0.1, 30, 1.0
    n, nx, nu = 3, 4, 2
    fleet = dtl.homogeneous_fleet(dtl.DOUBLE_INT_4D, n, dt)

    # Symmetric swap: agents pass near the origin -> coupling activates.
    x0 = np.array(
        [[-2.0, 0.0, 0, 0], [2.0, 0.1, 0, 0], [0.0, -2.0, 0, 0]]
    )
    xf = np.array(
        [[2.0, 0.0, 0, 0], [-2.0, 0.1, 0, 0], [0.0, 2.0, 0, 0]]
    )
    Q = np.eye(nx)
    R = np.eye(nu)
    Qf = 100 * np.eye(nx)

    cost = dtl.make_game_cost(
        xf, np.tile(Q, (n, 1, 1)), np.tile(R, (n, 1, 1)), np.tile(Qf, (n, 1, 1)),
        radius=radius,
    )
    res = dtl.ilqr_solve(fleet, cost, jnp.asarray(x0), N=N)

    model_o = OracleMultiModel("DoubleInt4D", n, dt)
    cost_o = OracleGameCost(xf.flatten(), [Q] * n, [R] * n, [Qf] * n, radius, nx, nu, n)
    X_o, U_o, J_o, iters_o, conv_o = oracle_ilqr(model_o, cost_o, x0.flatten(), N=N)

    assert int(res.iters) == iters_o
    assert bool(res.converged) == conv_o
    assert np.isclose(float(res.J), J_o, rtol=1e-7)
    X_flat = np.asarray(res.X).reshape(N + 1, n * nx)
    assert np.allclose(X_flat, X_o, atol=1e-5)

    # Sanity: proximity respected reasonably, agents reach goals.
    final = np.asarray(res.X)[-1]
    assert np.linalg.norm(final[:, :2] - xf[:, :2]) < 0.5


def test_quad6d_single_matches_oracle():
    # scripts/examples.py single_quad6d scenario.
    dt, N = 0.1, 40
    fleet = dtl.homogeneous_fleet(dtl.QUAD_6D, 1, dt)
    x0 = np.array([2.0, 2, 0.5, 0, 0, 0])
    Q = np.eye(6)
    Qf = 100 * np.eye(6)
    R = np.diag([0.0, 1, 1])
    cost = dtl.make_game_cost(np.zeros((1, 6)), Q[None], R[None], Qf[None], radius=0.0)
    res = dtl.ilqr_solve(fleet, cost, jnp.asarray(x0[None]), N=N)

    model_o = OracleMultiModel("Quad6D", 1, dt)
    cost_o = OracleGameCost(np.zeros(6), [Q], [R], [Qf], 0.0, 6, 3, 1)
    X_o, U_o, J_o, iters_o, conv_o = oracle_ilqr(model_o, cost_o, x0, N=N)

    assert int(res.iters) == iters_o
    assert np.isclose(float(res.J), J_o, rtol=1e-7)
    assert np.allclose(np.asarray(res.X)[:, 0, :], X_o, atol=1e-5)


def test_warm_start_used():
    fleet, cost, model_o, cost_o, x0, N = _setup_unicycle_single()
    rng = np.random.default_rng(0)
    U0 = rng.uniform(size=(N, 1, 2)) * 0.01
    res = dtl.ilqr_solve(fleet, cost, jnp.asarray(x0[None]), U0=jnp.asarray(U0))
    X_o, U_o, J_o, iters_o, conv_o = oracle_ilqr(
        model_o, cost_o, x0, U=U0.reshape(N, 2).copy()
    )
    assert int(res.iters) == iters_o
    assert np.isclose(float(res.J), J_o, rtol=1e-8)


def test_padded_subproblem_equals_unpadded():
    """A problem padded with a masked slot must yield the same solution for
    the real agents as the unpadded problem -- the invariant behind batched
    subproblem solves."""
    dt, N, radius = 0.1, 20, 1.0
    n, nx, nu = 2, 4, 2
    x0 = np.array([[-1.0, 0, 0, 0], [1.0, 0.1, 0, 0]])
    xf = np.array([[1.0, 0, 0, 0], [-1.0, 0.1, 0, 0]])
    Q, R, Qf = np.eye(nx), np.eye(nu), 50 * np.eye(nx)

    fleet2 = dtl.homogeneous_fleet(dtl.DOUBLE_INT_4D, 2, dt)
    cost2 = dtl.make_game_cost(
        xf, np.tile(Q, (2, 1, 1)), np.tile(R, (2, 1, 1)), np.tile(Qf, (2, 1, 1)),
        radius=radius,
    )
    res2 = dtl.ilqr_solve(fleet2, cost2, jnp.asarray(x0), N=N)

    fleet3 = dtl.homogeneous_fleet(dtl.DOUBLE_INT_4D, 3, dt)
    x0p = np.vstack([x0, [[5.0, 5, 0, 0]]])
    xfp = np.vstack([xf, np.zeros((1, nx))])
    cost3 = dtl.make_game_cost(
        xfp, np.tile(Q, (3, 1, 1)), np.tile(R, (3, 1, 1)), np.tile(Qf, (3, 1, 1)),
        radius=radius, agent_mask=np.array([1.0, 1.0, 0.0]),
    )
    res3 = dtl.ilqr_solve(fleet3, cost3, jnp.asarray(x0p), N=N)

    assert np.isclose(float(res2.J), float(res3.J), rtol=1e-9)
    assert int(res2.iters) == int(res3.iters)
    assert np.allclose(np.asarray(res2.X), np.asarray(res3.X)[:, :2], atol=1e-8)
    # Masked slot controls never move.
    assert np.allclose(np.asarray(res3.U)[:, 2], 0.0)
