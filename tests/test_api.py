"""Reference-facade tests: the object API must behave like dpilqr's
(signatures, flat-array shapes, split/extract semantics)."""

import numpy as np
import pytest

from dpilqr_tpu import api


@pytest.fixture(autouse=True)
def reset_ids():
    api._reset_ids()
    yield
    api._reset_ids()


def test_single_unicycle_example():
    # scripts/examples.py:26-46 scenario through the facade.
    dt, N = 0.05, 50
    x = np.array([-10.0, 10, 10, 0])
    x_goal = np.zeros((4, 1)).T
    dynamics = api.UnicycleDynamics4D(dt)
    Q = np.diag([1.0, 1, 0, 0])
    Qf = 1000 * np.eye(4)
    cost = api.ReferenceCost(x_goal, Q, np.eye(2), Qf)
    prob = api.ilqrProblem(dynamics, cost)
    solver = api.ilqrSolver(prob, N)
    X, U, J = solver.solve(x, verbose=False)
    assert X.shape == (N + 1, 4)
    assert U.shape == (N, 2)
    assert np.linalg.norm(X[-1][:2]) < 0.1
    assert J < 3500


def test_multi_model_ids_and_split():
    dt = 0.1
    ids = [100, 101, 102]
    models = [api.UnicycleDynamics4D(dt, id_) for id_ in ids]
    dynamics = api.MultiDynamicalModel(models)
    assert dynamics.ids == ids
    graph = {100: [100, 101], 101: [100, 101], 102: [102]}
    subs = dynamics.split(graph)
    assert [m.n_players for m in subs] == [2, 2, 1]
    assert subs[0].ids == [100, 101]


def test_multi_linearize_dense_block_diag():
    dt = 0.1
    dynamics = api.MultiDynamicalModel(
        [api.DoubleIntDynamics4D(dt), api.DoubleIntDynamics4D(dt)]
    )
    A, B = dynamics.linearize(np.zeros(8), np.zeros(4))
    assert A.shape == (8, 8) and B.shape == (8, 4)
    assert np.allclose(A[:4, 4:], 0) and np.allclose(A[4:, :4], 0)
    assert np.isclose(A[0, 2], dt)


def test_game_cost_quadraticize_matches_core():
    n, nx, nu = 2, 4, 2
    rng = np.random.default_rng(0)
    xf = rng.normal(size=(n * nx))
    rcs = [
        api.ReferenceCost(xf[i * nx : (i + 1) * nx], np.eye(nx), np.eye(nu))
        for i in range(n)
    ]
    prox = api.ProximityCost([nx] * n, 5.0, [2, 2])
    game = api.GameCost(rcs, prox)
    x = rng.normal(size=(n * nx))
    u = rng.normal(size=(n * nu))
    L_x, L_u, L_xx, L_uu, L_ux = game.quadraticize(x, u)
    assert L_x.shape == (n * nx,)
    # Cross-check against the array core's quadraticization.
    import jax.numpy as jnp
    from dpilqr_tpu.ops import costs as C
    from dpilqr_tpu.models.fleet import homogeneous_fleet
    from dpilqr_tpu.models.specs import DOUBLE_INT_4D

    fleet = homogeneous_fleet(DOUBLE_INT_4D, n, 0.1)
    spec = game.to_array_spec(fleet)
    cx, cu, cxx, cuu = C.quadraticize_stage(
        spec, jnp.asarray(x.reshape(n, nx)), jnp.asarray(u.reshape(n, nu))
    )
    assert np.allclose(L_x, np.asarray(cx).reshape(-1))
    assert np.allclose(L_u, np.asarray(cu).reshape(-1))
    assert np.allclose(L_xx, np.asarray(cxx).reshape(n * nx, n * nx))
    # prox coupling appears off-diagonal when within radius
    d = np.linalg.norm(x[:2] - x[nx : nx + 2])
    assert d < 5.0 and not np.allclose(L_xx[:2, nx : nx + 2], 0)


def test_prox_cost_values():
    prox = api.ProximityCost([3, 3], 10.0, [2, 2])
    x = np.array([0.0, 0, 0, 1, 2, 0])
    assert np.isclose(prox(x), (np.hypot(1, 2) - 10.0) ** 2)
    assert api.ProximityCost([2], 10.0)([1, 2]) == 0.0


def test_solve_distributed_facade():
    dt, N, radius = 0.1, 15, 0.5
    ids = [100, 101]
    dynamics = api.MultiDynamicalModel(
        [api.DoubleIntDynamics4D(dt, id_) for id_ in ids]
    )
    x0 = np.array([-1.0, 0.1, 0, 0, 1.0, -0.1, 0, 0])
    xf = np.array([1.0, 0.1, 0, 0, -1.0, -0.1, 0, 0])
    rcs = [
        api.ReferenceCost(xf[4 * i : 4 * (i + 1)], np.eye(4), np.eye(2),
                          100 * np.eye(4), id_)
        for i, id_ in enumerate(ids)
    ]
    game = api.GameCost(rcs, api.ProximityCost([4, 4], radius, [2, 2]))
    prob = api.ilqrProblem(dynamics, game)
    U = np.zeros((N, 4))
    X_dec, U_dec, J, info = api.solve_distributed(
        prob, x0[None], U, radius
    )
    assert X_dec.shape == (N + 1, 8)
    assert U_dec.shape == (N, 4)
    assert set(info) == {100, 101}
    assert np.isfinite(J)


def test_extract_and_ids_validation():
    dt = 0.1
    ids = [7, 9]
    dynamics = api.MultiDynamicalModel(
        [api.UnicycleDynamics4D(dt, id_) for id_ in ids]
    )
    rcs = [
        api.ReferenceCost(np.zeros(4), np.eye(4), np.eye(2), id=id_)
        for id_ in ids
    ]
    game = api.GameCost(rcs, api.ProximityCost([4, 4], 1.0, [2, 2]))
    prob = api.ilqrProblem(dynamics, game)
    X = np.arange(2 * 8).reshape(2, 8).astype(float)
    U = np.arange(2 * 4).reshape(2, 4).astype(float)
    Xi, Ui = prob.extract(X, U, 9)
    assert np.allclose(Xi, X[:, 4:8])
    with pytest.raises(IndexError):
        prob.extract(X, U, 123)


def test_define_inter_graph_threshold():
    ids = [100, 101, 102]
    X = np.zeros((1, 12))
    X[0, 0:2] = [0, 0]
    X[0, 4:6] = [0.9, 0]
    X[0, 8:10] = [50, 50]
    graph = api.define_inter_graph_threshold(X, 0.5, [4, 4, 4], ids)
    assert graph == {100: [100, 101], 101: [100, 101], 102: [102]}


def test_receding_horizon_controller():
    dt, N = 0.1, 20
    dynamics = api.DoubleIntDynamics4D(dt)
    cost = api.ReferenceCost(np.zeros(4), np.eye(4), np.eye(2), 100 * np.eye(4))
    prob = api.ilqrProblem(dynamics, cost)
    solver = api.ilqrSolver(prob, N)
    rhc = api.RecedingHorizonController(np.array([2.0, 2, 0, 0]), solver, 2)
    steps = 0
    for X, U, J in rhc.solve(np.zeros((N, 2)), J_converge=5.0, verbose=False):
        steps += 1
        if steps > 30:
            break
    assert steps < 30
    assert np.linalg.norm(rhc.x[:2]) < 0.5


def test_selfish_warmstart_facade():
    dt, N = 0.1, 10
    ids = [0, 1]
    dynamics = api.MultiDynamicalModel(
        [api.UnicycleDynamics4D(dt, id_) for id_ in ids]
    )
    xf = np.array([1.0, 1, 0, 0, -1.0, 1, 0, 0])
    rcs = [
        api.ReferenceCost(xf[4 * i : 4 * (i + 1)], np.eye(4), np.eye(2),
                          100 * np.eye(4), id_)
        for i, id_ in enumerate(ids)
    ]
    game = api.GameCost(rcs, api.ProximityCost([4, 4], 0.5, [2, 2]))
    prob = api.ilqrProblem(dynamics, game)
    U = prob.selfish_warmstart(np.zeros(8), N)
    assert U.shape == (N, 4)
    assert np.abs(U).max() > 0
