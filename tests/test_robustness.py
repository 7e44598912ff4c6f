"""Tests for round-2 solver robustness features:

- the mu-increase failed-line-search policy (the reference's dead code at
  control.py:198-208, implemented behind ``SolverConfig.on_failed_ls``),
- the reference-parity proximity evaluation mode (``prox_eval_n_d``,
  reproducing dpilqr/cost.py:122-133 vs :135-171 exactly),
- the wall-clock deadline on distributed solves (``t_kill``; reference
  threads it through every subproblem solve, distributed.py:170-176).
"""

from time import perf_counter

import numpy as np
import pytest
import jax.numpy as jnp

import dpilqr_tpu as dtl
from dpilqr_tpu.config import SolverConfig
from dpilqr_tpu.ops import costs as _costs


def _hard_two_agent():
    """Head-on near-collision: steep proximity gradients make the plain
    line search bail (see also the reference's jittered starts)."""
    n, dt = 2, 0.1
    fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, dt)
    x0 = np.array(
        [[0.0, 0.0, 1.0, 0.0], [1.0, 0.01, 1.0, np.pi]], dtype=float
    )
    xf = np.array(
        [[3.0, 0.0, 0.0, 0.0], [-2.0, 0.0, 0.0, np.pi]], dtype=float
    )
    # Starts INSIDE each other's proximity radius: the steep penalty
    # gradient reliably trips the plain line search's bail-out.
    cost = _costs.make_game_cost(
        jnp.asarray(xf),
        np.tile(np.eye(4), (n, 1, 1)),
        np.tile(np.eye(2), (n, 1, 1)),
        np.tile(1e3 * np.eye(4), (n, 1, 1)),
        radius=1.2,
    )
    return fleet, cost, jnp.asarray(x0)


class TestMuIncrease:
    def test_recovers_from_failed_line_search(self):
        fleet, cost, x0 = _hard_two_agent()
        bail = dtl.ilqr_solve(
            fleet, cost, x0, N=30,
            config=SolverConfig(n_lqr_iter=30, tol=1e-9, on_failed_ls="bail"),
        )
        inc = dtl.ilqr_solve(
            fleet, cost, x0, N=30,
            config=SolverConfig(
                n_lqr_iter=30, tol=1e-9, on_failed_ls="increase"
            ),
        )
        # The scenario must actually trip the bail-out for the test to be
        # meaningful (matches the reference's observed behavior).
        assert bool(bail.failed_line_search)
        # The increase policy keeps iterating and ends at least as good.
        assert int(inc.iters) > int(bail.iters)
        assert float(inc.J) <= float(bail.J) * (1 + 1e-9)

    def test_mu_max_aborts(self):
        fleet, cost, x0 = _hard_two_agent()
        cfg = SolverConfig(
            n_lqr_iter=200, tol=1e-12, on_failed_ls="increase", mu_max=10.0
        )
        res = dtl.ilqr_solve(fleet, cost, x0, N=30, config=cfg)
        # With a tiny mu_max the increase path must hit the abort before
        # exhausting the iteration budget.
        assert int(res.iters) < 200


class TestProxParityMode:
    """The reference evaluates proximity with 2-D distances but
    quadraticizes with min(n_dims) (cost.py:122-133 vs :135-171)."""

    def _cost3d(self, prox_eval_n_d):
        n = 2
        xf = np.zeros((n, 6))
        return _costs.make_game_cost(
            xf,
            np.tile(np.eye(6), (n, 1, 1)),
            np.tile(np.eye(3), (n, 1, 1)),
            np.tile(np.eye(6), (n, 1, 1)),
            radius=1.0,
            n_pos=np.array([3, 3]),
            prox_eval_n_d=prox_eval_n_d,
        )

    def test_quirk_semantics(self):
        # Two agents separated by 0.4 in xy and 0.5 in z: 2-D distance 0.4,
        # 3-D distance 0.64.
        x = jnp.asarray(
            np.array([[0.0, 0.0, 0.0, 0, 0, 0], [0.4, 0.0, 0.5, 0, 0, 0]])
        )
        parity = self._cost3d(prox_eval_n_d=2)
        exact = self._cost3d(prox_eval_n_d=None)

        # Evaluation: parity uses the 2-D distance (reference cost.py:122).
        pen_parity = float(_costs.proximity_cost(parity, x))
        pen_exact = float(_costs.proximity_cost(exact, x))
        d2, d3 = 0.4, float(np.sqrt(0.4**2 + 0.5**2))
        assert np.isclose(pen_parity, (d2 - 1.0) ** 2, atol=1e-9)
        assert np.isclose(pen_exact, (d3 - 1.0) ** 2, atol=1e-9)

        # Quadraticization: BOTH use min(n_dims) = 3 components (the quirk:
        # derivatives disagree with the parity-mode penalty, reference
        # cost.py:135-171).
        for c in (parity, exact):
            L_x, _ = _costs.proximity_quadraticize(c, x)
            g = np.asarray(L_x)
            # 3-D gradient has a z component; built from the 3-D distance.
            assert abs(g[0, 2]) > 1e-9
            expect_dx = 2.0 * (d3 - 1.0) / d3 * (-0.4)
            assert np.isclose(g[0, 0], expect_dx, atol=1e-9)

    def test_facade_passthrough(self):
        from dpilqr_tpu import api

        prox = api.ProximityCost([6, 6], 1.0, n_dims=[3, 3], eval_n_d=2)
        x = np.array([[0.0, 0, 0, 0, 0, 0], [0.4, 0, 0.5, 0, 0, 0]]).flatten()
        assert np.isclose(prox(x), (0.4 - 1.0) ** 2, atol=1e-9)
        sub = list(api.GameCost(
            [api.ReferenceCost(np.zeros(6), np.eye(6), np.eye(3), id=i)
             for i in range(2)],
            prox,
        ).split({0: [0, 1]}))[0]
        assert sub.prox_cost.eval_n_d == 2


class TestDistributedDeadline:
    def test_t_kill_stops_early(self):
        from dpilqr_tpu.parallel.deadline import solve_distributed_steppable

        n, N = 4, 20
        rng = np.random.default_rng(1)
        x0, xf = dtl.random_setup(n, 4, rng=rng, energy=5.0, n_d=2)
        fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, 0.1)
        cost = _costs.make_game_cost(
            jnp.asarray(xf),
            np.tile(np.eye(4), (n, 1, 1)),
            np.tile(np.eye(2), (n, 1, 1)),
            np.tile(1e3 * np.eye(4), (n, 1, 1)),
            radius=0.5,
        )
        X0 = jnp.broadcast_to(jnp.asarray(x0)[None], (N + 1, n, 4))
        U0 = jnp.zeros((N, n, 2))
        cfg = SolverConfig(n_lqr_iter=40, tol=1e-12)

        # Unlimited: runs many iterations.
        full = solve_distributed_steppable(
            fleet, cost, X0, U0, 0.5, K=4, config=cfg, t_kill=None
        )
        # Deadline already expired when iterations start: the solve must
        # stop after at most the initial rollout + one host check, i.e.
        # strictly fewer iterations than the unlimited run.
        t0 = perf_counter()
        capped = solve_distributed_steppable(
            fleet, cost, X0, U0, 0.5, K=4, config=cfg, t_kill=1e-9
        )
        assert int(np.asarray(capped.iters).max()) == 0
        assert int(np.asarray(full.iters).max()) > 2
        # Result is still a valid (rolled-out) plan with finite cost.
        assert np.isfinite(float(capped.J))
