"""Parallel-scan Riccati (ops/pscan.py) vs the sequential sweep.

The associative-scan construction must reproduce the sequential backward
pass exactly (float64), including the mu-regularized case (folded in as a
modified cost with a cross term -- see the pscan module docstring), and a
full ``sweep_backend="pscan"`` solve must match the default solve
iteration-for-iteration.
"""

import numpy as np
import jax.numpy as jnp

import dpilqr_tpu as dtl
from dpilqr_tpu.config import SolverConfig
from dpilqr_tpu.ops.costs import make_game_cost
from dpilqr_tpu.ops.ilqr import _backward_pass, _rollout_fn
from dpilqr_tpu.ops.pscan import backward_pass_pscan


def _setup(n, N, seed=0):
    rng = np.random.default_rng(seed)
    x0, xf = dtl.random_setup(n, 4, rng=rng, energy=5.0, n_d=2)
    fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, 0.1)
    cost = make_game_cost(
        jnp.asarray(xf),
        np.tile(np.eye(4), (n, 1, 1)),
        np.tile(np.eye(2), (n, 1, 1)),
        np.tile(1e3 * np.eye(4), (n, 1, 1)),
        radius=0.5,
    )
    U = jnp.asarray(rng.uniform(size=(N, n, 2)) * 0.1)
    return fleet, cost, jnp.asarray(x0), U


class TestPscanBackward:
    def test_matches_sequential_long_horizon(self):
        # N=120: the long-horizon regime the parallel scan targets (kept
        # just past the measured N~50 crossover; N=200 tripled the suite's
        # longest compile for no extra coverage).
        fleet, cost, x0, U = _setup(3, 120)
        X, _ = _rollout_fn(fleet.step, cost, x0, U)
        for mu in (0.0, 1.0, 37.5):
            Ks, ds = _backward_pass(fleet.linearize, cost, X, U, jnp.asarray(mu))
            Kp, dp = backward_pass_pscan(
                fleet.linearize, cost, X, U, jnp.asarray(mu)
            )
            np.testing.assert_allclose(
                np.asarray(Kp), np.asarray(Ks), atol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(dp), np.asarray(ds), atol=1e-9
            )

    def test_full_solve_equivalence(self):
        fleet, cost, x0, U = _setup(4, 40, seed=2)
        ref = dtl.ilqr_solve(
            fleet, cost, x0, U0=U,
            config=SolverConfig(n_lqr_iter=10, sweep_backend="xla"),
        )
        ps = dtl.ilqr_solve(
            fleet, cost, x0, U0=U,
            config=SolverConfig(n_lqr_iter=10, sweep_backend="pscan"),
        )
        assert int(ref.iters) == int(ps.iters)
        np.testing.assert_allclose(float(ps.J), float(ref.J), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(ps.X), np.asarray(ref.X), atol=1e-7
        )
