#!/usr/bin/env python
"""Closed-loop RHC benchmark: sustained ms per MPC step at 100 agents.

The reference's real-time contract is per-MPC-step (distributed.py:164-199):
graph build + subproblem gather + solve + advance + warm-start shift, every
replanning period.  This measures the sustained step rate of ``solve_rhc``
(not just the single-solve latency bench.py's headline reports).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run(n=100, n_steps=20, N=50, dt=0.1, radius=0.5, K=8, verbose=True):
    import jax.numpy as jnp

    import dpilqr_tpu as dtl
    from bench import _grid_scenario

    dtype = jnp.float32
    cfg = dtl.SolverConfig(n_lqr_iter=15, tol=1e-3)
    x0, xf = _grid_scenario(n)
    fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, dt)
    cost = dtl.make_game_cost(
        jnp.asarray(xf, dtype),
        jnp.asarray(np.tile(np.eye(4), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(2), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(1e3 * np.eye(4), (n, 1, 1)), dtype),
        radius=radius,
    )
    t_diverge = (n_steps - 1) * dt  # exactly n_steps MPC steps

    def once():
        return dtl.solve_rhc(
            fleet, cost, x0.astype(np.float32), N, radius=radius,
            centralized=False, step_size=1, J_converge=1e-3,
            t_diverge=t_diverge, K=K, config=cfg,
            rng=np.random.default_rng(0),
        )

    res = once()  # warm-up / compile
    t0 = time.perf_counter()
    res = once()
    wall = time.perf_counter() - t0
    ms_step = wall / len(res.steps) * 1e3
    solve_ms = np.mean([s.solve_time for s in res.steps]) * 1e3
    if verbose:
        print(f"steps: {len(res.steps)}  wall: {wall*1e3:.1f} ms")
        print(f"ms/step (sustained): {ms_step:.2f}  ({1000/ms_step:.1f} Hz)")
        print(f"mean solve_time: {solve_ms:.2f} ms  J: {res.J:.1f}")
    return ms_step, res


if __name__ == "__main__":
    run()
