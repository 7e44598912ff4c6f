#!/usr/bin/env python
"""Benchmark: 10-agent DP-iLQR centralized solve on the current backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: wall-clock milliseconds of a full 10-agent, N=50 unicycle
  potential-game iLQR solve (median of repeated warm runs) on the default
  (TPU) backend, float32.
- vs_baseline: per-iLQR-iteration speedup over an in-process dense numpy
  implementation of the reference algorithm (labicon/dp-ilqr publishes no
  numbers -- see BASELINE.md -- so the baseline is the reference's own
  algorithm/implementation style measured on this host's CPU, float64).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import dpilqr_tpu as dtl

    n, N, dt, radius = 10, 50, 0.1, 0.5
    rng = np.random.default_rng(12345)
    x0, xf = dtl.random_setup(n, 4, rng=rng, energy=10.0, n_d=2)

    dtype = jnp.float32
    fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, dt)
    cost = dtl.make_game_cost(
        jnp.asarray(xf, dtype),
        jnp.asarray(np.tile(np.eye(4), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(2), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(1e3 * np.eye(4), (n, 1, 1)), dtype),
        radius=radius,
    )
    cfg = dtl.SolverConfig(n_lqr_iter=15, tol=1e-9)
    x0j = jnp.asarray(x0, dtype)

    solve = dtl.make_solver(fleet, N, cfg)
    U0 = jnp.zeros((N, n, 2), dtype)

    # Warm-up (compile) + hard host sync: through remote-device tunnels
    # block_until_ready can return before execution completes, so all timing
    # uses steady-state throughput with a host transfer as the barrier.
    res = solve(cost, x0j, U0)
    jax_iters = max(int(res.iters), 1)

    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solve(cost, x0j, U0)
    float(res.J)
    jax_ms = (time.perf_counter() - t0) / reps * 1e3

    # Baseline: dense numpy transcription of the reference algorithm.
    sys.path.insert(0, "tests")
    from oracle import OracleGameCost, OracleMultiModel, oracle_ilqr

    model_o = OracleMultiModel("Unicycle4D", n, dt)
    cost_o = OracleGameCost(
        xf.flatten(),
        [np.eye(4)] * n,
        [np.eye(2)] * n,
        [1e3 * np.eye(4)] * n,
        radius,
        4,
        2,
        n,
    )
    t0 = time.perf_counter()
    _, _, _, base_iters, _ = oracle_ilqr(
        model_o, cost_o, x0.flatten(), N=N, n_lqr_iter=15, tol=1e-9
    )
    base_ms = (time.perf_counter() - t0) * 1e3

    per_iter_speedup = (base_ms / max(base_iters, 1)) / (jax_ms / jax_iters)

    print(
        json.dumps(
            {
                "metric": "dp-ilqr centralized solve, 10 unicycles, N=50",
                "value": round(jax_ms, 3),
                "unit": "ms",
                "vs_baseline": round(per_iter_speedup, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
