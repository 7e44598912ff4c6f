#!/usr/bin/env python
"""Benchmark: DP-iLQR solves at 10 / 50 / 100 agents on the current backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

- value: wall-clock milliseconds of the HEADLINE workload -- a full
  100-agent distributed (proximity-decomposed, K=8 slot neighborhoods)
  N=50 unicycle DP-iLQR solve on the default (TPU) backend, float32,
  at constant agent density (jittered grid, ~5 agents per neighborhood;
  the BASELINE.md north-star scale with a >= 10 Hz replanning target).
- vs_baseline: speedup over the reference algorithm (labicon/dp-ilqr
  publishes no numbers -- see BASELINE.md), estimated as an in-process
  dense numpy transcription of the reference solving the same subproblems
  SEQUENTIALLY (its distributed.py:56-77 path): per-iteration oracle time
  on one K-slot subproblem x the total subproblem iterations executed.
- extra: 50- and 250-agent distributed and 10-agent centralized wall-clock
  (the round-1 headline metric, kept comparable), replanning Hz, and the
  Riccati block-nnz/s north-star counter.
"""

import json
import sys
import time

import numpy as np


def _grid_scenario(n, spacing=0.75, seed=0):
    """Constant-density start/goal sets: jittered grid, goals mirrored so
    trajectories cross (realistic interaction graphs: ~5-7 agents within
    the 2 * 0.5 planning radius at any density-preserving n)."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n)))
    pts = np.stack(
        np.meshgrid(np.arange(side), np.arange(side)), -1
    ).reshape(-1, 2)[:n] * spacing
    pts = pts + rng.uniform(-0.05, 0.05, pts.shape)
    x0 = np.zeros((n, 4))
    x0[:, :2] = pts
    xf = np.zeros((n, 4))
    xf[:, :2] = pts[::-1] + rng.uniform(-0.05, 0.05, pts.shape)
    return x0, xf


def main():
    import jax
    import jax.numpy as jnp

    import dpilqr_tpu as dtl
    from dpilqr_tpu.parallel.distributed import _solve_distributed

    N, dt, radius, K = 50, 0.1, 0.5, 8
    dtype = jnp.float32
    cfg = dtl.SolverConfig(n_lqr_iter=15, tol=1e-3)

    def build(n):
        x0, xf = _grid_scenario(n)
        fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, dt)
        cost = dtl.make_game_cost(
            jnp.asarray(xf, dtype),
            jnp.asarray(np.tile(np.eye(4), (n, 1, 1)), dtype),
            jnp.asarray(np.tile(np.eye(2), (n, 1, 1)), dtype),
            jnp.asarray(np.tile(1e3 * np.eye(4), (n, 1, 1)), dtype),
            radius=radius,
        )
        x0j = jnp.asarray(x0, dtype)
        X0 = jnp.broadcast_to(x0j[None], (N + 1, n, 4))
        U0 = jnp.zeros((N, n, 2), dtype)
        return fleet, cost, X0, U0

    def time_solve(fn, reps=20):
        out = fn()  # warm-up / compile
        float(np.asarray(out.J).sum())  # hard host barrier (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        float(np.asarray(out.J).sum())
        return (time.perf_counter() - t0) / reps * 1e3, out

    import dataclasses

    from dpilqr_tpu.ops.pallas_batched import resolve_batched_backend

    results = {}
    total_iters = {}
    for n in (50, 100, 250):
        fleet, cost, X0, U0 = build(n)
        rad = jnp.asarray(radius, dtype)
        ign = jnp.zeros((n,), bool)
        cfg_n = dataclasses.replace(
            cfg,
            sweep_backend=resolve_batched_backend(cfg, fleet, N, K, n, (X0,)),
        )

        def solve(fleet=fleet, cost=cost, X0=X0, U0=U0, rad=rad, ign=ign,
                  cfg_n=cfg_n):
            return _solve_distributed(
                fleet, cfg_n, K, None, cost, X0, U0, rad, ign
            )

        ms, res = time_solve(solve, reps=20 if n <= 100 else 10)
        results[n] = ms
        total_iters[n] = int(np.asarray(res.iters).sum())

    # 10-agent centralized (round-1 headline metric, kept for continuity).
    rng = np.random.default_rng(12345)
    x0c, xfc = dtl.random_setup(10, 4, rng=rng, energy=10.0, n_d=2)
    fleet10 = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, 10, dt)
    cost10 = dtl.make_game_cost(
        jnp.asarray(xfc, dtype),
        jnp.asarray(np.tile(np.eye(4), (10, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(2), (10, 1, 1)), dtype),
        jnp.asarray(np.tile(1e3 * np.eye(4), (10, 1, 1)), dtype),
        radius=radius,
    )
    solve10 = dtl.make_solver(
        fleet10, N, dtl.SolverConfig(n_lqr_iter=15, tol=1e-9)
    )
    U0c = jnp.zeros((N, 10, 2), dtype)
    x0cj = jnp.asarray(x0c, dtype)
    ms10, _ = time_solve(lambda: solve10(cost10, x0cj, U0c))

    # Baseline: the reference algorithm (numpy oracle) solving ONE K-slot
    # subproblem; the reference runs the n subproblems sequentially
    # (distributed.py:56-77), so its projected cost is per-iteration time
    # x total subproblem iterations of the 100-agent solve.
    sys.path.insert(0, "tests")
    from oracle import OracleGameCost, OracleMultiModel, oracle_ilqr

    x0o, xfo = _grid_scenario(K, seed=1)
    model_o = OracleMultiModel("Unicycle4D", K, dt)
    cost_o = OracleGameCost(
        xfo.flatten(), [np.eye(4)] * K, [np.eye(2)] * K,
        [1e3 * np.eye(4)] * K, radius, 4, 2, K,
    )
    t0 = time.perf_counter()
    _, _, _, base_iters, _ = oracle_ilqr(
        model_o, cost_o, x0o.flatten(), N=N, n_lqr_iter=10, tol=1e-9
    )
    base_per_iter_ms = (time.perf_counter() - t0) * 1e3 / max(base_iters, 1)
    base_100_ms = base_per_iter_ms * total_iters[100]

    # North-star counter: Riccati block-nnz/s of the 100-agent solve
    # (utils/metrics.py): nonzero block entries touched per second by the
    # backward sweeps actually executed.
    from dpilqr_tpu.utils.metrics import riccati_block_nnz

    nnz = riccati_block_nnz(n_agents=K, nx=4, nu=2, N=N) * total_iters[100]
    block_nnz_per_s = nnz / (results[100] / 1e3)

    print(
        json.dumps(
            {
                "metric": (
                    "dp-ilqr distributed solve, 100 unicycles "
                    "(K=8 neighborhoods), N=50"
                ),
                "value": round(results[100], 3),
                "unit": "ms",
                "vs_baseline": round(base_100_ms / results[100], 3),
                "extra": {
                    "hz_100_distributed": round(1000.0 / results[100], 2),
                    "ms_50_distributed": round(results[50], 3),
                    "hz_50_distributed": round(1000.0 / results[50], 2),
                    "ms_10_centralized": round(ms10, 3),
                    "ms_250_distributed": round(results[250], 3),
                    "hz_250_distributed": round(1000.0 / results[250], 2),
                    "subproblem_iters_100": total_iters[100],
                    "riccati_block_nnz_per_s": float(f"{block_nnz_per_s:.3e}"),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
