#!/usr/bin/env python
"""Round-5 TPU validation: two-stage line search on the real kernels.

Measures the cold distributed solve at 100 / 250 / 500 agents with
ls_probe = 0 (monolithic 10-alpha forward, the r4 configuration) vs
ls_probe = 2 (staged), asserting identical per-subproblem iteration
counts, and prints one JSON line per configuration.
"""

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import _grid_scenario  # noqa: E402


def main(sizes=(100, 500)):
    import jax.numpy as jnp

    import dpilqr_tpu as dtl
    from dpilqr_tpu.ops.pallas_batched import resolve_batched_backend
    from dpilqr_tpu.parallel.distributed import _solve_distributed

    N, dt, radius, K = 50, 0.1, 0.5, 8
    dtype = jnp.float32
    base = dtl.SolverConfig(n_lqr_iter=15, tol=1e-3)

    def time_solve(fn, reps):
        out = fn()
        float(np.asarray(out.J).sum())

        def timed(r):
            t0 = time.perf_counter()
            for _ in range(r):
                out = fn()
            float(np.asarray(out.J).sum())
            return time.perf_counter() - t0

        t1 = timed(reps)
        t2 = timed(2 * reps)
        ms = (t2 - t1) / reps * 1e3
        if ms <= 0:
            ms = t2 / (2 * reps) * 1e3
        return ms, fn()

    for n in sizes:
        x0, xf = _grid_scenario(n)
        fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, dt)
        cost = dtl.make_game_cost(
            jnp.asarray(xf, dtype),
            jnp.asarray(np.tile(np.eye(4), (n, 1, 1)), dtype),
            jnp.asarray(np.tile(np.eye(2), (n, 1, 1)), dtype),
            jnp.asarray(np.tile(1e3 * np.eye(4), (n, 1, 1)), dtype),
            radius=radius,
        )
        X0 = jnp.broadcast_to(jnp.asarray(x0, dtype)[None], (N + 1, n, 4))
        U0 = jnp.zeros((N, n, 2), dtype)
        rad = jnp.asarray(radius, dtype)
        ign = jnp.zeros((n,), bool)
        backend = resolve_batched_backend(base, fleet, N, K, n, (X0,))
        results = {}
        for probe in (0, 2):
            cfg = dataclasses.replace(
                base, sweep_backend=backend, ls_probe=probe
            )
            t_c0 = time.perf_counter()
            ms, res = time_solve(
                lambda cfg=cfg: _solve_distributed(
                    fleet, cfg, K, None, cost, X0, U0, rad, ign
                ),
                reps=10,
            )
            results[probe] = (ms, np.asarray(res.iters))
            print(json.dumps({
                "n": n, "ls_probe": probe, "backend": backend,
                "ms": round(ms, 3), "hz": round(1000.0 / ms, 2),
                "iters": int(np.asarray(res.iters).sum()),
                "compile_plus_run_s": round(time.perf_counter() - t_c0, 1),
            }), flush=True)
        np.testing.assert_array_equal(results[0][1], results[2][1])
        print(json.dumps({
            "n": n,
            "iters_identical": True,
            "speedup": round(results[0][0] / results[2][0], 3),
        }), flush=True)


if __name__ == "__main__":
    sizes = tuple(int(a) for a in sys.argv[1:]) or (100, 500)
    main(sizes)
