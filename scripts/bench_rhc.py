#!/usr/bin/env python
"""Closed-loop RHC benchmark: sustained ms per MPC step at 100 agents.

Thin CLI over ``bench.closed_loop_run`` (the same workload bench.py's
``ms_per_mpc_step_100`` measures): graph build + subproblem gather + batched
solve + advance + warm-start shift, every replanning period.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import closed_loop_run  # noqa: E402


def run(n=100, n_steps=20, N=50, dt=0.1, radius=0.5, K=8, verbose=True):
    ms_step, res = closed_loop_run(
        n=n, n_steps=n_steps, N=N, dt=dt, radius=radius, K=K
    )
    solve_ms = np.mean([s.solve_time for s in res.steps]) * 1e3
    if verbose:
        print(f"steps: {len(res.steps)}")
        print(f"ms/step (sustained): {ms_step:.2f}  ({1000/ms_step:.1f} Hz)")
        print(f"mean per-step solve_time: {solve_ms:.2f} ms  J: {res.J:.1f}")
    return ms_step, res


if __name__ == "__main__":
    run()
