"""Profiling utilities.

The reference scatters ``time.perf_counter`` deltas through its solvers
(control.py:169,213; distributed.py:65-89).  Here profiling is structured:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of everything inside.
- ``timed_solve``: steady-state wall-time measurement with a hard host sync
  (through remote-device tunnels ``block_until_ready`` can return before the
  device finishes, so a host transfer is the only reliable barrier).
- ``solve_stats``: per-solve counters in the BASELINE.md units
  (solve Hz, Riccati block-nnz/s).
"""

from __future__ import annotations

import contextlib
from time import perf_counter

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def hard_sync(tree) -> float:
    """Force completion by pulling one scalar to the host; returns it."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf))


def timed_solve(fn, *args, reps: int = 20) -> float:
    """Median-free steady-state seconds per call (pipeline-safe)."""
    out = fn(*args)
    hard_sync(out)
    t0 = perf_counter()
    for _ in range(reps):
        out = fn(*args)
    hard_sync(out)
    return (perf_counter() - t0) / reps


def solve_stats(wall_s: float, n_agents: int, horizon: int, iters: int,
                nx: int) -> dict:
    """BASELINE.md north-star counters for one solve."""
    blocks = horizon * (n_agents * n_agents + 2 * n_agents) * max(iters, 1)
    return {
        "wall_s": wall_s,
        "hz": 1.0 / wall_s if wall_s else float("inf"),
        "block_nnz_per_s": blocks / wall_s if wall_s else float("inf"),
        "n_agents": n_agents,
        "horizon": horizon,
        "iters": iters,
    }
