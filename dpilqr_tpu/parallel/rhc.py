"""Receding-horizon control driver.

Equivalent of the reference's ``solve_rhc`` (distributed.py:106-221) and
``RecedingHorizonController`` (control.py:253-326): a host loop that
repeatedly solves (centralized or decomposed), advances ``step_size`` steps,
and shift-and-pads the warm start.  The per-step solves are single jitted
device programs; the MPC loop itself is host-side by nature (it models
simulated/real time and sensor feedback).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from time import perf_counter
from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, SolverConfig
from ..models.fleet import Fleet
from ..ops.costs import GameCost
from ..ops.ilqr import ilqr_solve, ilqr_solve_steppable, rollout
from ..utils.geometry import distance_to_goal
from .distributed import solve_distributed
from .graph import graph_to_dict


@dataclass
class RhcStepInfo:
    """Per-MPC-step record (the reference's solve_info + CSV row,
    distributed.py:187-194)."""

    t: float
    J: float
    solve_time: float
    graph: dict | None
    iters: list
    distance_left: list


@dataclass
class RhcResult:
    X: np.ndarray  # (T, n, nx_p) executed trajectory
    U: np.ndarray  # (T, n, nu_p) executed controls
    J: float  # joint cost of the executed plan
    converged: bool
    steps: list = field(default_factory=list)  # list[RhcStepInfo]


def solve_rhc(
    fleet: Fleet,
    cost: GameCost,
    x0,
    N: int,
    radius: float | None = None,
    centralized: bool = True,
    step_size: int = 1,
    J_converge: float | None = None,
    dist_converge: float | None = None,
    n_d: int = 2,
    t_diverge: float | None = None,
    t_kill: float | None = None,
    ignore_mask=None,
    K: int | None = None,
    config: SolverConfig = DEFAULT_CONFIG,
    rng=None,
    verbose: bool = False,
    log_fn: Callable | None = None,
    checkpoint_path=None,
    resume_state=None,
) -> RhcResult:
    """Receding-horizon solve, centralized or decomposed.

    Convergence: exactly one of ``J_converge`` (stop when J drops below) or
    ``dist_converge`` (stop when every agent is within this distance of its
    goal) must be given (reference distributed.py:125-143).  ``t_diverge``
    aborts after that much simulated time; ``t_kill`` caps wall-clock per
    solve (centralized mode; reference control.py:213-218).
    """
    if (J_converge is None) == (dist_converge is None):
        raise ValueError("Specify exactly one of J_converge or dist_converge")
    if not centralized and radius is None:
        raise ValueError("Decomposed mode needs the proximity radius")

    rng = np.random.default_rng() if rng is None else rng
    n, nx_p, nu_p = fleet.n_agents, fleet.nx_p, fleet.nu_p
    dt = fleet.dt

    # Follow the caller's dtype (float32 on TPU -- the Pallas kernels have
    # no 64-bit path; float64 for CPU parity runs).
    x0 = np.asarray(x0)
    if not np.issubdtype(x0.dtype, np.floating):
        x0 = x0.astype(float)
    dtype = x0.dtype
    x0 = x0.reshape(n, nx_p)
    xf = np.asarray(cost.xf)

    def predicate(x, J):
        if J_converge is not None:
            return J >= J_converge
        d = np.asarray(distance_to_goal(jnp.asarray(x), jnp.asarray(xf), n_d))
        return bool(np.any(d > dist_converge))

    if resume_state is not None:
        # Resume a checkpointed run (utils/checkpoint.py).
        xi = resume_state.xi.copy()
        X = resume_state.X_warm.copy()
        U = resume_state.U_warm.copy()
        t = resume_state.t
        X_full = resume_state.X_full.copy()
        U_full = resume_state.U_full.copy()
        step_count = resume_state.step
    else:
        # Small random warm start (reference distributed.py:152).
        U = (rng.uniform(size=(N, n, nu_p)) * 0.01).astype(dtype)
        U = U * np.asarray(fleet.control_mask, dtype)[None]
        X = x0[None].copy()  # (1, n, nx) until the first solve
        xi = x0.copy()
        t = 0.0
        X_full = np.zeros((0, n, nx_p), dtype)
        U_full = np.zeros((0, n, nu_p), dtype)
        step_count = 0

    J = np.inf
    converged = True
    steps: list[RhcStepInfo] = []
    # Subproblem width is cached across MPC steps (it changes rarely under
    # power-of-2 bucketing): computed from the returned neighborhood sizes
    # of the previous step instead of an extra graph build + host sync per
    # step (round-1 weakness: parallel/distributed.py auto width).
    K_cur = K

    while predicate(xi, J):
        t0 = perf_counter()
        if centralized:
            if t_kill is not None:
                res = ilqr_solve_steppable(
                    fleet, cost, jnp.asarray(xi), U0=jnp.asarray(U),
                    config=config, t_kill=t_kill,
                )
            else:
                res = ilqr_solve(
                    fleet, cost, jnp.asarray(xi), U0=jnp.asarray(U), config=config
                )
            X = np.asarray(res.X)
            U = np.asarray(res.U)
            J = float(res.J)
            graph = None
            iters = [int(res.iters)]
        else:
            if t_kill is not None:
                # Deadline-capped batched solve (reference forwards t_kill
                # into every subproblem solve, distributed.py:170-176).
                from .deadline import solve_distributed_steppable

                dres = solve_distributed_steppable(
                    fleet, cost, jnp.asarray(X), jnp.asarray(U), radius,
                    ignore_mask=ignore_mask, K=K_cur, config=config,
                    t_kill=t_kill,
                )
            else:
                dres = solve_distributed(
                    fleet, cost, jnp.asarray(X), jnp.asarray(U), radius,
                    ignore_mask=ignore_mask, K=K_cur, config=config,
                )
            X = np.asarray(dres.X)
            U = np.asarray(dres.U)
            J = float(dres.J)
            graph = graph_to_dict(dres.membership)
            iters = np.asarray(dres.iters).tolist()
            if K is None:
                # Grow immediately; shrink with hysteresis (each width
                # change costs one compile, amortized by the cache).
                k_need = int(np.asarray(dres.sizes).max())
                k_need = 1 << (k_need - 1).bit_length() if k_need > 1 else 1
                k_need = min(k_need, n)
                if K_cur is None or k_need > K_cur or k_need <= K_cur // 2:
                    K_cur = k_need
        solve_time = perf_counter() - t0

        # Advance the simulated system (reference distributed.py:178-181).
        xi = X[step_size]
        X_full = np.concatenate([X_full, X[:step_size]], axis=0)
        U_full = np.concatenate([U_full, U[:step_size]], axis=0)

        # Shift-and-pad warm start (distributed.py:184-185).
        X = np.concatenate(
            [X[step_size:], np.tile(X[-1], (step_size, 1, 1))], axis=0
        )
        U = np.concatenate(
            [U[step_size:], np.zeros((step_size, n, nu_p), U.dtype)], axis=0
        )

        dist_left = np.asarray(
            distance_to_goal(jnp.asarray(xi), jnp.asarray(xf), n_d)
        ).tolist()
        info = RhcStepInfo(
            t=t, J=J, solve_time=solve_time, graph=graph, iters=iters,
            distance_left=dist_left,
        )
        steps.append(info)
        step_count += 1
        if checkpoint_path is not None:
            from ..utils.checkpoint import RhcState, save_rhc_state

            # Store the NEXT iteration's simulated time so a resumed run
            # continues exactly where this one left off.
            save_rhc_state(
                checkpoint_path,
                RhcState(
                    xi=xi, X_warm=X, U_warm=U, t=t + step_size * dt,
                    X_full=X_full, U_full=U_full, step=step_count,
                ),
            )
        if log_fn:
            log_fn(info)
        if verbose:
            print(f"t: {t:.3g}\tJ: {J:g}\tsolve: {solve_time:.3g}s")

        if t_diverge is not None and t >= t_diverge:
            converged = False
            if verbose:
                print("Failed to converge within allotted time...")
            break
        t += step_size * dt

    # Immediate convergence without optimization (distributed.py:206-208).
    if X_full.size == 0:
        X_full = x0[None].copy()
        U_full = np.zeros((1, n, nu_p))

    # Joint cost of the executed control sequence (distributed.py:210-211).
    _, J_full = rollout(fleet, cost, jnp.asarray(x0), jnp.asarray(U_full))

    return RhcResult(
        X=X_full, U=U_full, J=float(J_full), converged=converged, steps=steps
    )


def selfish_warmstart(
    fleet: Fleet,
    cost: GameCost,
    x0,
    N: int,
    config: SolverConfig = DEFAULT_CONFIG,
):
    """Per-agent solo warm start (reference problem.py:66-91).

    Solves every agent's reference-tracking problem ignoring all others --
    batched as one decomposed solve on the empty interaction graph -- and
    returns the stacked controls ``(N, n, nu_p)``.
    """
    x0 = jnp.asarray(x0)
    n = fleet.n_agents
    U0 = jnp.zeros((N, n, fleet.nu_p), dtype=x0.dtype)
    # radius <= 0 means no pair is ever within 2*radius: singleton graph.
    res = solve_distributed(
        fleet, cost, x0[None], U0, radius=-1.0, config=config
    )
    return res.U
