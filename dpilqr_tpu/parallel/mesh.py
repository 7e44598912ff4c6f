"""Device-mesh scaling: shard the subproblem batch across chips.

The reference's scaling story is a multiprocessing pool on one host
(distributed.py:79-97) plus SLURM job placement (cluster/sim.sbatch).  The
TPU-native equivalent: the subproblem axis of the batched decomposed solve is
laid out over a ``jax.sharding.Mesh``, XLA inserts the collectives (the
all-gather of trajectories for graph construction, the gather of neighbor
"ghost" agents into each shard's subproblems, the all-to-all of owner rows
when stitching), and they ride ICI.

Agent-state arrays stay replicated (they are tiny: n * nx_p floats); the
heavy per-subproblem work -- the vmapped iLQR with its (K*nx)^2 Riccati
state -- is what shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DEFAULT_CONFIG, SolverConfig
from ..models.fleet import Fleet
from ..ops.costs import GameCost
from ..ops.ilqr import _rollout_fn
from .distributed import DistributedResult, _solve_subproblem_batch
from .graph import interaction_graph
from .subproblems import (
    extract_owner,
    gather_controls,
    gather_cost,
    gather_states,
    gather_subproblems,
)

SUB_AXIS = "sub"


def make_mesh(devices=None, axis_name: str = SUB_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _solve_distributed_sharded(
    fleet: Fleet,
    cfg: SolverConfig,
    K: int,
    graph_n_d,
    mesh: Mesh,
    cost: GameCost,
    X,
    U,
    radius,
    ignore_mask,
):
    dtype = X.dtype
    cost = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        cost,
    )
    shard = NamedSharding(mesh, P(SUB_AXIS))

    def shard_sub(tree):
        """Constrain the leading (subproblem) axis onto the mesh."""
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, shard), tree
        )

    membership = interaction_graph(X, radius, n_pos=cost.n_pos, n_d=graph_n_d)
    batch = gather_subproblems(membership, K)

    sub_cost = shard_sub(gather_cost(cost, batch, dtype))
    x0_s = shard_sub(gather_states(X[0], batch))
    U_s = shard_sub(gather_controls(U, batch))
    mids_s = shard_sub(jnp.asarray(fleet.branch_index_array)[batch.member_idx])
    enabled = shard_sub(~ignore_mask)

    res = _solve_subproblem_batch(fleet, cfg, sub_cost, x0_s, U_s, mids_s, enabled)

    X_dec, U_dec = extract_owner(batch, res.X, res.U)
    keep = (~ignore_mask).astype(dtype)
    X_dec = X_dec * keep[None, :, None]
    U_dec = U_dec * keep[None, :, None]
    _, J_full = _rollout_fn(fleet.step, cost, X[0], U_dec)

    return DistributedResult(
        X=X_dec,
        U=U_dec,
        J=J_full,
        membership=membership,
        iters=res.iters,
        converged=res.converged,
        sizes=batch.sizes,
        truncated=jnp.any(batch.sizes > K),
    )


def solve_distributed_sharded(
    fleet: Fleet,
    cost: GameCost,
    X,
    U,
    radius,
    mesh: Mesh,
    ignore_mask=None,
    K: int | None = None,
    graph_n_d: int | None = None,
    config: SolverConfig = DEFAULT_CONFIG,
) -> DistributedResult:
    """`solve_distributed` with the subproblem batch sharded over ``mesh``.

    The number of agents should be a multiple of the mesh size for an even
    layout (XLA handles ragged cases with padding, at some waste).
    """
    X = jnp.asarray(X)
    U = jnp.asarray(U, dtype=X.dtype)
    n = fleet.n_agents
    if X.ndim == 2:
        X = X[None]
    if ignore_mask is None:
        ignore_mask = jnp.zeros((n,), bool)
    ignore_mask = jnp.asarray(ignore_mask, bool)
    radius = jnp.asarray(radius, dtype=X.dtype)
    if K is None:
        from .distributed import auto_subproblem_width

        K = auto_subproblem_width(X, radius, cost, graph_n_d)
    return _solve_distributed_sharded(
        fleet, config, K, graph_n_d, mesh, cost, X, U, radius, ignore_mask
    )


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _solve_trials_sharded(
    fleet: Fleet, cfg: SolverConfig, K: int, graph_n_d, mesh: Mesh,
    cost_T: GameCost, X_T, U_T, radius, ignore_mask,
):
    shard = NamedSharding(mesh, P(SUB_AXIS))

    def shard_trials(tree):
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, shard), tree
        )

    cost_T = shard_trials(cost_T)
    X_T = shard_trials(X_T)
    U_T = shard_trials(U_T)

    def one(cost, X, U):
        dtype = X.dtype
        membership = interaction_graph(
            X, radius, n_pos=cost.n_pos, n_d=graph_n_d
        )
        batch = gather_subproblems(membership, K)
        sub_cost = gather_cost(cost, batch, dtype)
        x0_s = gather_states(X[0], batch)
        U_s = gather_controls(U, batch)
        mids_s = jnp.asarray(fleet.branch_index_array)[batch.member_idx]
        res = _solve_subproblem_batch(
            fleet, cfg, sub_cost, x0_s, U_s, mids_s, ~ignore_mask
        )
        X_dec, U_dec = extract_owner(batch, res.X, res.U)
        keep = (~ignore_mask).astype(dtype)
        X_dec = X_dec * keep[None, :, None]
        U_dec = U_dec * keep[None, :, None]
        _, J_full = _rollout_fn(fleet.step, cost, X[0], U_dec)
        return DistributedResult(
            X=X_dec, U=U_dec, J=J_full, membership=membership,
            iters=res.iters, converged=res.converged, sizes=batch.sizes,
            truncated=jnp.any(batch.sizes > K),
        )

    return jax.vmap(one)(cost_T, X_T, U_T)


def solve_trials_sharded(
    fleet: Fleet,
    cost_T: GameCost,
    X_T,
    U_T,
    radius,
    mesh: Mesh,
    K: int,
    ignore_mask=None,
    graph_n_d: int | None = None,
    config: SolverConfig = DEFAULT_CONFIG,
) -> DistributedResult:
    """Monte-Carlo trials as a SHARDED BATCH AXIS (SURVEY 2.3: the
    reference's SLURM job runs trials as a host loop on one 16-core node,
    cluster/sim.sbatch; here T independent trials vmap into one device
    program with the trial axis laid out over the mesh).

    ``cost_T``: GameCost with a leading trial axis on every leaf;
    ``X_T (T, Tw, n, nx_p)`` previous trajectories; ``U_T (T, N, n, nu_p)``.
    Uses the vmappable XLA solver backend (the fused Pallas kernels assume
    an unbatched program; trials keep them busy via the subproblem axis
    instead).  Returns a DistributedResult with a leading trial axis.
    """
    import dataclasses

    cfg = dataclasses.replace(config, sweep_backend="xla")
    X_T = jnp.asarray(X_T)
    U_T = jnp.asarray(U_T, dtype=X_T.dtype)
    n = fleet.n_agents
    if ignore_mask is None:
        ignore_mask = jnp.zeros((n,), bool)
    return _solve_trials_sharded(
        fleet, cfg, K, graph_n_d, mesh, cost_T, X_T, U_T,
        jnp.asarray(radius, X_T.dtype), jnp.asarray(ignore_mask, bool),
    )
