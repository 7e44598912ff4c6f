"""Subproblem batching: turn a membership matrix into one rectangular batch.

The reference materializes one Python ``ilqrProblem`` per agent and solves
them sequentially or in worker processes (problem.py:36-47,
distributed.py:56-97).  Here each agent's neighborhood becomes one row of a
fixed-width gather: slot 0 of subproblem ``i`` always holds the owner agent
``i`` itself (so truncation can never drop the owner), the remaining slots
hold the other members in ascending agent order (the reference's graphs are
sorted, distributed.py:246; slot order is semantically neutral -- every
subproblem op is slot-equivariant).  Padded slots are masked out.  The whole
batch then solves as ONE vmapped iLQR -- and shards over devices along the
subproblem axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.costs import GameCost


class SubproblemBatch(NamedTuple):
    member_idx: jnp.ndarray  # (n, K) int32: parent agent index per slot
    member_mask: jnp.ndarray  # (n, K) float: 1.0 = real member
    owner_slot: jnp.ndarray  # (n,) int32: owner agent's slot in its row
    sizes: jnp.ndarray  # (n,) int32: true neighborhood sizes


def gather_subproblems(membership, K: int | None = None) -> SubproblemBatch:
    """Build the batched gather plan from an ``(n, n)`` membership matrix.

    ``K`` is the static slot count (defaults to n: no truncation, matching
    the reference which never truncates).  If ``K < n`` and a neighborhood
    exceeds it, the highest-index non-owner members are dropped; the owner
    itself always occupies slot 0 and can never be dropped.
    """
    n = membership.shape[0]
    K = n if K is None else K
    arange = jnp.arange(n)
    is_owner = jnp.eye(n, dtype=bool)
    # Sort key: owner first, then valid members ascending, padding after.
    key = jnp.where(membership, arange[None, :], n + arange[None, :])
    key = jnp.where(is_owner, -1, key)
    order = jnp.argsort(key, axis=1)  # (n, n)
    member_idx = order[:, :K].astype(jnp.int32)
    member_mask = jnp.take_along_axis(membership, order[:, :K], axis=1)
    sizes = jnp.sum(membership, axis=1).astype(jnp.int32)
    owner_slot = jnp.zeros((n,), jnp.int32)
    # Padded slots gather the owner itself (harmless; masked out).
    member_idx = jnp.where(
        member_mask, member_idx, arange[:, None].astype(jnp.int32)
    )
    return SubproblemBatch(
        member_idx=member_idx,
        member_mask=member_mask.astype(jnp.float32),
        owner_slot=owner_slot,
        sizes=sizes,
    )


def gather_cost(cost: GameCost, batch: SubproblemBatch, dtype) -> GameCost:
    """Gather per-agent cost arrays into the batched slot layout.

    Matches the reference's ``GameCost.split`` (cost.py:241-262): each
    subproblem keeps its members' reference costs and builds a fresh
    proximity coupling among them; here that is just a gather plus the slot
    mask.
    """
    gi = batch.member_idx  # (n_sub, K)
    return GameCost(
        xf=cost.xf[gi],
        Q=cost.Q[gi],
        R=cost.R[gi],
        Qf=cost.Qf[gi],
        radius=jnp.broadcast_to(cost.radius, (gi.shape[0],)),
        n_pos=cost.n_pos[gi],
        agent_mask=batch.member_mask.astype(dtype) * cost.agent_mask[gi],
        prox_weight=jnp.broadcast_to(cost.prox_weight, (gi.shape[0],)),
        ref_weight=jnp.broadcast_to(cost.ref_weight, (gi.shape[0],)),
        n_pos_eval=cost.n_pos_eval[gi],
    )


def gather_states(x, batch: SubproblemBatch):
    """``x: (n, d)`` -> per-subproblem slots ``(n_sub, K, d)``."""
    return x[batch.member_idx]


def gather_controls(U, batch: SubproblemBatch):
    """``U: (N, n, d)`` -> ``(n_sub, N, K, d)`` with padded slots zeroed
    (padded-slot controls must start at zero for exact decoupling)."""
    Us = U[:, batch.member_idx]  # (N, n_sub, K, d)
    Us = jnp.swapaxes(Us, 0, 1)  # (n_sub, N, K, d)
    return Us * batch.member_mask[:, None, :, None].astype(U.dtype)


def extract_owner(batch: SubproblemBatch, X_sub, U_sub):
    """Pull each owner's rows out of its subproblem solution.

    ``X_sub: (n_sub, N+1, K, nx)``, ``U_sub: (n_sub, N, K, nu)`` ->
    ``X_dec: (N+1, n, nx)``, ``U_dec: (N, n, nu)`` (reference
    problem.py:49-64 + scatter at distributed.py:74-75).
    """
    n = X_sub.shape[0]
    idx = jnp.arange(n)
    X_own = X_sub[idx, :, batch.owner_slot]  # (n, N+1, nx)
    U_own = U_sub[idx, :, batch.owner_slot]  # (n, N, nu)
    return jnp.swapaxes(X_own, 0, 1), jnp.swapaxes(U_own, 0, 1)
