"""Device-mesh scaling: shard the subproblem batch across chips.

The reference's scaling story is a multiprocessing pool on one host
(distributed.py:79-97) plus SLURM job placement (cluster/sim.sbatch).  The
TPU-native equivalent: the subproblem axis of the batched decomposed solve is
laid out over a ``jax.sharding.Mesh`` and the heavy per-subproblem work --
the batched iLQR with its (K*nx)^2 Riccati state -- runs per shard, while
XLA inserts the collectives (the all-gather of trajectories for graph
construction, the gather of neighbor "ghost" agents into each shard's
subproblems, the all-to-all of owner rows when stitching) to ride ICI.

Round-5 composition (VERDICT r4 item 1): the sharded solve runs the SAME
fused Pallas batched kernels as the single-chip ``solve_distributed`` --
``shard_map`` over the subproblem axis places one
``solve_subproblems_batched`` (staged compaction, chunking and all) on each
device; backend resolution is identical to the unsharded path, so on a pod
slice the headline kernel program is what scales.  The vmapped-XLA
GSPMD path remains the fallback for backends/dtypes the kernels do not
cover.  Monte-Carlo trials (``solve_trials_sharded``) flatten the
(trial, subproblem) axes into ONE kernel batch -- the trial axis is just
more independent subproblems, which is exactly what the batched kernels
want.

Agent-state arrays stay replicated (they are tiny: n * nx_p floats).
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


def _cast_cost(cost: GameCost, dtype) -> GameCost:
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        cost,
    )


def resolve_sharded_backend(
    cfg: SolverConfig, fleet: Fleet, N: int, K: int, mesh: Mesh, S_total: int,
    arrays=(),
) -> str:
    """Backend for the sharded batched solve: the SAME resolution as the
    unsharded ``solve_distributed`` applied to one shard's batch width
    (each device runs its shard through ``solve_subproblems_batched``),
    with one extra constraint -- the compiled kernels must target the
    MESH's devices, not wherever the input arrays happen to live (the
    axon sitecustomize can park arrays on TPU while the mesh is a virtual
    CPU mesh)."""
    from ..ops.pallas_batched import resolve_batched_backend

    n_dev = mesh.shape[SUB_AXIS]
    S_shard = -(-S_total // n_dev)
    backend = resolve_batched_backend(cfg, fleet, N, K, S_shard, arrays)
    if backend == "pallas":
        plats = {d.platform for d in mesh.devices.flat}
        if not plats & {"tpu", "axon"}:
            return "xla"
    return backend


def _shard_solve_batched(
    fleet: Fleet,
    cfg: SolverConfig,
    mesh: Mesh,
    interpret: bool,
    sub_cost: GameCost,
    x0_s,
    U_s,
    mids_s,
    enabled,
):
    """Solve a subproblem batch with one ``solve_subproblems_batched`` per
    device: pad the batch to an equal per-shard count, ``shard_map`` the
    fused kernel solve over the subproblem axis (no cross-shard
    communication -- subproblems are independent; each shard compacts and
    chunks its own batch exactly like the single-chip path), and truncate
    the padding off the gathered result.
    """
    from ..ops.pallas_batched import solve_subproblems_batched

    S0 = x0_s.shape[0]
    n_dev = mesh.shape[SUB_AXIS]
    per = -(-S0 // n_dev)
    pad = per * n_dev - S0

    def pad0(a):
        if pad == 0:
            return a
        fill = jnp.zeros((pad, *a.shape[1:]), a.dtype)
        return jnp.concatenate([a, fill], axis=0)

    sub_cost, x0_s, U_s, mids_s = jax.tree.map(
        pad0, (sub_cost, x0_s, U_s, mids_s)
    )
    enabled = pad0(jnp.asarray(enabled, bool))

    def shard_fn(cost_sh, x0_sh, U_sh, mids_sh, en_sh):
        return solve_subproblems_batched(
            fleet, cfg, cost_sh, x0_sh, U_sh, mids_sh, en_sh,
            interpret=interpret,
        )

    res = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(SUB_AXIS), P(SUB_AXIS), P(SUB_AXIS), P(SUB_AXIS),
                  P(SUB_AXIS)),
        out_specs=P(SUB_AXIS),
        # pallas_call does not yet annotate varying-mesh-axes metadata on
        # its outputs; the body is collective-free so the check is moot.
        check_vma=False,
    )(sub_cost, x0_s, U_s, mids_s, enabled)
    if pad:
        res = jax.tree.map(lambda a: a[:S0], res)
    return res


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _solve_distributed_sharded(
    fleet: Fleet,
    cfg: SolverConfig,
    K: int,
    graph_n_d,
    mesh: Mesh,
    use_kernels: bool,
    cost: GameCost,
    X,
    U,
    radius,
    ignore_mask,
):
    dtype = X.dtype
    cost = _cast_cost(cost, dtype)

    membership = interaction_graph(X, radius, n_pos=cost.n_pos, n_d=graph_n_d)
    batch = gather_subproblems(membership, K)
    sub_cost = gather_cost(cost, batch, dtype)
    x0_s = gather_states(X[0], batch)
    U_s = gather_controls(U, batch)
    mids_s = jnp.asarray(fleet.branch_index_array)[batch.member_idx]
    enabled = ~ignore_mask

    if use_kernels:
        # The flagship composition: fused Pallas batched solve per shard.
        interpret = cfg.sweep_backend == "pallas-interpret"
        res = _shard_solve_batched(
            fleet, cfg, mesh, interpret, sub_cost, x0_s, U_s, mids_s, enabled
        )
    else:
        # GSPMD fallback: constrain the subproblem axis onto the mesh and
        # let XLA partition the vmapped scan solver.
        shard = NamedSharding(mesh, P(SUB_AXIS))

        def shard_sub(tree):
            return jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, shard), tree
            )

        res = _solve_subproblem_batch(
            fleet, cfg, shard_sub(sub_cost), shard_sub(x0_s), shard_sub(U_s),
            shard_sub(jnp.asarray(mids_s)), shard_sub(enabled),
        )

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

    Backend resolution matches the unsharded solve (per-shard batch width):
    on TPU the fused Pallas kernel path runs on every device via
    ``shard_map``; otherwise the GSPMD-partitioned XLA scans.  The number
    of agents should be a multiple of the mesh size for an even layout
    (ragged batches are padded with disabled subproblems).
    """
    import dataclasses

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

    backend = resolve_sharded_backend(
        config, fleet, U.shape[0], K, mesh, n, (X,)
    )
    from ..parallel.distributed import _vmem_fallback_cache
    from ..utils import negcache

    n_dev = mesh.shape[SUB_AXIS]
    shape_key = negcache.shape_key(
        "sharded", fleet, U.shape[0], K, n, n_dev, str(X.dtype),
        config.n_ls_iter,
    )
    if backend == "pallas" and shape_key in _vmem_fallback_cache():
        backend = "xla"
    cfg = dataclasses.replace(config, sweep_backend=backend)
    use_kernels = backend in ("pallas", "pallas-interpret")
    from ..ops.ilqr import is_vmem_error, retry_transient

    try:
        return retry_transient(
            lambda: _solve_distributed_sharded(
                fleet, cfg, K, graph_n_d, mesh, use_kernels, cost, X, U,
                radius, ignore_mask,
            )
        )
    except Exception as e:  # noqa: BLE001 -- filtered by is_vmem_error
        if not use_kernels or not is_vmem_error(e):
            raise
        import warnings

        warnings.warn(
            f"sharded pallas kernels exceeded VMEM for this shape "
            f"({e!s:.120}); falling back to the GSPMD XLA path",
            RuntimeWarning,
            stacklevel=2,
        )
        negcache.add(shape_key, _vmem_fallback_cache())
        cfg = dataclasses.replace(config, sweep_backend="xla")
        cfg2 = cfg
        return retry_transient(
            lambda: _solve_distributed_sharded(
                fleet, cfg2, K, graph_n_d, mesh, False, cost, X, U,
                radius, ignore_mask,
            )
        )


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _solve_trials_sharded(
    fleet: Fleet, cfg: SolverConfig, K: int, graph_n_d, mesh: Mesh,
    use_kernels: bool, cost_T: GameCost, X_T, U_T, radius, ignore_mask,
):
    n = X_T.shape[2]

    def prep(cost, X, U):
        dtype = X.dtype
        cost = _cast_cost(cost, dtype)
        membership = interaction_graph(
            X, radius, n_pos=cost.n_pos, n_d=graph_n_d
        )
        batch = gather_subproblems(membership, K)
        sub_cost = gather_cost(cost, batch, dtype)
        x0_s = gather_states(X[0], batch)
        U_s = gather_controls(U, batch)
        mids_s = jnp.asarray(fleet.branch_index_array)[batch.member_idx]
        return cost, membership, batch, sub_cost, x0_s, U_s, mids_s

    cost_c, membership, batch, sub_cost, x0_s, U_s, mids_s = jax.vmap(prep)(
        cost_T, X_T, U_T
    )
    T, S = x0_s.shape[:2]
    enabled = jnp.broadcast_to(~ignore_mask, (T, n))

    if use_kernels:
        # Trials x subproblems flatten into ONE kernel batch: the batched
        # solver treats lanes independently, so a trial axis is just more
        # subproblems (the reference runs trials as a host loop,
        # cluster/sim.sbatch; here they fill the same kernel lanes that
        # scale the single-trial solve).
        interpret = cfg.sweep_backend == "pallas-interpret"
        flat = jax.tree.map(
            lambda a: a.reshape(T * S, *a.shape[2:]),
            (sub_cost, x0_s, U_s, mids_s, enabled),
        )
        res = _shard_solve_batched(fleet, cfg, mesh, interpret, *flat)
        res = jax.tree.map(lambda a: a.reshape(T, S, *a.shape[1:]), res)
    else:
        shard = NamedSharding(mesh, P(SUB_AXIS))

        def shard_trials(tree):
            return jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, shard), tree
            )

        res = jax.vmap(
            lambda c, x0b, Ub, mb, en: _solve_subproblem_batch(
                fleet, cfg, c, x0b, Ub, mb, en
            )
        )(
            shard_trials(sub_cost), shard_trials(x0_s), shard_trials(U_s),
            shard_trials(mids_s), shard_trials(enabled),
        )

    def stitch(cost, membership, batch, res, X):
        dtype = X.dtype
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

    return jax.vmap(stitch)(cost_c, membership, batch, res, X_T)


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
    cluster/sim.sbatch; here T independent trials solve as one device
    program with (trial, subproblem) lanes laid out over the mesh).

    ``cost_T``: GameCost with a leading trial axis on every leaf;
    ``X_T (T, Tw, n, nx_p)`` previous trajectories; ``U_T (T, N, n, nu_p)``.
    On TPU the flattened (T * n)-subproblem batch runs the fused Pallas
    kernels per shard (round-5: the r4 XLA pin is lifted); elsewhere the
    vmapped XLA scans.  Returns a DistributedResult with a leading trial
    axis.
    """
    import dataclasses

    X_T = jnp.asarray(X_T)
    U_T = jnp.asarray(U_T, dtype=X_T.dtype)
    n = fleet.n_agents
    T = X_T.shape[0]
    if ignore_mask is None:
        ignore_mask = jnp.zeros((n,), bool)
    backend = resolve_sharded_backend(
        config, fleet, U_T.shape[1], K, mesh, T * n, (X_T,)
    )
    cfg = dataclasses.replace(config, sweep_backend=backend)
    use_kernels = backend in ("pallas", "pallas-interpret")
    return _solve_trials_sharded(
        fleet, cfg, K, graph_n_d, mesh, use_kernels, cost_T, X_T, U_T,
        jnp.asarray(radius, X_T.dtype), jnp.asarray(ignore_mask, bool),
    )
