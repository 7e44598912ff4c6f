"""Parity tests for the batched Pallas sweep kernels (ops/pallas_batched.py).

The batched solve must be algorithm-equivalent to the vmapped XLA path
(`_solve_subproblem_batch`): same per-subproblem iteration counts, accept
decisions, convergence flags, and trajectories to float tolerance.  On CPU
the kernels run in interpret mode; on a real TPU (when present) the compiled
kernels are checked directly (VERDICT r1 item 7).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dpilqr_tpu as dtl
from dpilqr_tpu.config import SolverConfig
from dpilqr_tpu.ops.costs import GameCost, make_game_cost
from dpilqr_tpu.parallel.distributed import _solve_distributed
from dpilqr_tpu.parallel.graph import interaction_graph


def _problem(n, N, dtype, models=None, seed=3):
    rng = np.random.default_rng(seed)
    dt, radius = 0.1, 0.5
    x0, xf = dtl.random_setup(n, 4, rng=rng, energy=5.0, n_d=2)
    if models is None:
        fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, dt)
    else:
        fleet = dtl.Fleet(tuple(models), dt)
    nx_p, nu_p = fleet.nx_p, fleet.nu_p
    x0p = np.zeros((n, nx_p))
    x0p[:, :4] = x0
    xfp = np.zeros((n, nx_p))
    xfp[:, :4] = xf
    cost = make_game_cost(
        jnp.asarray(xfp, dtype),
        jnp.asarray(np.tile(np.eye(nx_p), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(nu_p), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(1e3 * np.eye(nx_p), (n, 1, 1)), dtype),
        radius=radius,
    )
    U0 = jnp.asarray(rng.uniform(size=(N, n, nu_p)) * 0.01, dtype)
    U0 = U0 * jnp.asarray(fleet.control_mask, dtype)[None]
    x0j = jnp.asarray(x0p, dtype)
    X0 = jnp.broadcast_to(x0j[None], (N + 1, n, nx_p))
    return fleet, cost, X0, U0, jnp.asarray(radius, dtype)


def _run(fleet, cost, X0, U0, radius, K, backend, n_iter=6):
    cfg = SolverConfig(n_lqr_iter=n_iter, tol=1e-3, sweep_backend=backend)
    n = X0.shape[1]
    return _solve_distributed(
        fleet, cfg, K, None, cost, X0, U0, radius, jnp.zeros((n,), bool)
    )


class TestInterpretParity:
    """CPU interpret-mode: batched kernels == vmapped XLA path."""

    def test_homogeneous(self):
        fleet, cost, X0, U0, radius = _problem(4, 6, jnp.float64)
        rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=5)
        rp = _run(fleet, cost, X0, U0, radius, 4, "pallas-interpret", n_iter=5)
        np.testing.assert_array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
        np.testing.assert_array_equal(
            np.asarray(rx.converged), np.asarray(rp.converged)
        )
        np.testing.assert_allclose(
            np.asarray(rp.J), np.asarray(rx.J), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(rp.X), np.asarray(rx.X), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(rp.U), np.asarray(rx.U), atol=1e-7
        )

    def test_heterogeneous_models(self):
        models = [dtl.UNICYCLE_4D, dtl.DOUBLE_INT_4D, dtl.UNICYCLE_4D,
                  dtl.DOUBLE_INT_4D]
        fleet, cost, X0, U0, radius = _problem(
            4, 6, jnp.float64, models=models
        )
        rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=4)
        rp = _run(fleet, cost, X0, U0, radius, 4, "pallas-interpret", n_iter=4)
        np.testing.assert_array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
        np.testing.assert_allclose(
            np.asarray(rp.X), np.asarray(rx.X), atol=1e-8
        )

    def test_truncated_width(self):
        # K smaller than some neighborhoods: owner-first truncation path.
        fleet, cost, X0, U0, radius = _problem(5, 6, jnp.float64, seed=11)
        rx = _run(fleet, cost, X0, U0, radius, 2, "xla", n_iter=4)
        rp = _run(fleet, cost, X0, U0, radius, 2, "pallas-interpret", n_iter=4)
        np.testing.assert_array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
        np.testing.assert_allclose(
            np.asarray(rp.X), np.asarray(rx.X), atol=1e-8
        )

    def test_staged_compaction(self):
        # 70 subproblems pad to 128 = a two-stage width schedule (128 -> 64):
        # once <= 64 subproblems remain active the batch compacts (finished
        # lanes retire) and late iterations run at half width.  A lane's
        # position cannot affect its subproblem's iteration sequence, so
        # results must match the lockstep XLA path exactly.
        from dpilqr_tpu.ops.pallas_batched import _pad_unit, compaction_widths

        assert compaction_widths(128, _pad_unit(10)) == [128, 64]
        assert compaction_widths(512, 64) == [512, 256, 128, 64]
        assert compaction_widths(192, 64) == [192, 128, 64]
        assert compaction_widths(64, 64) == [64]
        fleet, cost, X0, U0, radius = _problem(70, 5, jnp.float64, seed=7)
        rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=8)
        rp = _run(fleet, cost, X0, U0, radius, 4, "pallas-interpret", n_iter=8)
        iters = np.asarray(rx.iters)
        # Precondition: convergence times spread, so a compaction boundary
        # is actually crossed while some subproblems remain active.
        assert iters.max() > iters.min(), iters
        np.testing.assert_array_equal(iters, np.asarray(rp.iters))
        np.testing.assert_allclose(np.asarray(rp.J), np.asarray(rx.J), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(rp.X), np.asarray(rx.X), atol=1e-8)

    def test_two_stage_line_search_exact(self):
        """SolverConfig.ls_probe stages the batched line search (first 2
        alphas, tail only when some active lane fails them).  The accept
        rule is first-improving-alpha, so staged and monolithic sweeps
        must make IDENTICAL decisions: same per-subproblem iteration
        counts, convergence flags, and values (VERDICT r4 item 3)."""
        import dataclasses

        fleet, cost, X0, U0, radius = _problem(12, 6, jnp.float64, seed=13)
        cfg0 = SolverConfig(
            n_lqr_iter=8, tol=1e-3, sweep_backend="pallas-interpret",
            ls_probe=0,
        )
        cfg2 = dataclasses.replace(cfg0, ls_probe=2)
        n = X0.shape[1]
        rm = _solve_distributed(
            fleet, cfg0, 4, None, cost, X0, U0, radius, jnp.zeros((n,), bool)
        )
        rs = _solve_distributed(
            fleet, cfg2, 4, None, cost, X0, U0, radius, jnp.zeros((n,), bool)
        )
        iters = np.asarray(rm.iters)
        assert iters.sum() > 0
        np.testing.assert_array_equal(iters, np.asarray(rs.iters))
        np.testing.assert_array_equal(
            np.asarray(rm.converged), np.asarray(rs.converged)
        )
        np.testing.assert_allclose(np.asarray(rs.J), np.asarray(rm.J), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(rs.X), np.asarray(rm.X), atol=1e-8)
        # The XLA path (monolithic by construction) agrees too.
        rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=8)
        np.testing.assert_array_equal(iters, np.asarray(rx.iters))

    def test_cross_chunk_merge(self, monkeypatch):
        # Batch of 160 pads to 256 and chunks at Sc=128 (VMEM predicate
        # shrunk): each chunk iterates full-width only until <=64 actives
        # remain, then both chunks' survivors merge into one 128-wide
        # staged batch.  Results must match the lockstep XLA path exactly.
        from dpilqr_tpu.ops import pallas_batched as pb

        monkeypatch.setattr(
            pb, "fits_vmem_batched", lambda N, K, nx, nu, S, na, nb=1, **kw:
            S <= 2 * pb._pad_unit(10),
        )
        fleet, cost, X0, U0, radius = _problem(160, 5, jnp.float64, seed=9)
        rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=6)
        rp = _run(fleet, cost, X0, U0, radius, 4, "pallas-interpret", n_iter=6)
        iters = np.asarray(rx.iters)
        assert iters.max() > iters.min(), iters
        np.testing.assert_array_equal(iters, np.asarray(rp.iters))
        np.testing.assert_allclose(np.asarray(rp.J), np.asarray(rx.J), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(rp.X), np.asarray(rx.X), atol=1e-8)

    def test_chunked_batch(self, monkeypatch):
        # Batches too large for one kernel launch split over several
        # launches (lax.map over the subproblem axis) instead of falling
        # back to the XLA scans.  Shrink the VMEM predicate so one
        # alignment unit (64) "fits" but the padded 70-subproblem batch
        # (128) does not -- forcing a 2-chunk solve -- and require
        # exact-iteration parity with the unchunked XLA path.
        from dpilqr_tpu.ops import pallas_batched as pb

        unit = pb._pad_unit(10)
        monkeypatch.setattr(
            pb, "fits_vmem_batched", lambda N, K, nx, nu, S, na, nb=1, **kw:
            S <= unit,
        )
        fleet, cost, X0, U0, radius = _problem(70, 5, jnp.float64, seed=5)
        rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=3)
        rp = _run(fleet, cost, X0, U0, radius, 4, "pallas-interpret", n_iter=3)
        np.testing.assert_array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
        np.testing.assert_allclose(np.asarray(rp.J), np.asarray(rx.J), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(rp.X), np.asarray(rx.X), atol=1e-8)


def _tpu_device():
    for d in jax.devices():
        if d.platform in ("tpu", "axon"):
            return d
    return None


@pytest.mark.skipif(_tpu_device() is None, reason="needs a TPU chip")
class TestOnTpuParity:
    """Compiled-kernel parity on the real chip (VERDICT r1 items 1 + 7).

    In float32 the two backends are algorithm-identical but not
    bit-identical: the 50-step Riccati recursion has kappa(P) ~ 1e3-1e4, so
    different (equally valid) op orderings produce ~1e-3-level J
    differences that can flip knife-edge line-search accepts.  Exact
    iteration parity is asserted in float64 (interpret tests above); here
    the contract is solution-quality equivalence.
    """

    def test_batched_distributed(self):
        dev = _tpu_device()
        fleet, cost, X0, U0, radius = _problem(6, 10, jnp.float32)
        put = lambda t: jax.tree.map(lambda a: jax.device_put(a, dev), t)
        cost, X0, U0, radius = put(cost), put(X0), put(U0), put(radius)
        rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=6)
        rp = _run(fleet, cost, X0, U0, radius, 4, "pallas", n_iter=6)
        # One-sided quality bound: a knife-edge convergence flip can make
        # either run optimize further (lower J); the pallas plan must not
        # be materially WORSE than the XLA plan.
        assert float(rp.J) <= float(rx.J) * 1.02, (float(rp.J), float(rx.J))
        # Sanity: finite outputs, most subproblems take the same number of
        # iterations (identical accept logic; flips are knife-edge only).
        assert np.isfinite(np.asarray(rp.X)).all()
        assert np.isfinite(np.asarray(rp.U)).all()
        same = np.asarray(rx.iters) == np.asarray(rp.iters)
        assert same.mean() >= 0.5, (rx.iters, rp.iters)

    def test_heterogeneous_batched(self):
        # Mixed quad/human fleet: exercises the compiled branch-mask
        # dispatch (branch_row) inside the forward kernel on real hardware.
        dev = _tpu_device()
        models = [dtl.QUAD_6D, dtl.QUAD_6D, dtl.HUMAN_LIN_6D, dtl.QUAD_6D]
        fleet, cost, X0, U0, radius = _problem(
            4, 8, jnp.float32, models=models
        )
        put = lambda t: jax.tree.map(lambda a: jax.device_put(a, dev), t)
        cost, X0, U0, radius = put(cost), put(X0), put(U0), put(radius)
        rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=5)
        rp = _run(fleet, cost, X0, U0, radius, 4, "pallas", n_iter=5)
        assert np.isfinite(float(rp.J))
        assert float(rp.J) <= float(rx.J) * 1.05, (float(rp.J), float(rx.J))

    def test_centralized_sweeps(self):
        # Full-solve parity of the round-1 centralized Pallas kernels.
        dev = _tpu_device()
        n, N = 5, 20
        rng = np.random.default_rng(9)
        x0, xf = dtl.random_setup(n, 4, rng=rng, energy=5.0, n_d=2)
        dtype = jnp.float32
        fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, 0.1)
        cost = make_game_cost(
            jnp.asarray(xf, dtype),
            jnp.asarray(np.tile(np.eye(4), (n, 1, 1)), dtype),
            jnp.asarray(np.tile(np.eye(2), (n, 1, 1)), dtype),
            jnp.asarray(np.tile(1e3 * np.eye(4), (n, 1, 1)), dtype),
            radius=0.5,
        )
        x0j = jax.device_put(jnp.asarray(x0, dtype), dev)
        cost = jax.tree.map(lambda a: jax.device_put(a, dev), cost)
        out = {}
        for backend in ("xla", "pallas"):
            cfg = SolverConfig(n_lqr_iter=8, tol=1e-6, sweep_backend=backend)
            out[backend] = dtl.ilqr_solve(fleet, cost, x0j, N=N, config=cfg)
        assert abs(int(out["xla"].iters) - int(out["pallas"].iters)) <= 2
        np.testing.assert_allclose(
            float(out["pallas"].J), float(out["xla"].J), rtol=5e-3
        )



def test_mixed_rk4_substeps():
    # Bike5D integrates with 1 RK4 substep while the rest use 5: the
    # kernel runs the max schedule with a per-column dh table (zeroed
    # past a model's own substeps -- x + 0*(...) is exact), so mixed
    # fleets ride the fused kernels.  Must match the XLA path exactly.
    models = [dtl.DOUBLE_INT_4D, dtl.BIKE_5D, dtl.DOUBLE_INT_4D,
              dtl.BIKE_5D]
    assert len({m.rk4_substeps for m in models}) == 2
    fleet, cost, X0, U0, radius = _problem(
        4, 6, jnp.float64, models=models, seed=21
    )
    rx = _run(fleet, cost, X0, U0, radius, 4, "xla", n_iter=5)
    rp = _run(fleet, cost, X0, U0, radius, 4, "pallas-interpret", n_iter=5)
    np.testing.assert_array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
    np.testing.assert_allclose(np.asarray(rp.J), np.asarray(rx.J), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rp.X), np.asarray(rx.X), atol=1e-8)
