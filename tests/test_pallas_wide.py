"""Parity tests for the blocked wide backward kernel
(ops/pallas_batched_wide.py): same arithmetic as the unrolled batched
kernel, in a layout whose program size stays O(nx_p + nuf) so the
TPU compiler handles K * nx_p up to WIDE_NXF_LIMIT (the quad models'
real neighborhood widths -- VERDICT r3 item 3)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dpilqr_tpu as dtl
from dpilqr_tpu.config import SolverConfig
from dpilqr_tpu.ops.pallas_batched import (
    UNROLLED_NXF_LIMIT,
    WIDE_NXF_LIMIT,
    backward_pass_batched,
    resolve_batched_backend,
)
from dpilqr_tpu.ops.pallas_batched_wide import backward_pass_batched_wide


def _batch(model, K, S, N, dtype, seed=0):
    n = K
    fleet = dtl.homogeneous_fleet(model, n, 0.1)
    nx_p, nu_p = fleet.nx_p, fleet.nu_p
    rng = np.random.default_rng(seed)
    xf = rng.normal(size=(n, nx_p))
    cost = dtl.make_game_cost(
        jnp.asarray(xf, dtype),
        jnp.asarray(np.tile(np.eye(nx_p), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(nu_p), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(1e3 * np.eye(nx_p), (n, 1, 1)), dtype),
        radius=0.5,
    )
    cost_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (S, *a.shape)), cost
    )
    X = jnp.asarray(0.1 * rng.normal(size=(S, N + 1, K, nx_p)), dtype)
    U = jnp.asarray(0.1 * rng.normal(size=(S, N, K, nu_p)), dtype)
    mu = jnp.ones((S,), dtype)
    mids = jnp.zeros((S, K), jnp.int32)
    return fleet, cost_b, mids, X, U, mu


@pytest.mark.parametrize(
    "model,K",
    [(dtl.UNICYCLE_4D, 4), (dtl.QUAD_6D, 4), (dtl.UNICYCLE_4D, 3)],
    ids=["uni-K4", "quad6d-K4", "uni-K3"],
)
def test_wide_matches_unrolled(model, K):
    """Blocked backward == unrolled backward to near-machine float64
    precision on shapes where both build (the difference is XLA FMA/
    reassociation noise, not ordering -- products and accumulation order
    are identical by construction)."""
    fleet, cost_b, mids, X, U, mu = _batch(model, K, 8, 6, jnp.float64)
    Kg1, d1 = backward_pass_batched(
        fleet, cost_b, mids, X, U, mu, interpret=True
    )
    Kg2, d2 = backward_pass_batched_wide(
        fleet, cost_b, mids, X, U, mu, interpret=True
    )
    np.testing.assert_allclose(np.asarray(Kg2), np.asarray(Kg1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-9)


def test_wide_shape_over_unrolled_envelope():
    """The blocked kernel builds and runs (interpret) at nxf=48 -- past the
    unrolled kernel's compile envelope -- and agrees with the reference
    XLA backward pass."""
    from dpilqr_tpu.ops.ilqr import _backward_pass
    from dpilqr_tpu.ops.costs import quadraticize_stage_compact

    K = 8
    fleet, cost_b, mids, X, U, mu = _batch(dtl.QUAD_6D, K, 4, 4, jnp.float64)
    assert K * fleet.nx_p > UNROLLED_NXF_LIMIT
    Kg, d = backward_pass_batched_wide(
        fleet, cost_b, mids, X, U, mu, interpret=True
    )
    assert np.isfinite(np.asarray(Kg)).all()
    assert np.isfinite(np.asarray(d)).all()

    # Cross-check one batch element against the XLA backward pass.
    def lin(x, u):
        return fleet.linearize_dyn(mids[0], x, u)

    cost0 = jax.tree.map(lambda a: a[0], cost_b)
    K_x, d_x = _backward_pass(lin, cost0, X[0], U[0], mu[0])
    # XLA path layout: (N, nuf, nxf); kernel: (N, nuf, nxf, S).
    np.testing.assert_allclose(
        np.asarray(Kg[:, :, :, 0]), np.asarray(K_x), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(d[:, :, 0]), np.asarray(d_x), atol=1e-8
    )


def test_resolver_routes_wide_widths(monkeypatch):
    """resolve_batched_backend: unrolled widths and wide widths up to the
    AUTO limit get the kernels; past it AUTO falls to the measured-faster
    XLA scans, while an explicit backend still reaches the wide kernel
    anywhere in its capability envelope (<= 96)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = SolverConfig(sweep_backend="auto")
    fleet6 = dtl.homogeneous_fleet(dtl.QUAD_6D, 8, 0.1)
    assert resolve_batched_backend(cfg, fleet6, 20, 4, 8) == "pallas"
    assert resolve_batched_backend(cfg, fleet6, 20, 8, 8) == "pallas"  # wide
    fleet12 = dtl.homogeneous_fleet(dtl.QUAD_12D, 16, 0.1)
    assert resolve_batched_backend(cfg, fleet12, 20, 4, 16) == "pallas"
    # Full-state Quad12D at K=8 (nxf=96): COMPILES and runs on the wide
    # kernel since the r5 scoped-vmem lift (logs/wide_envelope_r5.json),
    # but auto-resolution prefers the measured-faster XLA scans
    # (logs/r5_wide96_crossover.log); explicit selection still works.
    assert resolve_batched_backend(cfg, fleet12, 20, 8, 16) == "xla"
    cfg_p = SolverConfig(sweep_backend="pallas")
    assert resolve_batched_backend(cfg_p, fleet12, 20, 8, 16) == "pallas"
    assert 16 * fleet12.nx_p > WIDE_NXF_LIMIT >= 8 * fleet12.nx_p


def test_wide_shape_nxf96():
    """The full Quad12D K=8 shape (nxf=96, the r5 envelope lift) builds
    and runs in interpret mode and agrees with the XLA backward pass."""
    from dpilqr_tpu.ops.ilqr import _backward_pass

    K = 8
    fleet, cost_b, mids, X, U, mu = _batch(
        dtl.QUAD_12D, K, 2, 3, jnp.float64
    )
    assert K * fleet.nx_p == 96 <= WIDE_NXF_LIMIT
    Kg, d = backward_pass_batched_wide(
        fleet, cost_b, mids, X, U, mu, interpret=True
    )
    assert np.isfinite(np.asarray(Kg)).all()

    def lin(x, u):
        return fleet.linearize_dyn(mids[0], x, u)

    cost0 = jax.tree.map(lambda a: a[0], cost_b)
    K_x, d_x = _backward_pass(lin, cost0, X[0], U[0], mu[0])
    np.testing.assert_allclose(
        np.asarray(Kg[:, :, :, 0]), np.asarray(K_x), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(d[:, :, 0]), np.asarray(d_x), atol=1e-8
    )


def test_distributed_solve_through_wide_kernel():
    """Full distributed solve at nxf=48 through the batched-kernel path
    (interpret): equals the vmapped XLA path exactly on iteration counts."""
    from dpilqr_tpu.parallel.distributed import _solve_distributed

    K = n = 8
    N, dtype = 4, jnp.float64
    fleet = dtl.homogeneous_fleet(dtl.QUAD_6D, n, 0.1)
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(n, 6)) * 2.0
    xf = rng.normal(size=(n, 6)) * 2.0
    cost = dtl.make_game_cost(
        jnp.asarray(xf, dtype),
        jnp.asarray(np.tile(np.eye(6), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(3), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(1e3 * np.eye(6), (n, 1, 1)), dtype),
        radius=0.5,
        n_pos=np.full((n,), 3, np.int32),
    )
    X0 = jnp.broadcast_to(jnp.asarray(x0, dtype)[None], (N + 1, n, 6))
    U0 = jnp.zeros((N, n, 3), dtype)
    rad = jnp.asarray(0.5, dtype)
    ign = jnp.zeros((n,), bool)

    out = {}
    for backend in ("xla", "pallas-interpret"):
        cfg = SolverConfig(n_lqr_iter=3, tol=1e-3, sweep_backend=backend)
        out[backend] = _solve_distributed(
            fleet, cfg, K, None, cost, X0, U0, rad, ign
        )
    rx, rp = out["xla"], out["pallas-interpret"]
    np.testing.assert_array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
    np.testing.assert_allclose(np.asarray(rp.J), np.asarray(rx.J), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rp.X), np.asarray(rx.X), atol=1e-7)
