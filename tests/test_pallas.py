"""Pallas sweep kernels vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import dpilqr_tpu as dtl
from dpilqr_tpu.ops import ilqr as I
from dpilqr_tpu.ops.pallas_sweeps import (
    fits_vmem,
    forward_pass_pallas,
    rollout_pallas,
)


def _setup(n=4, N=12, hetero=False):
    dtype = jnp.float32
    rng = np.random.default_rng(1)
    x0, xf = dtl.random_setup(n, 4, rng=rng, energy=8.0)
    if hetero:
        fleet = dtl.Fleet(
            (dtl.UNICYCLE_4D, dtl.DOUBLE_INT_4D) * (n // 2), 0.1
        )
    else:
        fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, n, 0.1)
    cost = dtl.make_game_cost(
        jnp.asarray(xf, dtype),
        jnp.asarray(np.tile(np.eye(4), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(2), (n, 1, 1)), dtype),
        jnp.asarray(np.tile(1e3 * np.eye(4), (n, 1, 1)), dtype),
        radius=0.5,
    )
    cost = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        cost,
    )
    U0 = jnp.asarray(rng.normal(size=(N, n, 2)) * 0.1, dtype)
    return fleet, cost, jnp.asarray(x0, dtype), U0


def test_rollout_matches_xla():
    fleet, cost, x0, U0 = _setup()
    X_x, J_x = I._rollout_fn(fleet.step, cost, x0, U0)
    X_p, J_p = rollout_pallas(fleet, cost, x0, U0, interpret=True)
    assert np.allclose(np.asarray(X_x), np.asarray(X_p), atol=1e-5)
    assert np.isclose(float(J_x), float(J_p), rtol=1e-5)


def test_forward_pass_matches_xla():
    fleet, cost, x0, U0 = _setup()
    X0, _ = I._rollout_fn(fleet.step, cost, x0, U0)
    K, d = I._backward_pass(fleet.linearize, cost, X0, U0, jnp.float32(1.0))
    alphas = jnp.asarray(I.line_search_alphas(10, jnp.float32))
    Xc_x, Uc_x, Jc_x = jax.vmap(
        lambda a: I._forward_pass(fleet.step, cost, X0, U0, K, d, a)
    )(alphas)
    Xc_p, Uc_p, Jc_p = forward_pass_pallas(
        fleet, cost, X0, U0, K, d, alphas, interpret=True
    )
    assert np.allclose(np.asarray(Xc_x), np.asarray(Xc_p), atol=1e-4)
    assert np.allclose(np.asarray(Uc_x), np.asarray(Uc_p), atol=1e-4)
    assert np.allclose(
        np.asarray(Jc_x), np.asarray(Jc_p), rtol=1e-5
    )


def test_forward_pass_heterogeneous():
    fleet, cost, x0, U0 = _setup(hetero=True)
    X0, _ = I._rollout_fn(fleet.step, cost, x0, U0)
    K, d = I._backward_pass(fleet.linearize, cost, X0, U0, jnp.float32(1.0))
    alphas = jnp.asarray(I.line_search_alphas(4, jnp.float32))
    Xc_x, _, Jc_x = jax.vmap(
        lambda a: I._forward_pass(fleet.step, cost, X0, U0, K, d, a)
    )(alphas)
    Xc_p, _, Jc_p = forward_pass_pallas(
        fleet, cost, X0, U0, K, d, alphas, interpret=True
    )
    assert np.allclose(np.asarray(Xc_x), np.asarray(Xc_p), atol=1e-4)
    assert np.allclose(np.asarray(Jc_x), np.asarray(Jc_p), rtol=1e-5)


def test_single_agent_no_pairs():
    dtype = jnp.float32
    fleet = dtl.homogeneous_fleet(dtl.UNICYCLE_4D, 1, 0.1)
    cost = dtl.make_game_cost(
        jnp.zeros((1, 4), dtype),
        jnp.asarray(np.eye(4)[None], dtype),
        jnp.asarray(np.eye(2)[None], dtype),
        jnp.asarray(1e2 * np.eye(4)[None], dtype),
        radius=0.0,
    )
    cost = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        cost,
    )
    x0 = jnp.asarray([[1.0, 1, 0.5, 0]], dtype)
    U0 = jnp.zeros((8, 1, 2), dtype)
    X_x, J_x = I._rollout_fn(fleet.step, cost, x0, U0)
    X_p, J_p = rollout_pallas(fleet, cost, x0, U0, interpret=True)
    assert np.allclose(np.asarray(X_x), np.asarray(X_p), atol=1e-6)
    assert np.isclose(float(J_x), float(J_p), rtol=1e-6)


def test_fits_vmem_estimate():
    assert fits_vmem(50, 10, 4, 2)
    assert not fits_vmem(50, 100, 12, 4)


def test_full_solve_pallas_backend_matches_xla():
    """End-to-end: the solver with sweep_backend=pallas (interpret mode)
    reproduces the XLA solve."""
    fleet, cost, x0, U0 = _setup(n=3, N=10)
    cfg_x = dtl.SolverConfig(n_lqr_iter=6, sweep_backend="xla")
    cfg_p = dtl.SolverConfig(n_lqr_iter=6, sweep_backend="pallas-interpret")
    r_x = dtl.ilqr_solve(fleet, cost, x0, U0=U0, config=cfg_x)
    r_p = dtl.ilqr_solve(fleet, cost, x0, U0=U0, config=cfg_p)
    assert int(r_x.iters) == int(r_p.iters)
    assert np.isclose(float(r_x.J), float(r_p.J), rtol=1e-4)
    assert np.allclose(np.asarray(r_x.X), np.asarray(r_p.X), atol=1e-3)


def test_backward_pass_pallas_matches_xla():
    from dpilqr_tpu.ops.pallas_sweeps import backward_pass_pallas

    fleet, cost, x0, U0 = _setup(n=4, N=12)
    X0, _ = I._rollout_fn(fleet.step, cost, x0, U0)
    mu = jnp.float32(1.0)
    K_x, d_x = I._backward_pass(fleet.linearize, cost, X0, U0, mu)
    K_p, d_p = backward_pass_pallas(fleet, cost, X0, U0, mu, interpret=True)
    scale = float(jnp.abs(K_x).max())
    assert np.allclose(np.asarray(K_x), np.asarray(K_p), atol=1e-4 * scale)
    assert np.allclose(np.asarray(d_x), np.asarray(d_p), atol=1e-4)
