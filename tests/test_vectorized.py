"""Columnar dynamics must match the per-agent vmapped path exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

import dpilqr_tpu as dtl
from dpilqr_tpu.models import vectorized as V


@pytest.mark.parametrize("spec", list(dtl.MODEL_REGISTRY), ids=lambda s: s.name)
def test_columnar_f_matches_fleet(spec):
    rng = np.random.default_rng(spec.model_id)
    n = 7
    fleet = dtl.homogeneous_fleet(spec, n, 0.05)
    x = rng.normal(size=(n, spec.n_x)) * 0.4
    u = rng.normal(size=(n, spec.n_u)) * 0.4
    f = V.blended_f(fleet.specs, fleet.nx_p)
    out_col = np.asarray(f(jnp.asarray(x), jnp.asarray(u)))
    out_fleet = np.asarray(fleet.f(jnp.asarray(x), jnp.asarray(u)))
    assert np.allclose(out_col, out_fleet, atol=1e-14)


def test_columnar_rk4_matches_fleet_step():
    spec = dtl.UNICYCLE_4D
    n, dt = 5, 0.1
    fleet = dtl.homogeneous_fleet(spec, n, dt)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 4)))
    u = jnp.asarray(rng.normal(size=(n, 2)))
    f = V.blended_f(fleet.specs, fleet.nx_p)
    out = V.columnar_rk4(f, x, u, dt, spec.rk4_substeps)
    assert np.allclose(np.asarray(out), np.asarray(fleet.step(x, u)), atol=1e-14)


def test_blended_heterogeneous():
    fleet = dtl.Fleet((dtl.QUAD_6D, dtl.HUMAN_LIN_6D, dtl.QUAD_6D), 0.05)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 6)) * 0.3)
    u = jnp.asarray(rng.normal(size=(3, 3)) * 0.3)
    masks = jnp.asarray(V.branch_masks_for(fleet))
    f = V.blended_f(fleet.specs, fleet.nx_p)
    out_col = np.asarray(f(x, u, masks))
    out_fleet = np.asarray(fleet.f(x, u))
    assert np.allclose(out_col, out_fleet, atol=1e-14)
