"""Native host kernel parity: the C++ batched dynamics must match the JAX
path bit-for-bit-ish (both are float64 implementations of the same math)."""

import numpy as np
import jax.numpy as jnp
import pytest

import dpilqr_tpu as dtl
from dpilqr_tpu.native import host

pytestmark = pytest.mark.skipif(
    not host.available(), reason=f"native kernel unavailable: {host.build_error()}"
)

ALL_SPECS = list(dtl.MODEL_REGISTRY)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_step_matches_jax(spec):
    rng = np.random.default_rng(spec.model_id)
    dt = 0.05
    fleet = dtl.homogeneous_fleet(spec, 1, dt)
    x = rng.normal(size=(1, spec.n_x)) * 0.4
    u = rng.normal(size=(1, spec.n_u)) * 0.4
    out_native = host.step([spec.model_id], x, u, dt)
    out_jax = np.asarray(fleet.step(jnp.asarray(x), jnp.asarray(u)))
    # Quad12D's large torque gains (~1/inertia = 5.7e4) amplify last-bit
    # rounding differences; compare relative to the state scale.
    scale = max(1.0, np.abs(out_jax).max())
    assert np.allclose(out_native, out_jax, atol=1e-12 * scale)


@pytest.mark.parametrize("spec", ALL_SPECS, ids=lambda s: s.name)
def test_linearize_matches_jax(spec):
    rng = np.random.default_rng(100 + spec.model_id)
    dt = 0.05
    fleet = dtl.homogeneous_fleet(spec, 1, dt)
    x = rng.normal(size=(1, spec.n_x)) * 0.4
    u = rng.normal(size=(1, spec.n_u)) * 0.4
    A_n, B_n = host.linearize([spec.model_id], x, u, dt)
    A_j, B_j = fleet.linearize(jnp.asarray(x), jnp.asarray(u))
    assert np.allclose(A_n, np.asarray(A_j), atol=1e-12), spec.name
    assert np.allclose(B_n, np.asarray(B_j), atol=1e-12), spec.name


def test_batched_heterogeneous_padded():
    dt = 0.1
    fleet = dtl.Fleet((dtl.QUAD_6D, dtl.CAR_3D, dtl.UNICYCLE_4D), dt)
    rng = np.random.default_rng(0)
    nx_p, nu_p = fleet.nx_p, fleet.nu_p
    x = rng.normal(size=(3, nx_p)) * np.asarray(fleet.state_mask)
    u = rng.normal(size=(3, nu_p)) * np.asarray(fleet.control_mask)
    mids = [s.model_id for s in fleet.specs]
    out_n = host.step(mids, x, u, dt)
    out_j = np.asarray(fleet.step(jnp.asarray(x), jnp.asarray(u)))
    assert np.allclose(out_n, out_j, atol=1e-12)
    A_n, B_n = host.linearize(mids, x, u, dt)
    A_j, B_j = fleet.linearize(jnp.asarray(x), jnp.asarray(u))
    assert np.allclose(A_n, np.asarray(A_j), atol=1e-12)
    assert np.allclose(B_n, np.asarray(B_j), atol=1e-12)
