"""Columnar (agent-batched) dynamics and Jacobians.

Pallas kernels cannot vmap a per-agent function, so every model also has a
columnar form operating on whole ``(n, nx_p)`` / ``(n, nu_p)`` arrays with
column indexing.  Heterogeneous fleets blend the unique branches with
per-agent selection masks (computed once from model ids) -- branch-free,
vector-unit-friendly code.

The math matches models/specs.py exactly (same reference formulas,
dpilqr/bbdynamics.cpp); tests cross-check both paths bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .specs import GRAVITY, ModelSpec
from .specs import (
    _Q12_CX,
    _Q12_CY,
    _Q12_CZ,
    _Q12_KF,
    _Q12_KTX,
    _Q12_KTY,
    _Q12_KTZ,
)


def _zeros_like_cols(x, n_cols):
    return jnp.zeros(x.shape[:-1] + (n_cols,), dtype=x.dtype)


def _assemble(x, nx_p, cols: dict):
    """Build (n, nx_p) xdot from a {column: value} map.

    Written as one-hot broadcast multiply-adds (not ``.at[].set``): each
    column is written once onto a zero base so the sum is equivalent, and
    it avoids the scatter primitive, which Pallas TPU cannot lower.
    """
    import jax.lax

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, nx_p), 1)
    out = jnp.zeros((x.shape[0], nx_p), dtype=x.dtype)
    for c, v in cols.items():
        hot = (col_ids == c).astype(x.dtype)
        out = out + v[:, None] * hot
    return out


# Each vf_* takes padded (n, nx_p), (n, nu_p) and returns padded xdot.
def vf_double_int_4d(x, u, nx_p):
    return _assemble(x, nx_p, {0: x[:, 2], 1: x[:, 3], 2: u[:, 0], 3: u[:, 1]})


def vf_double_int_6d(x, u, nx_p):
    return _assemble(
        x, nx_p,
        {0: x[:, 3], 1: x[:, 4], 2: x[:, 5], 3: u[:, 0], 4: u[:, 1], 5: u[:, 2]},
    )


def vf_car_3d(x, u, nx_p):
    return _assemble(
        x, nx_p,
        {0: u[:, 0] * jnp.cos(x[:, 2]), 1: u[:, 0] * jnp.sin(x[:, 2]), 2: u[:, 1]},
    )


def vf_unicycle_4d(x, u, nx_p):
    return _assemble(
        x, nx_p,
        {
            0: x[:, 2] * jnp.cos(x[:, 3]),
            1: x[:, 2] * jnp.sin(x[:, 3]),
            2: u[:, 0],
            3: u[:, 1],
        },
    )


def vf_human_6d(x, u, nx_p):
    return _assemble(
        x, nx_p,
        {0: x[:, 3] * jnp.cos(u[:, 0]), 1: x[:, 3] * jnp.sin(u[:, 0]), 3: u[:, 1]},
    )


def vf_human_lin_6d(x, u, nx_p):
    return _assemble(
        x, nx_p, {0: x[:, 3], 1: x[:, 4], 3: u[:, 0], 4: u[:, 1]}
    )


def vf_quad_6d(x, u, nx_p):
    g = GRAVITY
    return _assemble(
        x, nx_p,
        {
            0: x[:, 3],
            1: x[:, 4],
            2: x[:, 5],
            3: g * jnp.tan(u[:, 2]),
            4: -g * jnp.tan(u[:, 1]),
            5: u[:, 0] - g,
        },
    )


def vf_quad_12d(x, u, nx_p):
    g = GRAVITY
    psi, th, ph = x[:, 3], x[:, 4], x[:, 5]
    vx, vy, vz = x[:, 6], x[:, 7], x[:, 8]
    wx, wy, wz = x[:, 9], x[:, 10], x[:, 11]
    sps, cps = jnp.sin(psi), jnp.cos(psi)
    sth, cth = jnp.sin(th), jnp.cos(th)
    sph, cph = jnp.sin(ph), jnp.cos(ph)
    tth = jnp.tan(th)
    return _assemble(
        x, nx_p,
        {
            0: vx * cps * cth + vy * (sph * sth * cps - sps * cph)
               + vz * (sph * sps + sth * cph * cps),
            1: vx * sps * cth + vy * (sph * sps * sth + cph * cps)
               + vz * (-sph * cps + sps * sth * cph),
            2: -vx * sth + vy * sph * cth + vz * cph * cth,
            3: wy * sph / cth + wz * cph / cth,
            4: wy * cph - wz * sph,
            5: wx + wy * sph * tth + wz * cph * tth,
            6: vy * wz - vz * wy + g * sth,
            7: -vx * wz + vz * wx - g * sph * cth,
            8: _Q12_KF * u[:, 3] + vx * wy - vy * wx - g * cph * cth,
            9: _Q12_KTX * u[:, 0] - _Q12_CX * wy * wz,
            10: _Q12_KTY * u[:, 1] + _Q12_CY * wx * wz,
            11: _Q12_KTZ * u[:, 2] - _Q12_CZ * wx * wy,
        },
    )


def vf_bike_5d(x, u, nx_p):
    return _assemble(
        x, nx_p,
        {
            0: x[:, 2] * jnp.cos(x[:, 3]),
            1: x[:, 2] * jnp.sin(x[:, 3]),
            2: u[:, 0],
            3: x[:, 2] * jnp.tan(x[:, 4]),
            4: u[:, 1],
        },
    )


VEC_F = {
    "DoubleInt4D": vf_double_int_4d,
    "DoubleInt6D": vf_double_int_6d,
    "Car3D": vf_car_3d,
    "Unicycle4D": vf_unicycle_4d,
    "Human6D": vf_human_6d,
    "HumanLin6D": vf_human_lin_6d,
    "Quad6D": vf_quad_6d,
    "Quad12D": vf_quad_12d,
    "Bike5D": vf_bike_5d,
}


def blended_f(specs: tuple[ModelSpec, ...], nx_p: int):
    """Columnar fleet RHS: unique branches blended by per-agent masks.

    Returns ``f(x, u, branch_masks) -> xdot`` where ``branch_masks`` is
    ``(n_branches, n)`` (1.0 where the agent uses that branch).  With one
    unique model the mask argument is ignored.
    """
    seen: dict[int, ModelSpec] = {}
    for s in specs:
        seen.setdefault(s.model_id, s)
    branches = [VEC_F[s.name] for s in seen.values()]

    if len(branches) == 1:
        fn = branches[0]

        def f_homog(x, u, branch_masks=None):
            return fn(x, u, nx_p)

        return f_homog

    def f_mixed(x, u, branch_masks):
        out = jnp.zeros((x.shape[0], nx_p), dtype=x.dtype)
        for b, fn in enumerate(branches):
            out = out + branch_masks[b][:, None] * fn(x, u, nx_p)
        return out

    return f_mixed


def branch_masks_for(fleet) -> np.ndarray:
    """(n_branches, n) float32 selection masks from a Fleet."""
    idx = fleet.branch_index_array
    n_branches = idx.max() + 1 if len(idx) else 1
    out = np.zeros((max(n_branches, 1), len(idx)), dtype=np.float32)
    out[idx, np.arange(len(idx))] = 1.0
    return out


def columnar_rk4(f, x, u, dt, substeps: int, branch_masks=None):
    """Classic RK4 over dt on columnar dynamics (all agents at once)."""
    dh = dt / substeps
    for _ in range(substeps):
        k0 = f(x, u, branch_masks)
        k1 = f(x + 0.5 * dh * k0, u, branch_masks)
        k2 = f(x + 0.5 * dh * k1, u, branch_masks)
        k3 = f(x + dh * k2, u, branch_masks)
        x = x + dh * (k0 + 2.0 * k1 + 2.0 * k2 + k3) / 6.0
    return x
