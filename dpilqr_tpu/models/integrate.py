"""Integrators and discretization.

Numerics match the reference kernel: classic RK4 with ``substeps`` equal
sub-intervals per control period (reference uses 5 in C++,
dpilqr/bbdynamics.cpp:39-93, and 1 in the Python path, dpilqr/dynamics.py:74),
and forward-Euler discretization of the continuous Jacobians
(dpilqr/bbdynamics.cpp:95-106).
"""

from __future__ import annotations

import jax.numpy as jnp


def rk4_step(f, x, u, dh):
    """One classic Runge-Kutta-4 step of size ``dh`` under zero-order hold."""
    k0 = f(x, u)
    k1 = f(x + 0.5 * dh * k0, u)
    k2 = f(x + 0.5 * dh * k1, u)
    k3 = f(x + dh * k2, u)
    return x + dh * (k0 + 2.0 * k1 + 2.0 * k2 + k3) / 6.0


def rk4_integrate(f, x, u, dt, substeps: int):
    """Integrate ``x_dot = f(x, u)`` over ``dt`` with ``substeps`` RK4 steps.

    ``substeps`` is static; the loop unrolls (it is at most 5), which XLA
    fuses into one elementwise chain.
    """
    dh = dt / substeps
    for _ in range(substeps):
        x = rk4_step(f, x, u, dh)
    return x


def euler_discretize(A_c, B_c, dt):
    """Discretize continuous Jacobians: ``A_d = I + dt A_c``, ``B_d = dt B_c``."""
    n_x = A_c.shape[-1]
    eye = jnp.eye(n_x, dtype=A_c.dtype)
    return eye + dt * A_c, dt * B_c
