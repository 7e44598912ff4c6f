"""Geometry and scenario utilities on the block layout ``(n, nx_p)``.

Array-native equivalents of the reference's flat-vector helpers
(dpilqr/util.py): pairwise distances, scenario randomization, energy
normalization.  Pairwise functions are jittable; scenario generation is
host-side numpy (it runs once per experiment).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pairwise_distances(X, n_pos=None, n_d: int | None = None):
    """All-pairs distances over a trajectory.

    ``X: (..., n, nx_p)`` -> ``(..., npairs)`` in ``itertools.combinations``
    order (reference util.py:48-61).  Per-pair dimensionality is
    ``min(n_pos_i, n_pos_j)`` (capped at 3), or a fixed ``n_d`` when given.
    """
    n = X.shape[-2]
    ii, jj = np.triu_indices(n, k=1)
    k = min(3, X.shape[-1])
    pos = X[..., :k]
    if pos.shape[-1] < 3:
        pad = [(0, 0)] * (pos.ndim - 1) + [(0, 3 - pos.shape[-1])]
        pos = jnp.pad(pos, pad)
    if n_d is not None:
        nd_pair = jnp.full((len(ii),), n_d)
    elif n_pos is not None:
        n_pos = jnp.asarray(n_pos)
        nd_pair = jnp.minimum(n_pos[ii], n_pos[jj])
    else:
        nd_pair = jnp.full((len(ii),), 2)
    comp = jnp.arange(3)[None, :] < nd_pair[:, None]  # (npairs, 3)
    delta = (pos[..., ii, :] - pos[..., jj, :]) * comp
    return jnp.sqrt(jnp.sum(delta * delta, axis=-1))


def pair_indices(n: int):
    """Static (i, j) upper-triangle pair index arrays."""
    return np.triu_indices(n, k=1)


def distance_to_goal(x, xf, n_d: int = 2):
    """Per-agent distance from goal positions (reference util.py:239-240)."""
    return jnp.linalg.norm(x[..., :n_d] - xf[..., :n_d], axis=-1)


# --------------------------------------------------------------- scenarios
def randomize_locs(
    n_pts: int,
    rng=None,
    random: bool = False,
    rel_dist: float = 3.0,
    var: float = 3.0,
    n_d: int = 2,
):
    """Uniform random points with enforced minimum separation
    (reference util.py:125-149)."""
    rng = np.random.default_rng() if rng is None else rng
    delta = 0.1 * n_pts
    x = var * rng.uniform(-1, 1, (n_pts, n_d))
    if random:
        return x

    import itertools

    pair_inds = np.array(list(itertools.combinations(range(n_pts), 2)))
    while True:
        center = x.mean(axis=0)
        d = np.linalg.norm(x[pair_inds[:, 0]] - x[pair_inds[:, 1]], axis=1)
        close = pair_inds[d <= rel_dist]
        if not close.size:
            break
        move = np.unique(close)
        x[move] += delta * (x[move] - center)
    return x


def face_goal(x0, xf, heading_var: float = 0.01, rng=None):
    """Point the terminal state component at the goal with slight noise
    (reference util.py:152-162).  Heading is assumed to be the last state."""
    rng = np.random.default_rng() if rng is None else rng
    dX = xf[:, :2] - x0[:, :2]
    headings = np.arctan2(dX[:, 1], dX[:, 0])
    x0 = x0.copy()
    xf = xf.copy()
    x0[:, -1] = headings + heading_var * rng.standard_normal(x0.shape[0])
    xf[:, -1] = headings + heading_var * rng.standard_normal(x0.shape[0])
    return x0, xf


def random_setup(
    n_agents: int,
    n_states: int,
    rng=None,
    is_rotation: bool = False,
    n_d: int = 2,
    energy: float | None = None,
    do_face: bool = False,
    **kwargs,
):
    """Random start/goal block states (reference util.py:165-195).

    Returns ``x0, xf`` of shape ``(n_agents, n_states)``.
    """
    rng = np.random.default_rng() if rng is None else rng
    x_i = randomize_locs(n_agents, rng=rng, n_d=n_d, **kwargs)
    if is_rotation:
        theta = np.pi + rng.uniform(-np.pi / 4, np.pi / 4)
        R = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
        )
        x_f = x_i @ R - x_i.mean(axis=0)
    else:
        x_f = randomize_locs(n_agents, rng=rng, n_d=n_d, **kwargs)

    x0 = np.c_[x_i, np.zeros((n_agents, n_states - n_d))]
    xf = np.c_[x_f, np.zeros((n_agents, n_states - n_d))]
    if do_face:
        x0, xf = face_goal(x0, xf, rng=rng)
    if energy:
        x0 = normalize_energy(x0, energy, n_d)
        xf = normalize_energy(xf, energy, n_d)
    return x0, xf


def compute_energy(x, n_d: int = 2):
    """Sum of position distances from the origin (reference util.py:198-200)."""
    return np.linalg.norm(np.asarray(x)[:, :n_d], axis=1).sum()


def normalize_energy(x, energy: float = 10.0, n_d: int = 2):
    """Zero-center positions and scale to the target energy
    (reference util.py:203-217)."""
    x = np.asarray(x).copy()
    x[:, :n_d] -= x[:, :n_d].mean(axis=0)
    x[:, :n_d] *= energy / compute_energy(x, n_d)
    return x


def perturb_state(x, rng=None, n_d: int = 2, var: float = 0.5):
    """Jitter positions to break symmetries (reference util.py:220-226)."""
    rng = np.random.default_rng() if rng is None else rng
    x = np.asarray(x).copy()
    x[:, :n_d] += var * rng.standard_normal(x[:, :n_d].shape)
    return x
