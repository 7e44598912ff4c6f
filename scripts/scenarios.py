#!/usr/bin/env python
"""Scenario library: archived start/goal configurations in block layout.

Capability parity with the reference's scenario collection
(scripts/scenarios.py): the same named set-ups, expressed as
``(n_agents, n_states)`` arrays.
"""

import numpy as np

PI = np.pi


def _jitter(x, rng, n_d=3, scale=0.1):
    x = x.copy()
    x[:, :n_d] += scale * rng.standard_normal(x[:, :n_d].shape)
    return x


def potential_ilqr_setup():
    """Three unicycles eyeballed from the Potential-iLQR paper
    (reference scenarios.py:12-22)."""
    x0 = np.array(
        [[0.5, 1.5, 0, 0.1], [2.5, 1.5, 0, PI], [1.5, 1.3, 0, PI / 2]]
    )
    xf = np.array(
        [[2.5, 1.5, 0, 0], [0.5, 1.5, 0, PI], [1.5, 2.2, 0, PI / 2]]
    )
    return x0, xf


def paper_setup_3_quads(rng=None):
    rng = np.random.default_rng() if rng is None else rng
    x0 = np.array(
        [
            [0.5, 1.5, 1, 0.5, 0.0, 0],
            [2.5, 1.5, 1, -0.5, 0.0, 0],
            [1.5, 1.3, 1, 0, 0.2, 0],
        ]
    )
    xf = np.array(
        [
            [2.5, 1.5, 1, 0, 0, 0],
            [0.5, 1.5, 1, 0, 0, 0],
            [1.5, 2.2, 1, 0, 0, 0],
        ]
    )
    return _jitter(x0, rng), _jitter(xf, rng)


def paper_setup_5_quads(rng=None):
    rng = np.random.default_rng() if rng is None else rng
    x0 = np.array(
        [
            [0.5, 1.5, 1, 0.1, 0.0, 0],
            [2.5, 1.5, 1, -0.1, 0.0, 0],
            [1.5, 1.3, 1, 0, 0.1, 0],
            [0.5, 1.0, 1, 0.1, 0, 0],
            [1.2, -0.5, 1, 0, 0, 0],
        ]
    )
    xf = np.array(
        [
            [2.5, 1.5, 1, 0, 0, 0],
            [0.5, 1.5, 1, 0, 0, 0],
            [1.5, 2.2, 1, 0, 0, 0],
            [-0.5, -0.6, 1, 0, 0, 0],
            [0.7, 1.0, 1, 0, 0, 0],
        ]
    )
    return _jitter(x0, rng), _jitter(xf, rng)


def paper_setup_7_quads(rng=None):
    rng = np.random.default_rng() if rng is None else rng
    x0 = np.array(
        [
            [0.5, 1.5, 1, 0.1, 0.0, 0],
            [2.5, 1.5, 1, -0.1, 0.0, 0],
            [1.5, 1.3, 1, 0, 0.1, 0],
            [0.5, 1.0, 1, 0.1, 0, 0],
            [1.2, -0.5, 1, 0, 0, 0],
            [1.7, 1.4, 1, 0, 0, 0],
            [-1.5, 1.1, 1, 0.1, 0, 0],
        ]
    )
    xf = np.array(
        [
            [2.5, 1.5, 1, 0, 0, 0],
            [0.5, 1.5, 1, 0, 0, 0],
            [1.5, 2.2, 1, 0, 0, 0],
            [-0.5, -0.6, 1, 0, 0, 0],
            [0.7, 1.0, 1, 0, 0, 0],
            [2.0, 2.1, 1, 0, 0, 0],
            [-0.6, 0.6, 1, 0, 0, 0],
        ]
    )
    return _jitter(x0, rng), _jitter(xf, rng)


def four_quads_exchange(rng=None):
    rng = np.random.default_rng() if rng is None else rng
    x0 = np.c_[np.arange(4.0), np.zeros(4), np.ones(4), np.zeros((4, 3))]
    xf = np.c_[
        np.array([3.0, 0, 1, 2]), np.ones(4), np.ones(4), np.zeros((4, 3))
    ]
    return _jitter(x0, rng), _jitter(xf, rng)


def four_quads_passthrough():
    x0 = np.array(
        [
            [-0.117, 0.179, 0.963, 0, 0, 0],
            [0.9, 0.118, 1.111, 0, 0, 0],
            [1.943, 0.065, 0.987, 0, 0, 0],
            [3.14, -0.077, 1.083, 0, 0, 0],
        ]
    )
    xf = np.array(
        [
            [2.989, 1.046, 0.986, 0, 0, 0],
            [-0.054, 0.979, 1.077, 0, 0, 0],
            [1.051, 1.121, 1.111, 0, 0, 0],
            [2.038, 1.006, 0.767, 0, 0, 0],
        ]
    )
    return x0, xf


def four_quads_box_exchange():
    x0 = np.array(
        [
            [-2.5, 2.5, 1.0, 0, 0, 0],
            [2.5, 2.5, 1.0, 0, 0, 0],
            [-2.5, -2.5, 1.0, 0, 0, 0],
            [2.5, -2.5, 1.0, 0, 0, 0],
        ]
    )
    xf = np.array(
        [
            [2.5, -2.5, 1.0, 0, 0, 0],
            [-2.5, -2.5, 1.0, 0, 0, 0],
            [2.5, 2.5, 1.0, 0, 0, 0],
            [-2.5, 2.5, 1.0, 0, 0, 0],
        ]
    )
    return x0, xf


def five_quads_figure1():
    x0 = np.array(
        [
            [0.0, -1.0, 0.95, 0, 0, 0],
            [0.0, 0.0, 1.0, 0, 0, 0],
            [-1.5, 0.0, 0.95, 0, 0, 0],
            [0.7, 0.7, 1.05, 0, 0, 0],
            [1.5, 0.3, 1.0, 0, 0, 0],
        ]
    )
    xf = np.array(
        [
            [-1.4, 0.0, 1.1, 0, 0, 0],
            [-1.0, -1.0, 1.0, 0, 0, 0],
            [0.0, -1.0, 1.0, 0, 0, 0],
            [1.5, 0.4, 1.0, 0, 0, 0],
            [1.0, 1.0, 1.0, 0, 0, 0],
        ]
    )
    return x0, xf


def q2h1_passthrough():
    """Two quads + one human crossing (reference scenarios.py:145-152)."""
    x0 = np.array(
        [
            [-1.5, 0.1, 1, 0, 0, 0],
            [1.5, 0, 1, 0, 0, 0],
            [0, -1, 1.5, 0, 0, 0],
        ]
    )
    xf = np.array(
        [
            [1.5, 0, 2, 0, 0, 0],
            [-1.5, 0, 2, 0, 0, 0],
            [0.0, 2, 1.5, 0, 0, 0],
        ]
    )
    return x0, xf


def q3h2_qcross():
    x0 = np.array(
        [
            [-1.5, 1, 0.95, 0, 0, 0],
            [1.5, 0.8, 1.05, 0, 0, 0],
            [0, -2, 0.9, 0, 0, 0],
            [-1.2, -1.1, 1, 0, 0, 0],
            [1.4, -0.9, 1, 0, 0, 0],
        ]
    )
    xf = np.array(
        [
            [1.5, 0.8, 1.05, 0, 0, 0],
            [-1.5, 1.1, 0.9, 0, 0, 0],
            [0, 0, 1.1, 0, 0, 0],
            [1.3, -0.95, 1, 0, 0, 0],
            [-1.0, -1.05, 1, 0, 0, 0],
        ]
    )
    return x0, xf


def q2h2_hcross():
    x0 = np.array(
        [
            [1.0, 0.4, 0.5, 0, 0.5, 0],
            [0.1, -1.2, 0.8, 0.5, 0, 0],
            [-1.0, 0.2, 1, 0, 0, 0],
            [0.2, 1.0, 1, 0, 0, 0],
        ]
    )
    xf = np.array(
        [
            [-1.0, 1.2, 1, 0, 0, 0],
            [0.3, 1.05, 1, 0, 0, 0],
            [0.5, 0.0, 1, 0, 0, 0],
            [0.0, -1.2, 1.2, 0, 0, 0],
        ]
    )
    return x0, xf
