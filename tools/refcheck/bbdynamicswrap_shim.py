"""Drop-in stand-in for the reference's compiled ``bbdynamicswrap`` module.

Same public surface as dpilqr/bbdynamicswrap.pyx (Model enum, ``f``,
``integrate``, ``linearize``), backed by the reference's own bbdynamics.cpp
compiled through tools/refcheck/ref_wrapper.cpp and bound with ctypes.
run_reference.py registers this module as ``dpilqr.bbdynamicswrap`` in
``sys.modules`` BEFORE importing the genuine package from /root/reference,
so every other reference module (dynamics.py:13 etc.) runs unmodified.
"""

import ctypes
import os
from enum import Enum, auto

import numpy as np


class Model(Enum):  # bbdynamicswrap.pyx:8-16
    DoubleInt4D = 0
    DoubleInt6D = auto()
    Car3D = auto()
    Unicycle4D = auto()
    Quadcopter6D = auto()
    Human6D = auto()
    HumanLin6D = auto()
    Quadcopter12D = auto()


_so_path = os.environ.get(
    "REFCHECK_SO",
    os.path.join(os.path.dirname(__file__), "build", "libbbref.so"),
)
_lib = ctypes.CDLL(_so_path)

_dp = ctypes.POINTER(ctypes.c_double)
_lib.ref_f.argtypes = [ctypes.c_int, _dp, _dp, _dp]
_lib.ref_integrate.argtypes = [
    ctypes.c_int, _dp, _dp, ctypes.c_double, ctypes.c_size_t, _dp,
]
_lib.ref_linearize.argtypes = [
    ctypes.c_int, _dp, _dp, ctypes.c_double, _dp, _dp,
]


def _ptr(a):
    return a.ctypes.data_as(_dp)


def _pair(x, u):
    x = np.ascontiguousarray(x, dtype=np.double)
    u = np.ascontiguousarray(u, dtype=np.double)
    return x, u


def f(x, u, model):
    x, u = _pair(x, u)
    x_dot = np.empty(x.shape[0], dtype=np.double)
    _lib.ref_f(model.value, _ptr(x), _ptr(u), _ptr(x_dot))
    return x_dot


def integrate(x, u, dt, model):
    x, u = _pair(x, u)
    x_new = np.empty(x.shape[0], dtype=np.double)
    _lib.ref_integrate(
        model.value, _ptr(x), _ptr(u), dt, x.shape[0], _ptr(x_new)
    )
    return x_new


def linearize(x, u, dt, model):
    x, u = _pair(x, u)
    nx, nu = x.shape[0], u.shape[0]
    A = np.empty(nx * nx, dtype=np.double)
    B = np.empty(nx * nu, dtype=np.double)
    _lib.ref_linearize(model.value, _ptr(x), _ptr(u), dt, _ptr(A), _ptr(B))
    return A.reshape((nx, nx)), B.reshape((nx, nu))
