"""ctypes wrapper for the native host dynamics kernel (bbdyn.cpp).

Builds the shared library on first use (g++, no external deps) and exposes
batched ``f`` / ``step`` / ``linearize`` on the framework's padded block
layout.  Falls back cleanly: ``available()`` reports whether the kernel can
be used; all call sites must tolerate ``False`` (the JAX path is always
available).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "bbdyn.cpp"
_LIB = _HERE / "libbbdyn.so"

_lib = None
_build_error: str | None = None


def _build() -> bool:
    global _build_error
    try:
        subprocess.run(
            [
                # -ffp-contract=off: no FMA contraction, so results match the
                # JAX/XLA CPU path bit-for-bit (Quad12D is chaotic at high
                # spin rates and amplifies last-bit differences).
                "g++", "-O3", "-march=native", "-ffp-contract=off",
                "-shared", "-fPIC", "-o", str(_LIB), str(_SRC),
            ],
            check=True,
            capture_output=True,
            text=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        _build_error = getattr(e, "stderr", str(e))
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    lib = ctypes.CDLL(str(_LIB))
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.bbdyn_f.argtypes = [i32p, c, c, c, f64p, f64p, f64p]
    lib.bbdyn_f.restype = c
    lib.bbdyn_step.argtypes = [i32p, c, c, c, f64p, f64p, ctypes.c_double, f64p]
    lib.bbdyn_step.restype = c
    lib.bbdyn_linearize.argtypes = [
        i32p, c, c, c, f64p, f64p, ctypes.c_double, f64p, f64p,
    ]
    lib.bbdyn_linearize.restype = c
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    return _build_error


def _prep(model_ids, x, u):
    models = np.ascontiguousarray(model_ids, dtype=np.int32)
    x = np.ascontiguousarray(x, dtype=np.float64)
    u = np.ascontiguousarray(u, dtype=np.float64)
    n, nx_p = x.shape
    nu_p = u.shape[1]
    assert models.shape == (n,)
    return models, x, u, n, nx_p, nu_p


def f(model_ids, x, u):
    """Batched continuous dynamics: (n, nx_p), (n, nu_p) -> (n, nx_p)."""
    lib = _load()
    models, x, u, n, nx_p, nu_p = _prep(model_ids, x, u)
    out = np.empty_like(x)
    rc = lib.bbdyn_f(models, n, nx_p, nu_p, x, u, out)
    if rc != 0:
        raise ValueError("bbdyn_f: bad model id")
    return out


def step(model_ids, x, u, dt):
    """Batched RK4 step over dt (per-model substeps)."""
    lib = _load()
    models, x, u, n, nx_p, nu_p = _prep(model_ids, x, u)
    out = np.empty_like(x)
    rc = lib.bbdyn_step(models, n, nx_p, nu_p, x, u, float(dt), out)
    if rc != 0:
        raise ValueError("bbdyn_step: bad model id")
    return out


def linearize(model_ids, x, u, dt):
    """Batched Euler-discretized Jacobians: -> (n, nx_p, nx_p), (n, nx_p, nu_p)."""
    lib = _load()
    models, x, u, n, nx_p, nu_p = _prep(model_ids, x, u)
    A = np.empty((n, nx_p, nx_p))
    B = np.empty((n, nx_p, nu_p))
    rc = lib.bbdyn_linearize(models, n, nx_p, nu_p, x, u, float(dt), A, B)
    if rc != 0:
        raise ValueError("bbdyn_linearize: bad model id")
    return A, B
