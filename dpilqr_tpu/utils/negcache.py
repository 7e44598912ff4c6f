"""Persistent negative cache for doomed Pallas compiles.

When the VMEM budget (ops/pallas_sweeps.fits_vmem /
ops/pallas_batched.fits_vmem_batched) under-estimates a shape, the solver
attempts the kernel compile, catches the Mosaic overflow, and falls back
(ops/ilqr.py, parallel/distributed.py).  The in-process set spares later
same-shape calls the doomed compile -- but compiles here cost ~30 s to
minutes PER PROCESS (the remote-compile path bypasses jax's persistent
cache), so the negative decisions are worth keeping across processes too.

Best-effort file-backed set keyed by stable shape strings: IO failures
never raise (a lost negative cache only costs one redundant compile
attempt).
"""

from __future__ import annotations

import json
import os

# Bump when a kernel's VMEM footprint changes: old negative decisions about
# shapes a new kernel CAN fit must not survive the upgrade.
KERNEL_VERSION = "r5b"  # r5b: wide kernel's scoped-vmem limit raised


def _env_tag() -> str:
    """Device-generation tag for the cache file: a VMEM-failure decision on
    one chip kind must not route shapes to the slow backend on another
    (ADVICE r4).  Falls back to the platform name off-accelerator."""
    try:
        import jax

        d = jax.devices()[0]
        kind = getattr(d, "device_kind", None) or d.platform
    except Exception:
        kind = "unknown"
    return "".join(c if c.isalnum() else "-" for c in str(kind))


def _path() -> str:
    return os.path.join(
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax_dpilqr"),
        ),
        f"dpilqr_vmem_negcache_{_env_tag()}_{KERNEL_VERSION}.json",
    )


def shape_key(*parts) -> str:
    """Stable string key from hashable shape parts (fleets contribute
    their spec names + dt so the key survives process restarts)."""
    toks = []
    for p in parts:
        specs = getattr(p, "specs", None)
        if specs is not None:  # a Fleet
            toks.append(
                "fleet[" + ",".join(s.name for s in specs)
                + f"]@{getattr(p, 'dt', '?')}"
            )
        else:
            toks.append(str(p))
    return "|".join(toks)


def load() -> set:
    try:
        with open(_path()) as f:
            return set(json.load(f))
    except Exception:
        return set()


def add(key: str, cache: set) -> None:
    """Record ``key`` in the in-memory set and best-effort persist."""
    cache.add(key)
    try:
        path = _path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        existing = load()
        existing.add(key)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(sorted(existing), f)
        os.replace(tmp, path)
    except Exception:
        pass
