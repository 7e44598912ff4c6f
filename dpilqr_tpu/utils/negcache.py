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

_PATH = os.path.join(
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_dpilqr")
    ),
    "dpilqr_vmem_negcache.json",
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
        with open(_PATH) as f:
            return set(json.load(f))
    except Exception:
        return set()


def add(key: str, cache: set) -> None:
    """Record ``key`` in the in-memory set and best-effort persist."""
    cache.add(key)
    try:
        os.makedirs(os.path.dirname(_PATH), exist_ok=True)
        existing = load()
        existing.add(key)
        tmp = _PATH + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(sorted(existing), f)
        os.replace(tmp, _PATH)
    except Exception:
        pass
