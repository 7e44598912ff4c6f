#!/usr/bin/env python
"""Diagnose what binds the blocked wide backward kernel past nxf = 48
(VERDICT r4 item 2): attempt compile+run at nxf = 56 / 64 / 80 / 96 in a
bounded subprocess each, record the sublane-padded VMEM model's
prediction, the outcome (ok / vmem / compile-timeout / other), and the
wall time.  One process at a time (the remote compile helper serializes).

Usage:
    python scripts/diagnose_wide_envelope.py            # full sweep
    python scripts/diagnose_wide_envelope.py --one K NXP  # inner mode
"""

import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# (K, nx_p, model): nxf = K * nx_p.  48 is the verified envelope; the
# sweep brackets it from above.  Quad12D K=8 is the config that matters
# (BASELINE config 5 full-state at K=8 neighborhoods).
CONFIGS = [
    (12, 4, "unicycle"),  # 48  control: must pass
    (14, 4, "unicycle"),  # 56
    (16, 4, "unicycle"),  # 64  measured failing in r4
    (20, 4, "unicycle"),  # 80
    (4, 12, "quad12d"),   # 48  control: the new bench point's shape
    (8, 12, "quad12d"),   # 96  the full Quad12D K=8 target
]


def inner(K: int, nx_p: int, model: str) -> None:
    import numpy as np
    import jax.numpy as jnp

    import dpilqr_tpu as dtl
    from dpilqr_tpu.ops.pallas_batched_wide import (
        backward_pass_batched_wide,
        fits_vmem_wide,
    )

    S, N, dt = 64, 50, 0.1
    spec = dtl.QUAD_12D if model == "quad12d" else dtl.UNICYCLE_4D
    fleet = dtl.homogeneous_fleet(spec, K, dt)
    nx, nu = fleet.nx_p, fleet.nu_p
    assert nx == nx_p
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    xf = np.zeros((K, nx))
    cost = dtl.make_game_cost(
        jnp.asarray(xf, dtype),
        jnp.asarray(np.tile(np.eye(nx), (K, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(nu), (K, 1, 1)), dtype),
        jnp.asarray(np.tile(np.eye(nx), (K, 1, 1)), dtype),
        radius=0.5,
        n_pos=np.full((K,), 3, np.int32),
    )
    import jax

    cost_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (S, *a.shape)) + 0.0
        if hasattr(a, "shape")
        else a,
        cost,
    )
    X = jnp.asarray(0.01 * rng.normal(size=(S, N + 1, K, nx)), dtype)
    U = jnp.asarray(0.01 * rng.normal(size=(S, N, K, nu)), dtype)
    mu = jnp.ones((S,), dtype)
    mids = jnp.zeros((S, K), jnp.int32)
    pred = fits_vmem_wide(N, K, nx, nu, S)
    print(json.dumps({"predicted_fits": bool(pred)}), flush=True)
    t0 = time.perf_counter()
    Kg, d = backward_pass_batched_wide(fleet, cost_b, mids, X, U, mu)
    val = float(np.asarray(jnp.sum(d)))
    print(
        json.dumps(
            {
                "ok": True,
                "compile_plus_run_s": round(time.perf_counter() - t0, 1),
                "finite": bool(np.isfinite(val)),
            }
        ),
        flush=True,
    )


def main() -> None:
    from dpilqr_tpu.ops.ilqr import is_vmem_error

    results = []
    for K, nx_p, model in CONFIGS:
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--one", str(K), str(nx_p), model],
                capture_output=True, text=True, timeout=900,
            )
            wall = time.perf_counter() - t0
            lines = [
                ln for ln in r.stdout.splitlines() if ln.startswith("{")
            ]
            pred = json.loads(lines[0])["predicted_fits"] if lines else None
            if r.returncode == 0 and len(lines) > 1:
                outcome = "ok"
                detail = json.loads(lines[1])
            else:
                err = r.stderr[-4000:]

                class _E(Exception):
                    pass

                e = _E(err)
                outcome = "vmem" if is_vmem_error(e) else "error"
                detail = {"stderr_tail": err[-600:]}
        except subprocess.TimeoutExpired:
            wall = time.perf_counter() - t0
            pred, outcome, detail = None, "compile-timeout", {}
        rec = {
            "K": K, "nx_p": nx_p, "model": model, "nxf": K * nx_p,
            "predicted_fits": pred, "outcome": outcome,
            "wall_s": round(wall, 1), **detail,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    out = ROOT / "logs" / "wide_envelope_r5.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        inner(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        main()
