"""Global configuration for dpilqr_tpu.

The reference implementation (labicon/dp-ilqr) computes everything in float64
(numpy default).  On TPU, float32 is the fast native precision, so the library
is dtype-polymorphic: every solver follows the dtype of its inputs.  For
parity testing against float64 oracles on CPU we enable the JAX x64 flag here
so float64 inputs stay float64; TPU benchmarks simply pass float32 arrays.
"""

import os
from dataclasses import dataclass

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: compiles of the fused solver programs are
# expensive (especially through remote-compile tunnels); cache them across
# processes.  Override the location with JAX_COMPILATION_CACHE_DIR.
# CPU-only runs (JAX_PLATFORMS=cpu -- virtual-mesh dryruns, sharding
# checks) get a SEPARATE cache dir: a TPU session's remote-compile helper
# can deposit XLA:CPU executables built for a different host CPU into the
# shared cache, and loading those in a CPU-only process risks SIGILL
# (the mismatch tests/conftest.py isolates itself from hermetically).
_default_cache = (
    "~/.cache/jax_dpilqr_cpu"
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"
    else "~/.cache/jax_dpilqr"
)
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser(_default_cache)
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax without the option
    pass


@dataclass(frozen=True)
class SolverConfig:
    """Hyperparameters of the iLQR solve.

    Defaults mirror the reference solver (dpilqr/control.py:48-51,150):
    ``DELTA_0=2.0, MU_MIN=1e-6, MU_MAX=1e3, N_LS_ITER=10`` with
    ``n_lqr_iter=50`` outer iterations and relative tolerance ``1e-3``.
    """

    n_lqr_iter: int = 50
    tol: float = 1e-3
    delta_0: float = 2.0
    mu_min: float = 1e-6
    mu_max: float = 1e3
    n_ls_iter: int = 10
    mu_init: float = 1.0

    # When True the returned cost is the cost of the returned trajectory
    # (J_star).  The reference returns the last line-search cost even when the
    # line search failed (dpilqr/control.py:225) -- a quirk we do not copy.
    # There is no flag for that behavior; this field documents the delta.
    return_accepted_cost: bool = True

    # Failed-line-search policy.  "bail" stops iterating immediately -- the
    # reference's actual behavior (its regularization-increase code at
    # control.py:198-208 sits after a break and is dead).  "increase"
    # implements that dead path: raise mu by the delta schedule and keep
    # iterating, aborting only when mu exceeds ``mu_max`` (which is
    # load-bearing only in this mode).
    on_failed_ls: str = "bail"

    # Forward-sweep implementation: "xla" (lax.scan), "pallas" (fused VMEM
    # kernel, TPU only), or "auto" (pallas on TPU when the problem fits
    # VMEM).  Resolved by the solver entry points before tracing.
    sweep_backend: str = "auto"

    # Two-stage batched line search (TPU kernel path).  The accept rule is
    # FIRST-improving-alpha (reference control.py:179-193), and warm or
    # converging iterations overwhelmingly accept one of the first alphas
    # -- so the batched forward kernel first evaluates only ``ls_probe``
    # alphas and launches the remaining ``n_ls_iter - ls_probe`` ONLY when
    # some active subproblem improved at none of them (kernel launch time
    # is near-linear in the alpha count: 0.44 / 1.78 ms at 2 / 10 alphas,
    # measured v5e).  The accept decision is provably identical: if any of
    # the first ``ls_probe`` alphas improves, the first-improving index is
    # unchanged by evaluating more.  0 disables staging.  The stage widths
    # must keep the kernel lane-aligned (ls_probe * 64 % 128 == 0, i.e.
    # even); misaligned values fall back to the monolithic sweep.
    ls_probe: int = 2

    # Conditioning guard (default off = exact reference behavior).  The
    # reference zeroes mu once it decays past MU_MIN (control.py:236), so a
    # deep proximity penetration can drive the unregularized Q_uu solve to
    # cond ~1e13, past which ANY two implementations diverge macroscopically
    # (BASELINE.md caveat).  With this flag mu is floored at ``mu_min``
    # instead of snapping to 0, bounding kappa(Q_uu) without measurably
    # changing well-conditioned solves.
    mu_floor: bool = False


DEFAULT_CONFIG = SolverConfig()
