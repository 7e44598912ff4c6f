"""Speed-of-light accounting for the Pallas sweep kernels.

BASELINE.json's north star says "every kernel at speed-of-light per chip".
This module makes that claim checkable: for each kernel family it counts
the FLOPs and HBM bytes a sweep must execute (formulas mirror the actual
in-kernel block ops, ops/pallas_batched.py), measures the achievable
ceilings ON THIS CHIP with two microbenchmarks written in the same kernel
style (a VMEM-resident VPU FMA loop and a HBM-streaming grid), and reports
achieved-vs-ceiling fractions plus which bound binds.

Why empirical ceilings: the kernels are VPU/bandwidth programs (the block
ops are lane-parallel FMAs, not 128x128 MXU contractions), and public
spec sheets give MXU TFLOP/s, not the VPU issue rate actually reachable
from a Pallas grid with double-buffered HBM streams.  Measuring the
ceiling with the same instrument removes every systematic error except
the one we care about (kernel efficiency).

All counts use MAC = 2 FLOPs and count the one-hot blend arithmetic of
the in-kernel Gauss-Jordan solve (it occupies the VPU just like the
"useful" FLOPs).
"""

from __future__ import annotations

import functools
from time import perf_counter

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    """Hard host barrier: fetch a scalar reduction of ``x``.  Through
    remote-device tunnels ``block_until_ready`` can return before the
    device work lands; a value fetch cannot (same trick as bench.py)."""
    return float(np.asarray(jnp.sum(x)))


def _diff_time(timed, inner: int, reps: int, min_signal: float = 0.02):
    """Two-point extrapolated time of ``inner`` calls, with the rep count
    escalated until the difference signal clearly exceeds barrier noise
    (the tunnel's sync jitter is tens of ms; a small negative diff floored
    at epsilon would otherwise produce absurd rates).  Returns
    ``(seconds_for_r_calls, r)``."""
    d, r = 0.0, inner
    for scale in (1, 2, 4, 8):
        r = inner * scale
        t1 = min(timed(r) for _ in range(reps))
        t2 = min(timed(2 * r) for _ in range(reps))
        d = t2 - t1
        if d > min_signal:
            return d, r
    return max(d, 1e-9), r


# ---------------------------------------------------------------------------
# Work counts (per subproblem, per time step) for the batched sweeps.
# ---------------------------------------------------------------------------


def backward_step_flops(K: int, nx_p: int, nu_p: int) -> int:
    """FLOPs of ONE time step of the batched backward kernel for ONE
    subproblem (ops/pallas_batched.backward_pass_batched's kernel body).

    Terms follow the kernel line by line; nxf = K*nx_p, nuf = K*nu_p.
    """
    nxf, nuf = K * nx_p, K * nu_p
    fl = 0
    fl += 2 * nxf * nxf  # Preg = P + mu * eye (mul + add per entry)
    fl += 2 * K * nx_p * nx_p + nxf  # Q_x = Lx + A_bd^T p
    fl += 2 * K * nx_p * nu_p + nuf  # Q_u = Lu + B_bd^T p
    fl += 2 * nx_p * nxf * nxf  # AtP = A_bd^T P
    fl += 2 * nx_p * nxf * nxf + nxf * nxf  # Q_xx = Lxx + AtP A_bd
    fl += 2 * nx_p * nuf * nxf  # W1 = B_bd^T Preg
    fl += 2 * nx_p * nuf * nxf  # Q_ux = W1 A_bd
    fl += 2 * nx_p * nuf * nuf + nuf * nuf  # Q_uu = W1 B_bd + Luu
    # _gj_solve: nuf pivots.  Per pivot over the (nuf + nxf + 1)-wide
    # augmented system: scale row (w mul), eliminate (2 w nuf), restore
    # via one-hot blends (~4 w: two muls, one sub, one add).
    w = nuf + nxf + 1
    fl += nuf * (w + 2 * w * nuf + 4 * w)
    fl += 2 * nuf * nuf + nuf  # w = Q_uu d + Q_u
    fl += 2 * nuf * nxf * 2 + 2 * nxf  # p' = Q_x + K^T w + Q_ux^T d
    fl += 2 * nuf * nuf * nxf  # QuuK = Q_uu K
    # K^T QuuK + K^T Q_ux; Q_ux^T K is the TRANSPOSE of the latter (no
    # FLOPs -- the kernel reuses the contraction).
    fl += 2 * (2 * nuf * nxf * nxf)
    fl += 3 * nxf * nxf  # adds + symmetrization
    return fl


def backward_step_hbm_bytes(
    K: int, nx_p: int, nu_p: int, dtype_bytes: int = 4
) -> int:
    """HBM bytes streamed per time step per subproblem by the batched
    backward kernel: the _tspec_rev inputs (A, B, L_uu, L_xx, L_x, L_u)
    and outputs (Kg, d).  The value-function state lives in VMEM scratch
    and never touches HBM."""
    nxf, nuf = K * nx_p, K * nu_p
    n_in = (
        K * nx_p * nx_p  # A
        + K * nx_p * nu_p  # B
        + nuf * nuf  # L_uu (block-diag embedded dense)
        + nxf * nxf  # L_xx
        + nxf  # L_x
        + nuf  # L_u
    )
    n_out = nuf * nxf + nuf  # Kg, d
    return (n_in + n_out) * dtype_bytes


def forward_step_trig_ops(
    K: int, nx_p: int, nu_p: int, n_alpha: int, substeps: int,
    f_trig_per_slot: int = 2,
) -> int:
    """Transcendental (sin/cos/tan) evaluations of ONE time step of the
    batched forward kernel for ONE subproblem across its n_alpha
    candidates: ``4 * substeps`` dynamics evals, each issuing
    ``f_trig_per_slot`` transcendentals per slot column (Unicycle4D:
    cos + sin of the heading, models/vectorized.py:56-57).

    Counted SEPARATELY from ``forward_step_flops`` because the VPU issues
    transcendentals through a multi-pass polynomial sequence, not one
    FLOP: the measured rate (``measure_vpu_transcendental_ops``) is ~20x
    below the FMA rate, which VERDICT r4 item 5 demands be modeled rather
    than asserted."""
    C = K * n_alpha
    return substeps * 4 * f_trig_per_slot * C


def forward_step_flops(
    K: int, nx_p: int, nu_p: int, n_alpha: int, substeps: int,
    f_flops_per_slot: int = 40,
) -> int:
    """FLOPs of ONE time step of the batched forward (line-search) kernel
    for ONE subproblem, across its n_alpha candidates.

    ``f_flops_per_slot``: cost of one continuous-dynamics eval per slot
    (model-dependent; ~40 covers the trig + affine work of the 4-state
    models, models/vectorized.py).  Transcendentals are ALSO counted at
    their true issue rate via ``forward_step_trig_ops`` (the ~2 ops of
    overlap out of 40 keeps this count conservative).
    """
    nxf, nuf = K * nx_p, K * nu_p
    C = K * n_alpha  # columns per subproblem
    fl = 0
    fl += 2 * nxf * nuf * n_alpha  # du = sum_k G dx (outer-product FMAs)
    fl += 2 * nu_p * nuf * C  # du row extraction (0/1 matmul)
    fl += 3 * nu_p * C  # u = Ur + du + alpha * d
    # stage cost: two quadforms (Q e, R u) + mask/weight muls
    fl += (2 * nx_p * nx_p + 2 * nx_p) * C
    fl += (2 * nu_p * nu_p + 2 * nu_p) * C
    fl += 6 * C
    npairs = K * (K - 1) // 2
    fl += npairs * (3 * 3 * 2 + 8) * n_alpha  # pairwise penalty columns
    # RK4: 4 f evals + state combines per substep
    fl += substeps * (4 * f_flops_per_slot + 14 * nx_p) * C
    return fl


def forward_step_hbm_bytes(
    K: int, nx_p: int, nu_p: int, n_alpha: int, dtype_bytes: int = 4
) -> int:
    """HBM bytes per time step per subproblem: streamed Xr, Ur, G, d in;
    Xo, Uo out (constants are grid-invariant and loaded once)."""
    nxf, nuf = K * nx_p, K * nu_p
    C = K * n_alpha
    n = (
        nx_p * C  # Xr
        + nu_p * C  # Ur
        + nxf * nuf  # G (per subproblem, not per alpha)
        + nu_p * C  # d tiled
        + nx_p * C  # Xo
        + nu_p * C  # Uo
    )
    return n * dtype_bytes


# ---------------------------------------------------------------------------
# Empirical ceilings: same-style microbenchmark kernels.
# ---------------------------------------------------------------------------


@functools.cache
def measure_vpu_peak_gflops(S: int = 512, rows: int = 256, iters: int = 2048,
                            reps: int = 5) -> float:
    """Achievable VPU FLOP/s from a Pallas kernel: a loop of (rows, S)
    FMAs on VMEM-resident data -- ``4 * rows * S`` FLOPs per iteration
    (two fused multiply-adds), no HBM traffic in the loop.  The (256, 512)
    operand spans 128 vregs, so the FMA latency chain between iterations
    is hidden and the loop measures ISSUE THROUGHPUT, not latency.
    Returns GFLOP/s."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        b = a * 1.0000001 + 0.0000003
        c = a * 0.9999999 + 0.0000001
        d = b * 1.0000002 + 0.0000002

        def body(i, carry):
            a, b, c, d = carry
            # Four independent FMA streams x4 unroll: enough ILP to
            # saturate issue and amortize the loop-carried overhead.
            for _ in range(4):
                a = a * 1.0000001 + 1.0000001e-7
                b = b * 0.9999999 + 1.0000002e-7
                c = c * 1.0000002 + 0.9999998e-7
                d = d * 0.9999998 + 1.0000003e-7
            return a, b, c, d

        a, b, c, d = jax.lax.fori_loop(0, iters, body, (a, b, c, d))
        o_ref[:] = (a + b) + (c + d)

    x = jnp.ones((rows, S), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, S), jnp.float32),
        )(x)
    )
    _sync(fn(x))
    # Two-point extrapolation cancels the dispatch+fetch overhead (which
    # through a remote-device tunnel dwarfs the kernel itself): take the
    # MIN of each rep count separately, then difference -- differencing
    # raw pairs would bias toward barrier noise.
    inner = 50

    def timed(r):
        t0 = perf_counter()
        out = None
        for _ in range(r):
            out = fn(x)
        _sync(out)
        return perf_counter() - t0

    d, r = _diff_time(timed, inner, reps)
    flops = 4 * 8 * rows * S * iters * r
    return flops / d / 1e9


@functools.cache
def measure_hbm_stream_gbps(mb: int = 256, reps: int = 5) -> float:
    """Achievable HBM->VMEM streaming bandwidth from a Pallas grid in the
    sweep kernels' style: a (T, 512, 512) float32 array streamed one
    leading-axis step per grid iteration (double-buffered by the Pallas
    pipeline), reduced into a VMEM accumulator.  Counts read bytes only.
    Returns GB/s."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    blk = 512
    T = max(1, (mb * 1024 * 1024) // (blk * blk * 4))

    def kernel(x_ref, o_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] = acc[:] + x_ref[0]

        @pl.when(t == T - 1)
        def _():
            o_ref[:] = acc[:]

    _i0 = np.int32(0)  # int32 index maps: python 0 promotes to int64
    x = jnp.ones((T, blk, blk), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, blk, blk), lambda t: (t, _i0, _i0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((blk, blk), lambda t: (_i0, _i0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((blk, blk), jnp.float32),
            scratch_shapes=[pltpu.VMEM((blk, blk), jnp.float32)],
        )(x)
    )
    _sync(fn(x))

    def timed(r):
        t0 = perf_counter()
        out = None
        for _ in range(r):
            out = fn(x)
        _sync(out)
        return perf_counter() - t0

    d, r = _diff_time(timed, 16, reps)
    return T * blk * blk * 4 * r / d / 1e9


@functools.cache
def measure_vpu_transcendental_ops(S: int = 512, rows: int = 256,
                                   iters: int = 256, reps: int = 5) -> float:
    """Achievable VPU transcendental issue rate (sin evals / second) from
    a Pallas kernel in the forward kernel's style: four independent
    sin-chains on VMEM-resident (rows, S) data, unrolled 4x -- the same
    ILP structure as ``measure_vpu_peak_gflops`` so the two ceilings are
    comparable.  Returns evals/second (Gops when divided by 1e9)."""
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        b = a * 0.99
        c = a * 1.01
        d = a * 0.98

        def body(i, carry):
            a, b, c, d = carry
            for _ in range(4):
                a = jnp.sin(a)
                b = jnp.sin(b)
                c = jnp.sin(c)
                d = jnp.sin(d)
            return a, b, c, d

        a, b, c, d = jax.lax.fori_loop(0, iters, body, (a, b, c, d))
        o_ref[:] = (a + b) + (c + d)

    x = jnp.full((rows, S), 0.7, jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, S), jnp.float32),
        )(x)
    )
    _sync(fn(x))

    def timed(r):
        t0 = perf_counter()
        out = None
        for _ in range(r):
            out = fn(x)
        _sync(out)
        return perf_counter() - t0

    d, r = _diff_time(timed, 20, reps)
    return 16 * rows * S * iters * r / d


@functools.cache
def measure_batched_matmul_gflops(nb: int = 400, m: int = 16,
                                  reps: int = 5) -> float:
    """Achievable float32 batched-matmul FLOP/s at the PSCAN COMBINE's OWN
    shapes: a chain of (nb, m, m) @ (nb, m, m) products through XLA --
    ``nb ~ 2N`` time-batched elements of ``nxf x nxf`` value blocks, the
    arrays the associative-scan combine actually contracts (ops/pscan.py).
    The 1024^3 MXU probe (measure_mxu_peak_gflops) answers 'what can the
    chip do'; this answers 'what can ANY implementation of these shapes
    do' -- at m=16 each matmul uses 16/128 of the MXU rows, so this
    ceiling sits far below the dense peak (VERDICT r4 item 4: report
    pscan against a fair ceiling).  Returns GFLOP/s."""
    a0 = jnp.eye(m, dtype=jnp.float32)[None] * 0.999 + 0.001
    a0 = jnp.broadcast_to(a0, (nb, m, m)) + 0.0

    @jax.jit
    def chain(x, a):
        for _ in range(8):
            x = jnp.matmul(x, a)
        return x

    x = jnp.ones((nb, m, m), jnp.float32)
    _sync(chain(x, a0))

    def timed(r):
        t0 = perf_counter()
        out = x
        for _ in range(r):
            out = chain(out, a0)
        _sync(out)
        return perf_counter() - t0

    d, r = _diff_time(timed, 64, reps)
    return 8 * nb * 2 * m**3 * r / d / 1e9


def pscan_sweep_flops(N: int, nxf: int) -> int:
    """FLOPs of one associative-scan Riccati sweep (ops/pscan.py).

    The round-5 combine does 8 dense (nxf, nxf) matmuls (TA1, C1@TA1,
    A2@M1A1, A1^T@TA1, TC1, C1@TC1, A2@M1C1, @A2^T: 2*nxf^3 each) plus
    ONE Gauss-Jordan pass over the (nxf, 2*nxf+1)-augmented system
    (~3 matmul-equivalents of elimination + blend work); matvecs are
    negligible.  ``associative_scan`` executes ~2N combines across its
    up/down sweeps."""
    return 2 * N * 11 * 2 * nxf**3


@functools.cache
def measure_mxu_peak_gflops(m: int = 1024, reps: int = 5) -> float:
    """Achievable matmul FLOP/s through XLA for float32 INPUTS at the
    DEFAULT precision (TPU lowers them to bf16 MXU passes -- measured
    ~134 TFLOP/s on v5e, ~68% of the nominal 197 bf16 peak), which is
    exactly how the pscan combines execute.  A chain of data-dependent
    (m, m) @ (m, m) products with the multiplier as a traced argument
    (a closure constant lets XLA fold the chain into one matmul against
    a precomputed power).  Returns GFLOP/s."""
    # ``a`` must be a traced ARGUMENT: as a closure constant XLA constant-
    # folds the chain x@a@...@a into one matmul against a precomputed a^8,
    # inflating the measured rate 8x (observed).
    a0 = jnp.eye(m, dtype=jnp.float32) * 0.999 + 0.001

    @jax.jit
    def chain(x, a):
        for _ in range(8):
            x = x @ a
        return x

    x = jnp.ones((m, m), jnp.float32)
    _sync(chain(x, a0))

    def timed(r):
        t0 = perf_counter()
        out = x
        for _ in range(r):
            out = chain(out, a0)
        _sync(out)
        return perf_counter() - t0

    d, r = _diff_time(timed, 8, reps)
    return 8 * 2 * m**3 * r / d / 1e9


# ---------------------------------------------------------------------------
# Report.
# ---------------------------------------------------------------------------


def kernel_sol(
    family: str,
    N: int,
    K: int,
    nx_p: int,
    nu_p: int,
    S: int,
    n_alpha: int,
    measured_s: float,
    launches: int = 1,
    substeps: int = 1,
) -> dict:
    """Achieved-vs-ceiling summary for ``launches`` sweeps of one kernel
    family measured at ``measured_s`` seconds total.

    The binding limit is whichever ceiling predicts the LONGER runtime:
    ``t_compute = flops / vpu_peak`` vs ``t_memory = bytes / hbm_bw``.
    Both microbenchmark ceilings are measured on this chip, in this
    process, with kernels of the same structure.

    Interpretation: the measured ceilings are CONSERVATIVE (the probe
    kernel cannot exceed true silicon peak, and measures ~75% of the
    nominal 8x128x2xclock VPU rate), so ``sol_frac`` can exceed 1.0 --
    that reads "the kernel out-issues the measuring instrument", i.e. it
    is at the VPU bound and further gains require fewer FLOPs, not better
    scheduling.

    Caveat: the remote TPU compiler's scheduling is NONDETERMINISTIC
    across compile instances -- the same backward kernel has measured
    0.42 and 1.45 TFLOP/s in different processes (3.5x, far beyond the
    timing error).  A sol_frac is therefore a property of THAT compile;
    the best observed instance bounds what the kernel design achieves.
    """
    trig = 0
    if family == "backward":
        fl = backward_step_flops(K, nx_p, nu_p) * N * S * launches
        by = backward_step_hbm_bytes(K, nx_p, nu_p) * N * S * launches
    elif family == "forward":
        fl = (
            forward_step_flops(K, nx_p, nu_p, n_alpha, substeps)
            * N * S * launches
        )
        by = (
            forward_step_hbm_bytes(K, nx_p, nu_p, n_alpha) * N * S * launches
        )
        trig = (
            forward_step_trig_ops(K, nx_p, nu_p, n_alpha, substeps)
            * N * S * launches
        )
    else:
        raise ValueError(family)
    vpu = measure_vpu_peak_gflops() * 1e9
    hbm = measure_hbm_stream_gbps() * 1e9
    t_compute = fl / vpu
    t_trig = 0.0
    trig_rate = 0.0
    if trig:
        # Transcendentals issue through a multi-pass polynomial sequence;
        # their time adds to the FMA time (same issue port), at the rate
        # the probe kernel measures on this chip (VERDICT r4 item 5: a
        # measured rate, not a narrative).
        trig_rate = measure_vpu_transcendental_ops()
        t_trig = trig / trig_rate
        t_compute = t_compute + t_trig
    t_memory = by / hbm
    bound = "vpu" if t_compute >= t_memory else "hbm"
    t_sol = max(t_compute, t_memory)
    out = {
        "family": family,
        "gflops": round(fl / 1e9, 3),
        "gbytes": round(by / 1e9, 3),
        "achieved_gflop_s": round(fl / measured_s / 1e9, 1),
        "achieved_gb_s": round(by / measured_s / 1e9, 1),
        "ceiling_vpu_gflop_s": round(vpu / 1e9, 1),
        "ceiling_hbm_gb_s": round(hbm / 1e9, 1),
        "binding_limit": bound,
        "sol_s": round(t_sol, 6),
        "measured_s": round(measured_s, 6),
        "sol_frac": round(t_sol / measured_s, 3),
    }
    if trig:
        out.update(
            trig_gops=round(trig / 1e9, 3),
            ceiling_trig_gops_s=round(trig_rate / 1e9, 2),
            trig_time_frac_of_sol=round(t_trig / t_sol, 3),
        )
    return out
