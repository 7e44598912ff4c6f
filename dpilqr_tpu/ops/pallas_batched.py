"""Batched Pallas TPU sweep kernels: ALL subproblems in ONE kernel program.

The distributed solve (parallel/distributed.py) turns the n per-agent
subproblems of the reference's ``solve_distributed``
(dpilqr/distributed.py:25-103) into one rectangular batch of S subproblems
with K padded slots each.  Round 1 solved that batch with a vmapped
``lax.scan`` iLQR: correct, but each scan step dispatches ~30 small device
ops whose fixed launch overhead dominates wall time.  These kernels fuse
each full sweep -- the Riccati backward recursion (dpilqr/control.py:116-148)
and the 10-alpha closed-loop line-search rollout (control.py:95-114,162) --
into ONE Pallas program over ALL subproblems, with the time loop as the
Pallas grid (per-step inputs/outputs stream HBM<->VMEM, double-buffered by
the Pallas pipeline; the value function / rolled state persist in VMEM
scratch across grid steps).

Layout: the subproblem axis S lives on the LANES (last dim) of every array,
so each elementwise op processes all subproblems as full vector registers.
Per-subproblem matrices (P, Q_uu, gains) keep their small row/col dims on
sublanes / untiled leading axes.  Mosaic cannot lower batched ``dot_general``
at this size without padding every operand's last two dims to MXU tiles
(measured: scoped-VMEM OOM at S=128), so all matrix products are expressed
as block-structured VPU contractions instead:

- dynamics Jacobians A, B are block-diagonal per slot (nx_p x nx_p blocks),
  so sandwiches like ``A^T P A`` decompose into K small per-slot outer
  products accumulated over nx_p (``_bdT_mul`` / ``_mul_bd``);
- contractions over a small leading axis (``Q_ux^T K``) unroll into per-row
  outer-product FMAs (``_t_dot``);
- the ``Q_uu`` gain solve is Gauss-Jordan without pivoting (SPD; same
  elimination as ops/ilqr.gauss_jordan_solve) with the pivot loop statically
  unrolled so every row access is a static slice (``_gj_solve``).

Value recursion uses the reference's full-form update with explicit
symmetrization (dpilqr/control.py:144-146) -- the algebraically-equal DDP
simplification ``V_x = Q_x + Q_ux^T d`` drifts from the XLA path in float32
(kappa(P) ~ 1e4 across 50 sequential steps) enough to flip borderline
line-search accepts; tests assert near-equivalence to the XLA path
(tests/test_pallas_batched.py).

Forward kernel layout: columns ``C = K * CS`` with ``CS = n_alpha * S`` and
``col = k * CS + alpha * S + s`` -- slot-major, so per-slot column blocks
are static lane slices.  Callers pad S so CS is a multiple of the 128-lane
tile, keeping every block boundary register-aligned (``pad_batch``).

VMEM: ``fits_vmem_batched`` bounds the working set; oversized batches
chunk over multiple launches (with cross-chunk retirement merging), and
shapes past every kernel's envelope fall back to the vmapped XLA scans.

Scheduling: converged/failed subproblems RETIRE mid-solve -- the batch
compacts into progressively smaller lane-aligned widths (staged
width-halving, device-side stable gather, no host sync), so late
iterations cost in proportion to the active count
(``solve_subproblems_batched``).

Width envelope: these statically-unrolled kernels compile up to
``K * nx_p = 32`` (UNROLLED_NXF_LIMIT); from 32 to WIDE_NXF_LIMIT the
blocked backward kernel (ops/pallas_batched_wide.py) takes over.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.fleet import Fleet
from ..models.vectorized import blended_f_smajor
from .costs import (
    GameCost,
    _pair_indices,
    assemble_pair_hessian,
    diag_embed,
    quadraticize_stage_compact,
    quadraticize_terminal_compact,
)


# Index maps must stay int32 end to end: under jax_enable_x64 a python-int
# literal promotes the arithmetic to int64, which Mosaic cannot legalize.
_I0 = np.int32(0)

# Widest flat state (K * nx_p) the statically-unrolled backward kernel's
# program compiles at (measured: 32 OK; 48 hangs the TPU compiler > 20 min).
# Past it the blocked kernel (pallas_batched_wide) takes over.
#
# WIDE_NXF_LIMIT is the CAPABILITY envelope: r4 pinned 48; the r5 envelope
# diagnosis (logs/wide_envelope_r5.json) showed every 48 < nxf <= 96
# failure was the DEFAULT 16 MB scoped-vmem flag, not compile time -- with
# the wide kernel's per-kernel vmem_limit_bytes raised
# (pallas_batched_wide.WIDE_VMEM_LIMIT_BYTES) Quad12D K=8 (nxf=96)
# compiles and runs on v5e.
#
# WIDE_NXF_AUTO_LIMIT is where AUTO resolution stops preferring the
# kernel: past 48 the blocked kernel's sequential K*nu_p-pivot elimination
# over K^2 blocks loses to the XLA scans by ~10x, and its float32
# accumulation on stiff Quad12D Hessians also costs iterations --
# measured at nxf=96 (logs/r5_wide96_crossover.log): 64 agents 28.3 ms /
# 64 iters XLA vs 295.2 ms / 382 iters Pallas; 16 agents 13.3 ms / 16
# iters XLA vs 264.3 ms / 107 iters Pallas.  Explicit
# sweep_backend="pallas" still routes 48 < nxf <= 96 through the wide
# kernel (correctness-tested at 96).
UNROLLED_NXF_LIMIT = 32
WIDE_NXF_LIMIT = 96
WIDE_NXF_AUTO_LIMIT = 48

# Scoped-VMEM ceiling requested from the Mosaic compiler for the batched
# kernels (same mechanism as pallas_batched_wide.WIDE_VMEM_LIMIT_BYTES):
# an upper bound, not an allocation -- chunk sizing still targets the
# 13 MB fits_vmem_batched budget below (wider single launches measured
# SLOWER, see its docstring); the raised ceiling protects shapes where
# the additive model under-counts the compiler's true footprint.
BATCHED_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _vspec(shape=None):
    """Full-array VMEM spec.  With a grid present, Pallas synthesizes a
    default index map returning python-int zeros, which become int64 under
    jax_enable_x64 and fail Mosaic legalization -- so when a shape is given
    we pin an explicit int32 zero map."""
    if shape is None:
        return pl.BlockSpec(memory_space=pltpu.VMEM)
    nd = len(shape)
    return pl.BlockSpec(
        tuple(shape), lambda t: (_I0,) * nd, memory_space=pltpu.VMEM
    )


def _tspec(shape):
    """BlockSpec streaming one leading-axis step per grid iteration."""
    nd = len(shape)
    return pl.BlockSpec(
        (1, *shape), lambda t: (t,) + (_I0,) * nd, memory_space=pltpu.VMEM
    )


def _tspec_rev(shape, N):
    """Reverse-time streaming BlockSpec (backward sweep runs t = N-1 .. 0)."""
    nd = len(shape)
    return pl.BlockSpec(
        (1, *shape),
        lambda t: (np.int32(N - 1) - t,) + (_I0,) * nd,
        memory_space=pltpu.VMEM,
    )


def fits_vmem_batched(
    N: int,
    K: int,
    nx_p: int,
    nu_p: int,
    S: int,
    n_alpha: int,
    n_branches: int = 1,
    dtype_bytes: int = 4,
    budget: int = 13 * 1024 * 1024,
    include_backward: bool = True,
) -> bool:
    """Conservative VMEM bound for the batched sweep kernels.

    The temp terms over-count (not all intermediates are live at once);
    the 13 MB budget against the 16 MB default scoped-vmem flag is
    calibrated so the largest verified configuration (250 agents / S=256,
    measured 97.9 ms = 10.2 Hz on v5e) resolves to the kernels while
    clearly-oversized problems fall back to the XLA scans.

    Measured negative (r5): raising this to 72 MB (with the kernels'
    scoped-vmem ceiling at BATCHED_VMEM_LIMIT_BYTES) so the 500-agent
    batch runs as ONE 512-lane launch per sweep instead of 2x256 chunks
    made the cold solve SLOWER -- 136.8/130.8 ms vs 119.2/112.1 ms at
    ls_probe 0/2 (logs/r5_single_launch_500.log) -- so the 13 MB chunk
    regime is also the fast one and stays.  The raised per-kernel
    ceiling itself is kept: it is an upper bound, not an allocation, and
    protects shapes where this additive model under-counts.

    ``include_backward=False`` drops the UNROLLED backward kernel's term:
    for wide shapes (K*nx_p > UNROLLED_NXF_LIMIT) the backward runs the
    blocked kernel instead, whose own model (``fits_vmem_wide``, raised
    scoped-vmem ceiling) must gate it -- scoring the unrolled kernel a
    wide batch never launches wrongly exiled Quad12D K=8 to XLA."""
    nxf, nuf = K * nx_p, K * nu_p
    npairs = max(K * (K - 1) // 2, 1)
    CS = n_alpha * S
    C = K * CS
    forward = (
        # streamed (x2 double buffer): Xr, Ur, dr, G + outputs Xo, Uo
        2 * (2 * nx_p * C + 3 * nu_p * C + nxf * nuf * S)
        # persistent consts: Q, R, Qf, xf, x0, masks, pair tables
        + (2 * nx_p * nx_p + nu_p * nu_p + 2 * nx_p + 4) * C
        + n_branches * C
        + npairs * 4 * CS
        # live temps (du tiles, rk4 stages, cost rows)
        + (2 * nuf + 10 * nx_p) * CS
    )
    backward = (
        # streamed x2: A, B, Luu, Lxx, Lx, Lu + outputs Kg, d
        2
        * (
            K * nx_p * (nx_p + nu_p)
            + K * nu_p * nu_p
            + nxf * nxf
            + nxf
            + 2 * nuf
            + nuf * nxf
        )
        * S
        # persistent: P, p
        + (nxf * nxf + nxf) * S
        # live temps: Preg, AtP, Qxx, W1, Qux, Quu, GJ state, t_dots
        + (5 * nxf * nxf + 3 * nuf * nxf + 2 * nuf * nuf) * S
    )
    if not include_backward:
        backward = 0
    return max(forward, backward) * dtype_bytes < budget


# ---------------------------------------------------------------------------
# In-kernel block-structured linear algebra (S on lanes).
# ---------------------------------------------------------------------------


def _bdT_vec(Xr2, v2, K, p, q):
    """``X_bd^T v`` for block-diagonal X with blocks ``X_k (p, q)``.

    ``Xr2: (K*p*q, S)`` rows ordered ``(k, b, j)`` holding ``X_k[b, j]``;
    ``v2: (K*p, S)``.  Returns ``(K*q, S)``.
    """
    blocks = []
    for k in range(K):
        acc = None
        for b in range(p):
            r0 = (k * p + b) * q
            term = Xr2[r0 : r0 + q, :] * v2[k * p + b : k * p + b + 1, :]
            acc = term if acc is None else acc + term
        blocks.append(acc)
    return jnp.concatenate(blocks, axis=0)


def _bdT_mul(Xr2, M3, K, p, q):
    """``X_bd^T M`` for block-diagonal X (blocks ``X_k (p, q)``) and dense
    ``M3 (K*p, C, S)``.  Returns ``(K*q, C, S)``."""
    blocks = []
    for k in range(K):
        acc = None
        for b in range(p):
            r0 = (k * p + b) * q
            term = Xr2[r0 : r0 + q, :][:, None, :] * M3[k * p + b][None, :, :]
            acc = term if acc is None else acc + term
        blocks.append(acc)
    return jnp.concatenate(blocks, axis=0)


def _mul_bd(M3, Xr2, K, p, q):
    """``M X_bd`` for dense ``M3 (R, K*p, S)`` and block-diagonal X
    (blocks ``X_k (p, q)``).  Returns ``(R, K*q, S)``."""
    blocks = []
    for k in range(K):
        acc = None
        for b in range(p):
            r0 = (k * p + b) * q
            mcol = M3[:, k * p + b : k * p + b + 1, :]  # (R, 1, S)
            term = mcol * Xr2[r0 : r0 + q, :][None, :, :]  # (R, q, S)
            acc = term if acc is None else acc + term
        blocks.append(acc)
    return jnp.concatenate(blocks, axis=1)


def _t_dot(M1, M2, V):
    """``M1^T M2`` over the leading axis: ``sum_v M1[v,i,s] M2[v,j,s]``.

    ``M1 (V, I, S)``, ``M2 (V, J, S)`` -> ``(I, J, S)``."""
    acc = None
    for v in range(V):
        term = M1[v][:, None, :] * M2[v][None, :, :]
        acc = term if acc is None else acc + term
    return acc


def _t_dot_vec(M1, w, V):
    """``sum_v M1[v, j, s] w[v, s]`` -> ``(J, S)``."""
    acc = None
    for v in range(V):
        term = M1[v] * w[v : v + 1, :]
        acc = term if acc is None else acc + term
    return acc


def _gj_solve(Quu, Qux, Qu, nuf):
    """Gauss-Jordan solve ``Quu [X | x] = [Qux | Qu]`` without pivoting.

    ``Quu (nuf, nuf, S)`` SPD, ``Qux (nuf, nxf, S)``, ``Qu (nuf, S)``.
    The pivot loop is statically unrolled: every row read is a static
    slice; pivot rows are restored with one-hot blends.  Same elimination
    order as ops/ilqr.gauss_jordan_solve (tests assert agreement)."""
    dtype = Quu.dtype
    rh3 = jax.lax.broadcasted_iota(jnp.int32, (nuf, 1, 1), 0)
    rh2 = jax.lax.broadcasted_iota(jnp.int32, (nuf, 1), 0)
    for kp in range(nuf):
        inv = 1.0 / Quu[kp][kp : kp + 1, :]  # (1, S)
        pivq = Quu[kp] * inv  # (nuf, S)
        pivx = Qux[kp] * inv  # (nxf, S)
        pivu = Qu[kp : kp + 1, :] * inv  # (1, S)
        colq3 = Quu[:, kp : kp + 1, :]  # (nuf, 1, S)
        colq2 = colq3[:, 0, :]  # (nuf, S)
        hot3 = (rh3 == kp).astype(dtype)
        hot2 = (rh2 == kp).astype(dtype)
        Quu = Quu - colq3 * pivq[None, :, :]
        Qux = Qux - colq3 * pivx[None, :, :]
        Qu = Qu - colq2 * pivu
        # Restore the pivot row (zeroed by its own elimination above).
        Quu = Quu * (1.0 - hot3) + hot3 * pivq[None, :, :]
        Qux = Qux * (1.0 - hot3) + hot3 * pivx[None, :, :]
        Qu = Qu * (1.0 - hot2) + hot2 * pivu
    return Qux, Qu


# ---------------------------------------------------------------------------
# Batched backward pass.
# ---------------------------------------------------------------------------


def _quadraticize_batch(cost_b: GameCost, X, U):
    """Time-batched quadraticization for a batch of subproblems.

    ``X (S, N+1, K, nx_p)``, ``U (S, N, K, nu_p)``; ``cost_b`` has a leading
    S axis on every leaf.  Returns flat-lanes arrays for the kernel plus the
    terminal value seed.
    """
    S, Np1, K, nx_p = X.shape
    N = Np1 - 1
    nu_p = U.shape[-1]
    nxf = K * nx_p

    def per_problem(c, Xp, Up):
        return jax.vmap(lambda x, u: quadraticize_stage_compact(c, x, u))(
            Xp[:-1], Up
        )

    L_x, L_u, L_xx_diag, L_uu, H = jax.vmap(per_problem)(cost_b, X, U)

    # Full state Hessian incl. proximity coupling (assembled here; the
    # kernel consumes it dense since the coupling is not block-diagonal).
    L_xx = jax.vmap(jax.vmap(diag_embed))(L_xx_diag)
    if K > 1:
        L_xx = L_xx + jax.vmap(
            jax.vmap(lambda h: assemble_pair_hessian(h, K, nx_p))
        )(H)

    def per_terminal(c, xT):
        L_xT, L_xxT_diag, HT = quadraticize_terminal_compact(c, xT)
        L_xxT = diag_embed(L_xxT_diag)
        if K > 1:
            L_xxT = L_xxT + assemble_pair_hessian(HT, K, nx_p)
        return L_xT, L_xxT

    L_xT, L_xxT = jax.vmap(per_terminal)(cost_b, X[:, -1])

    # L_uu block-diagonal embed happens HERE (XLA) rather than in-kernel:
    # assembling it from row slices at mixed sublane offsets trips Mosaic's
    # concat layout checks, and at (N, nuf, nuf, S) it is tiny in HBM.
    L_uu_bd = jax.vmap(jax.vmap(diag_embed))(L_uu)  # (S, N, K, nu_p, K, nu_p)
    out = dict(
        # (N, K*nx_p, S) etc.: time leading, S on lanes.
        L_x=L_x.reshape(S, N, nxf).transpose(1, 2, 0),
        L_u=L_u.reshape(S, N, K * nu_p).transpose(1, 2, 0),
        L_uu=L_uu_bd.reshape(S, N, K * nu_p, K * nu_p).transpose(1, 2, 3, 0),
        L_xx=L_xx.reshape(S, N, nxf, nxf).transpose(1, 2, 3, 0),
        p0=L_xT.reshape(S, nxf).transpose(1, 0),
        P0=L_xxT.reshape(S, nxf, nxf).transpose(1, 2, 0),
    )
    return out


def _linearize_batch(fleet: Fleet, cost_b: GameCost, mids_s, X, U):
    """Batched discretized Jacobians in flat-lanes layout.

    Returns ``A (N, K*nx_p*nx_p, S)`` rows (k, b, a) and
    ``B (N, K*nx_p*nu_p, S)`` rows (k, b, j); padded slots get B = 0
    (decoupling, see ops/ilqr._backward_pass).
    """
    S, Np1, K, nx_p = X.shape
    N = Np1 - 1
    nu_p = U.shape[-1]

    def per_problem(m, Xp, Up):
        return jax.vmap(lambda x, u: fleet.linearize_dyn(m, x, u))(Xp[:-1], Up)

    A, B = jax.vmap(per_problem)(mids_s, X, U)  # (S, N, K, nx_p, nx_p/nu_p)
    B = B * cost_b.agent_mask[:, None, :, None, None]
    A = A.reshape(S, N, K * nx_p * nx_p).transpose(1, 2, 0)
    B = B.reshape(S, N, K * nx_p * nu_p).transpose(1, 2, 0)
    return A, B


def backward_pass_batched(
    fleet: Fleet,
    cost_b: GameCost,
    mids_s,
    X,
    U,
    mu,
    interpret: bool = False,
):
    """Batched fused Riccati sweep (reference control.py:116-148).

    ``X (S, N+1, K, nx_p)``, ``U (S, N, K, nu_p)``, ``mu (S,)``.
    Returns ``Kg (N, nuf, nxf, S)`` and ``d (N, nuf, S)`` (kernel-native
    layout; see forward_pass_batched which consumes them directly).
    """
    S, Np1, K, nx_p = X.shape
    N = Np1 - 1
    nu_p = U.shape[-1]
    nxf, nuf = K * nx_p, K * nu_p
    dtype = X.dtype

    q = _quadraticize_batch(cost_b, X, U)
    A, B = _linearize_batch(fleet, cost_b, mids_s, X, U)
    mu3 = jnp.asarray(mu, dtype).reshape(1, 1, S)

    def kernel(
        A_ref, B_ref, Luu_ref, Lxx_ref, Lx_ref, Lu_ref, mu_ref, p0_ref,
        P0_ref, Kg_ref, d_ref, p_s, P_s,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            p_s[:] = p0_ref[:]
            P_s[:] = P0_ref[:]

        p = p_s[:]  # (nxf, S)
        P = P_s[:]  # (nxf, nxf, S)
        A2 = A_ref[0]  # (K*nx_p*nx_p, S)
        B2 = B_ref[0]  # (K*nx_p*nu_p, S)

        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (nxf, nxf, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (nxf, nxf, 1), 1)
        ).astype(dtype)
        Preg = P + mu_ref[:] * eye

        Q_x = Lx_ref[0] + _bdT_vec(A2, p, K, nx_p, nx_p)  # (nxf, S)
        Q_u = Lu_ref[0] + _bdT_vec(B2, p, K, nx_p, nu_p)  # (nuf, S)

        AtP = _bdT_mul(A2, P, K, nx_p, nx_p)  # (nxf, nxf, S)
        Q_xx = Lxx_ref[0] + _mul_bd(AtP, A2, K, nx_p, nx_p)

        W1 = _bdT_mul(B2, Preg, K, nx_p, nu_p)  # B^T Preg (nuf, nxf, S)
        Q_ux = _mul_bd(W1, A2, K, nx_p, nx_p)  # (nuf, nxf, S)

        Q_uu = _mul_bd(W1, B2, K, nx_p, nu_p) + Luu_ref[0]

        sol_K, sol_d = _gj_solve(Q_uu, Q_ux, Q_u, nuf)
        K_t = -sol_K  # (nuf, nxf, S)
        d_t = -sol_d  # (nuf, S)
        Kg_ref[0] = K_t
        d_ref[0] = d_t

        # Full-form value update exactly as the reference / XLA path
        # (control.py:144-146): the DDP-simplified form (Q_x + Q_ux^T d)
        # is algebraically equal but loses the float32 Q_uu d + Q_u
        # correction -- MEASURED to collapse convergence at scale (14% vs
        # 100% converged at 500 agents), so no fast-update mode exists.
        w = _t_dot_vec(Q_uu, d_t, nuf) + Q_u  # Q_uu d + Q_u (symmetry)
        p_s[:] = Q_x + _t_dot_vec(K_t, w, nuf) + _t_dot_vec(Q_ux, d_t, nuf)
        QuuK = _t_dot(Q_uu, K_t, nuf)  # Q_uu K (symmetric Q_uu)
        # Q_ux^T K is the elementwise transpose of K^T Q_ux (same
        # products, same v-accumulation order -> bitwise equal), so
        # compute the 2*nuf*nxf^2 contraction once and transpose --
        # ~20% fewer backward-kernel FLOPs at K=8/nx=4.
        KtQux = _t_dot(K_t, Q_ux, nuf)  # K^T Q_ux
        P_new = (
            Q_xx
            + _t_dot(K_t, QuuK, nuf)  # K^T Q_uu K
            + KtQux
            + jnp.transpose(KtQux, (1, 0, 2))  # Q_ux^T K
        )
        P_s[:] = 0.5 * (P_new + jnp.transpose(P_new, (1, 0, 2)))

    Kg, d = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            _tspec_rev((K * nx_p * nx_p, S), N),
            _tspec_rev((K * nx_p * nu_p, S), N),
            _tspec_rev((nuf, nuf, S), N),
            _tspec_rev((nxf, nxf, S), N),
            _tspec_rev((nxf, S), N),
            _tspec_rev((nuf, S), N),
            _vspec((1, 1, S)),  # mu
            _vspec((nxf, S)),  # p0
            _vspec((nxf, nxf, S)),  # P0
        ],
        out_specs=(
            _tspec_rev((nuf, nxf, S), N),
            _tspec_rev((nuf, S), N),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, nuf, nxf, S), dtype),
            jax.ShapeDtypeStruct((N, nuf, S), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((nxf, S), dtype),
            pltpu.VMEM((nxf, nxf, S), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=BATCHED_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(A, B, q["L_uu"], q["L_xx"], q["L_x"], q["L_u"], mu3, q["p0"], q["P0"])
    return Kg, d


# ---------------------------------------------------------------------------
# Batched forward pass (line search over all alphas, all subproblems).
# ---------------------------------------------------------------------------


def _tile_CS(arr_S_last, n_alpha):
    """Tile an (..., S) array over alphas -> (..., n_alpha * S), alpha-major
    within the new axis (col = alpha * S + s)."""
    shape = arr_S_last.shape
    out = jnp.broadcast_to(
        arr_S_last[..., None, :], (*shape[:-1], n_alpha, shape[-1])
    )
    return out.reshape(*shape[:-1], n_alpha * shape[-1])


def _tile_C(arr_SK, n_alpha):
    """(..., K, S) -> (..., K * n_alpha * S) with col = k*CS + a*S + s."""
    shape = arr_SK.shape
    K, S = shape[-2], shape[-1]
    out = jnp.broadcast_to(
        arr_SK[..., :, None, :], (*shape[:-2], K, n_alpha, S)
    )
    return out.reshape(*shape[:-2], K * n_alpha * S)


def forward_pass_batched(
    fleet: Fleet,
    cost_b: GameCost,
    branch_row,
    X,
    U,
    Kg,
    d,
    alphas,
    interpret: bool = False,
):
    """Batched fused closed-loop forward sweep (control.py:95-114).

    ``X (S, N+1, K, nx_p)``, ``U (S, N, K, nu_p)`` nominal trajectory;
    ``Kg (N, nuf, nxf, S)``, ``d (N, nuf, S)`` from backward_pass_batched
    (pass None for a plain rollout of U); ``alphas (n_alpha,)``;
    ``branch_row (n_branches, C)`` per-column model-dispatch masks (None for
    a homogeneous fleet).

    Returns ``X5 (N, nx_p, K, n_alpha, S)`` (states 1..N), ``U5``-alike
    ``(N, nu_p, K, n_alpha, S)`` and ``J (n_alpha, S)``.
    """
    S, Np1, K, nx_p = X.shape
    N = Np1 - 1
    nu_p = U.shape[-1]
    nxf, nuf = K * nx_p, K * nu_p
    dtype = X.dtype
    n_alpha = int(alphas.shape[0])
    CS = n_alpha * S
    C = K * CS
    has_gains = Kg is not None
    has_pairs = K > 1
    npairs = K * (K - 1) // 2 if has_pairs else 0

    # Mixed RK4 schedules: run max(substeps) in-kernel with a PER-COLUMN
    # step size table.  A column whose model uses fewer substeps gets
    # dh = dt/s_m for its first s_m substeps and EXACTLY 0.0 afterwards:
    # ``x + 0 * (...) = x`` bitwise, so its discrete map is the model's
    # own s_m-substep RK4 (the masked stages burn VPU cycles but change
    # nothing).  For uniform fleets every column gets the same constant
    # rows and results are identical to the scalar-dh kernel.
    substeps_list = [s.rk4_substeps for s in fleet.specs]
    substeps = max(substeps_list) if substeps_list else 1
    dt = fleet.dt
    fleet_f = blended_f_smajor(fleet.specs, nx_p)
    mixed = branch_row is not None

    # --- XLA-side layout prep -------------------------------------------
    Xsl = X.transpose(1, 3, 2, 0)  # (N+1, nx_p, K, S)
    Usl = U.transpose(1, 3, 2, 0)  # (N, nu_p, K, S)
    Xr = _tile_C(Xsl[:-1], n_alpha)  # (N, nx_p, C)
    Ur = _tile_C(Usl, n_alpha)  # (N, nu_p, C)
    x0t = _tile_C(Xsl[0], n_alpha)  # (nx_p, C)

    cost_b = jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        cost_b,
    )
    xfT = _tile_C(cost_b.xf.transpose(2, 1, 0), n_alpha)  # (nx_p, C)
    QT = _tile_C(cost_b.Q.transpose(2, 3, 1, 0), n_alpha)  # (nx_p, nx_p, C)
    RT = _tile_C(cost_b.R.transpose(2, 3, 1, 0), n_alpha)
    QfT = _tile_C(cost_b.Qf.transpose(2, 3, 1, 0), n_alpha)
    mrow = _tile_C(cost_b.agent_mask.transpose(1, 0), n_alpha)[None]  # (1, C)
    refw = jnp.broadcast_to(jnp.asarray(cost_b.ref_weight, dtype), (S,))
    refw_row = _tile_C(jnp.broadcast_to(refw, (K, S)), n_alpha)[None]
    radius_row = _tile_CS(
        jnp.broadcast_to(jnp.asarray(cost_b.radius, dtype), (S,)), n_alpha
    )[None]  # (1, CS)
    proxw_row = _tile_CS(
        jnp.broadcast_to(jnp.asarray(cost_b.prox_weight, dtype), (S,)),
        n_alpha,
    )[None]
    a_rowC = jnp.broadcast_to(
        jnp.asarray(alphas, dtype)[None, :, None], (K, n_alpha, S)
    ).reshape(1, C)

    if has_pairs:
        ii, jj = _pair_indices(K)
        am = cost_b.agent_mask  # (S, K)
        pairmask = _tile_CS(
            (am[:, ii] * am[:, jj]).transpose(1, 0), n_alpha
        )  # (npairs, CS)
        # Evaluation dims (parity mode's n_pos_eval; derivatives keep n_pos
        # and flow through the XLA quadraticize phase).
        npos = cost_b.n_pos_eval.astype(dtype)  # (S, K)
        nd_pair = jnp.minimum(npos[:, ii], npos[:, jj])  # (S, npairs)
        comp = (
            jnp.arange(3, dtype=dtype)[None, None, :] < nd_pair[:, :, None]
        ).astype(dtype)  # (S, npairs, 3)
        paircomp = _tile_CS(comp.transpose(1, 2, 0), n_alpha)  # (npairs,3,CS)
    else:
        pairmask = jnp.zeros((1, CS), dtype)
        paircomp = jnp.zeros((1, 3, CS), dtype)

    if has_gains:
        G = Kg.transpose(0, 2, 1, 3)  # (N, nxf, nuf, S)
        dr = _tile_C(
            d.reshape(N, K, nu_p, S).transpose(0, 2, 1, 3), n_alpha
        )  # (N, nu_p, C)
    else:
        G = jnp.zeros((N, 1, 1, S), dtype)
        dr = jnp.zeros((N, 1, 1), dtype)

    kpos = min(3, nx_p)

    def kernel(*refs):
        i = 0
        Xr_ref = refs[i]; i += 1
        Ur_ref = refs[i]; i += 1
        G_ref = refs[i]; i += 1
        dr_ref = refs[i]; i += 1
        x0_ref = refs[i]; i += 1
        a_ref = refs[i]; i += 1
        xf_ref = refs[i]; i += 1
        Q_ref = refs[i]; i += 1
        R_ref = refs[i]; i += 1
        Qf_ref = refs[i]; i += 1
        m_ref = refs[i]; i += 1
        refw_ref = refs[i]; i += 1
        rad_ref = refs[i]; i += 1
        proxw_ref = refs[i]; i += 1
        pm_ref = refs[i]; i += 1
        pc_ref = refs[i]; i += 1
        ex_ref = refs[i]; i += 1
        dh_ref = refs[i]; i += 1
        if mixed:
            bm_ref = refs[i]; i += 1
        Xo_ref = refs[i]; i += 1
        Uo_ref = refs[i]; i += 1
        Jo_ref = refs[i]; i += 1
        x_s = refs[i]; i += 1
        J_s = refs[i]; i += 1

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            x_s[:] = x0_ref[:]
            J_s[:] = jnp.zeros_like(J_s)

        x = x_s[:]  # (nx_p, C)
        mk = m_ref[:]
        xfk = xf_ref[:]
        radius = rad_ref[:]
        branch_masks = bm_ref[:] if mixed else None

        def quadform(Mk, v):
            acc = jnp.zeros((1, C), dtype)
            for b in range(Mk.shape[0]):
                Mv_b = jnp.sum(Mk[b] * v, axis=0, keepdims=True)
                acc = acc + v[b : b + 1, :] * Mv_b
            return acc

        def reduce_slots(rows):  # (1, C) -> (1, CS)
            acc = rows[:, :CS]
            for k in range(1, K):
                acc = acc + rows[:, k * CS : (k + 1) * CS]
            return acc

        def prox_cols(xk):  # (nx_p, C) -> (1, CS)
            acc = jnp.zeros((1, CS), dtype)
            for p_idx in range(npairs):
                k1, k2 = int(ii[p_idx]), int(jj[p_idx])
                compp = pc_ref[p_idx]  # (3, CS)
                dd2 = jnp.zeros((1, CS), dtype)
                for c in range(kpos):
                    dc = (
                        xk[c : c + 1, k1 * CS : (k1 + 1) * CS]
                        - xk[c : c + 1, k2 * CS : (k2 + 1) * CS]
                    ) * compp[c : c + 1, :]
                    dd2 = dd2 + dc * dc
                dist = jnp.sqrt(dd2)
                active = (dist < radius).astype(dtype)
                pen = jnp.minimum(0.0, dist - radius) ** 2
                acc = acc + pm_ref[p_idx : p_idx + 1, :] * active * pen
            return acc

        def stage_cost(xk, uk):
            e = xk - xfk
            rows = refw_ref[:] * mk * (quadform(Q_ref[:], e) + quadform(R_ref[:], uk))
            rows = rows + (1.0 - mk) * jnp.sum(uk * uk, axis=0, keepdims=True)
            J = reduce_slots(rows)
            if has_pairs:
                J = J + proxw_ref[:] * prox_cols(xk)
            return J

        def terminal_cost(xk):
            rows = refw_ref[:] * mk * quadform(Qf_ref[:], xk - xfk)
            J = reduce_slots(rows)
            if has_pairs:
                J = J + proxw_ref[:] * prox_cols(xk)
            return J

        if has_gains:
            dx = x - Xr_ref[0]
            G3 = G_ref[0]  # (nxf, nuf, S)
            du = jnp.zeros((nuf, CS), dtype)
            for kp in range(K):
                dxk = dx[:, kp * CS : (kp + 1) * CS]  # (nx_p, CS)
                for a in range(nx_p):
                    coeff = G3[kp * nx_p + a]  # (nuf, S)
                    coeffT = jnp.concatenate([coeff] * n_alpha, axis=1)
                    du = du + coeffT * dxk[a : a + 1, :]
            # (K*nu_p, CS) -> (nu_p, K*CS): row extraction via exact 0/1
            # matmuls -- lane-concat of raw row slices would mix sublane
            # offsets, which Mosaic's concat cannot relayout.
            du_cols = jnp.concatenate(
                [
                    jnp.dot(
                        ex_ref[k], du,
                        preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    for k in range(K)
                ],
                axis=1,
            )  # (nu_p, C)
            u = Ur_ref[0] + du_cols + a_ref[:] * dr_ref[0]
        else:
            u = Ur_ref[0]

        J_s[:] = J_s[:] + stage_cost(x, u)
        Uo_ref[0] = u

        for i_sub in range(substeps):
            dh = dh_ref[i_sub : i_sub + 1, :]  # (1, C) per-column step
            k0 = fleet_f(x, u, branch_masks)
            k1 = fleet_f(x + 0.5 * dh * k0, u, branch_masks)
            k2 = fleet_f(x + 0.5 * dh * k1, u, branch_masks)
            k3 = fleet_f(x + dh * k2, u, branch_masks)
            x = x + dh * (k0 + 2.0 * k1 + 2.0 * k2 + k3) / 6.0
        Xo_ref[0] = x
        x_s[:] = x

        @pl.when(t == N - 1)
        def _():
            Jo_ref[:] = J_s[:] + terminal_cost(x)

    # Row-extraction selectors for the du scatter: E[k] (nu_p, nuf) picks
    # slot k's control rows (exact under HIGHEST precision).
    ex_np = np.zeros((K, nu_p, nuf), np.float64)
    for k_ in range(K):
        ex_np[k_, np.arange(nu_p), k_ * nu_p + np.arange(nu_p)] = 1.0
    ex = jnp.asarray(ex_np, dtype)
    # Per-column RK4 step-size table (mixed-substeps support, see above):
    # dh_table[i, b] = dt / s_b for substep i < s_b of branch b, else 0.
    uniq = fleet._unique_specs if fleet.n_agents else ()
    dh_np = np.zeros((substeps, max(len(uniq), 1)))
    for b, spec in enumerate(uniq):
        dh_np[: spec.rk4_substeps, b] = dt / spec.rk4_substeps
    if mixed:
        dh_rows = jnp.einsum(
            "ib,bC->iC", jnp.asarray(dh_np, dtype),
            jnp.asarray(branch_row, dtype),
        )
    else:
        dh_rows = jnp.broadcast_to(
            jnp.asarray(dh_np[:, :1], dtype), (substeps, C)
        )
    ins = [Xr, Ur, G, dr, x0t, a_rowC, xfT, QT, RT, QfT, mrow, refw_row,
           radius_row, proxw_row, pairmask, paircomp, ex, dh_rows]
    if mixed:
        ins.append(jnp.asarray(branch_row, dtype))
    in_specs = [
        _tspec((nx_p, C)),
        _tspec((nu_p, C)),
        _tspec(tuple(G.shape[1:])),
        _tspec(tuple(dr.shape[1:])),
    ] + [_vspec(tuple(a.shape)) for a in ins[4:]]

    Xo, Uo, Jo = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=in_specs,
        out_specs=(
            _tspec((nx_p, C)),
            _tspec((nu_p, C)),
            _vspec((1, CS)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, nx_p, C), dtype),
            jax.ShapeDtypeStruct((N, nu_p, C), dtype),
            jax.ShapeDtypeStruct((1, CS), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((nx_p, C), dtype),
            pltpu.VMEM((1, CS), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=BATCHED_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*ins)

    X5 = Xo.reshape(N, nx_p, K, n_alpha, S)
    U5 = Uo.reshape(N, nu_p, K, n_alpha, S)
    J = Jo.reshape(n_alpha, S)
    return X5, U5, J


def select_alpha(X5, U5, x0_sl, a_idx):
    """Pick each subproblem's accepted line-search candidate.

    ``X5 (N, nx_p, K, n_alpha, S)``, ``a_idx (S,)`` -> rows-layout
    trajectories ``X (S, N+1, K, nx_p)``, ``U (S, N, K, nu_p)``;
    ``x0_sl (S, K, nx_p)`` is prepended as the (unchanged) initial state.
    """
    idx = a_idx[None, None, None, None, :]
    Xsel = jnp.take_along_axis(X5, idx, axis=3)[:, :, :, 0, :]
    Usel = jnp.take_along_axis(U5, idx, axis=3)[:, :, :, 0, :]
    X = Xsel.transpose(3, 0, 2, 1)  # (S, N, K, nx_p)
    U = Usel.transpose(3, 0, 2, 1)
    return jnp.concatenate([x0_sl[:, None], X], axis=1), U


# ---------------------------------------------------------------------------
# Batched iLQR solve driver.
# ---------------------------------------------------------------------------


from typing import NamedTuple

from ..config import SolverConfig
from .ilqr import SolveResult, line_search_alphas


class _BatchCarry(NamedTuple):
    X: jnp.ndarray  # (S, N+1, K, nx_p)
    U: jnp.ndarray  # (S, N, K, nu_p)
    J: jnp.ndarray  # (S,)
    mu: jnp.ndarray  # (S,)
    delta: jnp.ndarray  # (S,)
    i: jnp.ndarray  # (S,) int32
    converged: jnp.ndarray  # (S,) bool
    failed: jnp.ndarray  # (S,) bool
    active: jnp.ndarray  # (S,) bool


def _pad_unit(n_alpha: int) -> int:
    """Lane-alignment unit for the batch axis: both the n_alpha-column
    line-search kernel and the 2-column rollout kernel must tile to 128."""
    unit_ls = 128 // int(np.gcd(n_alpha, 128))
    return int(np.lcm(unit_ls, 64))


def _branch_row(fleet: Fleet, mids_s, n_alpha: int, dtype):
    """Per-column model-dispatch masks ``(n_branches, K * n_alpha * S)``
    from the traced per-slot branch indices ``mids_s (S, K)``."""
    n_br = int(np.max(fleet.branch_index_array)) + 1 if fleet.n_agents else 1
    if n_br <= 1:
        return None
    oh = jax.nn.one_hot(mids_s, n_br, dtype=dtype)  # (S, K, n_br)
    return _tile_C(oh.transpose(2, 1, 0), n_alpha)  # (n_br, C)


def pad_batch(
    cfg: SolverConfig, sub_cost, x0_s, U0_s, mids_s, enabled, target=None
):
    """Pad the subproblem axis to the kernel lane-alignment unit (or to an
    explicit ``target`` size, itself a multiple of the unit).

    Padded subproblems have agent_mask 0 on every slot (fully decoupled:
    identity control Hessian via the padded-slot stabilizer, ops/costs.py)
    and ``enabled=False`` so the solve loop freezes them from the start.
    Returns the padded pieces plus the original batch size.
    """
    S0 = x0_s.shape[0]
    unit = _pad_unit(cfg.n_ls_iter)
    S = int(-(-S0 // unit) * unit) if target is None else int(target)
    enabled = jnp.asarray(enabled, bool)
    if S == S0:
        return sub_cost, x0_s, U0_s, mids_s, enabled, S0
    pad = S - S0

    def pad0(a):
        fill = jnp.zeros((pad, *a.shape[1:]), a.dtype)
        return jnp.concatenate([a, fill], axis=0)

    return (
        jax.tree.map(pad0, sub_cost),
        pad0(x0_s),
        pad0(U0_s),
        pad0(mids_s),
        jnp.concatenate([enabled, jnp.zeros((pad,), bool)]),
        S0,
    )


def init_batch_carry(
    fleet: Fleet,
    cfg: SolverConfig,
    sub_cost: GameCost,
    x0_s,
    U0_s,
    mids_s,
    enabled,
    interpret: bool = False,
) -> _BatchCarry:
    """Initial rollout of the warm start (control.py:80-93) + carry setup.

    Inputs must already be padded (``pad_batch``).  The rollout runs through
    the forward kernel with zero gains; 2 duplicate alphas keep the lane
    alignment of ``_pad_unit``.
    """
    dtype = x0_s.dtype
    S, K, nx_p = x0_s.shape
    N = U0_s.shape[1]
    branch_row2 = _branch_row(fleet, mids_s, 2, dtype)
    X0full = jnp.broadcast_to(x0_s[:, None], (S, N + 1, K, nx_p)).astype(dtype)
    X5r, U5r, J2 = forward_pass_batched(
        fleet, sub_cost, branch_row2, X0full, U0_s, None, None,
        jnp.zeros((2,), dtype), interpret=interpret,
    )
    Xr, Ur = select_alpha(X5r, U5r, x0_s, jnp.zeros((S,), jnp.int32))
    active0 = jnp.asarray(enabled, bool) & (cfg.n_lqr_iter > 0)
    return _BatchCarry(
        X=Xr,
        U=Ur,
        J=J2[0],
        mu=jnp.full((S,), cfg.mu_init, dtype),
        delta=jnp.full((S,), cfg.delta_0, dtype),
        i=jnp.zeros((S,), jnp.int32),
        converged=jnp.zeros((S,), bool),
        failed=jnp.zeros((S,), bool),
        active=active0,
    )


def batched_iteration(
    fleet: Fleet,
    cfg: SolverConfig,
    sub_cost: GameCost,
    mids_s,
    x0_s,
    carry: _BatchCarry,
    interpret: bool = False,
) -> _BatchCarry:
    """One iLQR iteration over the whole padded batch: fused backward +
    line-search sweeps, per-subproblem accept / regularization / convergence
    (reference control.py:150-226), with inactive subproblems frozen --
    elementwise identical to the per-problem while_loop.
    """
    dtype = x0_s.dtype
    c = carry
    n_alpha = cfg.n_ls_iter
    alphas = jnp.asarray(line_search_alphas(n_alpha, dtype))

    if x0_s.shape[1] * fleet.nx_p > UNROLLED_NXF_LIMIT:
        # Wide subproblems: the statically-unrolled kernel's program does
        # not compile past nxf=32; the blocked kernel (same arithmetic,
        # O(nx_p + nuf) program size) takes over (pallas_batched_wide).
        from .pallas_batched_wide import backward_pass_batched_wide

        Kg, dv = backward_pass_batched_wide(
            fleet, sub_cost, mids_s, c.X, c.U, c.mu, interpret=interpret
        )
    else:
        Kg, dv = backward_pass_batched(
            fleet, sub_cost, mids_s, c.X, c.U, c.mu, interpret=interpret
        )

    # Two-stage line search (SolverConfig.ls_probe): evaluate the first p
    # alphas; the remaining n_alpha - p launch only when some ACTIVE lane
    # improved at none of them.  First-improving-alpha selection makes the
    # accept decision identical to the monolithic sweep; cold/converging
    # iterations (the majority) pay ~p/n_alpha of the forward launch.
    p = cfg.ls_probe
    S = x0_s.shape[0]
    stage = (
        0 < p < n_alpha
        and (p * S) % 128 == 0
        and ((n_alpha - p) * S) % 128 == 0
    )
    if stage:
        N = c.U.shape[1]
        K, nx_p = x0_s.shape[1], fleet.nx_p
        nu_p = fleet.nu_p
        br_a = _branch_row(fleet, mids_s, p, dtype)
        X5a, U5a, J_a = forward_pass_batched(
            fleet, sub_cost, br_a, c.X, c.U, Kg, dv, alphas[:p],
            interpret=interpret,
        )
        need_tail = jnp.any(
            c.active & ~jnp.any(J_a < c.J[None, :], axis=0)
        )
        br_b = _branch_row(fleet, mids_s, n_alpha - p, dtype)

        def tail(_):
            return forward_pass_batched(
                fleet, sub_cost, br_b, c.X, c.U, Kg, dv, alphas[p:],
                interpret=interpret,
            )

        def skip(_):
            # Never selected: every active lane improves at an index < p,
            # and argmax picks the FIRST improving index.  inf keeps the
            # tail's `improved` entries False.
            return (
                jnp.zeros((N, nx_p, K, n_alpha - p, S), dtype),
                jnp.zeros((N, nu_p, K, n_alpha - p, S), dtype),
                jnp.full((n_alpha - p, S), jnp.inf, dtype),
            )

        X5b, U5b, J_b = jax.lax.cond(need_tail, tail, skip, None)
        X5 = jnp.concatenate([X5a, X5b], axis=3)
        U5 = jnp.concatenate([U5a, U5b], axis=3)
        J_c = jnp.concatenate([J_a, J_b], axis=0)
    else:
        branch_row = _branch_row(fleet, mids_s, n_alpha, dtype)
        X5, U5, J_c = forward_pass_batched(
            fleet, sub_cost, branch_row, c.X, c.U, Kg, dv, alphas,
            interpret=interpret,
        )
    improved = J_c < c.J[None, :]  # (n_alpha, S)
    accept = jnp.any(improved, axis=0)
    a_idx = jnp.argmax(improved, axis=0).astype(jnp.int32)
    Xn, Un = select_alpha(X5, U5, x0_s, a_idx)
    Jn = jnp.take_along_axis(J_c, a_idx[None], axis=0)[0]

    upd = c.active & accept
    X = jnp.where(upd[:, None, None, None], Xn, c.X)
    U = jnp.where(upd[:, None, None, None], Un, c.U)
    J = jnp.where(upd, Jn, c.J)

    rel = jnp.abs(
        (c.J - Jn) / jnp.maximum(jnp.abs(c.J), jnp.finfo(dtype).tiny)
    )
    converged_now = upd & (rel < cfg.tol)
    failed_now = c.active & ~accept

    # Regularization decrease on acceptance (control.py:232-237); with
    # cfg.mu_floor, mu bottoms out at mu_min instead of snapping to 0
    # (conditioning guard; see SolverConfig.mu_floor).
    delta_dec = jnp.minimum(1.0, c.delta) / cfg.delta_0
    mu_dec = c.mu * delta_dec
    mu_lo = cfg.mu_min if cfg.mu_floor else 0.0
    mu_dec = jnp.where(mu_dec <= cfg.mu_min, mu_lo, mu_dec)
    if cfg.on_failed_ls == "increase":
        # The reference's (dead) mu-increase path (control.py:198-208),
        # per subproblem: keep iterating on failure, abort at mu_max.
        delta_inc = jnp.maximum(1.0, c.delta) * cfg.delta_0
        mu_inc = jnp.maximum(cfg.mu_min, c.mu * delta_inc)
        mu = jnp.where(upd, mu_dec, jnp.where(c.active, mu_inc, c.mu))
        delta = jnp.where(
            upd, delta_dec, jnp.where(c.active, delta_inc, c.delta)
        )
        failed_now = failed_now & (mu_inc >= cfg.mu_max)
    else:
        mu = jnp.where(upd, mu_dec, c.mu)
        delta = jnp.where(upd, delta_dec, c.delta)

    i = c.i + c.active.astype(jnp.int32)
    converged = c.converged | converged_now
    failed = c.failed | failed_now
    active = c.active & ~converged_now & ~failed_now & (i < cfg.n_lqr_iter)
    return _BatchCarry(X, U, J, mu, delta, i, converged, failed, active)


def _carry_result(out: _BatchCarry, S0: int) -> SolveResult:
    return SolveResult(
        X=out.X[:S0],
        U=out.U[:S0],
        J=out.J[:S0],
        iters=out.i[:S0],
        converged=out.converged[:S0],
        failed_line_search=out.failed[:S0],
    )


def _next_width(w: int, unit: int) -> int:
    """Next (smaller) compaction width: roughly half, kept lane-aligned.
    Returns ``w`` itself when no smaller aligned width exists."""
    nw = -(-(w // 2) // unit) * unit
    return nw if 0 < nw < w else w


def compaction_widths(S: int, unit: int) -> list[int]:
    """The halving width schedule ``[S, ~S/2, ..., unit]`` used by the
    staged solve (exposed for tests / SOL accounting)."""
    widths = [S]
    while (nw := _next_width(widths[-1], unit)) != widths[-1]:
        widths.append(nw)
    return widths


def solve_subproblems_batched(
    fleet: Fleet,
    cfg: SolverConfig,
    sub_cost: GameCost,
    x0_s,
    U0_s,
    mids_s,
    enabled,
    interpret: bool = False,
) -> SolveResult:
    """Batched iLQR over the subproblem axis using the fused Pallas sweeps.

    Drop-in replacement for the vmapped-XLA ``_solve_subproblem_batch``
    (parallel/distributed.py): same per-subproblem accept / regularization /
    convergence semantics as ``ops.ilqr.solve_core`` (reference
    control.py:150-226), applied elementwise over subproblems with masked
    freezing -- identical results to the per-problem while_loop
    (tests/test_pallas_batched.py asserts parity).

    Converged/failed subproblems RETIRE: whenever the number of still-active
    subproblems fits a smaller lane-aligned batch, the actives are compacted
    (device-side stable gather, no host sync) into that width and iteration
    continues there, so late iterations pay kernel cost proportional to the
    active count instead of the full batch -- the batched equivalent of the
    reference's sequential loop spending on each subproblem only the
    iterations *it* needs (dpilqr/distributed.py:56-77).  Each subproblem's
    iteration sequence is lane-independent, so results are bit-identical to
    the lockstep loop (tests/test_pallas_batched.py::test_staged_compaction).

    ``x0_s (S, K, nx_p)``, ``U0_s (S, N, K, nu_p)``, ``mids_s (S, K)``
    int32 branch indices, ``enabled (S,)`` bool.
    """
    dtype = x0_s.dtype
    sub_cost = jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        sub_cost,
    )

    S0 = x0_s.shape[0]
    N = U0_s.shape[1]
    K, nx_p, nu_p = x0_s.shape[1], fleet.nx_p, fleet.nu_p
    n_br = int(np.max(fleet.branch_index_array)) + 1 if fleet.n_agents else 1
    unit = _pad_unit(cfg.n_ls_iter)
    S_pad = int(-(-S0 // unit) * unit)

    def staged_loop(c, data, out, idx_map):
        """Width-halving retirement loop: iterate, commit finished lanes
        into ``out`` (via ``idx_map``), compact actives, repeat."""
        w = c.active.shape[0]
        while True:

            def body(ci, data=data):
                return batched_iteration(
                    fleet, cfg, data[0], data[1], data[2], ci, interpret
                )

            nw = _next_width(w, unit)
            if nw == w:
                c = jax.lax.while_loop(lambda ci: jnp.any(ci.active), body, c)
                out = jax.tree.map(
                    lambda o, s: o.at[idx_map].set(s), out, c
                )
                break
            # Iterate at this width only while the active set does not fit
            # the next width; then retire finished lanes and shrink.
            c = jax.lax.while_loop(
                lambda ci: jnp.any(ci.active)
                & (jnp.sum(ci.active) > nw),
                body,
                c,
            )
            out = jax.tree.map(lambda o, s: o.at[idx_map].set(s), out, c)
            # Stable active-first permutation; take the first nw lanes.
            perm = jnp.argsort(~c.active)[:nw]
            c = jax.tree.map(lambda a: a[perm], c)
            data = jax.tree.map(lambda a: a[perm], data)
            idx_map = idx_map[perm]
            w = nw
        return out

    def solve_chunk(cost_c, x0_c, U0_c, mids_c, en_c):
        S = x0_c.shape[0]
        c = init_batch_carry(
            fleet, cfg, cost_c, x0_c, U0_c, mids_c, en_c, interpret
        )
        return staged_loop(
            c,
            (cost_c, mids_c, x0_c),
            c,
            jnp.arange(S, dtype=jnp.int32),
        )

    if fits_vmem_dispatch(cfg, N, K, nx_p, nu_p, S_pad, n_br):
        sub_cost, x0_s, U0_s, mids_s, enabled, S0 = pad_batch(
            cfg, sub_cost, x0_s, U0_s, mids_s, enabled
        )
        out = solve_chunk(sub_cost, x0_s, U0_s, mids_s, enabled)
        return _carry_result(out, S0)

    # Batch too large for one kernel launch: chunk the subproblem axis over
    # several launches (subproblems are independent) instead of falling off
    # the kernel path wholesale.  ``lax.map`` compiles the chunk body ONCE
    # and loops it on device, so the working set stays at one chunk.
    Sc = chunk_size_batched(cfg, N, K, nx_p, nu_p, n_br)
    if Sc == 0:
        raise ValueError(
            f"batched pallas kernels cannot fit even one {unit}-subproblem "
            f"chunk of this shape (N={N}, K={K}, nx_p={nx_p}, nu_p={nu_p}) "
            "in VMEM; use sweep_backend='xla' (the 'auto' resolver does "
            "this automatically)"
        )
    n_chunks = -(-S0 // Sc)
    sub_cost, x0_s, U0_s, mids_s, enabled, S0 = pad_batch(
        cfg, sub_cost, x0_s, U0_s, mids_s, enabled, target=n_chunks * Sc
    )

    def to_chunks(a):
        return a.reshape(n_chunks, Sc, *a.shape[1:])

    args = jax.tree.map(to_chunks, (sub_cost, x0_s, U0_s, mids_s, enabled))

    # Cross-chunk retirement: each chunk iterates at full width only until
    # its actives fit an equal share (mw) of ONE chunk's lanes; the
    # surviving actives of ALL chunks then merge into a single <=Sc batch
    # and the tail runs once through the staged loop instead of once per
    # chunk.  Iteration sequences are lane-position-independent, so
    # results equal the per-chunk solve exactly.
    mw = (Sc // n_chunks) // unit * unit
    if mw >= unit:

        def stage_a(t):
            cost_c, x0_c, U0_c, mids_c, en_c = t
            c0 = init_batch_carry(
                fleet, cfg, cost_c, x0_c, U0_c, mids_c, en_c, interpret
            )
            c = jax.lax.while_loop(
                lambda ci: jnp.any(ci.active) & (jnp.sum(ci.active) > mw),
                lambda ci: batched_iteration(
                    fleet, cfg, cost_c, mids_c, x0_c, ci, interpret
                ),
                c0,
            )
            perm = jnp.argsort(~c.active)[:mw]
            comp = jax.tree.map(lambda a: a[perm], c)
            datac = jax.tree.map(lambda a: a[perm], (cost_c, mids_c, x0_c))
            return c, comp, datac, perm.astype(jnp.int32)

        outs, comps, datacs, perms = jax.lax.map(stage_a, args)
        unchunk = lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:])
        out_full = jax.tree.map(unchunk, outs)
        merged_c = jax.tree.map(unchunk, comps)
        merged_data = jax.tree.map(unchunk, datacs)
        idx_map = (
            jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * Sc + perms
        ).reshape(-1)
        out = staged_loop(merged_c, merged_data, out_full, idx_map)
        return _carry_result(out, S0)

    # Too many chunks for an equal-share merge: per-chunk staged solves.
    out = jax.lax.map(lambda t: solve_chunk(*t), args)
    out = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), out)
    return _carry_result(out, S0)


def fits_vmem_dispatch(
    cfg: SolverConfig, N: int, K: int, nx_p: int, nu_p: int, S: int,
    n_br: int,
) -> bool:
    """VMEM fit for the kernels the batch would ACTUALLY run at this shape:
    within the unrolled envelope, the forward + unrolled-backward model;
    for wide shapes (K*nx_p > 32, where the blocked kernel runs instead),
    the forward model plus the sublane-padding-aware wide model with its
    raised scoped-vmem budget.  Chunk sizing with the unrolled model alone
    over-estimated wide chunks by up to 2.7x of sublane padding (ADVICE
    r4) and wrongly scored the unrolled backward on batches that launch
    the blocked kernel (r5)."""
    wide = K * nx_p > UNROLLED_NXF_LIMIT
    if not fits_vmem_batched(
        N, K, nx_p, nu_p, S, cfg.n_ls_iter, n_br, include_backward=not wide
    ):
        return False
    if wide:
        from .pallas_batched_wide import fits_vmem_wide

        return fits_vmem_wide(N, K, nx_p, nu_p, S)
    return True


def chunk_size_batched(
    cfg: SolverConfig, N: int, K: int, nx_p: int, nu_p: int, n_br: int
) -> int:
    """Largest lane-aligned subproblem-axis chunk that fits the VMEM budget
    (0 if even one alignment unit does not fit -- callers must use the XLA
    scan path then)."""
    unit = _pad_unit(cfg.n_ls_iter)
    best = 0
    Sc = unit
    while fits_vmem_dispatch(cfg, N, K, nx_p, nu_p, Sc, n_br):
        best = Sc
        Sc += unit
    return best


def resolve_batched_backend(
    cfg: SolverConfig, fleet: Fleet, N: int, K: int, S: int, arrays=()
) -> str:
    """Resolve ``cfg.sweep_backend`` for the batched subproblem solve."""
    from .ilqr import env_sweep_backend

    env = env_sweep_backend()
    if env:
        return env
    if cfg.sweep_backend != "auto":
        return cfg.sweep_backend
    on_tpu = False
    for a in arrays:
        try:
            on_tpu = any(d.platform == "tpu" for d in a.devices())
            break
        except Exception:
            continue
    else:
        on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return "xla"
    # Mosaic has no 64-bit path; float64 problems stay on the XLA scans.
    for a in arrays:
        if hasattr(a, "dtype") and jnp.dtype(a.dtype).itemsize == 8:
            return "xla"
    # Mixed RK4 substeps run in-kernel via the per-column dh table
    # (forward_pass_batched), so no uniformity requirement here.
    n_br = int(np.max(fleet.branch_index_array)) + 1 if fleet.n_agents else 1
    # Performance envelope.  Up to nxf = K * nx_p = 32 the statically-
    # unrolled kernels (~2x faster per launch than the blocked form);
    # from 32 to WIDE_NXF_AUTO_LIMIT = 48 the blocked backward kernel;
    # beyond, the XLA scans win by ~10x measured (see the envelope
    # constants' header note) even though the wide kernel COMPILES and
    # runs to 96 -- force sweep_backend="pallas" to use it there.
    nxf = K * fleet.nx_p
    if nxf > WIDE_NXF_AUTO_LIMIT:
        return "xla"
    if nxf > UNROLLED_NXF_LIMIT:
        from .pallas_batched_wide import fits_vmem_wide

        unit_w = _pad_unit(cfg.n_ls_iter)
        if not fits_vmem_wide(N, K, fleet.nx_p, fleet.nu_p, unit_w):
            return "xla"
    # The kernel path chunks oversized batches over multiple launches
    # (solve_subproblems_batched), so it only needs ONE lane-aligned chunk
    # to fit the VMEM budget.
    if chunk_size_batched(cfg, N, K, fleet.nx_p, fleet.nu_p, n_br) == 0:
        return "xla"
    return "pallas"
