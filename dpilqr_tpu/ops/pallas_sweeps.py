"""Pallas TPU kernels for the iLQR sweeps.

The solver's per-step work is tiny (4-12 state dims per agent) while the
sweeps are long (N ~ 50) and strictly sequential -- under plain XLA each
timestep costs ~25-40 separate device ops of fixed overhead, which dominates
wall time.  These kernels run an ENTIRE sweep as one Pallas program: all
state lives in VMEM, the time loop is a ``fori_loop`` of vector-unit
instructions, and the 10-alpha line search maps onto the Pallas grid (one
program per alpha).

Covered here: the forward sweeps (nonlinear rollout and the closed-loop
line-search pass, reference control.py:80-114).  Cost math is expressed
with elementwise outer products + reductions (VPU) and incidence matmuls
(MXU) -- no gathers, scatters or batched small matmuls.

VMEM budget: X, U, K, d plus cost arrays must fit (~16 MB).  ``fits_vmem``
guards usage; callers fall back to the XLA scan path otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.fleet import Fleet
from ..models.vectorized import blended_f, branch_masks_for
from .costs import GameCost, _signed_incidence

# GameCost leaf order (matches the NamedTuple fields).
_COST_FIELDS = GameCost._fields


def _stage_cost_cols(cost: GameCost, W, has_pairs: bool, x, u):
    """Stage cost with VPU-only math (see module docstring)."""
    e = x - cost.xf
    ref = jnp.sum((e[:, :, None] * e[:, None, :]) * cost.Q, axis=(1, 2))
    ctrl = jnp.sum((u[:, :, None] * u[:, None, :]) * cost.R, axis=(1, 2))
    m = cost.agent_mask
    total = cost.ref_weight * jnp.sum(m * (ref + ctrl))
    total = total + jnp.sum((1.0 - m) * jnp.sum(u * u, axis=-1))
    if has_pairs:
        total = total + cost.prox_weight * _prox_cols(cost, W, x)
    return total


def _terminal_cost_cols(cost: GameCost, W, has_pairs: bool, x):
    e = x - cost.xf
    ref = jnp.sum((e[:, :, None] * e[:, None, :]) * cost.Qf, axis=(1, 2))
    total = cost.ref_weight * jnp.sum(cost.agent_mask * ref)
    if has_pairs:
        total = total + cost.prox_weight * _prox_cols(cost, W, x)
    return total


def _prox_cols(cost: GameCost, W, x):
    """Proximity penalty via the incidence matmul."""
    n, nx_p = x.shape
    k = min(3, nx_p)
    # concatenate instead of .at[slice].set: the latter captures index
    # constants Pallas rejects.
    pos = x[:, :k]
    if k < 3:
        pos = jnp.concatenate([pos, jnp.zeros((n, 3 - k), x.dtype)], axis=1)
    Wa = jnp.abs(W)
    dt_ = x.dtype
    delta = jnp.dot(W.T, pos, preferred_element_type=dt_)
    n_pos = cost.n_pos.astype(dt_)
    nd_pair = 0.5 * (
        jnp.dot(Wa.T, n_pos, preferred_element_type=dt_)
        - jnp.abs(jnp.dot(W.T, n_pos, preferred_element_type=dt_))
    )
    comp = (
        jax.lax.broadcasted_iota(jnp.int32, (W.shape[1], 3), 1).astype(dt_)
        < nd_pair[:, None]
    )
    delta = delta * comp
    d = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    m = cost.agent_mask
    m_pair = 0.25 * (
        jnp.dot(Wa.T, m, preferred_element_type=dt_) ** 2
        - jnp.dot(W.T, m, preferred_element_type=dt_) ** 2
    )
    active = (d < cost.radius).astype(dt_)
    pen = jnp.minimum(0.0, d - cost.radius) ** 2
    return jnp.sum(m_pair * active * pen)


def fits_vmem(N: int, n: int, nx_p: int, nu_p: int,
              dtype_bytes: int = 4, budget: int = 10 * 1024 * 1024) -> bool:
    """Conservative VMEM estimate for the fused sweep kernels.

    Covers the larger of the forward working set (gains K resident) and the
    backward working set (dense per-step flat matrices for all t).
    """
    nxf, nuf = n * nx_p, n * nu_p
    npairs = n * (n - 1) // 2
    forward = (
        (N + 1) * n * nx_p * 2
        + N * n * nu_p * 2
        + N * nuf * nxf  # K
        + N * nuf
        + 2 * n * nx_p * nx_p
        + n * nu_p * nu_p
        + n * npairs
        + 8 * max(npairs, n) * max(nx_p, 4)
    )
    backward = (
        2 * N * nxf * nxf  # A_f, L_xx_diag dense
        + N * nxf * nuf  # B_f
        + N * nuf * nuf  # L_uu_f
        + N * npairs * 9  # pair Hessians
        + N * nuf * nxf  # K out
        + 4 * nxf * nxf  # P, Preg, temps
        + n * npairs
    )
    return max(forward, backward) * dtype_bytes < budget


def forward_pass_pallas(
    fleet: Fleet, cost: GameCost, X, U, K, d, alphas, interpret: bool = False
):
    """Batched closed-loop forward pass: one Pallas program per alpha.

    Matches ``ops.ilqr._forward_pass`` vmapped over alphas.  Returns
    ``(X_c (n_alpha, N+1, n, nx), U_c (n_alpha, N, n, nu), J_c (n_alpha,))``.
    """
    N, n, nu_p = U.shape
    nx_p = X.shape[2]
    n_alpha = alphas.shape[0]
    dtype = X.dtype
    nxf, nuf = n * nx_p, n * nu_p

    substeps_set = {s.rk4_substeps for s in fleet.specs}
    if len(substeps_set) != 1:
        raise ValueError("pallas forward pass needs uniform RK4 substeps")
    substeps = substeps_set.pop()
    dt = fleet.dt

    fleet_f = blended_f(fleet.specs, nx_p)
    bm = jnp.asarray(branch_masks_for(fleet), dtype=dtype)
    has_pairs = n > 1
    npairs = max(n * (n - 1) // 2, 1)
    W = np.zeros((n, npairs))
    if has_pairs:
        W = _signed_incidence(n, np.float64)
    W = jnp.asarray(W, dtype=dtype)

    cost = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        cost,
    )
    cost_leaves = list(cost)
    is_scalar = [jnp.ndim(leaf) == 0 for leaf in cost_leaves]

    def kernel(x_ref, u_ref, K_ref, d_ref, a_ref, W_ref, bm_ref, *rest):
        cost_refs = rest[: len(_COST_FIELDS)]
        Xo_ref, Uo_ref, Jo_ref = rest[len(_COST_FIELDS):]
        c = GameCost(
            *(r[0] if sc else r[:] for r, sc in zip(cost_refs, is_scalar))
        )
        Wk = W_ref[:]
        alpha = a_ref[pl.program_id(0)]
        branch_masks = bm_ref[:]

        def rk4(x, u):
            dh = dt / substeps
            xx = x
            for _ in range(substeps):
                k0 = fleet_f(xx, u, branch_masks)
                k1 = fleet_f(xx + 0.5 * dh * k0, u, branch_masks)
                k2 = fleet_f(xx + 0.5 * dh * k1, u, branch_masks)
                k3 = fleet_f(xx + dh * k2, u, branch_masks)
                xx = xx + dh * (k0 + 2.0 * k1 + 2.0 * k2 + k3) / 6.0
            return xx

        x0 = x_ref[0]
        Xo_ref[0, 0] = x0

        def body(t, carry):
            x, J = carry
            dx = (x - x_ref[t]).reshape(1, nxf)
            K_t = K_ref[t]  # (nuf, nxf)
            du = jnp.dot(
                dx, K_t.T, preferred_element_type=dtype
            ).reshape(n, nu_p) + alpha * d_ref[t].reshape(n, nu_p)
            u_new = u_ref[t] + du
            J = J + _stage_cost_cols(c, Wk, has_pairs, x, u_new)
            Uo_ref[0, t] = u_new
            x_next = rk4(x, u_new)
            Xo_ref[0, t + 1] = x_next
            return (x_next, J)

        x_last, J = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(N), body, (x0, jnp.zeros((), dtype))
        )
        J = J + _terminal_cost_cols(c, Wk, has_pairs, x_last)
        Jo_ref[0, 0] = J

    def bcast_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM
        )

    in_specs = [
        bcast_spec(X),
        bcast_spec(U),
        bcast_spec(K),
        bcast_spec(d),
        bcast_spec(alphas),  # full alpha table; program_id selects
        bcast_spec(W),
        bcast_spec(bm),
    ] + [bcast_spec(jnp.atleast_1d(leaf)) for leaf in cost_leaves]
    out_specs = (
        pl.BlockSpec(
            (1, N + 1, n, nx_p), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, N, n, nu_p), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
    )

    X_c, U_c, J_c = pl.pallas_call(
        kernel,
        grid=(n_alpha,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((n_alpha, N + 1, n, nx_p), dtype),
            jax.ShapeDtypeStruct((n_alpha, N, n, nu_p), dtype),
            jax.ShapeDtypeStruct((n_alpha, 1), dtype),
        ),
        interpret=interpret,
    )(X, U, K, d, alphas, W, bm, *(jnp.atleast_1d(l) for l in cost_leaves))
    return X_c, U_c, J_c[:, 0]


def _gauss_jordan_solve(M, R):
    """Solve ``M X = R`` in-kernel via Gauss-Jordan without pivoting.

    ``M`` is the (symmetric positive definite) ``Q_uu``; elimination without
    pivoting on an SPD matrix is stable (equivalent to LDL^T).  One fori
    iteration per row -- pure VPU work, no custom-call.  Row/column selection
    uses one-hot masks + reductions (NOT dynamic indexing): Mosaic lowers
    masked full-tile ops directly, while dynamic row gathers/scatters inside
    a kernel fail to lower.
    """
    m = M.shape[0]
    MR = jnp.concatenate([M, R], axis=1)  # (m, q)
    q = MR.shape[1]
    dtype = MR.dtype
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, q), 1)

    def body(k, MR):
        row_hot = (row_iota == k).astype(dtype)  # (m, 1)
        col_hot = (col_iota == k).astype(dtype)  # (1, q)
        pivot_row = jnp.sum(MR * row_hot, axis=0, keepdims=True)  # (1, q)
        pivot_val = jnp.sum(pivot_row * col_hot)  # MR[k, k]
        pivot_row = pivot_row / pivot_val
        col = jnp.sum(MR * col_hot, axis=1, keepdims=True)  # (m, 1)
        col = col * (1.0 - row_hot)  # zero the pivot row's own entry
        MR = MR - col * pivot_row
        MR = MR * (1.0 - row_hot) + row_hot * pivot_row
        return MR

    # int32 bounds: under x64 a python-int bound makes the loop index int64,
    # and any int64 value inside a Mosaic kernel fails to lower.
    MR = jax.lax.fori_loop(jnp.int32(0), jnp.int32(m), body, MR)
    return MR[:, m:]


def backward_pass_pallas(
    fleet: Fleet, cost: GameCost, X, U, mu, interpret: bool = False
):
    """Fused Riccati sweep: the entire backward recursion as ONE Pallas
    program (reference control.py:116-148).

    The (X, U)-only terms (quadraticization, linearization) are hoisted and
    batched over time in XLA exactly like ``ops.ilqr._backward_pass``; the
    kernel runs the sequential value recursion with dense flat-space math in
    VMEM -- sized for subproblem-scale fleets (nxf = n * nx_p up to a few
    hundred).  The Q_uu solve is an in-kernel Gauss-Jordan (no custom call).
    """
    from .costs import (
        quadraticize_stage_compact,
        quadraticize_terminal,
    )

    N, n, nu_p = U.shape
    nx_p = X.shape[2]
    nxf, nuf = n * nx_p, n * nu_p
    dtype = X.dtype
    eye_n_np = np.eye(n)

    cost = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        cost,
    )

    # ---- XLA phase: time-batched quadraticize + linearize ------------------
    L_x, L_u, L_xx_diag, L_uu, H = jax.vmap(
        lambda x_t, u_t: quadraticize_stage_compact(cost, x_t, u_t)
    )(X[:-1], U)
    A, B = jax.vmap(fleet.linearize)(X[:-1], U)
    B = B * cost.agent_mask[None, :, None, None]
    eye_n = jnp.asarray(eye_n_np, dtype)
    # Dense flat-space per-step matrices (N, nxf, nxf) etc.
    A_f = jnp.einsum("ij,tiab->tiajb", eye_n, A).reshape(N, nxf, nxf)
    B_f = jnp.einsum("ij,tiab->tiajb", eye_n, B).reshape(N, nxf, nuf)
    L_uu_f = jnp.einsum("ij,tiab->tiajb", eye_n, L_uu).reshape(N, nuf, nuf)
    L_xx_d = jnp.einsum("ij,tiab->tiajb", eye_n, L_xx_diag).reshape(
        N, nxf, nxf
    )
    L_x_f = L_x.reshape(N, nxf)
    L_u_f = L_u.reshape(N, nuf)

    L_xT, L_xxT = quadraticize_terminal(cost, X[-1])
    p0 = L_xT.reshape(1, nxf)
    P0 = L_xxT.reshape(nxf, nxf)

    has_pairs = n > 1
    npairs = max(n * (n - 1) // 2, 1)
    k = min(3, nx_p)
    if not has_pairs:
        H = jnp.zeros((N, npairs, k, k), dtype)
    # Pair Hessians flattened for the in-kernel incidence assembly:
    # Hf[t, p, a*k+b]; the sandwich runs per (a, b) as W diag(H_ab) W^T.
    Hf = H.reshape(N, npairs, k * k)
    W = (
        _signed_incidence(n, np.float64)
        if has_pairs
        else np.zeros((n, npairs))
    )
    W = jnp.asarray(W, dtype)
    mu = jnp.asarray(mu, dtype).reshape(1)

    def kernel(Af_r, Bf_r, Luu_r, Lxxd_r, Lx_r, Lu_r, Hf_r, W_r, mu_r,
               p0_r, P0_r, K_out, d_out):
        Wk = W_r[:]
        mu_k = mu_r[0]
        eye_f = _eye(nxf, dtype)

        def assemble_prox(H_t):
            # (npairs, k*k) -> (nxf, nxf) coupling via 9 incidence matmuls.
            rows = []
            for a in range(k):
                cols = []
                for b in range(k):
                    Hab = H_t[:, a * k + b]  # (npairs,)
                    Cab = jnp.dot(
                        Wk * Hab[None, :], Wk.T,
                        preferred_element_type=dtype,
                    )  # (n, n)
                    cols.append(Cab)
                rows.append(cols)
            # (n, n, k, k) -> (n, k, n, k) -> zero-pad the per-agent block to
            # (nx, nx) (jnp.pad, not .at[slice].set: the latter captures
            # index constants Pallas rejects).
            blocks = jnp.stack(
                [jnp.stack(r, axis=-1) for r in rows], axis=-2
            )  # (n, n, k, k): [i, j, a, b]
            blk = jnp.transpose(blocks, (0, 2, 1, 3))  # (n, k, n, k)
            if k < nx_p:
                pad = nx_p - k
                blk = jnp.pad(blk, ((0, 0), (0, pad), (0, 0), (0, pad)))
            return blk.reshape(nxf, nxf)

        def body(i, carry):
            p, P = carry  # (1, nxf), (nxf, nxf)
            t = N - 1 - i
            A_t = Af_r[t]
            B_t = Bf_r[t]
            L_xx = Lxxd_r[t]
            if has_pairs:
                L_xx = L_xx + assemble_prox(Hf_r[t])
            Preg = P + mu_k * eye_f

            Q_x = Lx_r[t][None, :] + jnp.dot(
                p, A_t, preferred_element_type=dtype
            )
            Q_u = Lu_r[t][None, :] + jnp.dot(
                p, B_t, preferred_element_type=dtype
            )
            PA = jnp.dot(P, A_t, preferred_element_type=dtype)
            Q_xx = L_xx + jnp.dot(A_t.T, PA, preferred_element_type=dtype)
            PregB = jnp.dot(Preg, B_t, preferred_element_type=dtype)
            Q_uu = Luu_r[t] + jnp.dot(
                B_t.T, PregB, preferred_element_type=dtype
            )
            Q_ux = jnp.dot(
                B_t.T, jnp.dot(Preg, A_t, preferred_element_type=dtype),
                preferred_element_type=dtype,
            )

            rhs = jnp.concatenate([Q_ux, Q_u.T], axis=1)
            sol = _gauss_jordan_solve(Q_uu, rhs)
            K_t = -sol[:, :nxf]
            d_t = -sol[:, nxf]

            K_out[t] = K_t
            d_out[t] = d_t

            KtQuu = jnp.dot(K_t.T, Q_uu, preferred_element_type=dtype)
            p_new = (
                Q_x
                + jnp.dot(KtQuu, d_t[:, None], preferred_element_type=dtype).T
                + jnp.dot(Q_u, K_t, preferred_element_type=dtype)
                + jnp.dot(d_t[None, :], Q_ux, preferred_element_type=dtype)
            )
            P_new = (
                Q_xx
                + jnp.dot(KtQuu, K_t, preferred_element_type=dtype)
                + jnp.dot(K_t.T, Q_ux, preferred_element_type=dtype)
                + jnp.dot(Q_ux.T, K_t, preferred_element_type=dtype)
            )
            P_new = 0.5 * (P_new + P_new.T)
            return (p_new, P_new)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(N), body, (p0_r[:], P0_r[:]))

    def vspec(arr):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    K, d = pl.pallas_call(
        kernel,
        in_specs=[vspec(a) for a in (A_f, B_f, L_uu_f, L_xx_d, L_x_f, L_u_f,
                                      Hf, W, mu, p0, P0)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, nuf, nxf), dtype),
            jax.ShapeDtypeStruct((N, nuf), dtype),
        ),
        interpret=interpret,
    )(A_f, B_f, L_uu_f, L_xx_d, L_x_f, L_u_f, Hf, W, mu, p0, P0)
    return K, d


def _eye(m, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return (r == c).astype(dtype)


def rollout_pallas(fleet: Fleet, cost: GameCost, x0, U, interpret: bool = False):
    """Plain rollout as the closed-loop kernel with zero gains, one alpha."""
    N, n, nu_p = U.shape
    nx_p = x0.shape[1]
    dtype = x0.dtype
    X_ref = jnp.broadcast_to(x0[None], (N + 1, n, nx_p)).astype(dtype)
    K = jnp.zeros((N, n * nu_p, n * nx_p), dtype)
    d = jnp.zeros((N, n * nu_p), dtype)
    alphas = jnp.zeros((1,), dtype)
    X_c, U_c, J_c = forward_pass_pallas(
        fleet, cost, X_ref, U, K, d, alphas, interpret=interpret
    )
    return X_c[0], J_c[0]
