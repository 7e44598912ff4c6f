"""Pallas TPU kernels for the iLQR sweeps.

The solver's per-step work is tiny (4-12 state dims per agent) while the
sweeps are long (N ~ 50) and strictly sequential -- under plain XLA each
timestep costs ~25-40 separate device ops of fixed overhead, which dominates
wall time.  These kernels run an ENTIRE sweep as one Pallas program: all
state lives in VMEM, the time loop is a ``fori_loop`` of vector-unit
instructions, and the 10-alpha line search maps onto the Pallas grid (one
program per alpha).

Covered here: the forward sweeps (nonlinear rollout and the closed-loop
line-search pass, reference control.py:80-114) and the fused Riccati
backward recursion (control.py:116-148).

Mosaic (the Pallas TPU compiler) cannot lower tile-crossing reshapes (e.g.
``(n, nx) -> (1, n*nx)``), sublane concatenation, or scatter.  Every op here
sticks to the supported set (verified empirically on v5e): 2D transposes,
(transposed-operand) matmuls, lane-axis concatenation of static slices,
rank-changing broadcasts, leading-axis dynamic ref indexing, keepdims
reductions and iota comparisons.  Flatten is lane-concat; unflatten is a
one-hot matmul; x-independent pair constants (component masks, pair masks)
are precomputed outside the kernel.

VMEM budget: X, U, K, d plus cost arrays must fit (~16 MB).  ``fits_vmem``
guards usage; callers fall back to the XLA scan path otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.fleet import Fleet
from ..models.vectorized import blended_f, blended_f_smajor, branch_masks_for
from .costs import GameCost, _signed_incidence
from .ilqr import gauss_jordan_solve


# GameCost leaf order (matches the NamedTuple fields).
_COST_FIELDS = GameCost._fields

# All in-kernel matmuls use full f32 passes: the MXU's default single-pass
# bf16 rounding (rel err ~1e-3) destabilizes the Riccati recursion and the
# flatten/unflatten mask matmuls (which must be value-exact).
_HI = jax.lax.Precision.HIGHEST


def _flatten_row(x2d, O, MT):
    """(n, c) -> (1, n*c) row-major flatten as ``sum(O * (x @ M^T), axis=0)``.

    ``(x @ M^T)[i, q] = x[i, q % c]`` replicates each row across its span;
    ``O[i, q] = [q // c == i]`` keeps only agent i's span; the row-sum
    collapses to the flat layout.  Matmul + mask + reduce only -- a plain
    reshape is a tile-crossing shape cast and per-row lane-concat trips
    Mosaic's offset checks.
    """
    rep = jnp.dot(x2d, MT, preferred_element_type=x2d.dtype, precision=_HI)
    return jnp.sum(O * rep, axis=0, keepdims=True)


def _unflatten_masks(n, c):
    """0/1 masks for the unflatten matmul: (1, n*c) -> (n, c) is computed
    in-kernel as ``(O * flat) @ M``.  ``O[i, q] = [q // c == i]`` masks agent
    i's span; ``M[q, a] = [q % c == a]`` collapses each span to its columns.
    Two VPU/MXU ops, no reshapes.  Passed as explicit kernel inputs (Pallas
    rejects captured constants)."""
    q = np.arange(n * c)
    O = (q[None, :] // c == np.arange(n)[:, None]).astype(np.float64)
    M = (q[:, None] % c == np.arange(c)[None, :]).astype(np.float64)
    return O, M


def _pair_constants(cost: GameCost, n: int, dtype):
    """x-independent pair quantities, precomputed OUTSIDE the kernel.

    Returns ``(W (n, npairs), comp (npairs, 3), m_pair (npairs, 1))``:
    signed incidence, active-component mask (min over the pair of the
    EVALUATION position dims -- these kernels only evaluate the penalty,
    so parity mode's ``n_pos_eval`` applies) and the pair agent-mask
    product.
    """
    W = jnp.asarray(_signed_incidence(n, np.float64), dtype)
    Wa = jnp.abs(W)
    n_pos = cost.n_pos_eval.astype(dtype)
    nd_pair = 0.5 * (Wa.T @ n_pos - jnp.abs(W.T @ n_pos))
    comp = (
        jnp.arange(3, dtype=dtype)[None, :] < nd_pair[:, None]
    ).astype(dtype)
    m = cost.agent_mask.astype(dtype)
    m_pair = (0.25 * ((Wa.T @ m) ** 2 - (W.T @ m) ** 2))[:, None]
    return W, comp, m_pair


def _prox_cols(radius, W, comp, m_pair, x):
    """Proximity penalty via the incidence matmul; 2D-only in-kernel math."""
    n, nx_p = x.shape
    k = min(3, nx_p)
    # concatenate instead of .at[slice].set: the latter captures index
    # constants Pallas rejects.
    pos = x[:, :k]
    if k < 3:
        pos = jnp.concatenate([pos, jnp.zeros((n, 3 - k), x.dtype)], axis=1)
    delta = jnp.dot(W.T, pos, preferred_element_type=x.dtype, precision=_HI) * comp
    d = jnp.sqrt(jnp.sum(delta * delta, axis=1, keepdims=True))  # (npairs, 1)
    active = (d < radius).astype(x.dtype)
    pen = jnp.minimum(0.0, d - radius) ** 2
    return jnp.sum(m_pair * active * pen)


def _quadform_rows(Mat3, v):
    """Per-agent quadratic form ``v_i^T M_i v_i`` -> (n, 1); 2D/3D ops only
    (no rank-1 intermediates, which crash Mosaic's layout inference)."""
    Mv = jnp.sum(Mat3 * v[:, None, :], axis=2)  # (n, c)
    return jnp.sum(v * Mv, axis=1, keepdims=True)  # (n, 1)


def _stage_cost_cols(xf, Q, R, m2, radius, prox_w, ref_w,
                     W, comp, m_pair, has_pairs: bool, x, u):
    """Stage cost with VPU-only math (see module docstring)."""
    ref = _quadform_rows(Q, x - xf)
    ctrl = _quadform_rows(R, u)
    total = ref_w * jnp.sum(m2 * (ref + ctrl))
    total = total + jnp.sum(
        (1.0 - m2) * jnp.sum(u * u, axis=1, keepdims=True)
    )
    if has_pairs:
        total = total + prox_w * _prox_cols(radius, W, comp, m_pair, x)
    return total


def _terminal_cost_cols(xf, Qf, m2, radius, prox_w, ref_w,
                        W, comp, m_pair, has_pairs: bool, x):
    ref = _quadform_rows(Qf, x - xf)
    total = ref_w * jnp.sum(m2 * ref)
    if has_pairs:
        total = total + prox_w * _prox_cols(radius, W, comp, m_pair, x)
    return total


def fits_vmem(N: int, n: int, nx_p: int, nu_p: int,
              dtype_bytes: int = 4, budget: int = 10 * 1024 * 1024,
              n_alpha: int = 10) -> bool:
    """Conservative VMEM estimate for the fused sweep kernels.

    Covers the larger of the forward working set (rows layout: all alphas in
    one program, incl. the layout-mask matmuls) and the backward working set
    (dense per-step flat matrices for all t).
    """
    nxf, nuf = n * nx_p, n * nu_p
    npairs = max(n * (n - 1) // 2, 1)
    R_, P_ = n_alpha * n, n_alpha * npairs
    forward = (
        (N + 1) * R_ * nx_p  # Xo
        + N * R_ * nu_p  # Uo
        + N * nuf * nxf  # K
        + N * (n * nx_p + 2 * n * nu_p)  # X, U, d refs
        + R_ * P_  # Wbig
        + P_ * 6  # comp, m_pair, pen temps
        + R_ * (nxf + nuf)  # Ogx, Ogu
        + 2 * R_ * n_alpha + R_ * n  # Sel, SelT, T_rep
        + R_ * (2 * nx_p * nx_p + nu_p * nu_p)  # tiled Q, Qf, R
        + 8 * R_ * max(nx_p, 4)  # rk4 temps
    )
    backward = (
        2 * N * nxf * nxf  # A_f, L_xx dense (incl. prox coupling)
        + N * nxf * nuf  # B_f
        + N * nuf * nuf  # L_uu_f
        + N * nuf * nxf  # K out
        + 4 * nxf * nxf  # P, Preg, temps
        + n * npairs
    )
    return max(forward, backward) * dtype_bytes < budget


def forward_pass_pallas(
    fleet: Fleet, cost: GameCost, X, U, K, d, alphas, interpret: bool = False
):
    """Batched closed-loop forward pass: ALL alphas in ONE Pallas program.

    Matches ``ops.ilqr._forward_pass`` vmapped over alphas.  Returns
    ``(X_c (n_alpha, N+1, n, nx), U_c (n_alpha, N, n, nu), J_c (n_alpha,))``.

    Layout: STATE-MAJOR -- every per-agent quantity is a ``(c, C)`` array
    with a columns axis ``C = n_alpha * n`` (alpha-major) on the LANES.
    With the component count c <= 12 on sublanes, each elementwise op in the
    RK4/cost hot path is a single (8, 128) vreg instruction up to C = 128;
    the transposed rows layout burned ceil(C/8) vregs per op.  (A grid-per-
    alpha variant was ~2x slower than the XLA scan: TPU grid iterations
    serialize.)  Cross-layout moves (tiling the reference trajectory across
    alphas, flatten to per-alpha flat vectors, unflatten gains) are 0/1 mask
    matmuls, bit-exact under HIGHEST precision (bf16x3 splits f32 exactly).
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

    fleet_f = blended_f_smajor(fleet.specs, nx_p)
    has_pairs = n > 1
    nA = n_alpha
    C_ = nA * n  # columns axis (alpha-major, agents on lanes)
    npairs = n * (n - 1) // 2 if has_pairs else 1
    P_ = nA * npairs

    cost = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        cost,
    )
    if has_pairs:
        _, comp, m_pair = _pair_constants(cost, n, dtype)
        W_np = _signed_incidence(n, np.float64)
        compT = jnp.tile(comp.T, (1, nA))  # (3, P_)
        mpT = jnp.tile(m_pair.T, (1, nA))  # (1, P_)
    else:
        W_np = np.zeros((n, 1))
        compT = jnp.zeros((3, P_), dtype)
        mpT = jnp.zeros((1, P_), dtype)

    # --- static 0/1 layout masks (np; passed as inputs) ---------------------
    r_ = np.arange(C_)
    p_ = np.arange(P_)
    qx = np.arange(nxf)
    qu = np.arange(nuf)
    consts = {
        # tile (c, n) -> (c, C_):  v @ T_repT
        "T_repT": (np.arange(n)[:, None] == r_[None, :] % n),
        # per-alpha column reduce (., C_) @ SelC -> (., nA)
        "SelC": (r_[:, None] // n == np.arange(nA)[None, :]),
        # spread per-alpha (., nA) @ SelCT -> (., C_)
        "SelCT": (np.arange(nA)[:, None] == r_[None, :] // n),
        # flat-state expand: Mx @ dx, Mx (nxf, nx_p)
        "Mx": (qx[:, None] % nx_p == np.arange(nx_p)[None, :]),
        "OgxT": (qx[:, None] // nx_p == r_[None, :] % n),  # (nxf, C_)
        "MuT": (np.arange(nu_p)[:, None] == qu[None, :] % nu_p),  # (nu_p, nuf)
        "OguT": (qu[:, None] // nu_p == r_[None, :] % n),  # (nuf, C_)
        # proximity: pair differences as one incidence matmul
        "Wbig": (
            (r_[:, None] // n == p_[None, :] // npairs)
            * W_np[r_ % n][:, p_ % npairs % W_np.shape[1]]
            if has_pairs else np.zeros((C_, P_))
        ),
        "SpC": (p_[:, None] // npairs == np.arange(nA)[None, :]),  # (P_, nA)
    }
    const_names = list(consts)
    const_arrs = [jnp.asarray(np.asarray(consts[k], np.float64), dtype)
                  for k in const_names]

    alpha_row = jnp.repeat(jnp.asarray(alphas, dtype), n)[None, :]  # (1, C_)
    m_row = jnp.tile(cost.agent_mask.astype(dtype)[None, :], (1, nA))
    bmT = jnp.tile(jnp.asarray(branch_masks_for(fleet), dtype), (1, nA))
    # Cost arrays, state-major + alpha-tiled:  QT[b, a, r] = Q[r % n, a, b]
    xfT = jnp.tile(cost.xf.T, (1, nA))  # (nx_p, C_)
    QT = jnp.tile(jnp.transpose(cost.Q, (2, 1, 0)), (1, 1, nA))
    RT = jnp.tile(jnp.transpose(cost.R, (2, 1, 0)), (1, 1, nA))
    QfT = jnp.tile(jnp.transpose(cost.Qf, (2, 1, 0)), (1, 1, nA))
    scalars = jnp.stack(
        [cost.radius.astype(dtype), cost.prox_weight.astype(dtype),
         cost.ref_weight.astype(dtype)]
    )[None, :]  # (1, 3) SMEM

    # Reference trajectory / controls / gains, state-major (XLA-side).
    Xt = jnp.transpose(X, (0, 2, 1))  # (N+1, nx_p, n)
    Ut = jnp.transpose(U, (0, 2, 1))  # (N, nu_p, n)
    dT = jnp.transpose(d.reshape(N, n, nu_p), (0, 2, 1))  # (N, nu_p, n)

    def kernel(x_ref, u_ref, K_ref, d_ref, a_ref, comp_ref, mp_ref,
               bm_ref, xf_ref, Q_ref, R_ref, Qf_ref, m_ref, sc_ref,
               *rest):
        c_refs = rest[: len(const_names)]
        Xo_ref, Uo_ref, Jo_ref = rest[len(const_names):]
        Cm = {k: r[:] for k, r in zip(const_names, c_refs)}
        a_row = a_ref[:]  # (1, C_)
        compk = comp_ref[:]
        mpk = mp_ref[:]
        branch_masks = bm_ref[:]
        xfk = xf_ref[:]
        mk = m_ref[:]
        radius = sc_ref[0, 0]
        prox_w = sc_ref[0, 1]
        ref_w = sc_ref[0, 2]

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=dtype, precision=_HI)

        def tile_cols(v):  # (c, n) -> (c, C_), exact 0/1 matmul copy
            return dot(v, Cm["T_repT"])

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

        def quadform(M_ref_k, v):
            # per-column quadratic form v_r^T M_r v_r -> (1, C_);
            # M layout (c_b, c_a, C_): leading-index loads are Mosaic-safe.
            acc = jnp.zeros((1, C_), dtype)
            for b in range(M_ref_k.shape[0]):
                Mv_b = jnp.sum(M_ref_k[b] * v, axis=0, keepdims=True)
                acc = acc + v[b : b + 1, :] * Mv_b
            return acc

        def prox_cols(x):
            # (nx_p, C_) -> per-alpha proximity penalty (1, nA)
            pos3 = x[:3, :]  # junk components masked by compk below
            delta = dot(pos3, Cm["Wbig"]) * compk  # (3, P_)
            dd = jnp.sqrt(jnp.sum(delta * delta, axis=0, keepdims=True))
            active = (dd < radius).astype(dtype)
            pen = jnp.minimum(0.0, dd - radius) ** 2
            return dot(mpk * active * pen, Cm["SpC"])  # (1, nA)

        def stage_cost(Qk, Rk, x, u):
            ref = quadform(Qk, x - xfk)
            ctrl = quadform(Rk, u)
            rows = ref_w * mk * (ref + ctrl) + (1.0 - mk) * jnp.sum(
                u * u, axis=0, keepdims=True
            )
            J = dot(rows, Cm["SelC"])  # (1, nA)
            if has_pairs:
                J = J + prox_w * prox_cols(x)
            return J

        def terminal_cost(Qfk, x):
            rows = ref_w * mk * quadform(Qfk, x - xfk)
            J = dot(rows, Cm["SelC"])
            if has_pairs:
                J = J + prox_w * prox_cols(x)
            return J

        Qk = Q_ref[:]
        Rk = R_ref[:]
        Qfk = Qf_ref[:]

        x0 = tile_cols(x_ref[0])  # (nx_p, C_)
        Xo_ref[0] = x0

        def body(t, carry):
            x, J = carry
            dx = x - tile_cols(x_ref[t])  # (nx_p, C_)
            # flatten columns -> per-alpha flat state (nxf, nA)
            dx_flat = dot(Cm["OgxT"] * dot(Cm["Mx"], dx), Cm["SelC"])
            du = dot(K_ref[t], dx_flat)  # (nuf, nA)
            # unflatten back to columns (nu_p, C_)
            du_cols = dot(Cm["MuT"], Cm["OguT"] * dot(du, Cm["SelCT"]))
            u_new = tile_cols(u_ref[t]) + du_cols + a_row * tile_cols(d_ref[t])
            J = J + stage_cost(Qk, Rk, x, u_new)
            Uo_ref[t] = u_new
            x_next = rk4(x, u_new)
            Xo_ref[t + 1] = x_next
            return (x_next, J)

        x_last, J = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(N), body,
            (x0, jnp.zeros((1, nA), dtype)),
        )
        J = J + terminal_cost(Qfk, x_last)
        Jo_ref[:] = J

    def vspec(space=pltpu.VMEM):
        return pl.BlockSpec(memory_space=space)

    ins = [Xt, Ut, K, dT, alpha_row, compT, mpT, bmT,
           xfT, QT, RT, QfT, m_row, scalars] + const_arrs
    in_specs = [vspec() for _ in ins]
    in_specs[13] = vspec(pltpu.SMEM)  # scalars

    Xr, Ur, J_c = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(vspec(), vspec(), vspec()),
        out_shape=(
            jax.ShapeDtypeStruct((N + 1, nx_p, C_), dtype),
            jax.ShapeDtypeStruct((N, nu_p, C_), dtype),
            jax.ShapeDtypeStruct((1, n_alpha), dtype),
        ),
        interpret=interpret,
    )(*ins)
    # state-major -> per-alpha trajectories (XLA-side reshape/transpose)
    X_c = Xr.reshape(N + 1, nx_p, n_alpha, n).transpose(2, 0, 3, 1)
    U_c = Ur.reshape(N, nu_p, n_alpha, n).transpose(2, 0, 3, 1)
    return X_c, U_c, J_c[0, :]


def backward_pass_pallas(
    fleet: Fleet, cost: GameCost, X, U, mu, interpret: bool = False
):
    """Fused Riccati sweep: the entire backward recursion as ONE Pallas
    program (reference control.py:116-148).

    The (X, U)-only terms (quadraticization incl. the proximity coupling,
    linearization, block-diagonal embedding) are hoisted and batched over
    time in XLA exactly like ``ops.ilqr._backward_pass``; the kernel runs
    the sequential value recursion with dense flat-space math in VMEM --
    sized for subproblem-scale fleets (nxf = n * nx_p up to a few hundred).
    The Q_uu solve is an in-kernel Gauss-Jordan (no custom call).
    """
    from .costs import (
        assemble_pair_hessian,
        diag_embed,
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
    # Full state Hessian incl. the prox pair coupling, assembled here (XLA)
    # because Mosaic cannot lower the (n,k,n,k)->(nxf,nxf) reshape in-kernel.
    L_xx_blk = jax.vmap(lambda ld: diag_embed(ld))(L_xx_diag)
    if n > 1:
        L_xx_blk = L_xx_blk + jax.vmap(
            lambda h: assemble_pair_hessian(h, n, nx_p)
        )(H)
    L_xx_f = L_xx_blk.reshape(N, nxf, nxf)
    L_x_f = L_x.reshape(N, nxf)
    L_u_f = L_u.reshape(N, nuf)

    L_xT, L_xxT = quadraticize_terminal(cost, X[-1])
    p0 = L_xT.reshape(1, nxf)
    P0 = L_xxT.reshape(nxf, nxf)

    mu = jnp.asarray(mu, dtype).reshape(1)

    def kernel(Af_r, Bf_r, Luu_r, Lxx_r, Lx_r, Lu_r, mu_r,
               p0_r, P0_r, K_out, d_out):
        mu_k = mu_r[0]
        eye_f = _eye(nxf, dtype)

        def body(i, carry):
            p, P = carry  # (1, nxf), (nxf, nxf)
            t = N - 1 - i
            A_t = Af_r[t]
            B_t = Bf_r[t]
            L_xx = Lxx_r[t]
            Preg = P + mu_k * eye_f

            Q_x = Lx_r[t][None, :] + jnp.dot(
                p, A_t, preferred_element_type=dtype, precision=_HI
            )
            Q_u = Lu_r[t][None, :] + jnp.dot(
                p, B_t, preferred_element_type=dtype, precision=_HI
            )
            PA = jnp.dot(P, A_t, preferred_element_type=dtype, precision=_HI)
            Q_xx = L_xx + jnp.dot(A_t.T, PA, preferred_element_type=dtype, precision=_HI)
            PregB = jnp.dot(Preg, B_t, preferred_element_type=dtype, precision=_HI)
            Q_uu = Luu_r[t] + jnp.dot(
                B_t.T, PregB, preferred_element_type=dtype, precision=_HI
            )
            PregA = jnp.dot(Preg, A_t, preferred_element_type=dtype, precision=_HI)
            Q_ux = jnp.dot(B_t.T, PregA, preferred_element_type=dtype, precision=_HI)
            # Q_xu computed directly (not Q_ux^T): used for transpose-free
            # value updates below.
            Q_xu = jnp.dot(A_t.T, PregB, preferred_element_type=dtype, precision=_HI)

            rhs = jnp.concatenate([Q_ux, Q_u.T], axis=1)
            sol = gauss_jordan_solve(Q_uu, rhs)
            K_t = -sol[:, :nxf]
            d_col = -sol[:, nxf : nxf + 1]  # (nuf, 1)

            K_out[t] = K_t
            d_out[t] = d_col[:, 0]

            KtQuu = jnp.dot(K_t.T, Q_uu, preferred_element_type=dtype, precision=_HI)
            p_new = (
                Q_x
                + jnp.dot(KtQuu, d_col, preferred_element_type=dtype, precision=_HI).T
                + jnp.dot(Q_u, K_t, preferred_element_type=dtype, precision=_HI)
                + jnp.dot(d_col.T, Q_ux, preferred_element_type=dtype, precision=_HI)
            )
            P_new = (
                Q_xx
                + jnp.dot(KtQuu, K_t, preferred_element_type=dtype, precision=_HI)
                + jnp.dot(K_t.T, Q_ux, preferred_element_type=dtype, precision=_HI)
                + jnp.dot(Q_xu, K_t, preferred_element_type=dtype, precision=_HI)
            )
            P_new = 0.5 * (P_new + P_new.T)
            return (p_new, P_new)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(N), body, (p0_r[:], P0_r[:]))

    def vspec(arr):
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    K, d = pl.pallas_call(
        kernel,
        in_specs=[vspec(a) for a in (A_f, B_f, L_uu_f, L_xx_f, L_x_f, L_u_f,
                                      mu, p0, P0)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, nuf, nxf), dtype),
            jax.ShapeDtypeStruct((N, nuf), dtype),
        ),
        interpret=interpret,
    )(A_f, B_f, L_uu_f, L_xx_f, L_x_f, L_u_f, mu, p0, P0)
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
