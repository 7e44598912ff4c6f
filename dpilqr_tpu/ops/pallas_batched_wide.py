"""Blocked batched backward sweep for WIDE subproblems (K * nx_p > 32).

The standard batched backward kernel (ops/pallas_batched.py) statically
unrolls its block linear algebra over (k, b) pairs -- O(K^2 nx^2) program
ops -- and past nxf = K * nx_p = 32 the TPU compiler does not finish on
the generated program (a K=8 Quad6D compile ran > 20 min without
completing; round-3 measured K=12/16 at nx_p=4 crashing outright).  That
silently exiled half the model catalogue (Quad6D at K >= 8, Quad12D at
any real width) to the slow XLA scans -- VERDICT r3 item 3.

This module is the same algorithm in a BLOCKED layout that keeps program
size O(nx_p + K * nu_p):

- every matrix lives as 5D blocks ``M_b[ib, jb, i_in, j_in, S]`` with the
  block axes UNTILED (leading) and only ``(j_in, S)`` on sublane/lane;
- every block contraction becomes a python loop over the SMALL within-
  block dimension whose iterations are single whole-array broadcast FMAs
  (the block axes ride along as broadcast dims), instead of per-(k,b)
  slice arithmetic;
- no dynamic indexing anywhere -- all indices that reach a ref or value
  are python ints.

Per-element arithmetic (products and accumulation order) is IDENTICAL to
the unrolled kernel, so results are bit-identical where both compile
(tests/test_pallas_batched.py::test_wide_matches_unrolled) and the
float64 interpret parity with the XLA path carries over.

Reference: the sweep itself is dpilqr/control.py:116-148; layout and
Mosaic constraints follow ops/pallas_batched.py's header notes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.fleet import Fleet
from .costs import GameCost
from .pallas_batched import (
    _linearize_batch,
    _quadraticize_batch,
    _tspec_rev,
    _vspec,
)


def _pad8(d: int) -> int:
    """Sublane padding: every blocked array here is (..., d, S) with ``d``
    on the SECOND-TO-LAST axis, which Mosaic tiles to multiples of 8
    sublanes for float32.  nu_p = 3 pads 2.7x, nx_p = 6 pads 1.3x -- real
    VMEM the additive model must count (ADVICE r4)."""
    return -(-d // 8) * 8


# Scoped-VMEM ceiling requested from the Mosaic compiler for THIS kernel.
# The measured r5 envelope diagnosis (logs/wide_envelope_r5.json) showed
# every nxf in 48..96 failing with "Scoped allocation ... limit 16.00M"
# at 16.4-35.8 MB -- i.e. the DEFAULT scoped-vmem flag, not the 128 MB of
# physical VMEM and not compile time, was the 48 -> 96 envelope wall
# (VERDICT r4 item 2).  Raising the per-kernel limit admits the full
# Quad12D K=8 (nxf=96) program with headroom; chunk sizing still bounds
# the ACTUAL footprint via fits_vmem_wide's budget below.
WIDE_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def fits_vmem_wide(
    N: int,
    K: int,
    nx_p: int,
    nu_p: int,
    S: int,
    dtype_bytes: int = 4,
    budget: int = 72 * 1024 * 1024,
) -> bool:
    """Conservative VMEM bound for the blocked wide backward kernel.

    Counts the double-buffered streams, the persistent value-function
    blocks, and the live blocked temporaries (AtP, Qxx, W1, Qux, Quu,
    QuuK, KtQux, Preg -- the temp term over-counts liveness, like
    fits_vmem_batched) -- all with the second-to-last axis padded to the
    8-sublane tile the Mosaic layout actually allocates.

    Calibration (r5 envelope diagnosis, logs/wide_envelope_r5.json): the
    model over-counts the compiler's actual scoped allocation by ~1.5x
    (Quad12D K=8 S=64: model 29.8 MB vs measured 20.1 MB; Unicycle K=16
    S=64: model ~33 MB vs measured 35.8 MB -- within 10% there), so the
    72 MB budget keeps every admitted shape comfortably inside the
    100 MB per-kernel scoped-vmem ceiling (WIDE_VMEM_LIMIT_BYTES) on a
    128 MB-VMEM chip.
    """
    xp, up = _pad8(nx_p), _pad8(nu_p)
    streams = 2 * (
        K * nx_p * xp  # A (K, nx_p, nx_p^, S)
        + K * nx_p * up  # B (K, nx_p, nu_p^, S)
        + K * K * nx_p * xp  # L_xx blocked
        + K * nu_p * up  # L_uu diagonal blocks only
        + K * xp  # L_x
        + K * up  # L_u
        + K * K * nu_p * xp  # Kg out
        + K * up  # d out
    )
    persist = K * K * nx_p * xp + K * xp  # P, p
    temps = (
        4 * K * K * nx_p * xp  # Preg, AtP, Q_xx, P_new
        + 3 * K * K * nu_p * xp  # W1, Q_ux, QuuK/KtQux
        + 2 * K * K * nu_p * up  # Q_uu, GJ working copy
        + K * up
    )
    return (streams + persist + temps) * S * dtype_bytes < budget


def backward_pass_batched_wide(
    fleet: Fleet,
    cost_b: GameCost,
    mids_s,
    X,
    U,
    mu,
    interpret: bool = False,
):
    """Blocked batched fused Riccati sweep (reference control.py:116-148).

    Same contract as ops/pallas_batched.backward_pass_batched: inputs
    ``X (S, N+1, K, nx_p)``, ``U (S, N, K, nu_p)``, ``mu (S,)``; returns
    ``Kg (N, nuf, nxf, S)`` and ``d (N, nuf, S)`` in the layouts the
    batched forward kernel consumes.
    """
    S, Np1, K, nx_p = X.shape
    N = Np1 - 1
    nu_p = U.shape[-1]
    nxf, nuf = K * nx_p, K * nu_p
    dtype = X.dtype

    q = _quadraticize_batch(cost_b, X, U)
    A, B = _linearize_batch(fleet, cost_b, mids_s, X, U)
    mu5 = jnp.asarray(mu, dtype).reshape(1, 1, 1, 1, S)

    # Reshape the flat-lanes prep into blocked layouts (pure XLA).
    Ab = A.reshape(N, K, nx_p, nx_p, S)  # A_b[k, b, a]
    Bb = B.reshape(N, K, nx_p, nu_p, S)  # B_b[k, b, u]
    # L_xx (N, nxf, nxf, S) -> blocks [ib, jb, a, c]
    Lxx_b = (
        q["L_xx"].reshape(N, K, nx_p, K, nx_p, S).transpose(0, 1, 3, 2, 4, 5)
    )
    # L_uu embedded dense -> diagonal blocks only (N, K, nu_p, nu_p, S)
    Luu_full = q["L_uu"].reshape(N, K, nu_p, K, nu_p, S)
    Luu_b = jnp.stack([Luu_full[:, k, :, k] for k in range(K)], axis=1)
    Lx_b = q["L_x"].reshape(N, K, nx_p, S)
    Lu_b = q["L_u"].reshape(N, K, nu_p, S)
    p0_b = q["p0"].reshape(K, nx_p, S)
    P0_b = q["P0"].reshape(K, nx_p, K, nx_p, S).transpose(0, 2, 1, 3, 4)

    def kernel(
        A_ref, B_ref, Luu_ref, Lxx_ref, Lx_ref, Lu_ref, mu_ref, p0_ref,
        P0_ref, Kg_ref, d_ref, p_s, P_s,
    ):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            p_s[:] = p0_ref[:]
            P_s[:] = P0_ref[:]

        p = p_s[:]  # (K, nx_p, S)
        P = P_s[:]  # (K, K, nx_p, nx_p, S)
        Av = A_ref[0]  # (K, nx_p, nx_p, S)
        Bv = B_ref[0]  # (K, nx_p, nu_p, S)

        def acc_sum(terms):
            acc = None
            for term in terms:
                acc = term if acc is None else acc + term
            return acc

        # Preg = P + mu * I (blocked identity: ib==jb and a==c).
        iota = jax.lax.broadcasted_iota
        eye_b = (
            (iota(jnp.int32, (K, K, nx_p, nx_p, 1), 0)
             == iota(jnp.int32, (K, K, nx_p, nx_p, 1), 1))
            & (iota(jnp.int32, (K, K, nx_p, nx_p, 1), 2)
               == iota(jnp.int32, (K, K, nx_p, nx_p, 1), 3))
        ).astype(dtype)
        Preg = P + mu_ref[:] * eye_b

        # Q_x[k, a] = Lx[k, a] + sum_b A[k, b, a] p[k, b]
        Q_x = Lx_ref[0] + acc_sum(
            Av[:, b, :, :] * p[:, b : b + 1, :] for b in range(nx_p)
        )
        # Q_u[k, u] = Lu[k, u] + sum_b B[k, b, u] p[k, b]
        Q_u = Lu_ref[0] + acc_sum(
            Bv[:, b, :, :] * p[:, b : b + 1, :] for b in range(nx_p)
        )

        # AtP[i, j, a, c] = sum_b A[i, b, a] P[i, j, b, c]
        AtP = acc_sum(
            Av[:, b][:, None, :, None, :] * P[:, :, b][:, :, None, :, :]
            for b in range(nx_p)
        )
        # Q_xx[i, j, a, a'] = Lxx + sum_c AtP[i, j, a, c] A[j, c, a']
        Q_xx = Lxx_ref[0] + acc_sum(
            AtP[:, :, :, c, :][:, :, :, None, :]
            * Av[:, c, :, :][None, :, None, :, :]
            for c in range(nx_p)
        )
        # W1[i, j, u, c] = sum_b B[i, b, u] Preg[i, j, b, c]
        W1 = acc_sum(
            Bv[:, b][:, None, :, None, :] * Preg[:, :, b][:, :, None, :, :]
            for b in range(nx_p)
        )
        # Q_ux[i, j, u, a'] = sum_c W1[i, j, u, c] A[j, c, a']
        Q_ux = acc_sum(
            W1[:, :, :, c, :][:, :, :, None, :]
            * Av[:, c, :, :][None, :, None, :, :]
            for c in range(nx_p)
        )
        # Q_uu[i, j, u, u'] = sum_c W1[i, j, u, c] B[j, c, u'] + Luu_diag
        eye_K = (
            iota(jnp.int32, (K, K, 1, 1, 1), 0)
            == iota(jnp.int32, (K, K, 1, 1, 1), 1)
        ).astype(dtype)
        Q_uu = (
            acc_sum(
                W1[:, :, :, c, :][:, :, :, None, :]
                * Bv[:, c, :, :][None, :, None, :, :]
                for c in range(nx_p)
            )
            + eye_K * Luu_ref[0][:, None]
        )

        # Gauss-Jordan solve, blocked; pivots in the same order and with
        # the same scale/mask structure as pallas_batched._gj_solve.
        Quu_g, Qux_g, Qu_g = Q_uu, Q_ux, Q_u
        rowK5 = iota(jnp.int32, (K, 1, nu_p, 1, 1), 0)
        rowU5 = iota(jnp.int32, (K, 1, nu_p, 1, 1), 2)
        rowK3 = iota(jnp.int32, (K, nu_p, 1), 0)
        rowU3 = iota(jnp.int32, (K, nu_p, 1), 1)
        for kp in range(nuf):
            kpb, kpi = divmod(kp, nu_p)
            inv = 1.0 / Quu_g[kpb, kpb, kpi, kpi, :]  # (S,)
            hot5 = ((rowK5 == kpb) & (rowU5 == kpi)).astype(dtype)
            hot3 = ((rowK3 == kpb) & (rowU3 == kpi)).astype(dtype)
            scale5 = jnp.where(hot5 != 0, inv[None, None, None, None, :], 1.0)
            scale3 = jnp.where(hot3 != 0, inv[None, None, :], 1.0)
            colq = Quu_g[:, kpb, :, kpi, :] * (1.0 - hot3)  # (K, nu_p, S)
            Quu_g = Quu_g * scale5
            Qux_g = Qux_g * scale5
            Qu_g = Qu_g * scale3
            pivq = Quu_g[kpb, :, kpi, :, :]  # (K, nu_p, S) scaled row
            pivx = Qux_g[kpb, :, kpi, :, :]  # (K, nx_p, S)
            pivu = Qu_g[kpb, kpi, :]  # (S,)
            Quu_g = Quu_g - colq[:, None, :, None, :] * pivq[None, :, None, :, :]
            Qux_g = Qux_g - colq[:, None, :, None, :] * pivx[None, :, None, :, :]
            Qu_g = Qu_g - colq * pivu[None, None, :]
        K_t = -Qux_g  # (K, K, nu_p, nx_p, S): [ub, xb, u, x]
        d_t = -Qu_g  # (K, nu_p, S)
        Kg_ref[0] = K_t
        d_ref[0] = d_t

        def t_dot_vec(Mb, vb_arr, out_in):
            """sum_v Mb[v, j] * v_arr[v] over rows v=(vb, vi), ascending;
            ``Mb (K, K, nu_p, out_in, S)``, ``vb_arr (K, nu_p, S)`` ->
            ``(K, out_in, S)``."""
            return acc_sum(
                Mb[vb, :, vi, :, :] * vb_arr[vb, vi, :][None, None, :]
                for vb in range(K)
                for vi in range(nu_p)
            )

        def t_dot(M1, M2, in1, in2):
            """sum_v M1[v, i] M2[v, j]: ``M1 (K, K, nu_p, in1, S)``,
            ``M2 (K, K, nu_p, in2, S)`` -> ``(K, K, in1, in2, S)``."""
            return acc_sum(
                M1[vb, :, vi, :, :][:, None, :, None, :]
                * M2[vb, :, vi, :, :][None, :, None, :, :]
                for vb in range(K)
                for vi in range(nu_p)
            )

        # Full-form value update, same term order as the unrolled kernel.
        w = t_dot_vec(Q_uu, d_t, nu_p) + Q_u
        p_s[:] = Q_x + t_dot_vec(K_t, w, nx_p) + t_dot_vec(Q_ux, d_t, nx_p)
        QuuK = t_dot(Q_uu, K_t, nu_p, nx_p)  # [ub, xb, u, x]
        KtQux = t_dot(K_t, Q_ux, nx_p, nx_p)
        P_new = (
            Q_xx
            + t_dot(K_t, QuuK, nx_p, nx_p)
            + KtQux
            + jnp.transpose(KtQux, (1, 0, 3, 2, 4))
        )
        P_s[:] = 0.5 * (P_new + jnp.transpose(P_new, (1, 0, 3, 2, 4)))

    Kg_b, d_b = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            _tspec_rev((K, nx_p, nx_p, S), N),
            _tspec_rev((K, nx_p, nu_p, S), N),
            _tspec_rev((K, nu_p, nu_p, S), N),
            _tspec_rev((K, K, nx_p, nx_p, S), N),
            _tspec_rev((K, nx_p, S), N),
            _tspec_rev((K, nu_p, S), N),
            _vspec((1, 1, 1, 1, S)),  # mu
            _vspec((K, nx_p, S)),  # p0
            _vspec((K, K, nx_p, nx_p, S)),  # P0
        ],
        out_specs=(
            _tspec_rev((K, K, nu_p, nx_p, S), N),
            _tspec_rev((K, nu_p, S), N),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, K, K, nu_p, nx_p, S), dtype),
            jax.ShapeDtypeStruct((N, K, nu_p, S), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, nx_p, S), dtype),
            pltpu.VMEM((K, K, nx_p, nx_p, S), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=WIDE_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(Ab, Bb, Luu_b, Lxx_b, Lx_b, Lu_b, mu5, p0_b, P0_b)

    # Back to the flat layouts the batched forward kernel consumes:
    # Kg[(ub, u), (xb, x)] and d[(ub, u)].
    Kg = Kg_b.transpose(0, 1, 3, 2, 4, 5).reshape(N, nuf, nxf, S)
    d = d_b.reshape(N, nuf, S)
    return Kg, d
