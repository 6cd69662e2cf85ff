"""Lane-packed SLS backward Riccati: block-diagonal batched GEMM packing.

The folded backward kernel's per-stage products are per-instance
(J*nx, nx) @ (nx, nx) GEMMs — the contraction dim nx = 17 uses 13% of the
MXU's 128-wide systolic axis and every batch instance pays its own passes
(~4600 passes/stage at B = 512, measured ~0.44 ms/stage => the backward is
MXU-PASS-bound, not FLOP-bound; see BASELINE.md / ops/pallas_sls.py).

Packing trick: group P = floor(128 / nx) = 7 instances; stack their value
matrices side-by-side, S_cat (J*nx, P*nx), and their dynamics blocks into a
block-diagonal A_bd (P*nx, P*nx). Then

    S_cat @ A_bd  =  [S_1 A_1 | S_2 A_2 | ... | S_P A_P]

computes P instances' products in ONE GEMM whose contraction axis is
P*nx = 119/128 = 93% utilized and whose M x N output is fully dense (the
zeros of A_bd live INSIDE one 128x128 tile, costing nothing extra):
3 MXU passes per group instead of 3 per instance — 7x fewer passes.
Per-instance transposes (for A'S A from S A via S = S') become cheap
5-D XLA relayouts; the tiny nu-sized assemblies stay per-instance einsums.

Exact reformulation of `backward_solve_folded` (same reduction orders per
lane up to GEMM-internal accumulation; sym() applied per stage like the
folded kernel). Batched-only by construction: `make_backward_K_packed()`
wraps it in a jax.custom_batching.custom_vmap whose unbatched path falls
back to the folded XLA kernel — the same integration pattern as
ops/pallas_qp. Select with FastSLSOptions.sls_block = -1 (env
RNM_SLS_BLOCK=-1).

STATUS — MEASURED AND REJECTED as a default (kept as a tested research
option): standalone on v5e at the bench shapes (B=512, bf16 tube
precision) the packed backward runs 13.9 ms vs 5.4 ms for the triangular
column-blocked kernel, and end-to-end the bench drops 35.7k -> 22.8k
solves/s. The GEMM passes do shrink ~7x, but the per-stage XLA relayouts
the packing requires — two (G, J*nx, P*nx) block transposes (the A'S A
step needs (S A)' and S's symmetry cannot remove it), the block-diagonal
builds, and the pack/unpack reshuffles — cost more than the saved passes
(30 block transposes alone measure 1.5 ms; the rest of the gap is the
same relayout class). Fourth measured attempt at the backward (folded,
blocked, Pallas-VPU, packed-GEMM): the bf16 blocked(2) kernel at ~5-7 ms
is the practical floor for this op mix on this chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
    SLSRegs,
    backward_solve_folded,
    sym,
)
from robust_nonlinear_mpc_tpu.utils.numerics import spd_solve_small, tube_prec


def _pack_cols(X, G, P):
    """(B, R, n) -> (G, R, P*n): lane p of group g occupies column block p."""
    B, R, n = X.shape
    return (
        X.reshape(G, P, R, n).transpose(0, 2, 1, 3).reshape(G, R, P * n)
    )


def _unpack_cols(Xc, J, d1, P, d2):
    """(G, J*d1, P*d2) -> (B, J, d1, d2)."""
    G = Xc.shape[0]
    return (
        Xc.reshape(G, J, d1, P, d2)
        .transpose(0, 3, 1, 2, 4)
        .reshape(G * P, J, d1, d2)
    )


def _block_t(Xc, J, d1, P, d2):
    """Per-(column j, lane p) block transpose:
    (G, J*d1, P*d2) -> (G, J*d2, P*d1)."""
    G = Xc.shape[0]
    return (
        Xc.reshape(G, J, d1, P, d2)
        .transpose(0, 1, 4, 3, 2)
        .reshape(G, J * d2, P * d1)
    )


def _blockdiag(Mk, P):
    """(G, P, r, c) -> (G, P*r, P*c) block diagonal."""
    G, _, r, c = Mk.shape
    eye = jnp.eye(P, dtype=Mk.dtype)
    bd = Mk[:, :, :, None, :] * eye[None, :, None, :, None]
    return bd.reshape(G, P * r, P * c)


def backward_K_packed_batched(A, B, Gmat, Gf, eta, eta_f, regs: SLSRegs,
                              pack=None):
    """Lane-packed backward Riccati gains, batch-leading inputs.

    A (Bc,N,nx,nx), B (Bc,N,nx,nu), eta (Bc,N,N,ni), eta_f (Bc,J,ni_f);
    returns K (Bc, N, J, nu, nx) — matching backward_solve_folded(...)[1].
    """
    Bc, N, nx, _ = A.shape
    nu = B.shape[3]
    J = N + 1
    ni = Gmat.shape[0]
    dtype = A.dtype
    tp = tube_prec()
    Gx = Gmat[:, :nx]
    Gu = Gmat[:, nx:]
    if pack is None:
        pack = max(1, 128 // nx)
    padB = (-Bc) % pack
    if padB:
        # identity dynamics + zero eta keep padding lanes benign
        padc = [(0, padB)] + [(0, 0)] * 3
        A = jnp.concatenate(
            [A, jnp.broadcast_to(jnp.eye(nx, dtype=dtype),
                                 (padB, N, nx, nx))], axis=0
        )
        B = jnp.pad(B, padc)
        eta = jnp.pad(eta, padc)
        eta_f = jnp.pad(eta_f, [(0, padB), (0, 0), (0, 0)])
    Bp = Bc + padB
    G = Bp // pack

    GGx = (Gx[:, :, None] * Gx[:, None, :]).reshape(ni, nx * nx).astype(dtype)
    GGu = (Gu[:, :, None] * Gu[:, None, :]).reshape(ni, nu * nu).astype(dtype)
    GGf = (Gf[:, :, None] * Gf[:, None, :]).reshape(
        Gf.shape[0], nx * nx
    ).astype(dtype)

    SN = jnp.matmul(eta_f, GGf, precision=tp).reshape(Bp, J, nx, nx)
    SN = sym(SN + jnp.asarray(regs.Q_reg_f, dtype))
    S_cat0 = _pack_cols(SN.reshape(Bp, J * nx, nx).reshape(Bp, J * nx, nx),
                        G, pack)
    eta_pad = jnp.concatenate(
        [eta, jnp.zeros((Bp, N, 1, ni), dtype)], axis=2
    )

    cols = jnp.arange(J)
    Q_reg = jnp.asarray(regs.Q_reg, dtype)
    R_reg = jnp.asarray(regs.R_reg, dtype)

    # stage-major stacks for the scan
    A_s = jnp.swapaxes(A, 0, 1).reshape(N, G, pack, nx, nx)
    B_s = jnp.swapaxes(B, 0, 1).reshape(N, G, pack, nx, nu)
    eta_s = jnp.swapaxes(eta_pad, 0, 1)          # (N, Bp, J, ni)

    def step(S_cat, inp):
        k, A_k, B_k, eta_k = inp
        A_bd = _blockdiag(A_k, pack)             # (G, P*nx, P*nx)
        B_bd = _blockdiag(B_k, pack)             # (G, P*nx, P*nu)

        Cxx = jnp.matmul(eta_k, GGx, precision=tp).reshape(Bp, J, nx, nx)
        Cxx = Cxx + Q_reg
        Cuu = jnp.matmul(eta_k, GGu, precision=tp).reshape(Bp, J, nu, nu)
        Cuu = Cuu + R_reg

        SA = jnp.matmul(S_cat, A_bd, precision=tp)      # (G, J*nx, P*nx)
        SAT = _block_t(SA, J, nx, pack, nx)             # (S_j A)'[c, a]
        M = jnp.matmul(SAT, A_bd, precision=tp)         # A'S_jA (packed)
        FT = jnp.matmul(SAT, B_bd, precision=tp)        # (G, J*nx, P*nu)
        SB = jnp.matmul(S_cat, B_bd, precision=tp)      # (G, J*nx, P*nu)
        SBT = _block_t(SB, J, nx, pack, nu)             # (G, J*nu, P*nx)
        Hp = jnp.matmul(SBT, B_bd, precision=tp)        # (G, J*nu, P*nu)

        # unpack the small blocks for the gain solve
        F = jnp.swapaxes(_unpack_cols(FT, J, nx, pack, nu), 2, 3)  # (Bp,J,nu,nx)
        H = Cuu + _unpack_cols(Hp, J, nu, pack, nu)
        K = -spd_solve_small(sym(H), F)                 # (Bp, J, nu, nx)

        AtSBK = jnp.einsum("bjua,bjuc->bjac", F, K, precision=tp)
        corr = _pack_cols((Cxx + AtSBK).reshape(Bp, J * nx, nx), G, pack)
        S_new = M + corr
        S_new = 0.5 * (S_new + _block_t(S_new, J, nx, pack, nx))  # sym

        active = (k >= cols)[:, None, None]             # (J, 1, 1)
        act_rows = jnp.repeat(k >= cols, nx)[None, :, None]
        S_carry = jnp.where(act_rows, S_new, S_cat)
        K_out = jnp.where(active[None], K, jnp.zeros_like(K))
        return S_carry, K_out

    _, K_st = jax.lax.scan(
        step, S_cat0, (jnp.arange(N), A_s, B_s, eta_s), reverse=True
    )
    return jnp.swapaxes(K_st, 0, 1)[:Bc]                # (Bc, N, J, nu, nx)


def make_backward_K_packed():
    """custom_vmap: unbatched -> folded XLA kernel, vmapped -> lane-packed."""

    @jax.custom_batching.custom_vmap
    def backward_K(A, B, Gmat, Gf, eta, eta_f, Q_reg, R_reg, Q_reg_f):
        regs = SLSRegs(Q_reg, R_reg, Q_reg_f)
        return backward_solve_folded(A, B, Gmat, Gf, eta, eta_f, regs)[1]

    @backward_K.def_vmap
    def _rule(axis_size, in_batched, A, B, Gmat, Gf, eta, eta_f,
              Q_reg, R_reg, Q_reg_f):
        b_A, b_B, b_G, b_Gf, b_e, b_ef, b_q, b_r, b_qf = in_batched
        if b_G or b_Gf or b_q or b_r or b_qf or not (b_A and b_B and b_e and b_ef):
            bcast = lambda x, is_b: x if is_b else jax.lax.broadcast(
                x, (axis_size,)
            )
            res = jax.vmap(
                lambda a, bb, g, gf, e, ef, q, r, qf: backward_solve_folded(
                    a, bb, g, gf, e, ef, SLSRegs(q, r, qf)
                )[1]
            )(
                bcast(A, b_A), bcast(B, b_B), bcast(Gmat, b_G),
                bcast(Gf, b_Gf), bcast(eta, b_e), bcast(eta_f, b_ef),
                bcast(Q_reg, b_q), bcast(R_reg, b_r), bcast(Q_reg_f, b_qf),
            )
            return res, True
        regs = SLSRegs(Q_reg, R_reg, Q_reg_f)
        K = backward_K_packed_batched(A, B, Gmat, Gf, eta, eta_f, regs)
        return K, True

    return backward_K


backward_K_packed = make_backward_K_packed()
