"""fast-SLS compute kernels: dual extraction, column-wise backward Riccati,
system-response propagation, and tube backoffs.

TPU-native re-design of the reference's Numba kernels
(`solver/fast_SLS_jit.py:43-188`): the reference parallelizes the independent
SLS columns with `numba.prange` CPU threads; here the column axis j becomes a
`jax.vmap` axis (batched small matmuls on the MXU) and the horizon axis k a
`lax.scan`. Everything is pure and statically shaped, so the whole pipeline
jits into a single XLA program and carries an extra leading batch axis for
thousands of simultaneous solves.

Index conventions match the reference exactly:
    eta    (N, N, ni)        eta[k, j] defined for k >= j, else 0
    eta_f  (N+1, ni_f)
    S      (N+1, N+1, nx, nx)  S[k, j]
    K      (N, N+1, nu, nx)    K[k, j] nonzero for k >= j
    Phi_x  (N+1, N+1, nx, nw)  lower block triangular, Phi_x[j, j] = E[j]
    Phi_u  (N,   N+1, nu, nw)
    beta   (N, N, ni),  beta_f (N+1, ni_f)
    backoff (N, ni),    backoff_f (ni_f,)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from robust_nonlinear_mpc_tpu.utils.numerics import spd_solve_small, sym, tube_prec


class SLSRegs(NamedTuple):
    """Tube regularizers (reference OCP Q_reg/R_reg/Q_reg_f, solver/ocp.py:15-26)."""

    Q_reg: jax.Array    # (nx, nx)
    R_reg: jax.Array    # (nu, nu)
    Q_reg_f: jax.Array  # (nx, nx)


# ----------------------------------------------------------------------
# eta = mu / (2 sqrt(beta))   (reference fast_SLS_jit.py:475-487)
# ----------------------------------------------------------------------
def evaluate_dual_eta(mu, mu_f, beta, beta_f, epsilon_backoff):
    """mu (N, ni) stage ineq duals, mu_f (ni_f,), beta (N, N, ni), beta_f (N+1, ni_f).

    eta[k, j] = mu[k] / (2 sqrt(max(beta[k, j], eps)))  for k >= j, else 0.
    eta_f[j]  = mu_f  / (2 sqrt(max(beta_f[j], eps))).
    """
    N = mu.shape[0]
    b = jnp.maximum(beta, epsilon_backoff)
    b_f = jnp.maximum(beta_f, epsilon_backoff)
    eta = mu[:, None, :] / (2.0 * jnp.sqrt(b))            # (N, N, ni)
    kk = jnp.arange(N)[:, None]
    jj = jnp.arange(N)[None, :]
    eta = jnp.where((kk >= jj)[:, :, None], eta, 0.0)
    eta_f = mu_f[None, :] / (2.0 * jnp.sqrt(b_f))          # (N+1, ni_f)
    return eta, eta_f


# ----------------------------------------------------------------------
# Column-wise backward Riccati  (reference fast_SLS_jit.py:43-84)
# ----------------------------------------------------------------------
def riccati_step(A, B, Cx, Cu, Sk):
    """One Riccati step (reference riccati_step_njit, fast_SLS_jit.py:43-62)."""
    tp = tube_prec()
    mmt = lambda a, b: jnp.matmul(a, b, precision=tp)
    x = mmt(B.T, Sk)                 # (nu, nx)
    y = mmt(A.T, Sk)                 # (nx, nx)
    H = Cu + mmt(x, B)               # (nu, nu)
    F = mmt(x, A)                    # (nu, nx)
    K = -spd_solve_small(sym(H), F)
    S = Cx + mmt(y, A + mmt(B, K))
    return K, sym(S)


def riccati_column(j, eta_col, eta_f_j, A, B, Gmat, Gf, regs: SLSRegs):
    """Backward Riccati recursion for ONE SLS column j (masked to k >= j).

    eta_col (N, ni) = eta[:, j]; eta_f_j (ni_f,) = eta_f[j].
    Returns S_col (N+1, nx, nx), K_col (N, nu, nx).
    vmap over j for the dense kernel (`backward_solve`); shard the column
    axis over a device mesh for large N (`parallel/columns.py`).
    """
    N, nx = A.shape[0], A.shape[1]
    Gx = Gmat[:, :nx]
    Gu = Gmat[:, nx:]
    SN = jnp.matmul(Gf.T, eta_f_j[:, None] * Gf, precision=tube_prec()) + regs.Q_reg_f

    def step(S_next, inp):
        k, A_k, B_k, eta_kj = inp
        tp = tube_prec()
        mmt = lambda a, b: jnp.matmul(a, b, precision=tp)
        Cxx = mmt(Gx.T, eta_kj[:, None] * Gx) + regs.Q_reg
        Cuu = mmt(Gu.T, eta_kj[:, None] * Gu) + regs.R_reg
        K_k, S_k = riccati_step(A_k, B_k, Cxx, Cuu, S_next)
        active = k >= j
        S_out = jnp.where(active, S_k, jnp.zeros_like(S_k))
        K_out = jnp.where(active, K_k, jnp.zeros_like(K_k))
        S_carry = jnp.where(active, S_k, S_next)
        return S_carry, (K_out, S_out)

    ks = jnp.arange(N)
    _, (K_col, S_col) = lax.scan(step, SN, (ks, A, B, eta_col), reverse=True)
    S_col = jnp.concatenate([S_col, SN[None]], axis=0)  # (N+1, nx, nx)
    return S_col, K_col


def eta_columns(eta):
    """(N, N, ni) stage-major eta -> (N+1, N, ni) column-major with the
    empty terminal column appended (column j = N has no stage etas)."""
    return jnp.concatenate(
        [jnp.swapaxes(eta, 0, 1), jnp.zeros((1, eta.shape[0], eta.shape[2]), eta.dtype)],
        axis=0,
    )


def backward_solve(A, B, Gmat, Gf, eta, eta_f, regs: SLSRegs):
    """Per-column backward Riccati producing disturbance-feedback gains.

    A (N, nx, nx), B (N, nx, nu), Gmat (ni, nx+nu), Gf (ni_f, nx),
    eta (N, N, ni), eta_f (N+1, ni_f).
    Returns S (N+1, N+1, nx, nx), K (N, N+1, nu, nx).

    Matches `_backward_solve_numba` (fast_SLS_jit.py:65-84): the weighted
    constraint curvature C_kj = G' diag(eta[k,j]) G is split into its (x, x)
    and (u, u) diagonal blocks only (cross block discarded, as in the
    reference), regularized by Q_reg / R_reg; terminal uses Gf and Q_reg_f.
    The column axis j is vmapped; the stage recursion k = N-1..j is a masked
    reverse scan.
    """
    N = A.shape[0]
    js = jnp.arange(N + 1)
    S_all, K_all = jax.vmap(
        lambda j, ec, ef: riccati_column(j, ec, ef, A, B, Gmat, Gf, regs)
    )(js, eta_columns(eta), eta_f)
    # S_all: (N+1 cols, N+1 stages, nx, nx) -> transpose to (stage, col, ...)
    S = jnp.swapaxes(S_all, 0, 1)
    K = jnp.swapaxes(K_all, 0, 1)
    return S, K


def backward_solve_folded(A, B, Gmat, Gf, eta, eta_f, regs: SLSRegs):
    """`backward_solve` restructured so every large product is a single GEMM.

    Same inputs/outputs as `backward_solve` (exact up to FP reassociation).
    The vmap-over-columns form issues ~10 independent (nx, nx)-sized matmuls
    per column per stage — at nx = 17 each uses a sliver of the 128x128 MXU.
    Here one scan over stages carries ALL columns' value matrices S (J, nx, nx)
    and folds the column axis into the GEMM M/N dimension (J*nx = 272 for the
    reference shapes), exploiting:
      * curvature assembly as a Gram-tensor contraction:
        C_j = sum_r eta[k,j,r] (g_r g_r') + reg  ->  (J, ni) @ (ni, nx*nx)
      * S_j symmetric:  A'S_jA = (S_jA)'A  and  B'S_jA = (S_jB)'A, so the
        shared operand (A, B) always sits on the plain side of the dot and
        the batched side flattens to (J*nx, nx) / (J*nu, nx) row stacks.
    The only remaining batched-small ops are the rank-nu correction F'K and
    the closed-form (nu, nu) SPD solve.
    """
    N, nx = A.shape[0], A.shape[1]
    nu = B.shape[2]
    J = N + 1
    tp = tube_prec()
    Gx = Gmat[:, :nx]
    Gu = Gmat[:, nx:]
    ni = Gx.shape[0]

    # NOTE: pairwise-concatenating the shared-RHS GEMMs (Cxx|Cuu, S[A|B],
    # SBt[B|A]) to cut dispatch count was measured and REJECTED: 13.6k ->
    # 11.2k solves/s end-to-end — the per-step concats and strided output
    # splits cost more than the saved dispatches.
    GGx = (Gx[:, :, None] * Gx[:, None, :]).reshape(ni, nx * nx)
    GGu = (Gu[:, :, None] * Gu[:, None, :]).reshape(ni, nu * nu)
    GGf = (Gf[:, :, None] * Gf[:, None, :]).reshape(Gf.shape[0], nx * nx)

    SN = jnp.matmul(eta_f, GGf, precision=tp).reshape(J, nx, nx) + regs.Q_reg_f
    SN = sym(SN)
    # eta[k] per stage with the (empty) terminal column appended: (N, J, ni)
    eta_pad = jnp.concatenate([eta, jnp.zeros((N, 1, ni), eta.dtype)], axis=1)

    js = jnp.arange(J)

    def step(S_all, inp):
        k, A_k, B_k, eta_k = inp  # eta_k (J, ni)
        Cxx = jnp.matmul(eta_k, GGx, precision=tp).reshape(J, nx, nx) + regs.Q_reg
        Cuu = jnp.matmul(eta_k, GGu, precision=tp).reshape(J, nu, nu) + regs.R_reg
        S_flat = S_all.reshape(J * nx, nx)
        SA = jnp.matmul(S_flat, A_k, precision=tp).reshape(J, nx, nx)  # S_j A
        SB = jnp.matmul(S_flat, B_k, precision=tp).reshape(J, nx, nu)  # S_j B
        SBt = jnp.swapaxes(SB, 1, 2).reshape(J * nu, nx)               # B'S_j rows
        H = Cuu + jnp.matmul(SBt, B_k, precision=tp).reshape(J, nu, nu)
        F = jnp.matmul(SBt, A_k, precision=tp).reshape(J, nu, nx)      # B'S_j A
        K = -spd_solve_small(sym(H), F)
        SAt = jnp.swapaxes(SA, 1, 2).reshape(J * nx, nx)
        AtSA = jnp.matmul(SAt, A_k, precision=tp).reshape(J, nx, nx)   # A'S_j A
        AtSBK = jnp.einsum("jua,jub->jab", F, K, precision=tp)         # F'K
        S_new = sym(Cxx + AtSA + AtSBK)
        active = (k >= js)[:, None, None]
        S_carry = jnp.where(active, S_new, S_all)
        S_out = jnp.where(active, S_new, jnp.zeros_like(S_new))
        K_out = jnp.where(active, K, jnp.zeros_like(K))
        return S_carry, (K_out, S_out)

    _, (K_st, S_st) = lax.scan(
        step, SN, (jnp.arange(N), A, B, eta_pad), reverse=True
    )
    S = jnp.concatenate([S_st, SN[None]], axis=0)  # (N+1, J, nx, nx)
    return S, K_st


def backward_solve_blocked(A, B, Gmat, Gf, eta, eta_f, regs: SLSRegs, block=8):
    """`backward_solve_folded` with triangular column-blocking.

    Column j is active only at stages k >= j, but the folded scan carries and
    multiplies ALL J = N+1 columns at every stage — at stage k = 0 that is
    15/16 wasted GEMM rows. Here the stage axis is split into segments of
    `block` stages processed high-to-low; segment s (stages [s*block,
    hi = min((s+1)*block, N))) carries only the `hi` columns that can be
    active there, dropping a column block from the carry at each segment
    boundary. For N = 15, block = 8 this removes ~30% of the backward GEMM
    volume ((7*15 + 8*8) / (15*16) column-stages); block = 4 removes ~41%.
    Per-column arithmetic is identical to `backward_solve_folded` — only
    all-zero columns are skipped — so results match to roundoff.

    NOTE: the step body deliberately duplicates `backward_solve_folded`'s
    (the folded kernel stays a separate, mask-free implementation because it
    is the XLA:CPU-safe default — unifying on the blocked form would
    reintroduce the CPU compile blowup). Any fix to either step body must be
    mirrored in the other; tests/test_sls_kernels.py pins their equality.
    """
    N, nx = A.shape[0], A.shape[1]
    nu = B.shape[2]
    J = N + 1
    tp = tube_prec()
    Gx = Gmat[:, :nx]
    Gu = Gmat[:, nx:]
    ni = Gx.shape[0]

    GGx = (Gx[:, :, None] * Gx[:, None, :]).reshape(ni, nx * nx)
    GGu = (Gu[:, :, None] * Gu[:, None, :]).reshape(ni, nu * nu)
    GGf = (Gf[:, :, None] * Gf[:, None, :]).reshape(Gf.shape[0], nx * nx)

    SN = jnp.matmul(eta_f, GGf, precision=tp).reshape(J, nx, nx) + regs.Q_reg_f
    SN = sym(SN)
    eta_pad = jnp.concatenate([eta, jnp.zeros((N, 1, ni), eta.dtype)], axis=1)

    def make_step(W):
        js = jnp.arange(W)

        def step(S_all, inp):
            k, A_k, B_k, eta_k = inp  # eta_k (W, ni)
            Cxx = jnp.matmul(eta_k, GGx, precision=tp).reshape(W, nx, nx) + regs.Q_reg
            Cuu = jnp.matmul(eta_k, GGu, precision=tp).reshape(W, nu, nu) + regs.R_reg
            S_flat = S_all.reshape(W * nx, nx)
            SA = jnp.matmul(S_flat, A_k, precision=tp).reshape(W, nx, nx)
            SB = jnp.matmul(S_flat, B_k, precision=tp).reshape(W, nx, nu)
            SBt = jnp.swapaxes(SB, 1, 2).reshape(W * nu, nx)
            H = Cuu + jnp.matmul(SBt, B_k, precision=tp).reshape(W, nu, nu)
            F = jnp.matmul(SBt, A_k, precision=tp).reshape(W, nu, nx)
            K = -spd_solve_small(sym(H), F)
            SAt = jnp.swapaxes(SA, 1, 2).reshape(W * nx, nx)
            AtSA = jnp.matmul(SAt, A_k, precision=tp).reshape(W, nx, nx)
            AtSBK = jnp.einsum("jua,jub->jab", F, K, precision=tp)
            S_new = sym(Cxx + AtSA + AtSBK)
            active = (k >= js)[:, None, None]
            S_carry = jnp.where(active, S_new, S_all)
            S_out = jnp.where(active, S_new, jnp.zeros_like(S_new))
            K_out = jnp.where(active, K, jnp.zeros_like(K))
            return S_carry, (K_out, S_out)

        return step

    n_seg = -(-N // block)
    S_carry = SN
    K_segs, S_segs = [], []
    for s in reversed(range(n_seg)):
        lo, hi = s * block, min((s + 1) * block, N)
        W = hi  # columns j <= hi-1 can be active in stages [lo, hi)
        S_carry = S_carry[:W]
        ks = jnp.arange(lo, hi)
        S_carry, (K_st, S_st) = lax.scan(
            make_step(W), S_carry,
            (ks, A[lo:hi], B[lo:hi], eta_pad[lo:hi, :W]),
            reverse=True,
        )
        pad = [(0, 0), (0, J - W), (0, 0), (0, 0)]
        K_segs.append(jnp.pad(K_st, pad))
        S_segs.append(jnp.pad(S_st, pad))
    K = jnp.concatenate(K_segs[::-1], axis=0)          # (N, J, nu, nx)
    S = jnp.concatenate(S_segs[::-1] + [SN[None]], axis=0)
    return S, K


# ----------------------------------------------------------------------
# Phi propagation  (reference _propagate, fast_SLS_jit.py:87-117)
# ----------------------------------------------------------------------
def propagate(A, B, E, K):
    """Forward-propagate the system-response maps through A + B K[k, j].

    A (N, nx, nx), B (N, nx, nu), E (N+1, nx, nw), K (N, N+1, nu, nx).
    Returns Phi_x (N+1, N+1, nx, nw), Phi_u (N, N+1, nu, nw).
    """
    N, nx = A.shape[0], A.shape[1]
    nw = E.shape[2]

    cols = jnp.arange(N + 1)

    def step(row, inp):
        k, A_k, B_k, K_k, E_k = inp
        # inject this step's diagonal: Phi_x[k, k] = E[k]
        row = jnp.where((cols == k)[:, None, None], E_k[None], row)
        phi_u = jnp.einsum("jui,jiw->juw", K_k, row, precision=tube_prec())
        Acl = A_k[None] + jnp.einsum(
            "iu,juv->jiv", B_k, K_k, precision=tube_prec()
        )
        nxt = jnp.einsum("jiv,jvw->jiw", Acl, row, precision=tube_prec())
        active = (cols <= k)[:, None, None]
        nxt = jnp.where(active, nxt, 0.0)
        phi_u = jnp.where(active, phi_u, 0.0)
        return nxt, (row, phi_u)

    init = jnp.zeros((N + 1, nx, nw), dtype=A.dtype)
    last, (phi_x_rows, phi_u_rows) = lax.scan(
        step, init, (jnp.arange(N), A, B, K, E[:N])
    )
    last = jnp.where((cols == N)[:, None, None], E[N][None], last)
    Phi_x = jnp.concatenate([phi_x_rows, last[None]], axis=0)
    return Phi_x, phi_u_rows


# ----------------------------------------------------------------------
# Backoffs  (reference _backoff_from_phi, fast_SLS_jit.py:120-188)
# ----------------------------------------------------------------------
def backoff_from_phi(Phi_x, Phi_u, Gx, Gu, Gf, epsilon):
    """Row-norm tube tightenings.

    beta[k, j, i] = max(|| (Gx Phi_x[k,j] + Gu Phi_u[k,j])_i ||^2, eps), j <= k
    beta_f[j, i]  = max(|| (Gf Phi_x[N,j])_i ||^2, eps)
    backoff[k]    = sum_{j<=k} sqrt(beta[k, j])
    backoff_f     = sum_j sqrt(beta_f[j])
    """
    N = Phi_u.shape[0]
    Z = jnp.einsum(
        "ri,kjiw->kjrw", Gx, Phi_x[:N], precision=tube_prec()
    ) + jnp.einsum("ru,kjuw->kjrw", Gu, Phi_u, precision=tube_prec())
    beta = jnp.sum(Z * Z, axis=-1)  # (N, N+1, ni) -> trim to (N, N)
    beta = beta[:, :N, :]
    kk = jnp.arange(N)[:, None]
    jj = jnp.arange(N)[None, :]
    tri = (jj <= kk)[:, :, None]
    beta = jnp.where(tri, jnp.maximum(beta, epsilon), 0.0)

    Zf = jnp.einsum("ri,jiw->jrw", Gf, Phi_x[N], precision=tube_prec())
    beta_f = jnp.maximum(jnp.sum(Zf * Zf, axis=-1), epsilon)  # (N+1, ni_f)

    backoff = jnp.sum(jnp.sqrt(jnp.where(tri, beta, 0.0)), axis=1)  # (N, ni)
    backoff_f = jnp.sum(jnp.sqrt(beta_f), axis=0)                   # (ni_f,)
    return beta, beta_f, backoff, backoff_f


# ----------------------------------------------------------------------
# Streaming fused response: propagate + backoffs + tube cost, no Phi
# ----------------------------------------------------------------------
def response_streaming(A, B, E, K, Gx, Gu, Gf, regs: SLSRegs, epsilon):
    """Fused `propagate` + `backoff_from_phi` + `tube_cost` that never
    materializes the O(N^2) system-response tensors.

    The forward scan over stages k carries only the current stage's response
    rows Phi_x[k, :] (shape (N+1, nx, nw)); the constraint row-norms beta[k],
    the backoff sums, and the tube-cost Frobenius accumulation are computed
    in the same step and the rows are then overwritten by stage k+1. Peak
    memory per instance drops from O(N^2 nx nw) (Phi_x + Phi_u stacks) to
    O(N nx nw) — the enabler for very large Monte-Carlo batches (B >= 10k,
    where the Phi stacks alone are ~6 GB; ROUND1.md gap 4).

    Returns (beta, beta_f, backoff, backoff_f, cost_tube), bit-identical in
    exact arithmetic to the materializing kernels (the per-element operations
    and reduction orders match `backoff_from_phi`; the tube-cost reduction
    order differs only in the k-grouping of the same additions).
    """
    N, nx = A.shape[0], A.shape[1]
    cols = jnp.arange(N + 1)
    tp = tube_prec()

    def step(carry, inp):
        row, cost_acc = carry
        k, A_k, B_k, K_k, E_k = inp
        # inject this step's diagonal: Phi_x[k, k] = E[k]
        row = jnp.where((cols == k)[:, None, None], E_k[None], row)
        # row[j] == 0 for j > k, so phi_u inherits the triangular mask
        phi_u = jnp.einsum("jui,jiw->juw", K_k, row, precision=tp)

        # beta[k, j] = rowwise ||Gx Phi_x[k,j] + Gu Phi_u[k,j]||^2, j <= k
        Z = jnp.einsum("ri,jiw->jrw", Gx, row, precision=tp) + jnp.einsum(
            "ru,juw->jrw", Gu, phi_u, precision=tp
        )
        beta_row = jnp.sum(Z * Z, axis=-1)[:N]           # (N, ni)
        tri = (cols[:N] <= k)[:, None]
        beta_row = jnp.where(tri, jnp.maximum(beta_row, epsilon), 0.0)
        backoff_row = jnp.sum(jnp.sqrt(beta_row), axis=0)  # (ni,)

        # tube-cost accumulation (inactive columns are exactly zero)
        qx = jnp.einsum("ab,jbw->jaw", regs.Q_reg, row, precision=tp)
        ru = jnp.einsum("ab,jbw->jaw", regs.R_reg, phi_u, precision=tp)
        cost_acc = cost_acc + jnp.sum(qx * qx) + jnp.sum(ru * ru)

        # advance: Phi_x[k+1, j] = (A_k + B_k K[k, j]) Phi_x[k, j]
        Acl = A_k[None] + jnp.einsum("iu,juv->jiv", B_k, K_k, precision=tp)
        nxt = jnp.einsum("jiv,jvw->jiw", Acl, row, precision=tp)
        nxt = jnp.where((cols <= k)[:, None, None], nxt, 0.0)
        return (nxt, cost_acc), (beta_row, backoff_row)

    init = (
        jnp.zeros((N + 1, nx, E.shape[2]), dtype=A.dtype),
        jnp.zeros((), dtype=A.dtype),
    )
    (last, cost_acc), (beta, backoff) = lax.scan(
        step, init, (jnp.arange(N), A, B, K, E[:N])
    )

    # terminal stage: Phi_x[N, :] = propagated rows + diagonal E[N]
    last = jnp.where((cols == N)[:, None, None], E[N][None], last)
    Zf = jnp.einsum("ri,jiw->jrw", Gf, last, precision=tp)
    beta_f = jnp.maximum(jnp.sum(Zf * Zf, axis=-1), epsilon)   # (N+1, ni_f)
    backoff_f = jnp.sum(jnp.sqrt(beta_f), axis=0)
    qf = jnp.einsum("ab,jbw->jaw", regs.Q_reg_f, last, precision=tp)
    cost_tube = jnp.sqrt(cost_acc + jnp.sum(qf * qf))
    return beta, beta_f, backoff, backoff_f, cost_tube


def response_streaming_folded(A, B, E, K, Gx, Gu, Gf, regs: SLSRegs, epsilon):
    """`response_streaming` restructured so every large product is a single
    GEMM (same inputs/outputs, exact up to FP reassociation).

    The scan carries the current stage's response rows TRANSPOSED —
    P (nx, J, nw) instead of (J, nx, nw) — so the shared-operand products
    (Gx Phi, A_k Phi, Q_reg Phi, and their phi_u analogues) all flatten to
    plain (·, nx) @ (nx, J*nw) GEMMs with a 272-wide trailing dimension for
    the reference shapes, instead of J-batched (·, nx) @ (nx, nw) slivers.
    Only phi_u = K_j Phi_j stays a genuinely batched small contraction (K
    varies per column).
    """
    N, nx = A.shape[0], A.shape[1]
    nw = E.shape[2]
    J = N + 1
    tp = tube_prec()
    cols = jnp.arange(J)

    def step(carry, inp):
        P, cost_acc = carry  # P (nx, J, nw): Phi_x[k, :, :, :] transposed
        k, A_k, B_k, K_k, E_k = inp
        # inject this step's diagonal: Phi_x[k, k] = E[k]
        P = jnp.where((cols == k)[None, :, None], E_k[:, None, :], P)
        phi_u = jnp.einsum("jui,ijw->ujw", K_k, P, precision=tp)  # (nu, J, nw)
        P_flat = P.reshape(nx, J * nw)
        pu_flat = phi_u.reshape(-1, J * nw)
        Z = jnp.matmul(Gx, P_flat, precision=tp) + jnp.matmul(
            Gu, pu_flat, precision=tp
        )                                                          # (ni, J*nw)
        beta_all = jnp.sum(Z.reshape(-1, J, nw) ** 2, axis=-1)     # (ni, J)
        beta_row = beta_all.T[:N]                                  # (N, ni)
        tri = (cols[:N] <= k)[:, None]
        beta_row = jnp.where(tri, jnp.maximum(beta_row, epsilon), 0.0)
        backoff_row = jnp.sum(jnp.sqrt(beta_row), axis=0)          # (ni,)

        qx = jnp.matmul(regs.Q_reg, P_flat, precision=tp)
        ru = jnp.matmul(regs.R_reg, pu_flat, precision=tp)
        cost_acc = cost_acc + jnp.sum(qx * qx) + jnp.sum(ru * ru)

        nxt = jnp.matmul(A_k, P_flat, precision=tp) + jnp.matmul(
            B_k, pu_flat, precision=tp
        )
        nxt = nxt.reshape(nx, J, nw)
        nxt = jnp.where((cols <= k)[None, :, None], nxt, 0.0)
        return (nxt, cost_acc), (beta_row, backoff_row)

    init = (
        jnp.zeros((nx, J, nw), dtype=A.dtype),
        jnp.zeros((), dtype=A.dtype),
    )
    (last, cost_acc), (beta, backoff) = lax.scan(
        step, init, (jnp.arange(N), A, B, K, E[:N])
    )

    last = jnp.where((cols == N)[None, :, None], E[N][:, None, :], last)
    last_flat = last.reshape(nx, J * nw)
    Zf = jnp.matmul(Gf, last_flat, precision=tp)
    beta_f = jnp.maximum(
        jnp.sum(Zf.reshape(-1, J, nw) ** 2, axis=-1), epsilon
    ).T                                                            # (J, ni_f)
    backoff_f = jnp.sum(jnp.sqrt(beta_f), axis=0)
    qf = jnp.matmul(regs.Q_reg_f, last_flat, precision=tp)
    cost_tube = jnp.sqrt(cost_acc + jnp.sum(qf * qf))
    return beta, beta_f, backoff, backoff_f, cost_tube


def response_streaming_blocked(A, B, E, K, Gx, Gu, Gf, regs: SLSRegs, epsilon,
                               block=8):
    """`response_streaming_folded` with triangular column-blocking (the
    forward mirror of `backward_solve_blocked`): the scan over stages is
    split into segments of `block` stages, and segment s carries only the
    columns j < hi = min((s+1)*block, N) that can already be active there —
    the carry gains a zero column block at each segment boundary instead of
    multiplying not-yet-active zero columns through every GEMM. Same
    outputs, per-column arithmetic identical to the folded kernel.

    NOTE: deliberately duplicates `response_streaming_folded`'s step body
    (see `backward_solve_blocked` for why the two stay separate); mirror any
    fix in both — tests/test_sls_kernels.py pins their equality."""
    N, nx = A.shape[0], A.shape[1]
    nw = E.shape[2]
    J = N + 1
    ni = Gx.shape[0]
    tp = tube_prec()

    def make_step(W):
        cols = jnp.arange(W)

        def step(carry, inp):
            P, cost_acc = carry  # P (nx, W, nw)
            k, A_k, B_k, K_k, E_k = inp  # K_k (W, nu, nx)
            P = jnp.where((cols == k)[None, :, None], E_k[:, None, :], P)
            phi_u = jnp.einsum("jui,ijw->ujw", K_k, P, precision=tp)
            P_flat = P.reshape(nx, W * nw)
            pu_flat = phi_u.reshape(-1, W * nw)
            Z = jnp.matmul(Gx, P_flat, precision=tp) + jnp.matmul(
                Gu, pu_flat, precision=tp
            )
            beta_all = jnp.sum(Z.reshape(-1, W, nw) ** 2, axis=-1)  # (ni, W)
            tri = (cols <= k)[:, None]
            beta_row = jnp.where(
                tri, jnp.maximum(beta_all.T, epsilon), 0.0
            )                                                        # (W, ni)
            backoff_row = jnp.sum(jnp.sqrt(beta_row), axis=0)

            qx = jnp.matmul(regs.Q_reg, P_flat, precision=tp)
            ru = jnp.matmul(regs.R_reg, pu_flat, precision=tp)
            cost_acc = cost_acc + jnp.sum(qx * qx) + jnp.sum(ru * ru)

            nxt = jnp.matmul(A_k, P_flat, precision=tp) + jnp.matmul(
                B_k, pu_flat, precision=tp
            )
            nxt = nxt.reshape(nx, W, nw)
            nxt = jnp.where((cols <= k)[None, :, None], nxt, 0.0)
            return (nxt, cost_acc), (beta_row, backoff_row)

        return step

    n_seg = -(-N // block)
    W0 = min(block, N)
    P = jnp.zeros((nx, W0, nw), dtype=A.dtype)
    cost_acc = jnp.zeros((), dtype=A.dtype)
    beta_segs, backoff_rows = [], []
    for s in range(n_seg):
        lo, hi = s * block, min((s + 1) * block, N)
        W = hi
        P = jnp.pad(P, [(0, 0), (0, W - P.shape[1]), (0, 0)])
        (P, cost_acc), (beta_st, boff_st) = lax.scan(
            make_step(W), (P, cost_acc),
            (jnp.arange(lo, hi), A[lo:hi], B[lo:hi], K[lo:hi, :W], E[lo:hi]),
        )
        beta_segs.append(jnp.pad(beta_st, [(0, 0), (0, N - W), (0, 0)]))
        backoff_rows.append(boff_st)
    beta = jnp.concatenate(beta_segs, axis=0)       # (N, N, ni)
    backoff = jnp.concatenate(backoff_rows, axis=0)  # (N, ni)

    # terminal stage: all J columns, diagonal injection for column N
    last = jnp.pad(P, [(0, 0), (0, J - P.shape[1]), (0, 0)])
    cols = jnp.arange(J)
    last = jnp.where((cols == N)[None, :, None], E[N][:, None, :], last)
    last_flat = last.reshape(nx, J * nw)
    Zf = jnp.matmul(Gf, last_flat, precision=tp)
    beta_f = jnp.maximum(
        jnp.sum(Zf.reshape(-1, J, nw) ** 2, axis=-1), epsilon
    ).T                                              # (J, ni_f)
    backoff_f = jnp.sum(jnp.sqrt(beta_f), axis=0)
    qf = jnp.matmul(regs.Q_reg_f, last_flat, precision=tp)
    cost_tube = jnp.sqrt(cost_acc + jnp.sum(qf * qf))
    return beta, beta_f, backoff, backoff_f, cost_tube


def response_column(j, K_col, A, B, E, Gx, Gu, Gf, regs: SLSRegs, epsilon,
                    phi0=None):
    """Streaming response for ONE SLS column j: propagate Phi_x[:, j] through
    A_k + B_k K[k, j], accumulating the column's backoff terms and tube-cost
    contribution without materializing Phi.

    K_col (N, nu, nx) = K[:, j]. Returns:
        beta_col   (N, ni)   = beta[:, j]   (zero for stages k < j)
        beta_f_j   (ni_f,)   = beta_f[j]
        cost_sq_j  ()        column contribution to the squared tube cost

    Columns are fully independent — this is the unit sharded over a device
    mesh by `parallel/columns.py` for large horizons; `backoff[k]` then
    reduces as a psum of sqrt(beta_col[k]) over the column axis.
    A padded (inactive) column is encoded by j > N: it propagates zeros and
    contributes exactly zero to every output (the epsilon floor is masked).
    `phi0` overrides the zero scan-carry init — inside `shard_map` the carry
    must be marked device-varying (`jax.lax.pcast(zeros, axis, to='varying')`,
    see parallel/columns.py).
    """
    N, nx = A.shape[0], A.shape[1]
    nw = E.shape[2]
    tp = tube_prec()

    def step(phi, inp):
        k, A_k, B_k, K_k, E_k = inp
        # inject the diagonal: Phi_x[j, j] = E[j]
        phi = jnp.where(k == j, E_k, phi)
        phi_u = jnp.matmul(K_k, phi, precision=tp)
        Z = jnp.matmul(Gx, phi, precision=tp) + jnp.matmul(Gu, phi_u, precision=tp)
        active = k >= j
        beta_kj = jnp.where(
            active, jnp.maximum(jnp.sum(Z * Z, axis=-1), epsilon), 0.0
        )
        qx = jnp.matmul(regs.Q_reg, phi, precision=tp)
        ru = jnp.matmul(regs.R_reg, phi_u, precision=tp)
        cost_k = jnp.sum(qx * qx) + jnp.sum(ru * ru)
        Acl = A_k + jnp.matmul(B_k, K_k, precision=tp)
        nxt = jnp.matmul(Acl, phi, precision=tp)
        nxt = jnp.where(active, nxt, jnp.zeros_like(phi))
        return nxt, (beta_kj, cost_k)

    if phi0 is None:
        phi0 = jnp.zeros((nx, nw), dtype=A.dtype)
    last, (beta_col, cost_ks) = lax.scan(
        step, phi0, (jnp.arange(N), A, B, K_col, E[:N])
    )
    # terminal row: Phi_x[N, j] (diagonal injection for the j = N column)
    last = jnp.where(j == N, E[N], last)
    Zf = jnp.matmul(Gf, last, precision=tp)
    live = j <= N  # padded columns must contribute exactly zero
    beta_f_j = jnp.where(
        live, jnp.maximum(jnp.sum(Zf * Zf, axis=-1), epsilon), 0.0
    )
    qf = jnp.matmul(regs.Q_reg_f, last, precision=tp)
    cost_sq_j = jnp.sum(cost_ks) + jnp.sum(qf * qf)
    return beta_col, beta_f_j, cost_sq_j


# ----------------------------------------------------------------------
# Tube cost  (reference util/SLS.py:38-46 eval_cost)
# ----------------------------------------------------------------------
def tube_cost(Phi_x, Phi_u, regs: SLSRegs):
    """|| blkdiag(kron(I_N, Q_reg), Q_reg_f, kron(I_N, R_reg)) [Phi_x; Phi_u] ||_F."""
    N = Phi_u.shape[0]
    qx = jnp.einsum("ab,kjbw->kjaw", regs.Q_reg, Phi_x[:N], precision=tube_prec())
    qf = jnp.einsum("ab,jbw->jaw", regs.Q_reg_f, Phi_x[N], precision=tube_prec())
    ru = jnp.einsum("ab,kjbw->kjaw", regs.R_reg, Phi_u, precision=tube_prec())
    total = jnp.sum(qx * qx) + jnp.sum(qf * qf) + jnp.sum(ru * ru)
    return jnp.sqrt(total)


# ----------------------------------------------------------------------
# Block tensor <-> matrix  (reference util/SLS.py:48-75)
# ----------------------------------------------------------------------
def tensor_to_matrix(t):
    """(P, M, n, m) block tensor -> (P n, M m) block matrix."""
    P, M, n, m = t.shape
    return jnp.transpose(t, (0, 2, 1, 3)).reshape(P * n, M * m)


def matrix_to_tensor(mat, P, M, n, m):
    return mat.reshape(P, n, M, m).transpose(0, 2, 1, 3)
