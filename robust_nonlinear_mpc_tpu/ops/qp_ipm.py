"""Batched horizon-structured QP solver: Riccati-KKT primal-dual interior point.

This is the TPU-native replacement for the reference's OSQP/codegen front-end
(`solver/qp_jit.py` + the generated `osqp_generated` C extension; SURVEY.md
§2.3). Instead of a generic sparse-CSC ADMM in C, the horizon structure is
exploited directly:

  * the QP is stored as dense per-stage blocks (A_k, B_k, c_k, h_k) in
    (N, ...) arrays — never CSC; recompile only on shape change (XLA jit),
  * each interior-point Newton step is solved by a *block-tridiagonal Riccati
    factorization* over the horizon (`lax.scan`), i.e. O(N) small dense
    factorizations instead of a generic sparse LDL,
  * everything is a pure function of pytrees -> `jax.vmap` gives thousands of
    independent QP solves per chip, `jax.jit` fuses each iteration.

Problem solved (the reference's QP contract, qp_jit.py:102-192):

    min_{X,U}  sum_k x_k' Q x_k + u_k' R u_k + x_N' Qf x_N + q' y
    s.t.       x_0 = xinit
               x_{k+1} = A_k x_k + B_k u_k + c_k          k = 0..N-1
               Gx x_k + Gu u_k <= h_k                     k = 0..N-1
               Gf x_N <= hf

(cost convention: y' P y + q' y with P = blkdiag(Q, R, ..., Qf), matching the
reference's CasADi h = 2*P / OSQP P = 2*P convention, qp_jit.py:287-349).

Accuracy target: the reference runs OSQP at eps_abs = eps_rel = 1e-9 with
polish (qp_jit.py:295-306). A Mehrotra predictor-corrector IPM reaches that
KKT accuracy in ~10-25 iterations in f64; in f32 (TPU throughput path) use
a looser tolerance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from robust_nonlinear_mpc_tpu.utils.numerics import (
    mm,
    mv,
    qp_dir_prec,
    spd_solve_refined,
    sym,
)


def _dmv(a, b):
    """Matvec at the IPM direction precision. Raw `@` matvecs are FORBIDDEN
    on solver paths: unbatched they run full-f32 (VPU), but under vmap they
    become batched MXU GEMMs at DEFAULT (bf16) precision — measured r3: the
    vmapped QP's KKT residual degraded 6x (1.6e-4 -> 9.3e-4) on TPU versus
    the identical unbatched program, stalling converged-mode SCP at a 0.02
    delta plateau. Every matmul must pin a precision."""
    return jnp.matmul(a, b[..., None], precision=qp_dir_prec())[..., 0]


class QPStatics(NamedTuple):
    """Quadratic-cost and constraint-geometry blocks (fixed across SCP iters).

    Hx = 2Q, Hu = 2R, HxN = 2Qf are the Hessian blocks of y'Py + q'y.

    Hx/Hu/Gx/Gu may be either time-invariant (2-D, the common case) or
    per-stage stacks with a leading horizon axis (3-D: Hx (N, nx, nx), ...) —
    `solve_qp` normalizes to per-stage form internally. Per-stage statics are
    what the soft-constrained NLP uses (slack-augmented stages + a terminal
    slack stage; solvers/soft_nlp.py).
    """

    Hx: jax.Array   # (nx, nx) or (N, nx, nx)
    Hu: jax.Array   # (nu, nu) or (N, nu, nu)
    HxN: jax.Array  # (nx, nx)
    Gx: jax.Array   # (ni, nx) or (N, ni, nx)
    Gu: jax.Array   # (ni, nu) or (N, ni, nu)
    Gf: jax.Array   # (ni_f, nx)

    def per_stage(self, N: int) -> "QPStatics":
        """Broadcast 2-D blocks to per-stage (N, ...) stacks (free in XLA)."""
        b = lambda M: M if M.ndim == 3 else jnp.broadcast_to(M[None], (N,) + M.shape)
        return QPStatics(
            Hx=b(self.Hx), Hu=b(self.Hu), HxN=self.HxN,
            Gx=b(self.Gx), Gu=b(self.Gu), Gf=self.Gf,
        )


class QPData(NamedTuple):
    """Per-solve numeric data (updated every SCP / fast-SLS iteration)."""

    A: jax.Array      # (N, nx, nx)
    B: jax.Array      # (N, nx, nu)
    c: jax.Array      # (N, nx)   dynamics affine term (x+ = Ax + Bu + c)
    qx: jax.Array     # (N+1, nx) linear cost on states (row N = terminal)
    qu: jax.Array     # (N, nu)   linear cost on inputs
    h: jax.Array      # (N, ni)   stage inequality rhs
    hf: jax.Array     # (ni_f,)   terminal inequality rhs
    xinit: jax.Array  # (nx,)     pinned initial state


class QPSolution(NamedTuple):
    X: jax.Array        # (N+1, nx)
    U: jax.Array        # (N, nu)
    lam: jax.Array      # (N, ni)   stage inequality duals  (>= 0)
    lam_f: jax.Array    # (ni_f,)   terminal inequality duals
    nu_dyn: jax.Array   # (N, nx)   dynamics equality duals
    nu_init: jax.Array  # (nx,)     dual of the x_0 = xinit pin
    s: jax.Array        # (N, ni)   stage slacks
    s_f: jax.Array      # (ni_f,)
    cost: jax.Array     # scalar: y'Py + q'y
    kkt_res: jax.Array  # scalar max-norm KKT residual at exit
    iters: jax.Array    # scalar int
    success: jax.Array  # scalar bool


class IPMOptions(NamedTuple):
    max_iter: int = 30
    tol: float = 1e-9
    tau: float = 0.995      # fraction-to-boundary
    init_slack: float = 1.0
    # Newton-step linear solver:
    #   "riccati"   — block-tridiagonal Riccati factorization, lax.scan over
    #                 the horizon (O(N) sequential steps; max accuracy),
    #   "condensed" — scan-free: states eliminated through the dynamics once
    #                 per QP (transition/controllability tensors, W-independent
    #                 reduced Hessian part), each IPM iteration then assembles
    #                 H = Hq + M' W M, Jacobi-equilibrates, inverts by
    #                 recursive block-Schur (utils.numerics.spd_inverse) with
    #                 Newton-Schulz polish, and runs two exact-matvec
    #                 refinement passes.
    #   "pallas"    — same Riccati factorization, executed as fused Pallas
    #                 TPU kernels with the batch on the 128-lane axis
    #                 (ops/pallas_qp.py): one kernel per Newton solve
    #                 instead of ~60 XLA scan steps per IPM iteration.
    #                 Requires a BATCHED (vmapped) solve on TPU; unbatched
    #                 calls fall back to equivalent XLA scans, and the CPU
    #                 backend runs the kernels in interpret mode (tests).
    #                 Measured 2.2x end-to-end (35.7k vs 16.3k closed-loop
    #                 solves/s at B=512) with identical iteration counts.
    #   "pallas_iter" — EXPERIMENTAL: the ENTIRE Mehrotra iteration as one
    #                 fused kernel. Numerically verified identical to
    #                 riccati, but its remote compile exceeded practical
    #                 windows on this environment — see the STATUS note in
    #                 ops/pallas_qp.py before using.
    #
    # "condensed" MEASURED AND REJECTED as the default (v5e, rocket N=15,
    # B=256, f32): a condensed iteration costs ~13.8 ms vs ~4.1 ms for
    # riccati — the dense Hq/M'WM assembly and inverse polish far outweigh
    # the saved scan latency — and cond(H) ~ 1/mu^2 makes the explicit
    # inverse f32-unstable once mu < ~1e-4 (the Riccati recursion never
    # forms these products and stays stable to convergence). Exact to
    # ~1e-12 vs riccati in f64 at moderate conditioning
    # (tests/test_qp_ipm.py); kept for research use.
    kkt: str = "riccati"


# ----------------------------------------------------------------------
# Residuals
# ----------------------------------------------------------------------
def _residuals(stat: QPStatics, data: QPData, X, U, lam, s, lam_f, s_f, nu_dyn):
    N = data.A.shape[0]
    # dynamics: A x_k + B u_k + c_k - x_{k+1}
    req = (
        jnp.einsum("kij,kj->ki", data.A, X[:N], precision=lax.Precision.HIGHEST)
        + jnp.einsum("kij,kj->ki", data.B, U, precision=lax.Precision.HIGHEST)
        + data.c
        - X[1 : N + 1]
    )
    # inequalities (with slacks); stat is in per-stage form
    hp = lax.Precision.HIGHEST
    GzX = jnp.einsum("kri,ki->kr", stat.Gx, X[:N], precision=hp)
    GzU = jnp.einsum("kru,ku->kr", stat.Gu, U, precision=hp)
    rineq = GzX + GzU + s - data.h
    rineq_f = mv(stat.Gf, X[N]) + s_f - data.hf

    # stationarity
    # rx_k (k=1..N-1): Hx_k x_k + qx_k + Gx_k' lam_k + nu_{k-1} - A_k' nu_k
    rx = (
        jnp.einsum("kij,kj->ki", stat.Hx[1:N], X[1:N], precision=hp)
        + data.qx[1:N]
        + jnp.einsum("kri,kr->ki", stat.Gx[1:N], lam[1:N], precision=hp)
        + nu_dyn[: N - 1]
        - jnp.einsum("kji,kj->ki", data.A[1:N], nu_dyn[1:N], precision=hp)
    )
    rxN = mv(stat.HxN, X[N]) + data.qx[N] + mv(stat.Gf.T, lam_f) + nu_dyn[N - 1]
    ru = (
        jnp.einsum("kij,kj->ki", stat.Hu, U, precision=hp)
        + data.qu
        + jnp.einsum("kru,kr->ku", stat.Gu, lam, precision=hp)
        - jnp.einsum("kji,kj->ki", data.B, nu_dyn, precision=hp)
    )
    return req, rineq, rineq_f, rx, rxN, ru


def _max_abs(*arrs):
    return jnp.max(jnp.stack([jnp.max(jnp.abs(a)) for a in arrs]))


# ----------------------------------------------------------------------
# Riccati factorization (once per IPM iteration)
# ----------------------------------------------------------------------
def _curvature(stat: QPStatics, W, W_f):
    """Stage Hessians of the reduced KKT system after eliminating
    (dlam, ds): Cxx = Hx + Gx' W Gx, Cuu = Hu + Gu' W Gu, Cxu = Gx' W Gu,
    PN = HxN + Gf' W_f Gf (shared by the riccati and pallas paths)."""
    Gx, Gu, Gf = stat.Gx, stat.Gu, stat.Gf
    dp = qp_dir_prec()
    WGx = W[:, :, None] * Gx
    WGu = W[:, :, None] * Gu
    Cxx = stat.Hx + jnp.einsum("kri,krj->kij", Gx, WGx, precision=dp)
    Cuu = stat.Hu + jnp.einsum("kru,krv->kuv", Gu, WGu, precision=dp)
    Cxu = jnp.einsum("kri,krv->kiv", Gx, WGu, precision=dp)
    PN = stat.HxN + jnp.matmul(Gf.T, W_f[:, None] * Gf, precision=dp)
    return Cxx, Cuu, Cxu, PN


def _factorize_with_presolve(stat: QPStatics, data: QPData, W, W_f,
                             rbx, rbxN, rbu, req):
    """Backward Riccati factorization of the reduced (equality-only) KKT
    system (W = lam/s; stage Hessians after eliminating (dlam, ds):
    Cxx_k = Hx + Gx' W_k Gx, Cuu_k = Hu + Gu' W_k Gu, Cxu_k = Gx' W_k Gu),
    fused with the backward sweep of the first (predictor) Newton solve:
    the predictor rhs is available before the factorization, so ONE reverse
    scan produces both the per-stage factors and the predictor feedforward
    terms — one fewer sequential scan per IPM
    iteration than factorize-then-backward-solve, and the factors are
    consumed while still live instead of round-tripping through HBM. The
    gain solve (nx rhs columns) and the feedforward solve (1 rhs column)
    share a single blockwise-Schur SPD solve on a concatenated rhs.

    Returns (fact, (kff, p_next_seq)); `fact` feeds `_solve_newton` for the
    corrector re-solve, (kff, p_next_seq) feed `_forward_sweep`.
    """
    dp = qp_dir_prec()
    dmm = lambda a, b: jnp.matmul(a, b, precision=dp)
    Cxx, Cuu, Cxu, PN = _curvature(stat, W, W_f)
    nx = req.shape[1]

    def bwd(carry, blocks):
        P_next, p_next = carry
        A, B, Cxx_k, Cuu_k, Cxu_k, rbx_k, rbu_k, req_k = blocks
        PA = dmm(P_next, A)
        PB = dmm(P_next, B)
        Fxx = Cxx_k + dmm(A.T, PA)
        Fuu = Cuu_k + dmm(B.T, PB)
        Fxu = Cxu_k + dmm(A.T, PB)
        n_u = Fuu.shape[0]
        Fuu_r = sym(Fuu) + jnp.trace(Fuu) * 1e-14 * jnp.eye(n_u, dtype=Fuu.dtype)
        w = p_next + dmm(P_next, req_k[:, None])[:, 0]
        f_u = rbu_k + _dmv(B.T, w)
        sol = -spd_solve_refined(
            Fuu_r, jnp.concatenate([Fxu.T, f_u[:, None]], axis=1)
        )
        K = sol[:, :nx]
        kff = sol[:, nx]
        P = sym(Fxx + mm(Fxu, K))
        p = rbx_k + _dmv(A.T, w) + _dmv(Fxu, kff)
        return (P, p), (K, Fuu_r, Fxu, P_next, kff, p_next)

    blocks = (data.A, data.B, Cxx, Cuu, Cxu, rbx, rbu, req)
    _, (K, Fuu_seq, Fxu_seq, P_next_seq, kff, p_next_seq) = lax.scan(
        bwd, (PN, rbxN), blocks, reverse=True
    )
    return (K, Fuu_seq, Fxu_seq, P_next_seq), (kff, p_next_seq)


def _forward_sweep(data: QPData, K, kff, req, P_next_seq, p_next_seq):
    """Forward sweep of the Riccati Newton solve: roll dx through the
    dynamics under du = K dx + kff and recover the dynamics multipliers."""
    nx = req.shape[1]

    def fwd(dx, per_k):
        A, B, K_k, kff_k, req_k, Pn, p_next = per_k
        du = _dmv(K_k, dx) + kff_k
        dx_next = _dmv(A, dx) + _dmv(B, du) + req_k
        dnu = -(_dmv(Pn, dx_next) + p_next)
        return dx_next, (dx, du, dnu)

    per_k_f = (data.A, data.B, K, kff, req, P_next_seq, p_next_seq)
    dxN, (dX_head, dU, dnu) = lax.scan(fwd, jnp.zeros(nx, dtype=req.dtype), per_k_f)
    dX = jnp.concatenate([dX_head, dxN[None]], axis=0)
    return dX, dU, dnu


def _solve_newton(stat: QPStatics, data: QPData, fact, rbx, rbxN, rbu, req):
    """Solve the reduced KKT system for one rhs using the cached factorization.

    rbx: (N, nx) modified stationarity rhs for x_1..x_N-1 (row 0 unused),
    rbxN: (nx,), rbu: (N, nu), req: (N, nx).
    Returns dX (N+1, nx), dU (N, nu), dnu (N, nx).
    """
    K, Fuu_seq, Fxu, P_next_seq = fact

    dp = qp_dir_prec()

    def bwd(p_next, per_k):
        A, B, Fuu_k, Fxu_k, Pn, rbx_k, rbu_k, req_k = per_k
        w = p_next + jnp.matmul(Pn, req_k[:, None], precision=dp)[:, 0]
        f_u = rbu_k + _dmv(B.T, w)
        kff = -spd_solve_refined(Fuu_k, f_u[:, None])[:, 0]
        p = rbx_k + _dmv(A.T, w) + _dmv(Fxu_k, kff)
        return p, (kff, p_next)

    per_k = (data.A, data.B, Fuu_seq, Fxu, P_next_seq, rbx, rbu, req)
    _, (kff, p_next_seq) = lax.scan(bwd, rbxN, per_k, reverse=True)
    return _forward_sweep(data, K, kff, req, P_next_seq, p_next_seq)


# ----------------------------------------------------------------------
# Condensed KKT: eliminate states through the dynamics (scan-free Newton)
# ----------------------------------------------------------------------
class CondensedKKT(NamedTuple):
    """Per-QP precompute for the "condensed" Newton solver (W-independent;
    depends only on (A, B) and the constraint/cost statics, so it is shared
    by every IPM iteration and by the untightened/tightened QP solves of one
    fast-SLS iteration)."""

    Ash: jax.Array   # (N+1, N, nx, nx)   Ash[k, j] = A_{k-1}...A_{j+1} (state
    #                  transition from stage j+1 to k; zero for j+1 > k)
    Bbar: jax.Array  # (N+1, N, nx, nu)   dX_k / dU_j = Ash[k, j] B_j
    M2: jax.Array    # (N ni + ni_f, N nu) stacked ineq sensitivity to dU
    Hq: jax.Array    # (N nu, N nu)        blkdiag(Hu) + Bbar' Hx_aug Bbar
    Hx_aug: jax.Array  # (N+1, nx, nx)     [Hx_0..Hx_{N-1}, HxN]


def condense(stat: QPStatics, A: jax.Array, B: jax.Array) -> CondensedKKT:
    """Build the condensed-KKT tensors. `stat` must be in per-stage form."""
    N, nx, _ = A.shape
    nu = B.shape[2]
    ni = stat.Gx.shape[1]
    dtype = A.dtype
    hp = lax.Precision.HIGHEST
    cols = jnp.arange(N + 1)
    eye = jnp.eye(nx, dtype=dtype)

    # Abar rows by a forward scan: row_k[j] = Abar[k, j] = A_{k-1}...A_j
    def step(row, inp):
        k, A_k = inp
        nxt = jnp.einsum("ab,jbc->jac", A_k, row, precision=hp)
        nxt = jnp.where((cols == k + 1)[:, None, None], eye[None], nxt)
        nxt = jnp.where((cols <= k + 1)[:, None, None], nxt, 0.0)
        return nxt, nxt

    row0 = jnp.where((cols == 0)[:, None, None], eye[None], 0.0)
    _, rows = lax.scan(step, row0, (jnp.arange(N), A))
    Abar = jnp.concatenate([row0[None], rows], axis=0)  # (N+1, N+1, nx, nx)
    Ash = Abar[:, 1:]                                   # Ash[k, j] = Abar[k, j+1]
    Bbar = jnp.einsum("kjab,jbu->kjau", Ash, B, precision=hp)

    Mt = jnp.einsum("kri,kjiu->krju", stat.Gx, Bbar[:N], precision=hp)
    Mt = Mt.at[jnp.arange(N), :, jnp.arange(N), :].add(stat.Gu)
    Mf = jnp.einsum("ri,jiu->rju", stat.Gf, Bbar[N], precision=hp)
    M2 = jnp.concatenate(
        [Mt.reshape(N * ni, N * nu), Mf.reshape(-1, N * nu)], axis=0
    )

    Hx_aug = jnp.concatenate([stat.Hx, stat.HxN[None]], axis=0)
    HB = jnp.einsum("kab,kjbu->kjau", Hx_aug, Bbar, precision=hp)
    Hq = jnp.einsum("kjau,klav->julv", Bbar, HB, precision=hp).reshape(
        N * nu, N * nu
    )
    for k in range(N):
        Hq = Hq.at[k * nu : (k + 1) * nu, k * nu : (k + 1) * nu].add(stat.Hu[k])
    return CondensedKKT(Ash=Ash, Bbar=Bbar, M2=M2, Hq=Hq, Hx_aug=Hx_aug)


def _condensed_newton(stat: QPStatics, pre: CondensedKKT, W, W_f, req):
    """Return a Newton-solve closure for the current IPM iteration weights."""
    from robust_nonlinear_mpc_tpu.utils.numerics import spd_inverse

    N, ni = W.shape
    nx = req.shape[1]
    nu = pre.Bbar.shape[3]
    hp = lax.Precision.HIGHEST

    wf = jnp.concatenate([W.reshape(-1), W_f])                 # (nc,)
    WM = wf[:, None] * pre.M2
    Hmat = sym(pre.Hq + jnp.matmul(pre.M2.T, WM, precision=hp))
    # Jacobi scaling: the IPM weights spread over many orders of magnitude
    # as mu -> 0 (cond(H) ~ 1/mu^2); the block-Schur recursion needs the
    # equilibrated matrix to stay accurate. Solves then run in the scaled
    # space with two iterative-refinement passes on the EXACT matvec.
    dinv = lax.rsqrt(jnp.maximum(jnp.diagonal(Hmat), jnp.finfo(Hmat.dtype).tiny))
    Hs = Hmat * dinv[:, None] * dinv[None, :]
    eps_m = jnp.finfo(Hmat.dtype).eps
    eye = jnp.eye(Hs.shape[0], dtype=Hs.dtype)
    Hs_inv = spd_inverse(Hs + 10.0 * eps_m * eye)
    # Newton-Schulz polish: the recursive block-Schur inverse loses
    # ~cond^2 * eps accuracy; each NS step squares the inverse error
    # (two matmuls, still scan-free), restoring ~cond * eps quality so the
    # downstream iterative refinement contracts.
    for _ in range(4):
        Hs_inv = sym(
            jnp.matmul(
                Hs_inv, 2.0 * eye - jnp.matmul(Hs, Hs_inv, precision=hp),
                precision=hp,
            )
        )

    def happly_inv(rhs):
        return dinv * jnp.matmul(Hs_inv, dinv * rhs, precision=hp)

    # affine state response to the dynamics residuals (dx_0 = 0 always)
    rbar = jnp.einsum("kjab,jb->ka", pre.Ash, req, precision=hp)  # (N+1, nx)
    mbar = jnp.concatenate(
        [
            jnp.einsum("kri,ki->kr", stat.Gx, rbar[:N], precision=hp).reshape(-1),
            jnp.matmul(stat.Gf, rbar[N][:, None], precision=hp)[:, 0],
        ]
    )
    W_mbar = wf * mbar

    def hmul(x):
        return jnp.matmul(pre.Hq, x, precision=hp) + jnp.matmul(
            pre.M2.T, wf * jnp.matmul(pre.M2, x, precision=hp), precision=hp
        )

    def nsolve(rbx, rbxN, rbu):
        rbx_aug = jnp.concatenate([rbx, rbxN[None]], axis=0)   # (N+1, nx)
        v = (
            jnp.einsum("kab,kb->ka", pre.Hx_aug, rbar, precision=hp) + rbx_aug
        )
        g = (
            jnp.einsum("kjau,ka->ju", pre.Bbar, v, precision=hp).reshape(-1)
            + jnp.matmul(pre.M2.T, W_mbar, precision=hp)
            + rbu.reshape(-1)
        )
        dU = -happly_inv(g)
        # two refinement steps with the exact matvec
        dU = dU + happly_inv(-g - hmul(dU))
        dU = dU + happly_inv(-g - hmul(dU))
        dUr = dU.reshape(N, nu)
        dX = jnp.einsum("kjau,ju->ka", pre.Bbar, dUr, precision=hp) + rbar
        return dX, dUr

    def dnu_from(dX, dU, dlam, dlam_f, rx, rxN):
        """Dynamics duals via the adjoint transition map from the ORIGINAL
        stationarity rows: dnu_k = -sum_{l > k} Abar[l, k+1]' s_l with
        s_l = Hx_l dx_l + Gx_l' dlam_l + rx_l. Using the recovered dlam
        (not W (G dz), which amplifies dX roundoff by W ~ 1/mu) keeps the
        recovery stable all the way to convergence."""
        s_stage = (
            jnp.einsum("kab,kb->ka", stat.Hx[1:N], dX[1:N], precision=hp)
            + jnp.einsum("kri,kr->ki", stat.Gx[1:N], dlam[1:N], precision=hp)
            + rx
        )
        s_term = mv(stat.HxN, dX[N]) + mv(stat.Gf.T, dlam_f) + rxN
        s_aug = jnp.concatenate(
            [jnp.zeros((1, nx), dtype=dX.dtype), s_stage, s_term[None]], axis=0
        )
        return -jnp.einsum("lkab,la->kb", pre.Ash, s_aug, precision=hp)

    return nsolve, dnu_from


def _step_to_boundary(v, dv, tau):
    """max alpha in (0, 1] with v + alpha dv >= (1 - tau) v elementwise."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, tau * jnp.min(ratio))


# ----------------------------------------------------------------------
# Main solve
# ----------------------------------------------------------------------
def solve_qp(
    stat: QPStatics,
    data: QPData,
    opts: IPMOptions = IPMOptions(),
    init: QPSolution | None = None,
    pre: CondensedKKT | None = None,
    max_iter_dyn=None,
) -> QPSolution:
    """Solve one horizon-structured QP. Pure function: jit/vmap/shard-friendly.

    `max_iter_dyn`: optional TRACED iteration cap overriding the static
    opts.max_iter — the steady-state-aware budget (FastSLSOptions.
    adaptive_ipm_budget) switches a lane between a tight steady cap and the
    full cold budget without recompiling.

    `init`: optional warm start (e.g. the untightened solve feeding the
    tightened re-solve in fast-SLS): primal from init, slacks re-centered to
    the new bounds with a strict-interior margin, duals floored away from
    zero — cuts Mehrotra iterations roughly in half on nearby problems
    without changing the solution (the reference runs OSQP cold each time,
    qp_jit.py:303 warm_start=False; warm starting only changes iteration
    counts, never the optimum of this strictly convex QP).
    """
    if opts.kkt not in ("riccati", "condensed", "pallas", "pallas_iter"):
        raise ValueError(
            "IPMOptions.kkt must be 'riccati', 'condensed', 'pallas' or "
            f"'pallas_iter', got {opts.kkt!r}"
        )
    _mi_cap = (
        jnp.asarray(opts.max_iter, jnp.int32)
        if max_iter_dyn is None
        else jnp.asarray(max_iter_dyn, jnp.int32)
    )
    N, nx = data.c.shape
    nu = data.B.shape[2]
    stat = stat.per_stage(N)
    ni = stat.Gx.shape[1]
    ni_f = stat.Gf.shape[0]
    dtype = data.A.dtype
    n_comp = N * ni + ni_f
    if opts.kkt == "condensed" and pre is None:
        pre = condense(stat, data.A, data.B)

    # --- initialization ---
    if init is None:
        X0 = jnp.zeros((N + 1, nx), dtype=dtype).at[0].set(data.xinit)
        U0 = jnp.zeros((N, nu), dtype=dtype)
        slack0 = data.h - jnp.einsum(
            "kri,ki->kr", stat.Gx, X0[:N], precision=lax.Precision.HIGHEST
        )
        s0 = jnp.maximum(slack0, opts.init_slack)
        sf0 = jnp.maximum(data.hf - mv(stat.Gf, X0[N]), opts.init_slack)
        lam0 = jnp.ones((N, ni), dtype=dtype)
        lamf0 = jnp.ones((ni_f,), dtype=dtype)
        nu0 = jnp.zeros((N, nx), dtype=dtype)
    else:
        margin = jnp.asarray(0.01, dtype)
        X0 = init.X.at[0].set(data.xinit)
        U0 = init.U
        hp = lax.Precision.HIGHEST
        slack0 = data.h - (
            jnp.einsum("kri,ki->kr", stat.Gx, X0[:N], precision=hp)
            + jnp.einsum("kru,ku->kr", stat.Gu, U0, precision=hp)
        )
        s0 = jnp.maximum(slack0, margin)
        sf0 = jnp.maximum(data.hf - mv(stat.Gf, X0[N]), margin)
        lam0 = jnp.maximum(init.lam, margin)
        lamf0 = jnp.maximum(init.lam_f, margin)
        nu0 = init.nu_dyn
        # Mehrotra initial-point shift: a warm point from a NEARBY problem has
        # near-complementary (s, lam) pairs (products ~ margin^2) while the new
        # problem's residuals are O(problem change) — starting that far off the
        # central path at tiny mu collapses the fraction-to-boundary step sizes
        # and the iteration stalls (measured: 26/32 rocket warm-step lanes hit
        # the iteration cap at KKT ~ 1). Shift both cones so every product is
        # at least ~0.5 * (duality gap)/n, Mehrotra's own heuristic.
        gap0 = (jnp.sum(s0 * lam0) + jnp.sum(sf0 * lamf0)) / n_comp
        shift = 0.5 * jnp.sqrt(gap0)
        s0, sf0 = s0 + shift, sf0 + shift
        lam0, lamf0 = lam0 + shift, lamf0 + shift

    # OSQP-style relative termination scales (qp_jit.py runs OSQP with
    # eps_abs = eps_rel = 1e-9; we match the relative criterion, which is the
    # one that stays meaningful for rho ~ 1e6 soft-penalty problems)
    scale_p = 1.0 + _max_abs(data.c, data.h, data.hf, data.xinit)

    # Residual tensors are carried across iterations (invariant: R is
    # _residuals at the carried iterate) — the end-of-iteration convergence
    # check and the next iteration's rhs assembly share ONE _residuals
    # evaluation instead of recomputing it at the same point twice.
    def kkt_scalar(R, lam, lam_f, s, s_f):
        req, rineq, rineq_f, rx, rxN, ru = R
        gap = (jnp.sum(lam * s) + jnp.sum(lam_f * s_f)) / n_comp
        scale_d = 1.0 + _max_abs(data.qx, data.qu, lam, lam_f)
        res_p = _max_abs(req, rineq, rineq_f) / scale_p
        res_d = _max_abs(rx, rxN, ru) / scale_d
        return jnp.maximum(jnp.maximum(res_p, res_d), gap / scale_d)

    if opts.kkt == "pallas_iter":
        # the ENTIRE Mehrotra iteration runs as one fused Pallas kernel
        # (ops/pallas_qp._ipm_iter_kernel); XLA keeps only the lam/s
        # weights, the curvature Gram GEMMs (inside the seam's batch rule)
        # and the done-flag bookkeeping
        from robust_nonlinear_mpc_tpu.ops.pallas_qp import (
            default_ipm_iteration,
        )

        it_fn = default_ipm_iteration(opts.tau, n_comp)
        scale_p_arr = jnp.asarray(scale_p, dtype)

        def body(carry):
            X, U, lam, s, lam_f, s_f, nu_dyn, R, it, done = carry
            req, rineq, rineq_f, rx, rxN, ru = R
            W = lam / s
            W_f = lam_f / s_f
            rx_pad = jnp.concatenate(
                [jnp.zeros((1, nx), dtype), rx], axis=0
            )
            (X_n, U_n, lam_n, s_n, lamf_n, sf_n, nu_n,
             req_n, rineq_n, rineqf_n, rxpad_n, rxN_n, ru_n,
             res_n, bad) = it_fn(
                data.A, data.B, data.c, data.qx, data.qu, data.h, data.hf,
                stat.Gx, stat.Gu, stat.Gf, stat.Hx, stat.Hu, stat.HxN,
                W, W_f, X, U, lam, s, lam_f, s_f, nu_dyn,
                req, rineq, rineq_f, rx_pad, rxN, ru,
                scale_p_arr, done,
            )
            R_n = (req_n, rineq_n, rineqf_n, rxpad_n[1:], rxN_n, ru_n)
            eps_mach = jnp.finfo(dtype).eps
            mu_n = (jnp.sum(lam_n * s_n) + jnp.sum(lamf_n * sf_n)) / n_comp
            scale_mu = 1.0 + _max_abs(data.qx, data.qu, lam_n, lamf_n)
            at_floor = mu_n < 10.0 * eps_mach * scale_mu
            done_n = done | (res_n < opts.tol) | bad | at_floor
            return (
                X_n, U_n, lam_n, s_n, lamf_n, sf_n, nu_n, R_n,
                it + 1, done_n,
            )

        def cond(carry):
            *_, it, done = carry
            return (~done) & (it < _mi_cap)

        R0 = _residuals(stat, data, X0, U0, lam0, s0, lamf0, sf0, nu0)
        carry0 = (X0, U0, lam0, s0, lamf0, sf0, nu0, R0,
                  jnp.array(0, jnp.int32), jnp.array(False))
        X, U, lam, s, lam_f, s_f, nu_dyn, R, iters, done = lax.while_loop(
            cond, body, carry0
        )
        return _finalize(stat, data, opts, N, dtype, n_comp, kkt_scalar,
                         X, U, lam, s, lam_f, s_f, nu_dyn, R, iters)

    def body(carry):
        X, U, lam, s, lam_f, s_f, nu_dyn, R, it, done = carry

        req, rineq, rineq_f, rx, rxN, ru = R
        mu = (jnp.sum(lam * s) + jnp.sum(lam_f * s_f)) / n_comp

        W = lam / s
        W_f = lam_f / s_f

        def reduced_rhs(rcomp, rcomp_f):
            # rbar = r_stat + G'((lam*rineq - rcomp)/s); the Newton step solves
            # min 1/2 d'Cd + rbar'd  s.t.  dx+ = A dx + B du + req
            t = (lam * rineq - rcomp) / s                    # (N, ni)
            t_f = (lam_f * rineq_f - rcomp_f) / s_f          # (ni_f,)
            hp = qp_dir_prec()
            rbx = rx + jnp.einsum("kri,kr->ki", stat.Gx[1:N], t[1:N], precision=hp)
            rbx = jnp.concatenate([jnp.zeros((1, nx), dtype=dtype), rbx], axis=0)
            rbxN = rxN + jnp.matmul(stat.Gf.T, t_f[:, None], precision=hp)[:, 0]
            rbu = ru + jnp.einsum("kru,kr->ku", stat.Gu, t, precision=hp)
            return rbx, rbxN, rbu

        def recover(dX, dU, rcomp, rcomp_f):
            hp = qp_dir_prec()
            dGz = jnp.einsum("kri,ki->kr", stat.Gx, dX[:N], precision=hp) + jnp.einsum(
                "kru,ku->kr", stat.Gu, dU, precision=hp
            )
            ds = -rineq - dGz
            dlam = -(rcomp + lam * ds) / s
            dGz_f = jnp.matmul(stat.Gf, dX[N][:, None], precision=hp)[:, 0]
            ds_f = -rineq_f - dGz_f
            dlam_f = -(rcomp_f + lam_f * ds_f) / s_f
            return ds, dlam, ds_f, dlam_f

        # ---- affine (predictor) step ----
        rcomp_a = lam * s
        rcomp_af = lam_f * s_f
        rbx, rbxN, rbu = reduced_rhs(rcomp_a, rcomp_af)
        if opts.kkt == "condensed":
            csolve, dnu_from = _condensed_newton(stat, pre, W, W_f, req)
            nsolve = lambda rbx_, rbxN_, rbu_: csolve(rbx_, rbxN_, rbu_) + (None,)
            dXa, dUa, _ = nsolve(rbx, rbxN, rbu)
        elif opts.kkt == "pallas":
            from robust_nonlinear_mpc_tpu.ops.pallas_qp import (
                default_newton_kernels,
            )

            newton_fp, newton_rs = default_newton_kernels()
            Cxx, Cuu, Cxu, PN = _curvature(stat, W, W_f)
            dXa, dUa, _, fact_p = newton_fp(
                data.A, data.B, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req
            )
            nsolve = lambda rbx_, rbxN_, rbu_: newton_rs(
                data.A, data.B, fact_p, rbx_, rbxN_, rbu_, req
            )
        else:
            # predictor rhs is known before the factorization: fuse the
            # factorization scan with the predictor backward sweep
            fact, pre_bwd = _factorize_with_presolve(
                stat, data, W, W_f, rbx, rbxN, rbu, req
            )
            K_g, _, _, P_next_seq = fact
            kff_a, p_next_a = pre_bwd
            dXa, dUa, _ = _forward_sweep(
                data, K_g, kff_a, req, P_next_seq, p_next_a
            )
            nsolve = lambda rbx_, rbxN_, rbu_: _solve_newton(
                stat, data, fact, rbx_, rbxN_, rbu_, req
            )
        dsa, dlama, dsfa, dlamfa = recover(dXa, dUa, rcomp_a, rcomp_af)

        alpha_p_a = jnp.minimum(
            _step_to_boundary(s, dsa, 1.0), _step_to_boundary(s_f, dsfa, 1.0)
        )
        alpha_d_a = jnp.minimum(
            _step_to_boundary(lam, dlama, 1.0), _step_to_boundary(lam_f, dlamfa, 1.0)
        )
        mu_aff = (
            jnp.sum((s + alpha_p_a * dsa) * (lam + alpha_d_a * dlama))
            + jnp.sum((s_f + alpha_p_a * dsfa) * (lam_f + alpha_d_a * dlamfa))
        ) / n_comp
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        # ---- corrector step ----
        rcomp_c = lam * s + dsa * dlama - sigma * mu
        rcomp_cf = lam_f * s_f + dsfa * dlamfa - sigma * mu
        rbx, rbxN, rbu = reduced_rhs(rcomp_c, rcomp_cf)
        dX, dU, dnu = nsolve(rbx, rbxN, rbu)
        ds, dlam, ds_f, dlam_f = recover(dX, dU, rcomp_c, rcomp_cf)
        if opts.kkt == "condensed":
            dnu = dnu_from(dX, dU, dlam, dlam_f, rx, rxN)

        alpha_p = jnp.minimum(
            _step_to_boundary(s, ds, opts.tau), _step_to_boundary(s_f, ds_f, opts.tau)
        )
        alpha_d = jnp.minimum(
            _step_to_boundary(lam, dlam, opts.tau),
            _step_to_boundary(lam_f, dlam_f, opts.tau),
        )

        X_n = X + alpha_p * dX
        U_n = U + alpha_p * dU
        s_n = s + alpha_p * ds
        sf_n = s_f + alpha_p * ds_f
        lam_n = lam + alpha_d * dlam
        lamf_n = lam_f + alpha_d * dlam_f
        nu_n = nu_dyn + alpha_d * dnu

        # keep converged lanes frozen (vmap-safe)
        sel = lambda new, old: jnp.where(done, old, new)
        X_n, U_n, s_n, sf_n = sel(X_n, X), sel(U_n, U), sel(s_n, s), sel(sf_n, s_f)
        lam_n, lamf_n, nu_n = sel(lam_n, lam), sel(lamf_n, lam_f), sel(nu_n, nu_dyn)

        R_n = _residuals(stat, data, X_n, U_n, lam_n, s_n, lamf_n, sf_n, nu_n)
        res_n = kkt_scalar(R_n, lam_n, lamf_n, s_n, sf_n)

        # numerical safeguards (critical on the f32 TPU path):
        #  * if the step produced non-finite values, revert to the previous
        #    iterate and stop — keep the best usable solution,
        #  * once mu reaches the machine-precision floor, further centering
        #    cannot improve the solution in this dtype; stop.
        bad = ~jnp.isfinite(res_n)
        rev = lambda new, old: jnp.where(bad, old, new)
        X_n, U_n, s_n, sf_n = rev(X_n, X), rev(U_n, U), rev(s_n, s), rev(sf_n, s_f)
        lam_n, lamf_n, nu_n = rev(lam_n, lam), rev(lamf_n, lam_f), rev(nu_n, nu_dyn)
        R_n = tuple(rev(rn, ro) for rn, ro in zip(R_n, R))
        res_n = jnp.where(bad, kkt_scalar(R, lam, lam_f, s, s_f), res_n)

        eps_mach = jnp.finfo(dtype).eps
        mu_n = (jnp.sum(lam_n * s_n) + jnp.sum(lamf_n * sf_n)) / n_comp
        scale_mu = 1.0 + _max_abs(data.qx, data.qu, lam_n, lamf_n)
        at_floor = mu_n < 10.0 * eps_mach * scale_mu

        done_n = done | (res_n < opts.tol) | bad | at_floor
        return (X_n, U_n, lam_n, s_n, lamf_n, sf_n, nu_n, R_n, it + 1, done_n)

    def cond(carry):
        *_, it, done = carry
        return (~done) & (it < _mi_cap)

    R0 = _residuals(stat, data, X0, U0, lam0, s0, lamf0, sf0, nu0)
    carry0 = (X0, U0, lam0, s0, lamf0, sf0, nu0, R0, jnp.array(0, jnp.int32),
              jnp.array(False))
    X, U, lam, s, lam_f, s_f, nu_dyn, R, iters, done = lax.while_loop(
        cond, body, carry0
    )

    return _finalize(stat, data, opts, N, dtype, n_comp, kkt_scalar,
                     X, U, lam, s, lam_f, s_f, nu_dyn, R, iters)


def _finalize(stat, data, opts, N, dtype, n_comp, kkt_scalar,
              X, U, lam, s, lam_f, s_f, nu_dyn, R, iters):
    res = kkt_scalar(R, lam, lam_f, s, s_f)

    # dual of the initial-condition pin, from stationarity at x_0
    # (consumers: SQP merit-penalty adaptation)
    nu_init = -(
        mv(stat.Hx[0], X[0])
        + data.qx[0]
        + mv(stat.Gx[0].T, lam[0])
        - mv(data.A[0].T, nu_dyn[0])
    )

    # cost = y'Py + q'y  (P = blkdiag(Q, R, ..., Qf) = 0.5 * H blocks)
    hp = lax.Precision.HIGHEST
    cost = (
        0.5
        * (
            jnp.sum(jnp.einsum("kij,kj->ki", stat.Hx, X[:N], precision=hp) * X[:N])
            + jnp.sum(jnp.einsum("kij,kj->ki", stat.Hu, U, precision=hp) * U)
            + jnp.sum(X[N] * mv(stat.HxN, X[N]))
        )
        + jnp.sum(data.qx * X)
        + jnp.sum(data.qu * U)
    )

    return QPSolution(
        X=X,
        U=U,
        lam=lam,
        lam_f=lam_f,
        nu_dyn=nu_dyn,
        nu_init=nu_init,
        s=s,
        s_f=s_f,
        cost=cost,
        kkt_res=res,
        iters=iters,
        success=res < jnp.asarray(opts.tol, dtype) * 100,
    )
