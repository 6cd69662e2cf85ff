"""Pallas TPU kernel: batch-on-lanes SLS backward Riccati (gains only).

The XLA kernels (`ops/sls_kernels.backward_solve_*`) process one problem
instance per vmap lane; their per-stage products are J-batched tiny matmuls
((nx, nx) with nx = 17) that pad each instance onto a 128x128 MXU tile —
measured ~6.6 ms for the rocket backward at B = 512 on v5e, ~40x off the
FLOP bound. This kernel flips the layout: the BATCH lives on the 128-wide
lane axis and every contraction over the tiny state/input dims becomes a
short unrolled loop of full-width VPU FMAs (8x128 per cycle), with the
value-matrix recursion state resident in VMEM across the whole stage sweep.

Replaces (for the gains) the reference's numba column recursion
`_backward_solve_numba` (fast_SLS_jit.py:65-84) like the XLA kernels do;
returns only K — the hot dual-recycling path consumes nothing else
(solvers/fast_sls.py `_iteration`), and skipping S halves the HBM writes.

Layout rules (Mosaic): every in-kernel tensor is (d0, d1, small, b_tile) so
the LAST TWO dims (sublane, lane) are never sliced; all contraction loops
slice untiled leading axes. Scalar-per-lane quantities are (J, b_tile)
slabs. The 4x4 SPD gain solve is a closed-form 2x2 blockwise Schur
elimination on such slabs (matching ops/qp_ipm's small-SPD strategy).

Curvature assembly (C = G' diag(eta) G + reg) stays OUTSIDE the kernel as
one large shared-operand XLA GEMM over all stages/columns/instances — MXU
is the right unit for it (Gram-tensor trick of backward_solve_folded);
the kernel streams the per-stage curvature blocks in.

Integration: `make_backward_K()` returns a jax.custom_batching.custom_vmap —
the unbatched call falls back to the XLA folded kernel, a vmapped call runs
the fused batched Pallas kernel (this is how a batch-on-lanes kernel
composes with the solver's instance-level vmap).

STATUS — measured and NOT integrated (research option, like
ops/pallas_response.py): on v5e at rocket shapes (B = 512, f32) this kernel
runs 8.3 ms total = 2.3 ms curvature prologue + ~6 ms kernel, vs 12.9 ms
for the f32 blocked XLA kernel (1.55x) BUT ~6.6 ms for the production
bf16-tube-precision XLA path — the ~6 ms kernel time matches the VPU f32
roofline (~6.6 GFMA at ~1 TFLOP/s), i.e. the backward is FLOP-bound and
both implementations sit near the practical floor for per-lane distinct
tiny matmuls on this chip (MXU bf16 multi-pass == VPU f32, to within
measurement). Column-tile width Jt=8 vs Jt=16 measured equal (8.76 vs
8.32 ms) — confirming FLOP-bound, not loop-overhead-bound. The win from
this machinery is in OVERHEAD-bound stages instead: the QP Newton scans
run ~60 sequential XLA scan steps at ~61 us/step (~0.07 TFLOP/s effective)
per IPM iteration — see ops/pallas_qp (fused Newton-solve kernel) which
reuses the slab utilities (_spd_inv_slabs) and layout rules built here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robust_nonlinear_mpc_tpu.ops.sls_kernels import SLSRegs, backward_solve_folded


# ----------------------------------------------------------------------
# In-kernel helpers (all shapes (d0, d1, small, bt) or (J, bt))
# ----------------------------------------------------------------------
def _contract_major(x_slices, y_slices, n, out_shape, dtype):
    """acc[...] = sum_l x_slices(l) * y_slices(l) with broadcasting.

    A lax.fori_loop, NOT an unrolled Python loop: Mosaic allocates every
    unrolled step's broadcast temporary on the scoped-vmem stack without
    reuse (measured: 17 unrolled steps of (8,17,17,128) temps -> 20.8 MB
    scoped vmem, hard compile error); the loop body reuses one buffer.
    x_slices/y_slices take a traced index (use lax.dynamic_index_in_dim)."""
    def body(l, acc):
        return acc + x_slices(l) * y_slices(l)

    return jax.lax.fori_loop(0, n, body, jnp.zeros(out_shape, dtype))


def _spd_inv_slabs(H, n):
    """Inverse of a per-(column, lane) SPD n x n matrix held as slab
    components H[(u, v)] (u <= v, symmetric) — recursive 2-block Schur
    elimination, all elementwise VPU ops. Returns the inverse components
    {(u, v): slab, u <= v}."""
    if n == 1:
        return {(0, 0): 1.0 / H[(0, 0)]}
    m = n // 2

    def get(D, u, v):
        return D[(u, v)] if u <= v else D[(v, u)]

    Ainv = _spd_inv_slabs({(u, v): H[(u, v)] for u in range(m)
                           for v in range(u, m)}, m)
    # W = A^{-1} B   (m x (n-m))
    W = {
        (u, v): sum(get(Ainv, u, l) * H[(l, v)] for l in range(m))
        for u in range(m) for v in range(m, n)
    }
    # S = C - B' W   ((n-m) x (n-m), symmetric)
    S = {
        (u - m, v - m): H[(u, v)]
        - sum(H[(l, u)] * W[(l, v)] for l in range(m))
        for u in range(m, n) for v in range(u, n)
    }
    Sinv = _spd_inv_slabs(S, n - m)
    inv = {}
    for u in range(m):          # top-left: Ainv + W Sinv W'
        for v in range(u, m):
            inv[(u, v)] = get(Ainv, u, v) + sum(
                W[(u, m + a)] * get(Sinv, a, b) * W[(v, m + b)]
                for a in range(n - m) for b in range(n - m)
            )
    for u in range(m):          # top-right: -W Sinv
        for v in range(m, n):
            inv[(u, v)] = -sum(
                W[(u, m + a)] * get(Sinv, a, v - m) for a in range(n - m)
            )
    for u in range(m, n):       # bottom-right: Sinv
        for v in range(u, n):
            inv[(u, v)] = Sinv[(u - m, v - m)]
    return inv


def _spd_solve_rows(Hc, F, nu):
    """K = H^{-1} F with H as slab components and F (J, nu, nx, bt) rhs
    rows; returns (J, nu, nx, bt)."""
    inv = _spd_inv_slabs(Hc, nu)

    def get(u, v):
        c = inv[(u, v)] if u <= v else inv[(v, u)]
        return c[:, None, :]    # broadcast over the nx axis

    rows = [
        sum(get(u, v) * F[:, v] for v in range(nu)) for u in range(nu)
    ]
    return jnp.stack(rows, axis=1)


def _backward_kernel(
    # inputs (blocks; Jt = columns per tile)
    A_ref,      # (nx, nx, bt)      stage k: A[l, c, b] (row l, col c)
    B_ref,      # (nx, nu, bt)      stage k
    Cxx_ref,    # (nx, Jt, nx, bt)  stage k curvature (a, j, c, b)
    Cuu_ref,    # (nu, Jt, nu, bt)  stage k input curvature (u, j, v, b)
    SN_ref,     # (nx, Jt, nx, bt)  terminal value matrices (per j-tile)
    # outputs (blocks)
    K_ref,      # (Jt, nu, nx, bt)  stage k gains
    # scratch (sliced axes LEADING so dynamic fori_loop indices hit refs,
    # not values — Mosaic TC has no dynamic_slice on values)
    S_ref,      # (nx, Jt, nx, bt)  value carry S[l, j, i, b]
    X2_ref,     # (nx, Jt, nx, bt)  (S_j A)[k, j, c, b]
    X1_ref,     # (nx, Jt, nu, bt)  (S_j B)[k, j, v, b]
    F_ref,      # (nu, Jt, nx, bt)  (B' S_j A)[u, j, c, b]
    Ks_ref,     # (nu, Jt, nx, bt)  gains[u, j, c, b]
    *, N, nx, nu, Jt, bt,
):
    s = pl.program_id(2)          # 0 .. N-1, stage k = N-1-s
    jt = pl.program_id(1)         # column tile
    dtype = S_ref.dtype

    @pl.when(s == 0)
    def _init():
        S_ref[...] = SN_ref[...]

    J = Jt

    # X2[k, j, c, b] = sum_l S[l, j, k, b] * A[l, c, b]   (S_j A, S symmetric)
    def x2_body(l, acc):
        return acc + S_ref[l][:, :, None, :] * A_ref[0, l][None, None, :, :]

    X2 = jax.lax.fori_loop(
        0, nx, x2_body, jnp.zeros((J, nx, nx, bt), dtype)
    )
    X2_ref[...] = jnp.swapaxes(X2, 0, 1)        # (k, J, c, bt)

    # X1[k, j, v, b] = sum_l S[l, j, k, b] * B[l, v, b]   (S_j B)
    def x1_body(l, acc):
        return acc + S_ref[l][:, :, None, :] * B_ref[0, l][None, None, :, :]

    X1 = jax.lax.fori_loop(
        0, nx, x1_body, jnp.zeros((J, nx, nu, bt), dtype)
    )
    X1_ref[...] = jnp.swapaxes(X1, 0, 1)        # (k, J, v, bt)

    # F[j, u, c, b] = sum_k B[k, u, b] * X2[k, j, c, b]   (B' S_j A)
    def f_acc_body(k, acc):
        return acc + B_ref[0, k][None, :, None, :] * X2_ref[k][:, None, :, :]

    F = jax.lax.fori_loop(
        0, nx, f_acc_body, jnp.zeros((J, nu, nx, bt), dtype)
    )
    F_ref[...] = jnp.swapaxes(F, 0, 1)          # (u, J, c, bt)

    # H[j, u, v, b] = Cuu[u, j, v, b] + sum_k B[k, u, b] * X1[k, j, v, b]
    def h_body(k, acc):
        return acc + B_ref[0, k][None, :, None, :] * X1_ref[k][:, None, :, :]

    H = jax.lax.fori_loop(
        0, nx, h_body, jnp.zeros((J, nu, nu, bt), dtype)
    )
    # extract symmetric H components as (J, bt) slabs (upper triangle);
    # sublane slicing is not available, so reduce against one-hot masks
    Hc = {}
    eye_v = jnp.eye(nu, dtype=dtype)
    for u in range(nu):
        Hu = H[:, u] + Cuu_ref[0, u]   # (J, nu_v, bt)
        for v in range(u, nu):
            Hc[(u, v)] = jnp.sum(Hu * eye_v[v][None, :, None], axis=1)

    Kjuc = -_spd_solve_rows(Hc, F, nu)               # (J, nu, nx, bt)
    Ks_ref[...] = jnp.swapaxes(Kjuc, 0, 1)           # (u, J, c, bt)

    # mask inactive columns (j > k): K[k, j] = 0 (reference triangular
    # structure; the S carry for inactive columns is never consumed)
    k_stage = N - 1 - s
    jcol = jt * Jt + jax.lax.broadcasted_iota(jnp.int32, (J, 1, 1, 1), 0)
    K_ref[0] = jnp.where(jcol <= k_stage, Kjuc, jnp.zeros_like(Kjuc))

    # S_new[j, a, c] = (A' S_j A)[a, c] + (F' K)[a, c], one accumulator
    # (avoids a second live (J, nx, nx, bt) buffer in VMEM)
    def m_body(k, acc):        # M[j,a,c] = sum_k A[k,a] X2[k,j,c]
        return acc + (
            A_ref[0, k][None, :, None, :] * X2_ref[k][:, None, :, :]
        )

    def fk_body(u, acc):       # + sum_u F[u,j,a] K[u,j,c]
        return acc + (
            F_ref[u][:, :, None, :] * Ks_ref[u][:, None, :, :]
        )

    S_new = jax.lax.fori_loop(
        0, nx, m_body, jnp.zeros((J, nx, nx, bt), dtype)
    )
    S_new = jax.lax.fori_loop(0, nu, fk_body, S_new)
    # No explicit symmetrization (the XLA kernels apply sym() per stage):
    # M = A'S_jA and F'K = -F'H^{-1}F are symmetric by construction given a
    # symmetric S carry, so asymmetry here is pure roundoff; an (a <-> c)
    # transpose would cross the sublane/untiled boundary, which Mosaic
    # handles poorly. Verified against the folded kernel in tests.
    S_ref[...] = jnp.swapaxes(S_new, 0, 1) + Cxx_ref[0]   # -> (a, J, c, bt)


def _backward_K_batched(A, B, Gmat, Gf, eta, eta_f, regs: SLSRegs,
                        b_tile=128, interpret=False):
    """Batched (leading axis) backward Riccati gains via the Pallas kernel.

    A (Bc,N,nx,nx), B (Bc,N,nx,nu), eta (Bc,N,N,ni) (no terminal column,
    same contract as backward_solve_folded), eta_f (Bc,J,ni_f);
    Gmat (ni, nx+nu), Gf (ni_f, nx) shared. Returns K (Bc, N, J, nu, nx).
    """
    Bc, N, nx, _ = A.shape
    nu = B.shape[3]
    J = N + 1
    dtype = A.dtype
    ni = Gmat.shape[0]
    Gx = Gmat[:, :nx]
    Gu = Gmat[:, nx:]
    # append the (always-zero) terminal column like the XLA kernels do
    eta = jnp.concatenate(
        [eta, jnp.zeros((Bc, N, 1, ni), eta.dtype)], axis=2
    )

    pad = (-Bc) % b_tile
    if pad:
        padc = [(0, pad)] + [(0, 0)] * 3
        A = jnp.pad(A, padc)
        B = jnp.pad(B, padc)
        eta = jnp.pad(eta, padc)
        eta_f = jnp.pad(eta_f, [(0, pad), (0, 0), (0, 0)])
    Bp = Bc + pad
    nbt = Bp // b_tile

    # ---- curvature assembly outside the kernel (shared-operand MXU GEMMs)
    GGx = (Gx[:, :, None] * Gx[:, None, :]).astype(dtype)          # (ni,nx,nx)
    GGu = (Gu[:, :, None] * Gu[:, None, :]).astype(dtype)
    GGf = (Gf[:, :, None] * Gf[:, None, :]).astype(dtype)
    hp = jax.lax.Precision.HIGHEST
    # layouts the kernel reads directly: (N, a, J, c, Bp) / (N, u, J, v, Bp)
    Cxx = jnp.einsum("bkjr,rac->kajcb", eta, GGx, precision=hp)
    Cxx = Cxx + jnp.asarray(regs.Q_reg, dtype)[None, :, None, :, None]
    Cuu = jnp.einsum("bkjr,ruv->kujvb", eta, GGu, precision=hp)
    Cuu = Cuu + jnp.asarray(regs.R_reg, dtype)[None, :, None, :, None]
    SN = jnp.einsum("bjr,rac->ajcb", eta_f, GGf, precision=hp)
    SN = SN + jnp.asarray(regs.Q_reg_f, dtype)[:, None, :, None]

    At = jnp.transpose(A, (1, 2, 3, 0))        # (N, nx, nx, Bp)
    Bt = jnp.transpose(B, (1, 2, 3, 0))        # (N, nx, nu, Bp)

    # column tiles keep every VMEM block within budget at full lane width
    # (the raised vmem_limit_bytes makes full-J tiles fit at rocket shapes;
    # halving Jt halves every VPU op's width and doubles the loop cost)
    j_tile = J
    while j_tile > 1 and nx * j_tile * nx * b_tile * 4 > 2.6e6:
        j_tile //= 2
    while J % j_tile:
        j_tile -= 1
    njt = J // j_tile

    grid = (nbt, njt, N)

    def smap(bt_i, jt, s):  # stage-indexed blocks, reversed stage order
        return (N - 1 - s, 0, 0, bt_i)

    def smap5(bt_i, jt, s):
        return (N - 1 - s, 0, jt, 0, bt_i)

    kern = functools.partial(
        _backward_kernel, N=N, nx=nx, nu=nu, Jt=j_tile, bt=b_tile,
    )
    K = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nx, nx, b_tile), smap),
            pl.BlockSpec((1, nx, nu, b_tile), smap),
            pl.BlockSpec((1, nx, j_tile, nx, b_tile), smap5),
            pl.BlockSpec((1, nu, j_tile, nu, b_tile), smap5),
            pl.BlockSpec(
                (nx, j_tile, nx, b_tile), lambda bt_i, jt, s: (0, jt, 0, bt_i)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, j_tile, nu, nx, b_tile),
            lambda bt_i, jt, s: (N - 1 - s, jt, 0, 0, bt_i),
        ),
        out_shape=jax.ShapeDtypeStruct((N, J, nu, nx, Bp), dtype),
        scratch_shapes=[
            pltpu.VMEM((nx, j_tile, nx, b_tile), dtype),   # S carry
            pltpu.VMEM((nx, j_tile, nx, b_tile), dtype),   # X2
            pltpu.VMEM((nx, j_tile, nu, b_tile), dtype),   # X1
            pltpu.VMEM((nu, j_tile, nx, b_tile), dtype),   # F
            pltpu.VMEM((nu, j_tile, nx, b_tile), dtype),   # Ks
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # the default 16 MiB scoped-vmem budget falls 532 KiB short of
            # this kernel's blocks+scratch+loop buffers at (Jt=8, bt=128);
            # v5e VMEM is large enough — raise the compiler cap
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(At, Bt, Cxx, Cuu, SN)
    # (N, J, nu, nx, Bp) -> (Bc, N, J, nu, nx)
    K = jnp.transpose(K, (4, 0, 1, 2, 3))[:Bc]
    return K


def make_backward_K(b_tile=128, interpret=False):
    """custom_vmap wrapper: per-instance fallback = XLA folded kernel;
    vmapped (the solver's batch axis) = the fused Pallas kernel."""

    @jax.custom_batching.custom_vmap
    def backward_K(A, B, Gmat, Gf, eta, eta_f, Q_reg, R_reg, Q_reg_f):
        regs = SLSRegs(Q_reg, R_reg, Q_reg_f)
        return backward_solve_folded(A, B, Gmat, Gf, eta, eta_f, regs)[1]

    @backward_K.def_vmap
    def _rule(axis_size, in_batched, A, B, Gmat, Gf, eta, eta_f,
              Q_reg, R_reg, Q_reg_f):
        b_A, b_B, b_G, b_Gf, b_e, b_ef, b_q, b_r, b_qf = in_batched
        # shared statics must be unbatched; a batched static falls back to
        # the plain vmapped XLA kernel (NOT backward_K — that would recurse
        # into this rule)
        if b_G or b_Gf or b_q or b_r or b_qf or not (b_A and b_B and b_e and b_ef):
            bcast = lambda x, is_b: x if is_b else jax.lax.broadcast(x, (axis_size,))
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
        K = _backward_K_batched(
            A, B, Gmat, Gf, eta, eta_f, regs,
            b_tile=b_tile, interpret=interpret,
        )
        return K, True

    return backward_K
