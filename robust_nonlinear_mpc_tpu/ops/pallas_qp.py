"""Pallas TPU kernels: fused IPM Newton solves, batch on the lane axis.

WHY. The Riccati Newton solve inside the IPM (`ops/qp_ipm.py`) is the
dominant cost of a warm MPC step and is OVERHEAD-bound, not FLOP-bound:
each IPM iteration runs 4 sequential `lax.scan`s x 15 stages of tiny
(17x17 @ B) ops at ~61 us per scan step (~0.07 TFLOP/s effective on v5e;
tools/pallas_bwd_bench.py and BASELINE.md carry the measurements). These
kernels fuse a WHOLE Newton solve — the backward factorization + predictor
sweep and the forward recovery — into one Pallas program per batch tile:
~450 VPU ops of (17,17,128) slabs with all carries VMEM-resident, instead
of ~60 XLA kernel launches with HBM round-trips between them.

Two kernels per IPM iteration (replacing `_factorize_with_presolve` +
`_forward_sweep` + `_solve_newton`):

  * `_factor_predictor_kernel`: reverse stage loop producing the Riccati
    factors (K, Fxu', Fuu upper-tri slabs and their closed-form inverse
    slabs, P_{k+1} sequence) FUSED with the predictor backward sweep, then
    the forward sweep -> (dX, dU, dnu) of the affine step.
  * `_resolve_kernel`: the corrector re-solve against the cached factors
    (backward feedforward sweep + forward sweep).

Layout rules (shared with ops/pallas_sls.py, see its STATUS note for the
measured groundwork): batch lives on the 128-lane axis; every per-stage
matrix is a rank-3 (d0, d1, bt) value whose axis 0 is untiled — the only
axis Mosaic can slice; contractions over a matrix's SECOND index use a
pre-transposed copy (A', B') or symmetry (P' = P); mat-vecs are one
broadcast-multiply + reduce over the untiled axis; scalar-per-lane values
are (1, bt) slabs extracted by one-hot sublane reductions; the nu x nu SPD
gain solve is `_spd_inv_slabs` (recursive blockwise Schur on slabs) plus
one iterative-refinement pass, matching utils.numerics.spd_solve_refined.

Integration: `make_newton_kernels()` returns two
jax.custom_batching.custom_vmap functions — unbatched calls fall back to
the XLA scan implementations (exact same math), vmapped calls run the
fused batched kernels. `IPMOptions(kkt="pallas")` routes `solve_qp`
through them; `RNM_BENCH_KKT=pallas` benches it.

Replaces, at the algorithm level, the reference's OSQP KKT solve
(qp_jit.py:343-513 via OSQP's generic sparse LDL) with a structure-aware
block-tridiagonal factorization — same role, TPU-shaped execution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robust_nonlinear_mpc_tpu.ops.pallas_sls import _spd_inv_slabs


def _tri(nu):
    return [(u, v) for u in range(nu) for v in range(u, nu)]


# ----------------------------------------------------------------------
# in-kernel building blocks
# ----------------------------------------------------------------------
def _mv_t(Mt, v):
    """(M' v) for Mt = M in (row, col, bt) layout contracted over rows:
    out[c, b] = sum_l Mt[l, c, b] v[l, b]."""
    return jnp.sum(Mt * v[:, None, :], axis=0)


def _slab(v, i, n):
    """Extract component i of a (n, bt) vector as a (1, bt) slab (one-hot
    sublane reduction; sublane slicing and scatters are unsupported)."""
    e = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == i).astype(v.dtype)
    return jnp.sum(v * e, axis=0, keepdims=True)


def _mm_rows(X_load, Y_load, n, out_shape, dtype):
    """acc[i, c, b] = sum_l X_load(l)[i, b] * Y_load(l)[c, b] via fori_loop
    (ref-sliced operands; unrolled Python loops blow the scoped-vmem stack,
    see ops/pallas_sls.py)."""
    def body(l, acc):
        return acc + X_load(l)[:, None, :] * Y_load(l)[None, :, :]

    return jax.lax.fori_loop(0, n, body, jnp.zeros(out_shape, dtype))


def _sym_slabs(M, nu):
    """Upper-tri slab dict of the symmetrized (nu, nu, bt) value M, plus a
    tiny trace regularizer (matches qp_ipm's Fuu_r construction)."""
    comps = {}
    for u in range(nu):
        row = M[u]                       # (nu, bt), static untiled slice
        for v in range(nu):
            comps[(u, v)] = _slab(row, v, nu)
    Hc = {}
    tr = None
    for u in range(nu):
        d = comps[(u, u)]
        tr = d if tr is None else tr + d
        for v in range(u, nu):
            Hc[(u, v)] = 0.5 * (comps[(u, v)] + comps[(v, u)])
    for u in range(nu):
        Hc[(u, u)] = Hc[(u, u)] + 1e-14 * tr
    return Hc


def _refined_rows(Hc, Fiv, rhs_rows, nu):
    """x = H^{-1} rhs with one refinement pass, on lists of (d, bt) rows."""
    def get(D, u, v):
        return D[(u, v)] if u <= v else D[(v, u)]

    x0 = [
        sum(get(Fiv, u, v) * rhs_rows[v] for v in range(nu)) for u in range(nu)
    ]
    r = [
        rhs_rows[u] - sum(get(Hc, u, v) * x0[v] for v in range(nu))
        for u in range(nu)
    ]
    return [
        x0[u] + sum(get(Fiv, u, v) * r[v] for v in range(nu))
        for u in range(nu)
    ]


def _forward_loop(N, nx, nu, bt, dtype, AtT_ref, BtT_ref, req_ref,
                  K_ref, kff_ref, Pseq_ref, pn_ref, dX_ref, dU_ref, dnu_ref):
    """Shared forward sweep: roll dx through du = K dx + kff, recover dnu."""
    def fwd(k, dx):
        Kk = K_ref[k]                    # (nu, nx, bt)
        kffk = kff_ref[k]                # (nu, bt)
        du_rows = [
            jnp.sum(Kk[u] * dx, axis=0, keepdims=True) + _slab(kffk, u, nu)
            for u in range(nu)
        ]
        dxn = _mv_t(AtT_ref[k], dx) + req_ref[k]
        BtT = BtT_ref[k]                 # (nu, nx, bt)
        for u in range(nu):
            dxn = dxn + BtT[u] * du_rows[u]
        Pn = Pseq_ref[k]                 # (nx, nx, bt), symmetric
        dnu = -(_mv_t(Pn, dxn) + pn_ref[k])
        dX_ref[k] = dx
        dU_ref[k] = jnp.concatenate(du_rows, axis=0)
        dnu_ref[k] = dnu
        return dxn

    dxN = jax.lax.fori_loop(0, N, fwd, jnp.zeros((nx, bt), dtype))
    dX_ref[N] = dxN


# ----------------------------------------------------------------------
# kernel A: factorization + predictor solve
# ----------------------------------------------------------------------
def _factor_predictor_kernel(
    At_ref,    # (N, nx, nx, bt)  A[k][l, c] (row l, col c)
    AtT_ref,   # (N, nx, nx, bt)  A[k]' in the same convention
    Bt_ref,    # (N, nx, nu, bt)  B[k][l, v]
    BtT_ref,   # (N, nu, nx, bt)  B[k]'
    Cxx_ref,   # (N, nx, nx, bt)
    CxuT_ref,  # (N, nu, nx, bt)  Cxu[k]'
    Cuu_ref,   # (N, nu, nu, bt)
    PN_ref,    # (nx, nx, bt)
    rbx_ref,   # (N, nx, bt)   (row 0 unused/zero)
    rbxN_ref,  # (nx, bt)
    rbu_ref,   # (N, nu, bt)
    req_ref,   # (N, nx, bt)
    # outputs
    dX_ref,    # (N+1, nx, bt)
    dU_ref,    # (N, nu, bt)
    dnu_ref,   # (N, nx, bt)
    K_ref,     # (N, nu, nx, bt)    gain rows
    FxuT_ref,  # (N, nu, nx, bt)
    Fuu_ref,   # (N, nuu, bt)       upper-tri slabs of Fuu_r
    Fiv_ref,   # (N, nuu, bt)       upper-tri slabs of Fuu_r^{-1}
    Pseq_ref,  # (N, nx, nx, bt)    P_{k+1}
    # scratch
    P_ref,     # (nx, nx, bt)
    PA_ref,    # (nx, nx, bt)
    PB_ref,    # (nx, nu, bt)
    kff_ref,   # (N, nu, bt)
    pn_ref,    # (N, nx, bt)
    *, N, nx, nu, bt,
):
    dtype = P_ref.dtype
    tri = _tri(nu)

    P_ref[...] = PN_ref[...]
    p0 = rbxN_ref[...]

    def bwd(s, p):
        k = N - 1 - s
        P = P_ref[...]
        Pseq_ref[k] = P
        pn_ref[k] = p

        # PA[l', c] = (P A)[l', c] = sum_l P[l, l'] A[l, c]   (P symmetric)
        PA_ref[...] = _mm_rows(
            lambda l: P_ref[l], lambda l: At_ref[k, l],
            nx, (nx, nx, bt), dtype,
        )
        PB_ref[...] = _mm_rows(
            lambda l: P_ref[l], lambda l: Bt_ref[k, l],
            nx, (nx, nu, bt), dtype,
        )
        # Fxx = Cxx + A' PA;  FxuT = Cxu' + B' PA;  Fuu = Cuu + B' PB
        Fxx = Cxx_ref[k] + _mm_rows(
            lambda l: At_ref[k, l], lambda l: PA_ref[l],
            nx, (nx, nx, bt), dtype,
        )
        FxuT = CxuT_ref[k] + _mm_rows(
            lambda l: Bt_ref[k, l], lambda l: PA_ref[l],
            nx, (nu, nx, bt), dtype,
        )
        Fuu = Cuu_ref[k] + _mm_rows(
            lambda l: Bt_ref[k, l], lambda l: PB_ref[l],
            nx, (nu, nu, bt), dtype,
        )
        FxuT_ref[k] = FxuT

        # w = p + P req_k;  f_u = rbu_k + B' w
        req_k = req_ref[k]
        w = p + _mv_t(P, req_k)
        f_u = rbu_ref[k] + _mv_t(Bt_ref[k], w)

        Hc = _sym_slabs(Fuu, nu)
        Fiv = _spd_inv_slabs(Hc, nu)
        Fuu_ref[k] = jnp.concatenate([Hc[uv] for uv in tri], axis=0)
        Fiv_ref[k] = jnp.concatenate([Fiv[uv] for uv in tri], axis=0)

        # K = -Fuu_r^{-1} Fxu' ; kff = -Fuu_r^{-1} f_u   (refined solves)
        K_rows = _refined_rows(Hc, Fiv, [FxuT[u] for u in range(nu)], nu)
        K_rows = [-r for r in K_rows]
        fu_rows = [_slab(f_u, u, nu) for u in range(nu)]
        kff_rows = _refined_rows(Hc, Fiv, fu_rows, nu)
        kff_rows = [-r for r in kff_rows]
        K_ref[k] = jnp.concatenate(
            [r[None] for r in K_rows], axis=0
        )
        kff_ref[k] = jnp.concatenate(kff_rows, axis=0)

        # P <- Fxx + Fxu K  (symmetric up to roundoff; see pallas_sls on
        # why no explicit sym());  p <- rbx_k + A' w + Fxu kff
        P_new = Fxx
        p_new = rbx_ref[k] + _mv_t(At_ref[k], w)
        for u in range(nu):
            P_new = P_new + FxuT[u][:, None, :] * K_rows[u][None, :, :]
            p_new = p_new + FxuT[u] * kff_rows[u]
        P_ref[...] = P_new
        return p_new

    jax.lax.fori_loop(0, N, bwd, p0)

    _forward_loop(N, nx, nu, bt, dtype, AtT_ref, BtT_ref, req_ref,
                  K_ref, kff_ref, Pseq_ref, pn_ref, dX_ref, dU_ref, dnu_ref)


# ----------------------------------------------------------------------
# kernel B: corrector re-solve against cached factors
# ----------------------------------------------------------------------
def _resolve_kernel(
    At_ref, AtT_ref, Bt_ref, BtT_ref,
    K_ref,     # (N, nu, nx, bt)
    FxuT_ref,  # (N, nu, nx, bt)
    Fuu_ref,   # (N, nuu, bt)
    Fiv_ref,   # (N, nuu, bt)
    Pseq_ref,  # (N, nx, nx, bt)
    rbx_ref, rbxN_ref, rbu_ref, req_ref,
    # outputs
    dX_ref, dU_ref, dnu_ref,
    # scratch
    kff_ref,   # (N, nu, bt)
    pn_ref,    # (N, nx, bt)
    *, N, nx, nu, bt,
):
    dtype = rbx_ref.dtype
    tri = _tri(nu)
    nuu = len(tri)

    def bwd(s, p):
        k = N - 1 - s
        pn_ref[k] = p
        Pn = Pseq_ref[k]
        w = p + _mv_t(Pn, req_ref[k])
        f_u = rbu_ref[k] + _mv_t(Bt_ref[k], w)
        fuu_k = Fuu_ref[k]               # (nuu, bt)
        fiv_k = Fiv_ref[k]
        Hc = {uv: _slab(fuu_k, i, nuu) for i, uv in enumerate(tri)}
        Fiv = {uv: _slab(fiv_k, i, nuu) for i, uv in enumerate(tri)}
        fu_rows = [_slab(f_u, u, nu) for u in range(nu)]
        kff_rows = _refined_rows(Hc, Fiv, fu_rows, nu)
        kff_rows = [-r for r in kff_rows]
        kff_ref[k] = jnp.concatenate(kff_rows, axis=0)
        p_new = rbx_ref[k] + _mv_t(At_ref[k], w)
        FxuT = FxuT_ref[k]
        for u in range(nu):
            p_new = p_new + FxuT[u] * kff_rows[u]
        return p_new

    jax.lax.fori_loop(0, N, bwd, rbxN_ref[...])

    _forward_loop(N, nx, nu, bt, dtype, AtT_ref, BtT_ref, req_ref,
                  K_ref, kff_ref, Pseq_ref, pn_ref, dX_ref, dU_ref, dnu_ref)


# ----------------------------------------------------------------------
# batched wrappers
# ----------------------------------------------------------------------
def _lanes(x, src_batch_axis=0):
    """Move the batch axis last (lane layout)."""
    return jnp.moveaxis(x, src_batch_axis, -1)


def _make_pad_b(pad):
    def _pad_b(x):
        if not pad:
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return _pad_b


def _common_specs(N, nx, nu, b_tile):
    bmap3 = lambda bi: (0, 0, bi)
    bmap4 = lambda bi: (0, 0, 0, bi)
    return {
        "At": pl.BlockSpec((N, nx, nx, b_tile), bmap4),
        "Bt": pl.BlockSpec((N, nx, nu, b_tile), bmap4),
        "BtT": pl.BlockSpec((N, nu, nx, b_tile), bmap4),
        "vecx": pl.BlockSpec((N, nx, b_tile), bmap3),
        "vecu": pl.BlockSpec((N, nu, b_tile), bmap3),
        "x1": pl.BlockSpec((nx, b_tile), lambda bi: (0, bi)),
        "dX": pl.BlockSpec((N + 1, nx, b_tile), bmap3),
        "K": pl.BlockSpec((N, nu, nx, b_tile), bmap4),
        "Pseq": pl.BlockSpec((N, nx, nx, b_tile), bmap4),
    }


def _eff_tile(b_tile, Bc):
    """Shrink the lane tile for tiny batches (interpret-mode tests);
    production batches (>= 128) always use full 128-lane tiles."""
    return min(b_tile, max(8, -(-Bc // 8) * 8))


def _factor_predictor_batched(A, B, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req,
                              b_tile=128, interpret=False):
    """All inputs batch-leading; returns (dX, dU, dnu, fact) batch-leading.

    fact = (K (Bc,N,nu,nx), FxuT (Bc,N,nu,nx), Fuu_tri (Bc,N,nuu),
    Fiv_tri (Bc,N,nuu), Pseq (Bc,N,nx,nx))."""
    Bc, N, nx, _ = A.shape
    nu = B.shape[3]
    dtype = A.dtype
    nuu = nu * (nu + 1) // 2
    b_tile = _eff_tile(b_tile, Bc)
    pad = (-Bc) % b_tile
    Bp = Bc + pad
    _pad_b = _make_pad_b(pad)
    args = [
        _pad_b(_lanes(A)), _pad_b(_lanes(jnp.swapaxes(A, 2, 3))),
        _pad_b(_lanes(B)), _pad_b(_lanes(jnp.swapaxes(B, 2, 3))),
        _pad_b(_lanes(Cxx)), _pad_b(_lanes(jnp.swapaxes(Cxu, 2, 3))),
        _pad_b(_lanes(Cuu)),
        _pad_b(_lanes(PN)),
        _pad_b(_lanes(rbx)), _pad_b(_lanes(rbxN)),
        _pad_b(_lanes(rbu)), _pad_b(_lanes(req)),
    ]
    # padding lanes carry zero curvature -> Fuu = 0 would divide by zero in
    # the closed-form inverse; give them identity curvature instead
    if pad:
        eye_u = jnp.zeros((N, nu, nu, Bp), dtype) + jnp.eye(nu, dtype=dtype)[
            None, :, :, None
        ]
        mask = (jnp.arange(Bp) >= Bc)[None, None, None, :]
        args[6] = jnp.where(mask, eye_u, args[6])

    sp = _common_specs(N, nx, nu, b_tile)
    bmap3 = lambda bi: (0, 0, bi)
    kern = functools.partial(
        _factor_predictor_kernel, N=N, nx=nx, nu=nu, bt=b_tile,
    )
    out = pl.pallas_call(
        kern,
        grid=(Bp // b_tile,),
        in_specs=[
            sp["At"], sp["At"], sp["Bt"], sp["BtT"],
            sp["At"], sp["BtT"], pl.BlockSpec((N, nu, nu, b_tile),
                                              lambda bi: (0, 0, 0, bi)),
            pl.BlockSpec((nx, nx, b_tile), lambda bi: (0, 0, bi)),
            sp["vecx"], sp["x1"], sp["vecu"], sp["vecx"],
        ],
        out_specs=[
            sp["dX"], sp["vecu"], sp["vecx"],
            sp["K"], sp["K"],
            pl.BlockSpec((N, nuu, b_tile), bmap3),
            pl.BlockSpec((N, nuu, b_tile), bmap3),
            sp["Pseq"],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nuu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nuu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nx, nx, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, nx, b_tile), dtype),
            pltpu.VMEM((nx, nx, b_tile), dtype),
            pltpu.VMEM((nx, nu, b_tile), dtype),
            pltpu.VMEM((N, nu, b_tile), dtype),
            pltpu.VMEM((N, nx, b_tile), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    unl = lambda x: jnp.moveaxis(x, -1, 0)[:Bc]
    dX, dU, dnu, K, FxuT, Fuu, Fiv, Pseq = out
    return (
        unl(dX), unl(dU), unl(dnu),
        (unl(K), unl(FxuT), unl(Fuu), unl(Fiv), unl(Pseq)),
    )


def _resolve_batched(A, B, fact, rbx, rbxN, rbu, req,
                     b_tile=128, interpret=False):
    Bc, N, nx, _ = A.shape
    nu = B.shape[3]
    dtype = A.dtype
    K, FxuT, Fuu, Fiv, Pseq = fact
    nuu = Fuu.shape[2]
    b_tile = _eff_tile(b_tile, Bc)
    pad = (-Bc) % b_tile
    Bp = Bc + pad
    _pad_b = _make_pad_b(pad)
    args = [
        _pad_b(_lanes(A)), _pad_b(_lanes(jnp.swapaxes(A, 2, 3))),
        _pad_b(_lanes(B)), _pad_b(_lanes(jnp.swapaxes(B, 2, 3))),
        _pad_b(_lanes(K)), _pad_b(_lanes(FxuT)),
        _pad_b(_lanes(Fuu)), _pad_b(_lanes(Fiv)),
        _pad_b(_lanes(Pseq)),
        _pad_b(_lanes(rbx)), _pad_b(_lanes(rbxN)),
        _pad_b(_lanes(rbu)), _pad_b(_lanes(req)),
    ]
    sp = _common_specs(N, nx, nu, b_tile)
    bmap3 = lambda bi: (0, 0, bi)
    kern = functools.partial(_resolve_kernel, N=N, nx=nx, nu=nu, bt=b_tile)
    out = pl.pallas_call(
        kern,
        grid=(Bp // b_tile,),
        in_specs=[
            sp["At"], sp["At"], sp["Bt"], sp["BtT"],
            sp["K"], sp["K"],
            pl.BlockSpec((N, nuu, b_tile), bmap3),
            pl.BlockSpec((N, nuu, b_tile), bmap3),
            sp["Pseq"],
            sp["vecx"], sp["x1"], sp["vecu"], sp["vecx"],
        ],
        out_specs=[sp["dX"], sp["vecu"], sp["vecx"]],
        out_shape=[
            jax.ShapeDtypeStruct((N + 1, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nx, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, nu, b_tile), dtype),
            pltpu.VMEM((N, nx, b_tile), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    unl = lambda x: jnp.moveaxis(x, -1, 0)[:Bc]
    return unl(out[0]), unl(out[1]), unl(out[2])


# ----------------------------------------------------------------------
# XLA fallbacks (unbatched path of the custom_vmaps) — same math as the
# kernels, built from qp_ipm's scan implementations
# ----------------------------------------------------------------------
def _fallback_factor_predictor(A, B, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req):
    from robust_nonlinear_mpc_tpu.utils.numerics import (
        spd_solve_refined,
        spd_solve_small,
        sym,
    )

    N, nx = req.shape
    nu = B.shape[2]
    dtype = A.dtype
    hp = jax.lax.Precision.HIGHEST
    mmh = lambda a, b: jnp.matmul(a, b, precision=hp)

    def bwd(carry, blocks):
        P_next, p_next = carry
        A_k, B_k, Cxx_k, Cuu_k, Cxu_k, rbx_k, rbu_k, req_k = blocks
        PA = mmh(P_next, A_k)
        PB = mmh(P_next, B_k)
        Fxx = Cxx_k + mmh(A_k.T, PA)
        Fuu = Cuu_k + mmh(B_k.T, PB)
        Fxu = Cxu_k + mmh(A_k.T, PB)
        Fuu_r = sym(Fuu) + jnp.trace(Fuu) * 1e-14 * jnp.eye(nu, dtype=dtype)
        w = p_next + mmh(P_next, req_k[:, None])[:, 0]
        f_u = rbu_k + B_k.T @ w
        sol = -spd_solve_refined(
            Fuu_r, jnp.concatenate([Fxu.T, f_u[:, None]], axis=1)
        )
        K = sol[:, :nx]
        kff = sol[:, nx]
        P = Fxx + mmh(Fxu, K)
        p = rbx_k + A_k.T @ w + Fxu @ kff
        return (P, p), (K, Fuu_r, Fxu, P_next, kff, p_next)

    blocks = (A, B, Cxx, Cuu, Cxu, rbx, rbu, req)
    _, (K, Fuu_seq, Fxu_seq, Pseq, kff, pn) = jax.lax.scan(
        bwd, (PN, rbxN), blocks, reverse=True
    )

    def fwd(dx, per_k):
        A_k, B_k, K_k, kff_k, req_k, Pn, p_next = per_k
        du = K_k @ dx + kff_k
        dxn = A_k @ dx + B_k @ du + req_k
        dnu = -(Pn @ dxn + p_next)
        return dxn, (dx, du, dnu)

    dxN, (dX_head, dU, dnu) = jax.lax.scan(
        fwd, jnp.zeros(nx, dtype), (A, B, K, kff, req, Pseq, pn)
    )
    dX = jnp.concatenate([dX_head, dxN[None]], axis=0)

    tri = _tri(nu)
    eye = jnp.eye(nu, dtype=dtype)
    Fiv_full = jax.vmap(lambda H: spd_solve_small(H, eye))(Fuu_seq)
    pack = lambda M: jnp.stack([M[:, u, v] for (u, v) in tri], axis=1)
    fact = (K, jnp.swapaxes(Fxu_seq, 1, 2), pack(Fuu_seq), pack(Fiv_full),
            Pseq)
    return dX, dU, dnu, fact


def _fallback_resolve(A, B, fact, rbx, rbxN, rbu, req):
    N, nx = req.shape
    nu = B.shape[2]
    dtype = A.dtype
    K, FxuT, Fuu_tri, Fiv_tri, Pseq = fact
    tri = _tri(nu)
    nuu = len(tri)

    def unpack(tri_arr):
        M = jnp.zeros((N, nu, nu), dtype)
        for i, (u, v) in enumerate(tri):
            M = M.at[:, u, v].set(tri_arr[:, i])
            M = M.at[:, v, u].set(tri_arr[:, i])
        return M

    Fuu = unpack(Fuu_tri)
    Fiv = unpack(Fiv_tri)
    hp = jax.lax.Precision.HIGHEST
    mmh = lambda a, b: jnp.matmul(a, b, precision=hp)

    def bwd(p_next, per_k):
        A_k, B_k, Fuu_k, Fiv_k, FxuT_k, Pn, rbx_k, rbu_k, req_k = per_k
        w = p_next + mmh(Pn, req_k[:, None])[:, 0]
        f_u = rbu_k + B_k.T @ w
        x0 = Fiv_k @ f_u
        kff = -(x0 + Fiv_k @ (f_u - Fuu_k @ x0))
        p = rbx_k + A_k.T @ w + FxuT_k.T @ kff
        return p, (kff, p_next)

    _, (kff, pn) = jax.lax.scan(
        bwd, rbxN, (A, B, Fuu, Fiv, FxuT, Pseq, rbx, rbu, req),
        reverse=True,
    )

    def fwd(dx, per_k):
        A_k, B_k, K_k, kff_k, req_k, Pn, p_next = per_k
        du = K_k @ dx + kff_k
        dxn = A_k @ dx + B_k @ du + req_k
        dnu = -(Pn @ dxn + p_next)
        return dxn, (dx, du, dnu)

    dxN, (dX_head, dU, dnu) = jax.lax.scan(
        fwd, jnp.zeros(nx, dtype), (A, B, K, kff, req, Pseq, pn)
    )
    dX = jnp.concatenate([dX_head, dxN[None]], axis=0)
    return dX, dU, dnu


# ----------------------------------------------------------------------
# custom_vmap seams
# ----------------------------------------------------------------------
def make_newton_kernels(b_tile=128, interpret=False):
    """(factor_predictor, resolve) custom_vmaps: unbatched -> XLA scans,
    vmapped -> the fused Pallas kernels."""

    @jax.custom_batching.custom_vmap
    def factor_predictor(A, B, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req):
        return _fallback_factor_predictor(
            A, B, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req
        )

    @factor_predictor.def_vmap
    def _fp_rule(axis_size, in_batched, *args):
        if not all(jax.tree_util.tree_leaves(in_batched)):
            bargs = [
                a if b else jax.lax.broadcast(a, (axis_size,))
                for a, b in zip(args, in_batched)
            ]
        else:
            bargs = list(args)
        out = _factor_predictor_batched(
            *bargs, b_tile=b_tile, interpret=interpret
        )
        return out, jax.tree_util.tree_map(lambda _: True, out)

    @jax.custom_batching.custom_vmap
    def resolve(A, B, fact, rbx, rbxN, rbu, req):
        return _fallback_resolve(A, B, fact, rbx, rbxN, rbu, req)

    @resolve.def_vmap
    def _rs_rule(axis_size, in_batched, A, B, fact, rbx, rbxN, rbu, req):
        flat = jax.tree_util.tree_leaves(in_batched)
        if not all(flat):
            br = lambda a, b: a if b else jax.lax.broadcast(a, (axis_size,))
            ib = in_batched
            A = br(A, ib[0])
            B = br(B, ib[1])
            fact = jax.tree_util.tree_map(br, fact, ib[2])
            rbx = br(rbx, ib[3])
            rbxN = br(rbxN, ib[4])
            rbu = br(rbu, ib[5])
            req = br(req, ib[6])
        out = _resolve_batched(
            A, B, fact, rbx, rbxN, rbu, req, b_tile=b_tile, interpret=interpret
        )
        return out, (True, True, True)

    return factor_predictor, resolve


# module singletons used by solve_qp's kkt="pallas" path; interpret mode is
# picked per-backend so the same code path runs (slowly but exactly) in the
# CPU test suite
_KERNELS = None


def default_newton_kernels():
    global _KERNELS
    if _KERNELS is None:
        _KERNELS = make_newton_kernels(
            interpret=jax.default_backend() == "cpu"
        )
    return _KERNELS
