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

# Debug-only escape hatch for A/B-ing the per-stage P symmetrization cost
# (RNM_PALLAS_QP_SYM=0 skips it). NEVER disable in production: without
# sym() the kernel is measurably wrong at long horizons (rocket N=60 QPs:
# exit KKT 6.5e-2 vs 3.4e-4, 1/8 converging — tools/pallas_n60_qp_probe.py)
# because every contraction downstream exploits P = P'.
import os as _os

_SYM = _os.environ.get("RNM_PALLAS_QP_SYM", "1") != "0"


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

        # P <- sym(Fxx + Fxu K);  p <- rbx_k + A' w + Fxu kff
        P_new = Fxx
        p_new = rbx_ref[k] + _mv_t(At_ref[k], w)
        for u in range(nu):
            P_new = P_new + FxuT[u][:, None, :] * K_rows[u][None, :, :]
            p_new = p_new + FxuT[u] * kff_rows[u]
        # EXPLICIT per-stage symmetrization, matching the XLA path
        # (qp_ipm.py `P = sym(...)`). Every contraction here exploits
        # P = P' (PA/PB products, _mv_t(P, .), the forward loop's
        # _mv_t(Pn, .)), so skipping sym() lets asymmetric roundoff
        # compound along the recursion — harmless at the reference
        # horizon but fatal at long ones (measured rocket QP exit KKT,
        # pallas vs riccati: N=15 equal 6.5e-5; N=30 1.4e-3 vs 1.3e-4;
        # N=60 6.5e-2 vs 3.4e-4 with 1/8 QPs converging —
        # tools/pallas_n60_qp_probe.py). Transpose = one _mm_rows with
        # one-hot columns (sublane slicing is unsupported): ~1/5 of the
        # stage's existing matmul work.
        P_ref[...] = P_new
        if _SYM:
            # transpose into PA_ref (dead at this point in the stage) instead
            # of a fresh (nx, nx, bt) temporary. Measured compile accounting
            # (ADVICE r4 reconciliation): the reuse helps at N<=30 shapes but
            # does NOT rescue N=60 x B=512 — that program still reports
            # 133.56M vs the 128M scoped-VMEM cap post-sym (it sat at 128.0M
            # pre-sym; Mosaic's accounting did not credit the dead-scratch
            # reuse at that shape). The honest N=60 bench path is
            # RNM_BENCH_KKT=riccati until blockwise-N windowing lands.
            iota0 = jax.lax.broadcasted_iota(jnp.int32, (nx, bt), 0)
            PA_ref[...] = _mm_rows(
                lambda l: P_ref[l],
                lambda l: (iota0 == l).astype(dtype),
                nx, (nx, nx, bt), dtype,
            )
            P_ref[...] = 0.5 * (P_ref[...] + PA_ref[...])
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


def _eff_tile(b_tile, Bc, N=1):
    """Shrink the lane tile for tiny batches (interpret-mode tests);
    production batches (>= 128) always use full 128-lane tiles. (The lane
    tile CANNOT shrink below 128 for large batches — Mosaic requires the
    minormost block dim to be a multiple of 128 or the full array — so the
    long-horizon VMEM budget is managed by keeping in-kernel scratch flat
    instead: the N=60 program sits at ~128.0M of the 128M scoped-VMEM cap,
    and the sym() transpose reuses the dead PA_ref scratch for exactly this
    reason.)"""
    del N
    return min(b_tile, max(8, -(-Bc // 8) * 8))


def _factor_predictor_batched(A, B, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req,
                              b_tile=128, interpret=False):
    """All inputs batch-leading; returns (dX, dU, dnu, fact) batch-leading.

    fact = (K (Bc,N,nu,nx), FxuT (Bc,N,nu,nx), Fuu_tri (Bc,N,nuu),
    Fiv_tri (Bc,N,nuu), Pseq (Bc,N,nx,nx))."""
    Bc, N, nx, _ = A.shape
    window = _pick_window(N)
    if window < N:
        # long horizon: blockwise-N windowed path (O(window) scoped VMEM)
        return _factor_predictor_batched_win(
            A, B, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req,
            window, b_tile=b_tile, interpret=interpret,
        )
    nu = B.shape[3]
    dtype = A.dtype
    nuu = nu * (nu + 1) // 2
    b_tile = _eff_tile(b_tile, Bc, N)
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
    window = _pick_window(N)
    if window < N:
        return _resolve_batched_win(
            A, B, fact, rbx, rbxN, rbu, req,
            window, b_tile=b_tile, interpret=interpret,
        )
    nu = B.shape[3]
    dtype = A.dtype
    K, FxuT, Fuu, Fiv, Pseq = fact
    nuu = Fuu.shape[2]
    b_tile = _eff_tile(b_tile, Bc, N)
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
# Blockwise-N windowed kernels (long horizons).
#
# The single-kernel path above loads every (N, d0, d1, bt) operand whole
# per lane tile, so its scoped VMEM grows linearly in N and the N=60 x
# B=512 program overflows the 128M cap (133.56M measured, BASELINE.md r4).
# Here the stage axis becomes a SEQUENTIAL grid dimension: each grid step
# processes a `window` of stages while the Riccati carries (P, p for the
# backward sweep; dx for the forward sweep) persist in scratch across grid
# steps — scoped VMEM is O(window), independent of N. The natural seam is
# backward/forward (they traverse stages in opposite orders, and one grid
# axis has one direction), so a windowed Newton solve is two pallas_calls
# instead of one; the extra dispatch only exists at horizons the fused
# kernel cannot compile anyway. Math is IDENTICAL to the single-kernel
# path (same slab ops, same sym(), same refinement) — asserted by
# tests/test_pallas_qp.py's windowed-equivalence tests.
# ----------------------------------------------------------------------
_WINDOW_N_MAX = int(_os.environ.get("RNM_PALLAS_QP_WINDOW_N", "30"))


def _pick_window(N):
    """Window size for the blockwise-N path: the smallest window COUNT
    whose window fits the measured full-tile VMEM envelope
    (<= _WINDOW_N_MAX), i.e. w = ceil(N / ceil(N / MAX)). Non-divisor N
    (primes included) is handled by front-padding the stage axis with
    exact pass-through stages (A=I, B=0, C=0 — the Riccati carries P/p/dx
    traverse them unchanged), so there is no window=1 perf cliff.
    N <= the cap -> no windowing."""
    if N <= _WINDOW_N_MAX:
        return N
    return -(-N // (-(-N // _WINDOW_N_MAX)))


def _factor_bwd_win_kernel(
    At_ref,    # (Nw, nx, nx, bt) window, stages in ORIGINAL order
    Bt_ref,    # (Nw, nx, nu, bt)
    Cxx_ref,   # (Nw, nx, nx, bt)
    CxuT_ref,  # (Nw, nu, nx, bt)
    Cuu_ref,   # (Nw, nu, nu, bt)
    PN_ref,    # (nx, nx, bt)   full (read at the first window only)
    rbx_ref,   # (Nw, nx, bt)
    rbxN_ref,  # (nx, bt)
    rbu_ref,   # (Nw, nu, bt)
    req_ref,   # (Nw, nx, bt)
    # outputs (windowed)
    K_ref, FxuT_ref, Fuu_ref, Fiv_ref, Pseq_ref, kff_ref, pn_ref,
    # scratch — P_ref/p_ref are the cross-window Riccati carries
    P_ref,     # (nx, nx, bt)
    PA_ref,    # (nx, nx, bt)
    PB_ref,    # (nx, nu, bt)
    p_ref,     # (nx, bt)
    *, Nw, nx, nu, bt,
):
    dtype = P_ref.dtype
    tri = _tri(nu)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        P_ref[...] = PN_ref[...]
        p_ref[...] = rbxN_ref[...]

    def bwd(s, _):
        k = Nw - 1 - s
        p = p_ref[...]
        P = P_ref[...]
        Pseq_ref[k] = P
        pn_ref[k] = p

        PA_ref[...] = _mm_rows(
            lambda l: P_ref[l], lambda l: At_ref[k, l],
            nx, (nx, nx, bt), dtype,
        )
        PB_ref[...] = _mm_rows(
            lambda l: P_ref[l], lambda l: Bt_ref[k, l],
            nx, (nx, nu, bt), dtype,
        )
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

        req_k = req_ref[k]
        w = p + _mv_t(P, req_k)
        f_u = rbu_ref[k] + _mv_t(Bt_ref[k], w)

        Hc = _sym_slabs(Fuu, nu)
        Fiv = _spd_inv_slabs(Hc, nu)
        Fuu_ref[k] = jnp.concatenate([Hc[uv] for uv in tri], axis=0)
        Fiv_ref[k] = jnp.concatenate([Fiv[uv] for uv in tri], axis=0)

        K_rows = _refined_rows(Hc, Fiv, [FxuT[u] for u in range(nu)], nu)
        K_rows = [-r for r in K_rows]
        fu_rows = [_slab(f_u, u, nu) for u in range(nu)]
        kff_rows = _refined_rows(Hc, Fiv, fu_rows, nu)
        kff_rows = [-r for r in kff_rows]
        K_ref[k] = jnp.concatenate([r[None] for r in K_rows], axis=0)
        kff_ref[k] = jnp.concatenate(kff_rows, axis=0)

        P_new = Fxx
        p_new = rbx_ref[k] + _mv_t(At_ref[k], w)
        for u in range(nu):
            P_new = P_new + FxuT[u][:, None, :] * K_rows[u][None, :, :]
            p_new = p_new + FxuT[u] * kff_rows[u]
        P_ref[...] = P_new
        if _SYM:
            # same per-stage symmetrization as the single kernel (see its
            # note); PA_ref is dead here too
            iota0 = jax.lax.broadcasted_iota(jnp.int32, (nx, bt), 0)
            PA_ref[...] = _mm_rows(
                lambda l: P_ref[l],
                lambda l: (iota0 == l).astype(dtype),
                nx, (nx, nx, bt), dtype,
            )
            P_ref[...] = 0.5 * (P_ref[...] + PA_ref[...])
        p_ref[...] = p_new
        return 0

    jax.lax.fori_loop(0, Nw, bwd, 0)


def _resolve_bwd_win_kernel(
    At_ref, Bt_ref,
    FxuT_ref,  # (Nw, nu, nx, bt)
    Fuu_ref,   # (Nw, nuu, bt)
    Fiv_ref,   # (Nw, nuu, bt)
    Pseq_ref,  # (Nw, nx, nx, bt)
    rbx_ref, rbxN_ref, rbu_ref, req_ref,
    # outputs (windowed)
    kff_ref, pn_ref,
    # scratch
    p_ref,     # (nx, bt) cross-window carry
    *, Nw, nx, nu, bt,
):
    tri = _tri(nu)
    nuu = len(tri)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        p_ref[...] = rbxN_ref[...]

    def bwd(s, _):
        k = Nw - 1 - s
        p = p_ref[...]
        pn_ref[k] = p
        Pn = Pseq_ref[k]
        w = p + _mv_t(Pn, req_ref[k])
        f_u = rbu_ref[k] + _mv_t(Bt_ref[k], w)
        fuu_k = Fuu_ref[k]
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
        p_ref[...] = p_new
        return 0

    jax.lax.fori_loop(0, Nw, bwd, 0)


def _newton_fwd_win_kernel(
    AtT_ref,   # (Nw, nx, nx, bt)
    BtT_ref,   # (Nw, nu, nx, bt)
    req_ref,   # (Nw, nx, bt)
    K_ref,     # (Nw, nu, nx, bt)
    kff_ref,   # (Nw, nu, bt)
    Pseq_ref,  # (Nw, nx, nx, bt)
    pn_ref,    # (Nw, nx, bt)
    # outputs
    dXh_ref,   # (Nw, nx, bt) windowed head rows of dX
    dU_ref,    # (Nw, nu, bt)
    dnu_ref,   # (Nw, nx, bt)
    dxN_ref,   # (nx, bt) full — the last window's final dx wins
    # scratch
    dx_ref,    # (nx, bt) cross-window carry
    *, Nw, nx, nu, bt,
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    def fwd(k, _):
        dx = dx_ref[...]
        Kk = K_ref[k]
        kffk = kff_ref[k]
        du_rows = [
            jnp.sum(Kk[u] * dx, axis=0, keepdims=True) + _slab(kffk, u, nu)
            for u in range(nu)
        ]
        dxn = _mv_t(AtT_ref[k], dx) + req_ref[k]
        BtT = BtT_ref[k]
        for u in range(nu):
            dxn = dxn + BtT[u] * du_rows[u]
        Pn = Pseq_ref[k]
        dnu = -(_mv_t(Pn, dxn) + pn_ref[k])
        dXh_ref[k] = dx
        dU_ref[k] = jnp.concatenate(du_rows, axis=0)
        dnu_ref[k] = dnu
        dx_ref[...] = dxn
        return 0

    jax.lax.fori_loop(0, Nw, fwd, 0)
    dxN_ref[...] = dx_ref[...]


def _win_specs(N, window, nx, nu, b_tile, reverse):
    """BlockSpec builders for the windowed calls. `reverse` maps window
    index wi to stage block (backward sweeps consume windows from the
    end)."""
    nw = N // window
    blk = (lambda bi, wi: (nw - 1 - wi,)) if reverse else (lambda bi, wi: (wi,))

    def win4(d0, d1):
        return pl.BlockSpec(
            (window, d0, d1, b_tile), lambda bi, wi: blk(bi, wi) + (0, 0, bi)
        )

    def win3(d0):
        return pl.BlockSpec(
            (window, d0, b_tile), lambda bi, wi: blk(bi, wi) + (0, bi)
        )

    full3 = lambda d0, d1: pl.BlockSpec(
        (d0, d1, b_tile), lambda bi, wi: (0, 0, bi)
    )
    full2 = lambda d0: pl.BlockSpec((d0, b_tile), lambda bi, wi: (0, bi))
    return win4, win3, full3, full2


def _pad_stages_front(x, npad, fill=None):
    """Prepend `npad` pass-through stages along axis 1 of a batch-leading
    (Bc, N, ...) array. fill=None -> zeros; fill="eye" -> identity blocks
    (square trailing dims). Pad stages are exact no-ops for the Riccati
    sweeps: A=I, B=0, C*=0 (Cuu=I for the slab inverse's positive
    definiteness), rhs=0 keep P/p/dx unchanged through them."""
    if npad == 0:
        return x
    if fill == "eye":
        n = x.shape[-1]
        blk = jnp.broadcast_to(
            jnp.eye(n, dtype=x.dtype), x.shape[:1] + (npad,) + x.shape[2:]
        )
    else:
        blk = jnp.zeros(x.shape[:1] + (npad,) + x.shape[2:], x.dtype)
    return jnp.concatenate([blk, x], axis=1)


def _factor_predictor_batched_win(A, B, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu,
                                  req, window, b_tile=128, interpret=False):
    """Windowed twin of _factor_predictor_batched (two pallas_calls)."""
    Bc, N_real, nx, _ = A.shape
    nu = B.shape[3]
    dtype = A.dtype
    nuu = nu * (nu + 1) // 2
    # front-pad the stage axis up to a multiple of the window with exact
    # pass-through stages (see _pad_stages_front) — outputs sliced after
    nwin = -(-N_real // window)
    N = nwin * window
    npad = N - N_real
    if npad:
        A = _pad_stages_front(A, npad, "eye")
        B = _pad_stages_front(B, npad)
        Cxx = _pad_stages_front(Cxx, npad)
        Cuu = _pad_stages_front(Cuu, npad, "eye")
        Cxu = _pad_stages_front(Cxu, npad)
        rbx = _pad_stages_front(rbx, npad)
        rbu = _pad_stages_front(rbu, npad)
        req = _pad_stages_front(req, npad)
    b_tile = _eff_tile(b_tile, Bc, N)
    pad = (-Bc) % b_tile
    Bp = Bc + pad
    _pad_b = _make_pad_b(pad)

    At_l = _pad_b(_lanes(A))
    AtT_l = _pad_b(_lanes(jnp.swapaxes(A, 2, 3)))
    Bt_l = _pad_b(_lanes(B))
    BtT_l = _pad_b(_lanes(jnp.swapaxes(B, 2, 3)))
    Cxx_l = _pad_b(_lanes(Cxx))
    CxuT_l = _pad_b(_lanes(jnp.swapaxes(Cxu, 2, 3)))
    Cuu_l = _pad_b(_lanes(Cuu))
    PN_l = _pad_b(_lanes(PN))
    rbx_l = _pad_b(_lanes(rbx))
    rbxN_l = _pad_b(_lanes(rbxN))
    rbu_l = _pad_b(_lanes(rbu))
    req_l = _pad_b(_lanes(req))
    if pad:
        eye_u = jnp.zeros((N, nu, nu, Bp), dtype) + jnp.eye(nu, dtype=dtype)[
            None, :, :, None
        ]
        mask = (jnp.arange(Bp) >= Bc)[None, None, None, :]
        Cuu_l = jnp.where(mask, eye_u, Cuu_l)

    nw = N // window
    win4, win3, full3, full2 = _win_specs(N, window, nx, nu, b_tile, True)
    kern = functools.partial(
        _factor_bwd_win_kernel, Nw=window, nx=nx, nu=nu, bt=b_tile
    )
    K_l, FxuT_l, Fuu_l, Fiv_l, Pseq_l, kff_l, pn_l = pl.pallas_call(
        kern,
        grid=(Bp // b_tile, nw),
        in_specs=[
            win4(nx, nx), win4(nx, nu), win4(nx, nx), win4(nu, nx),
            win4(nu, nu), full3(nx, nx), win3(nx), full2(nx), win3(nu),
            win3(nx),
        ],
        out_specs=[
            win4(nu, nx), win4(nu, nx), win3(nuu), win3(nuu),
            win4(nx, nx), win3(nu), win3(nx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, nu, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nuu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nuu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nx, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nx, Bp), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, nx, b_tile), dtype),
            pltpu.VMEM((nx, nx, b_tile), dtype),
            pltpu.VMEM((nx, nu, b_tile), dtype),
            pltpu.VMEM((nx, b_tile), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(At_l, Bt_l, Cxx_l, CxuT_l, Cuu_l, PN_l, rbx_l, rbxN_l, rbu_l, req_l)

    dX, dU, dnu = _fwd_win_call(
        AtT_l, BtT_l, req_l, K_l, kff_l, Pseq_l, pn_l,
        N, nx, nu, window, Bp, b_tile, dtype, interpret,
    )
    # drop the pad stages (axis 1 after un-laning)
    unl = lambda x: jnp.moveaxis(x, -1, 0)[:Bc, npad:]
    return (
        unl(dX), unl(dU), unl(dnu),
        (unl(K_l), unl(FxuT_l), unl(Fuu_l), unl(Fiv_l), unl(Pseq_l)),
    )


def _fwd_win_call(AtT_l, BtT_l, req_l, K_l, kff_l, Pseq_l, pn_l,
                  N, nx, nu, window, Bp, b_tile, dtype, interpret):
    """Windowed forward sweep on lane-layout operands -> lane-layout
    (dX (N+1, nx, Bp), dU, dnu)."""
    nw = N // window
    win4, win3, full3, full2 = _win_specs(N, window, nx, nu, b_tile, False)
    kern = functools.partial(
        _newton_fwd_win_kernel, Nw=window, nx=nx, nu=nu, bt=b_tile
    )
    dXh, dU, dnu, dxN = pl.pallas_call(
        kern,
        grid=(Bp // b_tile, nw),
        in_specs=[
            win4(nx, nx), win4(nu, nx), win3(nx),
            win4(nu, nx), win3(nu), win4(nx, nx), win3(nx),
        ],
        out_specs=[win3(nx), win3(nu), win3(nx), full2(nx)],
        out_shape=[
            jax.ShapeDtypeStruct((N, nx, Bp), dtype),
            jax.ShapeDtypeStruct((N, nu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nx, Bp), dtype),
            jax.ShapeDtypeStruct((nx, Bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((nx, b_tile), dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(AtT_l, BtT_l, req_l, K_l, kff_l, Pseq_l, pn_l)
    dX = jnp.concatenate([dXh, dxN[None]], axis=0)
    return dX, dU, dnu


def _resolve_batched_win(A, B, fact, rbx, rbxN, rbu, req, window,
                         b_tile=128, interpret=False):
    """Windowed twin of _resolve_batched (two pallas_calls)."""
    Bc, N_real, nx, _ = A.shape
    nu = B.shape[3]
    dtype = A.dtype
    K, FxuT, Fuu, Fiv, Pseq = fact
    nuu = Fuu.shape[2]
    nwin = -(-N_real // window)
    N = nwin * window
    npad = N - N_real
    if npad:
        A = _pad_stages_front(A, npad, "eye")
        B = _pad_stages_front(B, npad)
        K = _pad_stages_front(K, npad)
        FxuT = _pad_stages_front(FxuT, npad)
        # Fuu/Fiv pad stages = identity in upper-tri slab packing (PD for
        # the refined solve; kff stays 0 there since f_u = 0)
        eye_tri = jnp.asarray(
            [1.0 if u == v else 0.0 for (u, v) in _tri(nu)], dtype
        )
        tri_blk = jnp.broadcast_to(eye_tri, (Bc, npad, nuu))
        Fuu = jnp.concatenate([tri_blk, Fuu], axis=1)
        Fiv = jnp.concatenate([tri_blk, Fiv], axis=1)
        Pseq = _pad_stages_front(Pseq, npad)
        rbx = _pad_stages_front(rbx, npad)
        rbu = _pad_stages_front(rbu, npad)
        req = _pad_stages_front(req, npad)
    b_tile = _eff_tile(b_tile, Bc, N)
    pad = (-Bc) % b_tile
    Bp = Bc + pad
    _pad_b = _make_pad_b(pad)
    At_l = _pad_b(_lanes(A))
    AtT_l = _pad_b(_lanes(jnp.swapaxes(A, 2, 3)))
    Bt_l = _pad_b(_lanes(B))
    BtT_l = _pad_b(_lanes(jnp.swapaxes(B, 2, 3)))
    K_l = _pad_b(_lanes(K))
    FxuT_l = _pad_b(_lanes(FxuT))
    Fuu_l = _pad_b(_lanes(Fuu))
    Fiv_l = _pad_b(_lanes(Fiv))
    Pseq_l = _pad_b(_lanes(Pseq))
    rbx_l = _pad_b(_lanes(rbx))
    rbxN_l = _pad_b(_lanes(rbxN))
    rbu_l = _pad_b(_lanes(rbu))
    req_l = _pad_b(_lanes(req))

    nw = N // window
    win4, win3, full3, full2 = _win_specs(N, window, nx, nu, b_tile, True)
    kern = functools.partial(
        _resolve_bwd_win_kernel, Nw=window, nx=nx, nu=nu, bt=b_tile
    )
    kff_l, pn_l = pl.pallas_call(
        kern,
        grid=(Bp // b_tile, nw),
        in_specs=[
            win4(nx, nx), win4(nx, nu),
            win4(nu, nx), win3(nuu), win3(nuu), win4(nx, nx),
            win3(nx), full2(nx), win3(nu), win3(nx),
        ],
        out_specs=[win3(nu), win3(nx)],
        out_shape=[
            jax.ShapeDtypeStruct((N, nu, Bp), dtype),
            jax.ShapeDtypeStruct((N, nx, Bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((nx, b_tile), dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(At_l, Bt_l, FxuT_l, Fuu_l, Fiv_l, Pseq_l, rbx_l, rbxN_l, rbu_l, req_l)

    dX, dU, dnu = _fwd_win_call(
        AtT_l, BtT_l, req_l, K_l, kff_l, Pseq_l, pn_l,
        N, nx, nu, window, Bp, b_tile, dtype, interpret,
    )
    unl = lambda x: jnp.moveaxis(x, -1, 0)[:Bc, npad:]
    return unl(dX), unl(dU), unl(dnu)


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
        # sym() matches both the kernel and qp_ipm (asymmetric roundoff
        # compounds over long horizons; see the kernel's P update note)
        P = sym(Fxx + mmh(Fxu, K))
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


# ----------------------------------------------------------------------
# fused whole-iteration kernel ("pallas_iter"): one Mehrotra predictor-
# corrector iteration per kernel — rhs assembly, factorization, both Newton
# solves, slack/dual recovery, fraction-to-boundary line searches, the
# centering sigma, the state update, the fresh residuals and the KKT scalar
# all run in-kernel (everything is per-lane math); only the lam/s weights,
# curvature Gram GEMMs (shared-operand MXU work — measured faster in XLA)
# and the done-flag bookkeeping stay outside.
#
# STATUS — EXPERIMENTAL, not the default: numerically verified end to end
# (identical iterates/iteration counts vs kkt="riccati" in interpret mode,
# tests/test_pallas_qp.py), but compiling the full MPC step with this
# kernel nested in vmap+while_loop exceeded a 28-minute remote-compile
# window on this environment — impractical vs the 2-kernel "pallas" mode
# (~6 min cold compile, 35.7k solves/s). Revisit on an environment with
# local compilation before investing further; the expected additional win
# over "pallas" is the ~1.3 ms/iteration of XLA glue between the kernels.
# ----------------------------------------------------------------------
def _shared_mv_t(G, t):
    """out[i, b] = sum_r G[r, i] t[r, b] for a SHARED (n_r, n_i) matrix."""
    return jnp.sum(G[:, :, None] * t[:, None, :], axis=0)


def _shared_mv(G, x):
    """out[r, b] = sum_i G[r, i] x[i, b] (sublane reduction)."""
    return jnp.sum(G[:, :, None] * x[None, :, :], axis=1)


def _alpha_ftb(pairs, tau, bt, dtype):
    """Per-lane fraction-to-boundary step: min over all (v, dv) entries of
    -tau*v/dv where dv < 0, capped at 1. pairs: list of (v, dv) tensors with
    the lane axis LAST."""
    alpha = jnp.ones((1, bt), dtype)
    for v, dv in pairs:
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        red = jnp.min(ratio.reshape(-1, bt), axis=0, keepdims=True)
        alpha = jnp.minimum(alpha, tau * red)
    return alpha


def _maxabs_lane(ts, bt):
    m = None
    for t in ts:
        r = jnp.max(jnp.abs(t).reshape(-1, bt), axis=0, keepdims=True)
        m = r if m is None else jnp.maximum(m, r)
    return m


def _ipm_iter_kernel(
    # problem data (batched, lane layout)
    At_ref, AtT_ref, Bt_ref, BtT_ref,     # (N,nx,nx,bt) x2, (N,nx,nu,bt), (N,nu,nx,bt)
    c_ref,      # (N, nx, bt)
    qx_ref,     # (N+1, nx, bt)
    qu_ref,     # (N, nu, bt)
    h_ref,      # (N, ni, bt)
    hf_ref,     # (ni_f, bt)
    # statics (shared)
    Gx_ref,     # (N, ni, nx)
    Gu_ref,     # (N, ni, nu)
    Gf_ref,     # (ni_f, nx)
    Hx_ref,     # (N, nx, nx)
    Hu_ref,     # (N, nu, nu)
    HxN_ref,    # (nx, nx)
    # per-iteration curvature (batched; assembled in XLA)
    Cxx_ref,    # (N, nx, nx, bt)
    CxuT_ref,   # (N, nu, nx, bt)
    Cuu_ref,    # (N, nu, nu, bt)
    PN_ref,     # (nx, nx, bt)
    # iterate state (batched)
    X_ref,      # (N+1, nx, bt)
    U_ref,      # (N, nu, bt)
    lam_ref,    # (N, ni, bt)
    s_ref,      # (N, ni, bt)
    lamf_ref,   # (ni_f, bt)
    sf_ref,     # (ni_f, bt)
    nu_ref,     # (N, nx, bt)
    # carried residuals (batched; invariant: residuals AT the iterate)
    req_ref,    # (N, nx, bt)
    rineq_ref,  # (N, ni, bt)
    rineqf_ref, # (ni_f, bt)
    rx_ref,     # (N, nx, bt)  row 0 = 0
    rxN_ref,    # (nx, bt)
    ru_ref,     # (N, nu, bt)
    scalep_ref, # (1, bt)
    done_ref,   # (1, bt)  float: 1.0 = frozen
    # outputs
    Xo_ref, Uo_ref, lamo_ref, so_ref, lamfo_ref, sfo_ref, nuo_ref,
    reqo_ref, rineqo_ref, rineqfo_ref, rxo_ref, rxNo_ref, ruo_ref,
    res_ref,    # (1, bt) relative KKT at the output iterate
    bad_ref,    # (1, bt) 1.0 where the step produced non-finite values
    # scratch
    P_ref,      # (nx, nx, bt)
    PA_ref, PB_ref,                       # (nx, nx, bt), (nx, nu, bt)
    K_ref,      # (N, nu, nx, bt)
    FxuT_s,     # (N, nu, nx, bt)
    Fuu_s,      # (N, nuu, bt)
    Fiv_s,      # (N, nuu, bt)
    Pseq_s,     # (N, nx, nx, bt)
    kff_s,      # (N, nu, bt)
    pn_s,       # (N, nx, bt)
    dX_s,       # (N+1, nx, bt)
    dU_s,       # (N, nu, bt)
    dnu_s,      # (N, nx, bt)
    dsa_s,      # (N, ni, bt)
    dlama_s,    # (N, ni, bt)
    t_ref,      # (N, ni, bt)   reduced-rhs weights (ref: fori-sliceable)
    rcomp_ref,  # (N, ni, bt)   complementarity rhs (ref: fori-sliceable)
    *, N, nx, nu, ni, ni_f, bt, tau, n_comp,
):
    dtype = P_ref.dtype
    tri = _tri(nu)
    nuu = len(tri)

    lam = lam_ref[...]
    s = s_ref[...]
    lamf = lamf_ref[...]
    sf = sf_ref[...]
    rineq = rineq_ref[...]
    rineqf = rineqf_ref[...]

    mu = (
        jnp.sum((lam * s).reshape(-1, bt), axis=0, keepdims=True)
        + jnp.sum(lamf * sf, axis=0, keepdims=True)
    ) / n_comp

    def backward(t_f, store_factors):
        """Reverse sweep: rhs assembly + (optionally) factorization + the
        feedforward solve. Stage weights read from t_ref (set by caller);
        t_f (ni_f, bt)."""
        rbxN = rxN_ref[...] + _shared_mv_t(Gf_ref[...], t_f)
        if store_factors:
            P_ref[...] = PN_ref[...] + 0.0
        P_ref0 = P_ref  # alias for clarity

        def bwd(si, p):
            k = N - 1 - si
            t_k = t_ref[k]
            rbu_k = ru_ref[k] + _shared_mv_t(Gu_ref[k], t_k)
            is0 = (k == 0)
            rbx_k = jnp.where(
                is0,
                jnp.zeros((nx, bt), dtype),
                rx_ref[k] + _shared_mv_t(Gx_ref[k], t_k),
            )
            if store_factors:
                P = P_ref0[...]
                Pseq_s[k] = P
                pn_s[k] = p
                PA_ref[...] = _mm_rows(
                    lambda l: P_ref0[l], lambda l: At_ref[k, l],
                    nx, (nx, nx, bt), dtype,
                )
                PB_ref[...] = _mm_rows(
                    lambda l: P_ref0[l], lambda l: Bt_ref[k, l],
                    nx, (nx, nu, bt), dtype,
                )
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
                FxuT_s[k] = FxuT
                Hc = _sym_slabs(Fuu, nu)
                Fiv = _spd_inv_slabs(Hc, nu)
                Fuu_s[k] = jnp.concatenate([Hc[uv] for uv in tri], axis=0)
                Fiv_s[k] = jnp.concatenate([Fiv[uv] for uv in tri], axis=0)
                w = p + _mv_t(P, req_ref[k])
                f_u = rbu_k + _mv_t(Bt_ref[k], w)
                K_rows = _refined_rows(
                    Hc, Fiv, [FxuT[u] for u in range(nu)], nu
                )
                K_rows = [-r for r in K_rows]
                fu_rows = [_slab(f_u, u, nu) for u in range(nu)]
                kff_rows = [-r for r in _refined_rows(Hc, Fiv, fu_rows, nu)]
                K_ref[k] = jnp.concatenate([r[None] for r in K_rows], axis=0)
                kff_s[k] = jnp.concatenate(kff_rows, axis=0)
                P_new = Fxx
                p_new = rbx_k + _mv_t(At_ref[k], w)
                for u in range(nu):
                    P_new = P_new + FxuT[u][:, None, :] * K_rows[u][None, :, :]
                    p_new = p_new + FxuT[u] * kff_rows[u]
                # explicit sym(): see the kernel-A P update note (long-
                # horizon asymmetric-roundoff compounding). Transposes into
                # the dead PA_ref scratch — zero extra scoped VMEM.
                P_ref0[...] = P_new
                if _SYM:
                    iota0 = jax.lax.broadcasted_iota(
                        jnp.int32, (nx, bt), 0
                    )
                    PA_ref[...] = _mm_rows(
                        lambda l: P_ref0[l],
                        lambda l: (iota0 == l).astype(dtype),
                        nx, (nx, nx, bt), dtype,
                    )
                    P_ref0[...] = 0.5 * (P_ref0[...] + PA_ref[...])
                return p_new
            else:
                Pn = Pseq_s[k]
                pn_s[k] = p
                w = p + _mv_t(Pn, req_ref[k])
                f_u = rbu_k + _mv_t(Bt_ref[k], w)
                fuu_k = Fuu_s[k]
                fiv_k = Fiv_s[k]
                Hc = {uv: _slab(fuu_k, i, nuu) for i, uv in enumerate(tri)}
                Fiv = {uv: _slab(fiv_k, i, nuu) for i, uv in enumerate(tri)}
                fu_rows = [_slab(f_u, u, nu) for u in range(nu)]
                kff_rows = [-r for r in _refined_rows(Hc, Fiv, fu_rows, nu)]
                kff_s[k] = jnp.concatenate(kff_rows, axis=0)
                FxuT = FxuT_s[k]
                p_new = rbx_k + _mv_t(At_ref[k], w)
                for u in range(nu):
                    p_new = p_new + FxuT[u] * kff_rows[u]
                return p_new

        jax.lax.fori_loop(0, N, bwd, rbxN)

    def forward():
        def fwd(k, dx):
            Kk = K_ref[k]
            kffk = kff_s[k]
            du_rows = [
                jnp.sum(Kk[u] * dx, axis=0, keepdims=True)
                + _slab(kffk, u, nu)
                for u in range(nu)
            ]
            dxn = _mv_t(AtT_ref[k], dx) + req_ref[k]
            BtT = BtT_ref[k]
            for u in range(nu):
                dxn = dxn + BtT[u] * du_rows[u]
            dnu = -(_mv_t(Pseq_s[k], dxn) + pn_s[k])
            dX_s[k] = dx
            dU_s[k] = jnp.concatenate(du_rows, axis=0)
            dnu_s[k] = dnu
            return dxn

        dxN = jax.lax.fori_loop(0, N, fwd, jnp.zeros((nx, bt), dtype))
        dX_s[N] = dxN

    def recover_ds(rcomp_f):
        """(ds, dlam, ds_f, dlam_f) at the current dX_s/dU_s; the stage
        complementarity rhs is read from rcomp_ref (set by caller)."""
        def per_stage(k, _):
            dGz = _shared_mv(Gx_ref[k], dX_s[k]) + _shared_mv(
                Gu_ref[k], dU_s[k]
            )
            ds_k = -rineq_ref[k] - dGz
            dsa_s[k] = ds_k
            dlama_s[k] = -(rcomp_ref[k] + lam_ref[k] * ds_k) / s_ref[k]
            return 0

        jax.lax.fori_loop(0, N, per_stage, 0)
        dGzf = _shared_mv(Gf_ref[...], dX_s[N])
        ds_f = -rineqf - dGzf
        dlam_f = -(rcomp_f + lamf * ds_f) / sf
        return ds_f, dlam_f

    # ---- predictor (affine) ----
    rcomp_a = lam * s
    rcomp_af = lamf * sf
    t_ref[...] = (lam * rineq - rcomp_a) / s
    rcomp_ref[...] = rcomp_a
    t_af = (lamf * rineqf - rcomp_af) / sf
    backward(t_af, store_factors=True)
    forward()
    dsf_a, dlamf_a = recover_ds(rcomp_af)
    dsa = dsa_s[...]
    dlama = dlama_s[...]

    alpha_p_a = _alpha_ftb([(s, dsa), (sf, dsf_a)], 1.0, bt, dtype)
    alpha_d_a = _alpha_ftb([(lam, dlama), (lamf, dlamf_a)], 1.0, bt, dtype)
    mu_aff = (
        jnp.sum(((s + alpha_p_a * dsa) * (lam + alpha_d_a * dlama)
                 ).reshape(-1, bt), axis=0, keepdims=True)
        + jnp.sum((sf + alpha_p_a * dsf_a) * (lamf + alpha_d_a * dlamf_a),
                  axis=0, keepdims=True)
    ) / n_comp
    sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

    # ---- corrector ----
    rcomp_c = lam * s + dsa * dlama - sigma * mu
    rcomp_cf = lamf * sf + dsf_a * dlamf_a - sigma * mu
    t_ref[...] = (lam * rineq - rcomp_c) / s
    rcomp_ref[...] = rcomp_c
    t_cf = (lamf * rineqf - rcomp_cf) / sf
    backward(t_cf, store_factors=False)
    forward()
    dsf_c, dlamf_c = recover_ds(rcomp_cf)
    ds = dsa_s[...]
    dlam = dlama_s[...]

    alpha_p = _alpha_ftb([(s, ds), (sf, dsf_c)], tau, bt, dtype)
    alpha_d = _alpha_ftb([(lam, dlam), (lamf, dlamf_c)], tau, bt, dtype)

    # ---- update, frozen-lane freeze (done lanes keep the old iterate) ----
    keep = done_ref[...] > 0.5           # (1, bt)
    def sel3(new, old):
        return jnp.where(keep[None] if new.ndim == 3 else keep, old, new)

    X_n = sel3(X_ref[...] + alpha_p[None] * dX_s[...], X_ref[...])
    U_n = sel3(U_ref[...] + alpha_p[None] * dU_s[...], U_ref[...])
    s_n = sel3(s + alpha_p[None] * ds, s)
    sf_n = sel3(sf + alpha_p * dsf_c, sf)
    lam_n = sel3(lam + alpha_d[None] * dlam, lam)
    lamf_n = sel3(lamf + alpha_d * dlamf_c, lamf)
    nu_n = sel3(nu_ref[...] + alpha_d[None] * dnu_s[...], nu_ref[...])
    # stage the selected iterate in the output refs so the residual loop
    # can ref-slice it (value dynamic_slice is unsupported)
    Xo_ref[...] = X_n
    Uo_ref[...] = U_n
    so_ref[...] = s_n
    lamo_ref[...] = lam_n
    nuo_ref[...] = nu_n

    # ---- fresh residuals at the selected iterate (per stage) ----
    def resid(k, _):
        x_k = Xo_ref[k]
        x_k1 = Xo_ref[k + 1]
        u_k = Uo_ref[k]
        lam_k = lamo_ref[k]
        nu_k = nuo_ref[k]
        s_k = so_ref[k]
        reqo_ref[k] = (
            _mv_t(AtT_ref[k], x_k) + _mv_t(BtT_ref[k], u_k)
            + c_ref[k] - x_k1
        )
        rineqo_ref[k] = (
            _shared_mv(Gx_ref[k], x_k) + _shared_mv(Gu_ref[k], u_k)
            + s_k - h_ref[k]
        )
        # stationarity rows 1..N-1 (row 0 pinned to zero by convention);
        # Hx symmetric so Hx x == Hx' x via the shared-matrix helper
        HxX = _shared_mv_t(Hx_ref[k], x_k)
        nu_km1 = nuo_ref[jnp.maximum(k - 1, 0)]
        rx_k = (
            HxX + qx_ref[k]
            + _shared_mv_t(Gx_ref[k], lam_k)
            + nu_km1
            - _mv_t(At_ref[k], nu_k)
        )
        rxo_ref[k] = jnp.where(
            k == 0, jnp.zeros((nx, bt), dtype), rx_k
        )
        HuU = _shared_mv_t(Hu_ref[k], u_k)
        ruo_ref[k] = (
            HuU + qu_ref[k]
            + _shared_mv_t(Gu_ref[k], lam_k)
            - _mv_t(Bt_ref[k], nu_k)
        )
        return 0

    jax.lax.fori_loop(0, N, resid, 0)
    x_N = X_n[N]
    rineqfo_ref[...] = _shared_mv(Gf_ref[...], x_N) + sf_n - hf_ref[...]
    HxNx = _shared_mv_t(HxN_ref[...], x_N)
    rxNo_ref[...] = (
        HxNx + qx_ref[N]
        + _shared_mv_t(Gf_ref[...], lamf_n)
        + nu_n[N - 1]
    )

    def kkt(reqv, rineqv, rineqfv, rxv, rxNv, ruv, lamv, lamfv, sv, sfv):
        gap = (
            jnp.sum((lamv * sv).reshape(-1, bt), axis=0, keepdims=True)
            + jnp.sum(lamfv * sfv, axis=0, keepdims=True)
        ) / n_comp
        scale_d = 1.0 + _maxabs_lane(
            [qx_ref[...], qu_ref[...], lamv, lamfv], bt
        )
        res_p = _maxabs_lane([reqv, rineqv, rineqfv], bt) / scalep_ref[...]
        res_d = _maxabs_lane([rxv, rxNv, ruv], bt) / scale_d
        return jnp.maximum(jnp.maximum(res_p, res_d), gap / scale_d)

    res_new = kkt(
        reqo_ref[...], rineqo_ref[...], rineqfo_ref[...],
        rxo_ref[...], rxNo_ref[...], ruo_ref[...],
        lam_n, lamf_n, s_n, sf_n,
    )
    bad = ~jnp.isfinite(res_new)         # (1, bt)

    def rev(new, old):
        return jnp.where(bad[None] if new.ndim == 3 else bad, old, new)

    Xo_ref[...] = rev(X_n, X_ref[...])
    Uo_ref[...] = rev(U_n, U_ref[...])
    so_ref[...] = rev(s_n, s)
    sfo_ref[...] = rev(sf_n, sf)
    lamo_ref[...] = rev(lam_n, lam)
    lamfo_ref[...] = rev(lamf_n, lamf)
    nuo_ref[...] = rev(nu_n, nu_ref[...])
    reqo_ref[...] = rev(reqo_ref[...], req_ref[...])
    rineqo_ref[...] = rev(rineqo_ref[...], rineq)
    rineqfo_ref[...] = rev(rineqfo_ref[...], rineqf)
    rxo_ref[...] = rev(rxo_ref[...], rx_ref[...])
    rxNo_ref[...] = rev(rxNo_ref[...], rxN_ref[...])
    ruo_ref[...] = rev(ruo_ref[...], ru_ref[...])
    res_old = kkt(
        req_ref[...], rineq, rineqf, rx_ref[...], rxN_ref[...], ru_ref[...],
        lam, lamf, s, sf,
    )
    res_ref[...] = jnp.where(bad, res_old, res_new)
    bad_ref[...] = bad.astype(dtype)


def _ipm_iter_batched(A, B, c, qx, qu, h, hf, Gx, Gu, Gf, Hx, Hu, HxN,
                      W, W_f, X, U, lam, s, lam_f, s_f, nu_dyn,
                      req, rineq, rineq_f, rx_pad, rxN, ru, scale_p, done,
                      *, tau, n_comp, b_tile=128, interpret=False):
    """One fused Mehrotra iteration for the whole batch. Batched args lead
    with the batch axis; Gx/Gu/Gf/Hx/Hu/HxN shared. Returns the updated
    state, residual tensors (rx padded to N rows, row 0 = 0), the per-lane
    relative KKT scalar and the non-finite-revert flag."""
    Bc, N, nx, _ = A.shape
    nu = B.shape[3]
    ni = Gx.shape[1]
    ni_f = Gf.shape[0]
    dtype = A.dtype
    nuu = nu * (nu + 1) // 2
    b_tile = _eff_tile(b_tile, Bc, N)
    pad = (-Bc) % b_tile
    Bp = Bc + pad
    _pad_b = _make_pad_b(pad)

    # curvature in XLA (shared-operand MXU GEMMs — measured faster than any
    # in-kernel assembly; see ROUND1.md), then lane layout
    hp = jax.lax.Precision.HIGHEST
    WGx = W[:, :, :, None] * Gx[None]
    WGu = W[:, :, :, None] * Gu[None]
    Cxx = Hx[None] + jnp.einsum("kri,bkrj->bkij", Gx, WGx, precision=hp)
    Cuu = Hu[None] + jnp.einsum("kru,bkrv->bkuv", Gu, WGu, precision=hp)
    CxuT = jnp.einsum("bkrv,kri->bkvi", WGu, Gx, precision=hp)
    PN = HxN[None] + jnp.einsum(
        "ri,brj->bij", Gf, W_f[:, :, None] * Gf[None], precision=hp
    )

    # padding lanes: keep cones strictly positive and dynamics benign
    ones_pad = lambda x: jnp.concatenate(
        [x, jnp.ones((pad,) + x.shape[1:], x.dtype)], axis=0
    ) if pad else x
    lam_p, s_p = ones_pad(lam), ones_pad(s)
    lamf_p, sf_p = ones_pad(lam_f), ones_pad(s_f)
    Cuu_p = Cuu if not pad else jnp.concatenate(
        [Cuu, jnp.broadcast_to(jnp.eye(nu, dtype=dtype),
                               (pad, N, nu, nu))], axis=0
    )
    done_p = jnp.concatenate(
        [done.astype(dtype), jnp.ones((pad,), dtype)], axis=0
    ) if pad else done.astype(dtype)
    scale_pp = ones_pad(scale_p.astype(dtype))

    L = _lanes
    args = [
        _pad_b(L(A)), _pad_b(L(jnp.swapaxes(A, 2, 3))),
        _pad_b(L(B)), _pad_b(L(jnp.swapaxes(B, 2, 3))),
        _pad_b(L(c)), _pad_b(L(qx)), _pad_b(L(qu)),
        _pad_b(L(h)), _pad_b(L(hf)),
        jnp.asarray(Gx, dtype), jnp.asarray(Gu, dtype), jnp.asarray(Gf, dtype),
        jnp.asarray(Hx, dtype), jnp.asarray(Hu, dtype), jnp.asarray(HxN, dtype),
        _pad_b(L(Cxx)), _pad_b(L(CxuT)), L(Cuu_p), _pad_b(L(PN)),
        _pad_b(L(X)), _pad_b(L(U)), L(lam_p), L(s_p), L(lamf_p), L(sf_p),
        _pad_b(L(nu_dyn)),
        _pad_b(L(req)), _pad_b(L(rineq)), _pad_b(L(rineq_f)),
        _pad_b(L(rx_pad)), _pad_b(L(rxN)), _pad_b(L(ru)),
        scale_pp[None, :], done_p[None, :],
    ]

    sp = _common_specs(N, nx, nu, b_tile)
    bmap2 = lambda bi: (0, bi)
    bmap3 = lambda bi: (0, 0, bi)
    shared = lambda shape: pl.BlockSpec(shape, lambda bi: (0,) * len(shape))
    vec_ni = pl.BlockSpec((N, ni, b_tile), bmap3)
    vec_nif = pl.BlockSpec((ni_f, b_tile), bmap2)
    one = pl.BlockSpec((1, b_tile), bmap2)
    in_specs = [
        sp["At"], sp["At"], sp["Bt"], sp["BtT"],
        sp["vecx"], sp["dX"], sp["vecu"],
        vec_ni, vec_nif,
        shared((N, ni, nx)), shared((N, ni, nu)), shared((ni_f, nx)),
        shared((N, nx, nx)), shared((N, nu, nu)), shared((nx, nx)),
        sp["At"], sp["BtT"],
        pl.BlockSpec((N, nu, nu, b_tile), lambda bi: (0, 0, 0, bi)),
        pl.BlockSpec((nx, nx, b_tile), bmap3),
        sp["dX"], sp["vecu"], vec_ni, vec_ni, vec_nif, vec_nif,
        sp["vecx"],
        sp["vecx"], vec_ni, vec_nif, sp["vecx"], sp["x1"], sp["vecu"],
        one, one,
    ]
    out_specs = [
        sp["dX"], sp["vecu"], vec_ni, vec_ni, vec_nif, vec_nif, sp["vecx"],
        sp["vecx"], vec_ni, vec_nif, sp["vecx"], sp["x1"], sp["vecu"],
        one, one,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N + 1, nx, Bp), dtype),
        jax.ShapeDtypeStruct((N, nu, Bp), dtype),
        jax.ShapeDtypeStruct((N, ni, Bp), dtype),
        jax.ShapeDtypeStruct((N, ni, Bp), dtype),
        jax.ShapeDtypeStruct((ni_f, Bp), dtype),
        jax.ShapeDtypeStruct((ni_f, Bp), dtype),
        jax.ShapeDtypeStruct((N, nx, Bp), dtype),
        jax.ShapeDtypeStruct((N, nx, Bp), dtype),
        jax.ShapeDtypeStruct((N, ni, Bp), dtype),
        jax.ShapeDtypeStruct((ni_f, Bp), dtype),
        jax.ShapeDtypeStruct((N, nx, Bp), dtype),
        jax.ShapeDtypeStruct((nx, Bp), dtype),
        jax.ShapeDtypeStruct((N, nu, Bp), dtype),
        jax.ShapeDtypeStruct((1, Bp), dtype),
        jax.ShapeDtypeStruct((1, Bp), dtype),
    ]
    kern = functools.partial(
        _ipm_iter_kernel, N=N, nx=nx, nu=nu, ni=ni, ni_f=ni_f, bt=b_tile,
        tau=tau, n_comp=n_comp,
    )
    out = pl.pallas_call(
        kern,
        grid=(Bp // b_tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nx, nx, b_tile), dtype),
            pltpu.VMEM((nx, nx, b_tile), dtype),
            pltpu.VMEM((nx, nu, b_tile), dtype),
            pltpu.VMEM((N, nu, nx, b_tile), dtype),
            pltpu.VMEM((N, nu, nx, b_tile), dtype),
            pltpu.VMEM((N, nuu, b_tile), dtype),
            pltpu.VMEM((N, nuu, b_tile), dtype),
            pltpu.VMEM((N, nx, nx, b_tile), dtype),
            pltpu.VMEM((N, nu, b_tile), dtype),
            pltpu.VMEM((N, nx, b_tile), dtype),
            pltpu.VMEM((N + 1, nx, b_tile), dtype),
            pltpu.VMEM((N, nu, b_tile), dtype),
            pltpu.VMEM((N, nx, b_tile), dtype),
            pltpu.VMEM((N, ni, b_tile), dtype),
            pltpu.VMEM((N, ni, b_tile), dtype),
            pltpu.VMEM((N, ni, b_tile), dtype),
            pltpu.VMEM((N, ni, b_tile), dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    unl = lambda x: jnp.moveaxis(x, -1, 0)[:Bc]
    (Xo, Uo, lamo, so, lamfo, sfo, nuo,
     reqo, rineqo, rineqfo, rxo, rxNo, ruo, res, bad) = out
    return (
        unl(Xo), unl(Uo), unl(lamo), unl(so), unl(lamfo), unl(sfo), unl(nuo),
        unl(reqo), unl(rineqo), unl(rineqfo), unl(rxo), unl(rxNo), unl(ruo),
        unl(res)[:, 0], unl(bad)[:, 0] > 0.5,
    )


def _fallback_ipm_iter(A, B, c, qx, qu, h, hf, Gx, Gu, Gf, Hx, Hu, HxN,
                       W, W_f, X, U, lam, s, lam_f, s_f, nu_dyn,
                       req, rineq, rineq_f, rx_pad, rxN, ru, scale_p, done,
                       *, tau, n_comp):
    """Unbatched XLA replica of one fused iteration, built from qp_ipm's
    scan pieces — defines the semantics the kernel must match."""
    from robust_nonlinear_mpc_tpu.ops import qp_ipm as qi

    N, nx = req.shape
    nu = B.shape[2]
    dtype = A.dtype
    stat = qi.QPStatics(Hx, Hu, HxN, Gx, Gu, Gf)
    data = qi.QPData(A, B, c, qx, qu, h, hf, jnp.zeros(nx, dtype))
    rx = rx_pad[1:]
    mu = (jnp.sum(lam * s) + jnp.sum(lam_f * s_f)) / n_comp

    def reduced_rhs(rcomp, rcomp_f):
        t = (lam * rineq - rcomp) / s
        t_f = (lam_f * rineq_f - rcomp_f) / s_f
        hp = jax.lax.Precision.HIGHEST
        rbx = rx + jnp.einsum("kri,kr->ki", Gx[1:N], t[1:N], precision=hp)
        rbx = jnp.concatenate([jnp.zeros((1, nx), dtype), rbx], axis=0)
        rbxN = rxN + Gf.T @ t_f
        rbu = ru + jnp.einsum("kru,kr->ku", Gu, t, precision=hp)
        return rbx, rbxN, rbu

    def recover(dX, dU, rcomp, rcomp_f):
        hp = jax.lax.Precision.HIGHEST
        dGz = jnp.einsum("kri,ki->kr", Gx, dX[:N], precision=hp) + jnp.einsum(
            "kru,ku->kr", Gu, dU, precision=hp
        )
        ds = -rineq - dGz
        dlam = -(rcomp + lam * ds) / s
        ds_f = -rineq_f - Gf @ dX[N]
        dlam_f = -(rcomp_f + lam_f * ds_f) / s_f
        return ds, dlam, ds_f, dlam_f

    rcomp_a = lam * s
    rcomp_af = lam_f * s_f
    rbx, rbxN, rbu = reduced_rhs(rcomp_a, rcomp_af)
    fact, (kff_a, pn_a) = qi._factorize_with_presolve(
        stat, data, W, W_f, rbx, rbxN, rbu, req
    )
    K_g, _, _, Pseq = fact
    dXa, dUa, _ = qi._forward_sweep(data, K_g, kff_a, req, Pseq, pn_a)
    dsa, dlama, dsfa, dlamfa = recover(dXa, dUa, rcomp_a, rcomp_af)
    ap_a = jnp.minimum(
        qi._step_to_boundary(s, dsa, 1.0), qi._step_to_boundary(s_f, dsfa, 1.0)
    )
    ad_a = jnp.minimum(
        qi._step_to_boundary(lam, dlama, 1.0),
        qi._step_to_boundary(lam_f, dlamfa, 1.0),
    )
    mu_aff = (
        jnp.sum((s + ap_a * dsa) * (lam + ad_a * dlama))
        + jnp.sum((s_f + ap_a * dsfa) * (lam_f + ad_a * dlamfa))
    ) / n_comp
    sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

    rcomp_c = lam * s + dsa * dlama - sigma * mu
    rcomp_cf = lam_f * s_f + dsfa * dlamfa - sigma * mu
    rbx, rbxN, rbu = reduced_rhs(rcomp_c, rcomp_cf)
    dX, dU, dnu = qi._solve_newton(stat, data, fact, rbx, rbxN, rbu, req)
    ds, dlam, ds_f, dlam_f = recover(dX, dU, rcomp_c, rcomp_cf)
    ap = jnp.minimum(
        qi._step_to_boundary(s, ds, tau), qi._step_to_boundary(s_f, ds_f, tau)
    )
    ad = jnp.minimum(
        qi._step_to_boundary(lam, dlam, tau),
        qi._step_to_boundary(lam_f, dlam_f, tau),
    )

    sel = lambda new, old: jnp.where(done, old, new)
    X_n = sel(X + ap * dX, X)
    U_n = sel(U + ap * dU, U)
    s_n = sel(s + ap * ds, s)
    sf_n = sel(s_f + ap * ds_f, s_f)
    lam_n = sel(lam + ad * dlam, lam)
    lamf_n = sel(lam_f + ad * dlam_f, lam_f)
    nu_n = sel(nu_dyn + ad * dnu, nu_dyn)

    R_n = qi._residuals(stat, data, X_n, U_n, lam_n, s_n, lamf_n, sf_n, nu_n)

    def kkt(R, lamv, lamfv, sv, sfv):
        reqv, rineqv, rineqfv, rxv, rxNv, ruv = R
        gap = (jnp.sum(lamv * sv) + jnp.sum(lamfv * sfv)) / n_comp
        scale_d = 1.0 + qi._max_abs(qx, qu, lamv, lamfv)
        res_p = qi._max_abs(reqv, rineqv, rineqfv) / scale_p
        res_d = qi._max_abs(rxv, rxNv, ruv) / scale_d
        return jnp.maximum(jnp.maximum(res_p, res_d), gap / scale_d)

    res_new = kkt(R_n, lam_n, lamf_n, s_n, sf_n)
    bad = ~jnp.isfinite(res_new)
    rev = lambda new, old: jnp.where(bad, old, new)
    R_old = (req, rineq, rineq_f, rx, rxN, ru)
    R_out = tuple(rev(rn, ro) for rn, ro in zip(R_n, R_old))
    res = jnp.where(bad, kkt(R_old, lam, lam_f, s, s_f), res_new)
    rx_out = jnp.concatenate([jnp.zeros((1, nx), dtype), R_out[3]], axis=0)
    return (
        rev(X_n, X), rev(U_n, U), rev(lam_n, lam), rev(s_n, s),
        rev(lamf_n, lam_f), rev(sf_n, s_f), rev(nu_n, nu_dyn),
        R_out[0], R_out[1], R_out[2], rx_out, R_out[4], R_out[5],
        res, bad,
    )


_ITER_CACHE = {}


def default_ipm_iteration(tau, n_comp):
    """custom_vmap for one fused IPM iteration (cached per (tau, n_comp)).
    Unbatched -> XLA scan replica; vmapped -> the fused Pallas kernel
    (interpret mode on the CPU backend)."""
    interpret = jax.default_backend() == "cpu"
    key = (float(tau), int(n_comp), interpret)
    if key in _ITER_CACHE:
        return _ITER_CACHE[key]

    @jax.custom_batching.custom_vmap
    def ipm_iteration(*args):
        return _fallback_ipm_iter(*args, tau=tau, n_comp=n_comp)

    @ipm_iteration.def_vmap
    def _rule(axis_size, in_batched, *args):
        b = list(in_batched)
        # statics (indices 7..12: Gx, Gu, Gf, Hx, Hu, HxN) must be shared;
        # everything else batched — otherwise broadcast and run the XLA
        # replica vmapped
        expected = all(b[:7]) and not any(b[7:13]) and all(b[13:])
        if not expected:
            bc = lambda a, isb: a if isb else jax.lax.broadcast(a, (axis_size,))
            out = jax.vmap(
                functools.partial(_fallback_ipm_iter, tau=tau, n_comp=n_comp)
            )(*[bc(a, isb) for a, isb in zip(args, in_batched)])
            return out, jax.tree_util.tree_map(lambda _: True, out)
        out = _ipm_iter_batched(
            *args, tau=tau, n_comp=n_comp, interpret=interpret
        )
        return out, jax.tree_util.tree_map(lambda _: True, out)

    _ITER_CACHE[key] = ipm_iteration
    return ipm_iteration
