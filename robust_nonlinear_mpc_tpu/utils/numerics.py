"""Numerical helpers shared across the solver stack.

On TPU, float32 matmuls default to reduced (bfloat16-pass) MXU precision.
Every matmul on a solver-critical path goes through `mm`/`mv`, which pin
`precision=HIGHEST` so results are reproducible across CPU (f64 test mesh)
and TPU (f32 production path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST
_TUBE_PREC = jax.lax.Precision.HIGHEST


def set_tube_precision(mode: str) -> None:
    """Set the matmul precision of the SLS tube-synthesis path
    (backward Riccati / Phi propagation / backoffs / tube cost).

    "highest" (default): full f32 accuracy — required for the CPU/f64
    accuracy-matching path. "default": the TPU's fast reduced-precision MXU
    passes — backoffs are tightening *margins*, so ~1e-3 relative error there
    perturbs conservatism marginally without touching QP optimality; the
    throughput bench uses this. Takes effect at the next trace (re-jit).
    """
    global _TUBE_PREC
    _TUBE_PREC = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[mode]


def prec():
    """Precision for solver-critical (QP/KKT) matmuls."""
    return _PREC


_QP_DIR_PREC = jax.lax.Precision.HIGHEST


def set_qp_direction_precision(mode: str) -> None:
    """Set the matmul precision of the IPM *direction* computation (Riccati
    factorization + Newton back/forward sweeps + rhs assembly).

    The IPM's convergence test and residuals always run at HIGHEST, so an
    inexact Newton direction can only cost iterations, never correctness —
    "default" trades MXU passes (bf16 single-pass vs 3-pass f32) against
    possible extra Mehrotra iterations. Takes effect at the next trace.
    """
    global _QP_DIR_PREC
    _QP_DIR_PREC = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[mode]


def qp_dir_prec():
    """Precision for the IPM Newton-direction matmuls (configurable)."""
    return _QP_DIR_PREC


def tube_prec():
    """Precision for the SLS tube-synthesis matmuls (configurable)."""
    return _TUBE_PREC


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matrix (or batched-matrix) product at full precision."""
    return jnp.matmul(a, b, precision=_PREC)


def mv(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matrix-vector product at full precision."""
    return jnp.matmul(a, b[..., None], precision=_PREC)[..., 0]


def sym(a: jax.Array) -> jax.Array:
    """Symmetrize to control numerical drift (reference: fast_SLS_jit.py:61)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def _inv2(M):
    """Batched closed-form 2x2 inverse."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) / det[..., None, None]


def spd_solve_small(H: jax.Array, F: jax.Array) -> jax.Array:
    """Solve H X = F for small well-conditioned SPD H (n <= 4) without
    cholesky/triangular solves.

    Batched tiny triangular solves lower poorly on TPU (loop-based); a
    closed-form blockwise-Schur inverse is ~3x faster in the SLS backward
    recursion and exact to roundoff for the tube path, where
    H = R_reg + ... with R_reg ~ 1e3-1e4 I keeps the conditioning tiny.
    Falls back to cholesky for n > 4.
    """
    n = H.shape[-1]
    if n == 1:
        return F / H[..., :1, :1]
    if n == 2:
        return jnp.matmul(_inv2(H), F, precision=tube_prec())
    if n <= 4:
        if n == 3:  # pad to 4x4 with an identity corner
            pad_H = jnp.zeros(H.shape[:-2] + (4, 4), H.dtype)
            pad_H = pad_H.at[..., :3, :3].set(H).at[..., 3, 3].set(1.0)
            pad_F = jnp.zeros(F.shape[:-2] + (4,) + F.shape[-1:], F.dtype)
            pad_F = pad_F.at[..., :3, :].set(F)
            return spd_solve_small(pad_H, pad_F)[..., :3, :]
        tp = tube_prec()
        mmt = lambda a, b: jnp.matmul(a, b, precision=tp)
        H11, H12 = H[..., :2, :2], H[..., :2, 2:]
        H21, H22 = H[..., 2:, :2], H[..., 2:, 2:]
        iH11 = _inv2(H11)
        Sc = H22 - mmt(H21, mmt(iH11, H12))
        iSc = _inv2(Sc)
        iH11_H12 = mmt(iH11, H12)
        H21_iH11 = mmt(H21, iH11)
        TL = iH11 + mmt(iH11_H12, mmt(iSc, H21_iH11))
        TR = -mmt(iH11_H12, iSc)
        BL = -mmt(iSc, H21_iH11)
        Hi = jnp.concatenate(
            [jnp.concatenate([TL, TR], axis=-1), jnp.concatenate([BL, iSc], axis=-1)],
            axis=-2,
        )
        return mmt(Hi, F)
    import jax.scipy.linalg as jsl

    L = jnp.linalg.cholesky(H)
    return jsl.cho_solve((L, True), F)


def spd_inverse(H: jax.Array) -> jax.Array:
    """Explicit inverse of a symmetric positive-definite matrix by recursive
    2x2 block Schur complementation (full matmul precision).

    TPU-motivated: cholesky/LU/triangular-solve lower to sequential
    column loops on TPU (n sequential steps of tiny work), while this
    recursion is O(log n) levels of batched matmuls that ride the MXU.
    Intended for the condensed-KKT interior point where H = Hq + M' W M is
    re-inverted every iteration; callers should pair each application with
    one iterative-refinement step using an exact residual matvec (the IPM
    terminates on TRUE residuals, so an inexact Newton step costs
    iterations, never correctness).
    """
    n = H.shape[-1]
    if n == 1:
        return 1.0 / H
    if n == 2:
        return _inv2(H)
    n1 = n // 2
    H11 = H[..., :n1, :n1]
    H12 = H[..., :n1, n1:]
    H21 = H[..., n1:, :n1]
    H22 = H[..., n1:, n1:]
    i11 = spd_inverse(H11)
    i11_H12 = jnp.matmul(i11, H12, precision=_PREC)
    S = H22 - jnp.matmul(H21, i11_H12, precision=_PREC)
    iS = spd_inverse(0.5 * (S + jnp.swapaxes(S, -1, -2)))
    BL = -jnp.matmul(iS, jnp.matmul(H21, i11, precision=_PREC), precision=_PREC)
    TL = i11 - jnp.matmul(i11_H12, BL, precision=_PREC)
    TR = jnp.swapaxes(BL, -1, -2)
    return jnp.concatenate(
        [
            jnp.concatenate([TL, TR], axis=-1),
            jnp.concatenate([BL, iS], axis=-1),
        ],
        axis=-2,
    )


def spd_solve_refined(H: jax.Array, F: jax.Array) -> jax.Array:
    """spd_solve_small + one iterative-refinement step.

    Error ~ (kappa * eps)^2 instead of kappa * eps — matches or beats a
    cholesky solve for the moderately-conditioned KKT blocks while avoiding
    TPU-slow batched triangular solves. Used by the IPM Riccati
    factorization; the IPM's convergence test evaluates TRUE residuals, so
    an inexact Newton step can only cost iterations, never correctness.
    """
    x0 = spd_solve_small(H, F)
    r = F - jnp.matmul(H, x0, precision=_PREC)
    return x0 + spd_solve_small(H, r)
