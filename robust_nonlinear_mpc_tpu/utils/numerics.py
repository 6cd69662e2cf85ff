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
