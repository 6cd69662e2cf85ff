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


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matrix (or batched-matrix) product at full precision."""
    return jnp.matmul(a, b, precision=_PREC)


def mv(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matrix-vector product at full precision."""
    return jnp.matmul(a, b[..., None], precision=_PREC)[..., 0]


def sym(a: jax.Array) -> jax.Array:
    """Symmetrize to control numerical drift (reference: fast_SLS_jit.py:61)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))
