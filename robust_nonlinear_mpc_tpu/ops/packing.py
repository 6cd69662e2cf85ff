"""Stage-wise packing helpers: (X, U) <-> y = [x0; u0; ...; x_{N-1}; u_{N-1}; xN].

Parity with the reference `solver/ocp.py:43-74` (pack/unpack_primal_nominal),
vectorized for JAX. Note our trajectory layout is horizon-major: X (N+1, nx),
U (N, nu) (the reference stores (nx, N+1)); transposition happens at npz/API
boundaries only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_primal(X: jax.Array, U: jax.Array) -> jax.Array:
    """X (N+1, nx), U (N, nu) -> y ((nx+nu)N + nx,) in stage-wise order."""
    N = U.shape[0]
    stages = jnp.concatenate([X[:N], U], axis=1).reshape(-1)
    return jnp.concatenate([stages, X[N]])


def unpack_primal(y: jax.Array, N: int, nx: int, nu: int):
    """Inverse of `pack_primal`."""
    stages = y[: N * (nx + nu)].reshape(N, nx + nu)
    X = jnp.concatenate([stages[:, :nx], y[N * (nx + nu) :][None]], axis=0)
    U = stages[:, nx:]
    return X, U
