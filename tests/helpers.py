"""Shared test fixtures: random structured QP instances."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from robust_nonlinear_mpc_tpu.ops.qp_ipm import QPData, QPStatics


def random_qp(seed=0, N=6, nx=3, nu=2, ni=4, ni_f=3, feasible_margin=2.0):
    """A random stable LTV QP with interior-feasible inequalities."""
    rng = np.random.default_rng(seed)
    Q = np.eye(nx) + 0.5 * _rand_psd(rng, nx)
    R = np.eye(nu) + 0.5 * _rand_psd(rng, nu)
    Qf = 3 * np.eye(nx) + _rand_psd(rng, nx)

    A = 0.8 * rng.standard_normal((N, nx, nx)) / np.sqrt(nx)
    B = rng.standard_normal((N, nx, nu)) / np.sqrt(nu)
    c = 0.1 * rng.standard_normal((N, nx))
    qx = 0.5 * rng.standard_normal((N + 1, nx))
    qu = 0.5 * rng.standard_normal((N, nu))
    Gx = rng.standard_normal((ni, nx))
    Gu = rng.standard_normal((ni, nu))
    Gf = rng.standard_normal((ni_f, nx))
    xinit = 0.3 * rng.standard_normal(nx)

    # make inequalities loosely feasible around the unconstrained trajectory
    h = feasible_margin + rng.uniform(0.5, 1.5, (N, ni))
    hf = feasible_margin + rng.uniform(0.5, 1.5, ni_f)

    stat = QPStatics(
        Hx=jnp.asarray(2 * Q), Hu=jnp.asarray(2 * R), HxN=jnp.asarray(2 * Qf),
        Gx=jnp.asarray(Gx), Gu=jnp.asarray(Gu), Gf=jnp.asarray(Gf),
    )
    data = QPData(
        A=jnp.asarray(A), B=jnp.asarray(B), c=jnp.asarray(c),
        qx=jnp.asarray(qx), qu=jnp.asarray(qu),
        h=jnp.asarray(h), hf=jnp.asarray(hf), xinit=jnp.asarray(xinit),
    )
    return stat, data


def _rand_psd(rng, n):
    M = rng.standard_normal((n, n))
    return M @ M.T / n
