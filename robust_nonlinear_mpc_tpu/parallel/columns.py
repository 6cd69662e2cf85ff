"""Column-axis sharding of the fast-SLS kernels over a device mesh.

The SLS column dimension (N+1 independent disturbance-injection columns) is
the reference's parallel axis — its Numba kernels `prange` over columns
(reference solver/fast_SLS_jit.py:66,113). On one chip the column axis is a
`vmap` axis (ops/sls_kernels.py); this module shards it over a
`jax.sharding.Mesh` with `shard_map` for LARGE horizons, where the O(N^2)
response work stops fitting one chip's HBM or its latency budget.

Communication is minimal by construction: the backward Riccati and the
response propagation are fully column-local; the only cross-column
reductions in the whole fast-SLS iteration are
    backoff[k]  = sum_j sqrt(beta[k, j])        -> psum over the column axis
    backoff_f   = sum_j sqrt(beta_f[j])         -> psum
    tube cost   = sqrt(sum_j cost_sq_j)         -> psum
i.e. one (N, ni) + (ni_f,) + scalar psum per iteration rides ICI; the
O(N^2 nx nw) Phi work never moves. eta for the next iteration
(eta[k, j] = mu[k] / (2 sqrt(beta[k, j]))) needs only the device's OWN beta
columns plus the replicated QP duals mu, so the iteration loop stays
column-local too (`sharded_tube_iteration`).

The column count N+1 is padded to a multiple of the mesh size; padded
columns are encoded as j = N+1 and contribute exactly zero (see
ops/sls_kernels.response_column).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
    SLSRegs,
    eta_columns,
    response_column,
    riccati_column,
)

COLUMN_AXIS = "columns"


def column_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the SLS column axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (COLUMN_AXIS,))


def _pad_cols(n_cols: int, n_shards: int) -> int:
    return (-n_cols) % n_shards


def _padded_columns(N: int, eta, eta_f, n_shards: int):
    """Column-major eta/eta_f/js padded to a multiple of the shard count.

    Padded columns get j = N + 1 (the response kernel's inactive sentinel)
    and zero eta so the Riccati kernel produces pure-regularizer columns that
    are discarded on unpad.
    """
    pad = _pad_cols(N + 1, n_shards)
    js = jnp.concatenate([jnp.arange(N + 1), jnp.full((pad,), N + 1)])
    eta_cols = eta_columns(eta)                      # (N+1, N, ni)
    eta_cols = jnp.concatenate(
        [eta_cols, jnp.zeros((pad,) + eta_cols.shape[1:], eta_cols.dtype)]
    )
    eta_f_p = jnp.concatenate(
        [eta_f, jnp.zeros((pad,) + eta_f.shape[1:], eta_f.dtype)]
    )
    return js, eta_cols, eta_f_p


def column_sharded_backward_solve(mesh, A, B, Gmat, Gf, eta, eta_f, regs: SLSRegs):
    """`ops.sls_kernels.backward_solve` with the column axis sharded.

    Returns S (N+1, N+1, nx, nx), K (N, N+1, nu, nx) in the dense kernel's
    (stage, column) layout; the outputs stay column-sharded on device until
    the caller gathers them.
    """
    N = A.shape[0]
    js, eta_cols, eta_f_p = _padded_columns(N, eta, eta_f, mesh.size)
    col = P(COLUMN_AXIS)
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(col, col, col, rep, rep, rep, rep),
        out_specs=(col, col),
    )
    def run(js_l, eta_l, eta_f_l, A_, B_, Gmat_, Gf_):
        return jax.vmap(
            lambda j, ec, ef: riccati_column(j, ec, ef, A_, B_, Gmat_, Gf_, regs)
        )(js_l, eta_l, eta_f_l)

    S_all, K_all = run(js, eta_cols, eta_f_p, A, B, Gmat, Gf)
    S = jnp.swapaxes(S_all[: N + 1], 0, 1)
    K = jnp.swapaxes(K_all[: N + 1], 0, 1)
    return S, K


def column_sharded_response(mesh, A, B, E, K, Gx, Gu, Gf, regs: SLSRegs, epsilon):
    """`ops.sls_kernels.response_streaming` with the column axis sharded.

    K (N, N+1, nu, nx) in the dense (stage, column) layout. Returns
    (beta, beta_f, backoff, backoff_f, cost_tube) matching the dense kernel;
    backoff/backoff_f/cost reduce with one psum over the column axis.
    """
    N = A.shape[0]
    pad = _pad_cols(N + 1, mesh.size)
    js = jnp.concatenate([jnp.arange(N + 1), jnp.full((pad,), N + 1)])
    K_cols = jnp.swapaxes(K, 0, 1)                   # (N+1, N, nu, nx)
    K_cols = jnp.concatenate(
        [K_cols, jnp.zeros((pad,) + K_cols.shape[1:], K_cols.dtype)]
    )
    col = P(COLUMN_AXIS)
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(col, col, rep, rep, rep, rep, rep, rep),
        out_specs=(col, col, rep, rep, rep),
    )
    def run(js_l, K_l, A_, B_, E_, Gx_, Gu_, Gf_):
        # the scan carry inside response_column must be device-varying
        phi0 = jax.lax.pcast(
            jnp.zeros((A_.shape[1], E_.shape[2]), A_.dtype),
            (COLUMN_AXIS,), to="varying",
        )
        beta_cols, beta_f_l, cost_sq = jax.vmap(
            lambda j, Kc: response_column(
                j, Kc, A_, B_, E_, Gx_, Gu_, Gf_, regs, epsilon, phi0=phi0
            ), in_axes=(0, 0),
        )(js_l, K_l)
        backoff = jax.lax.psum(
            jnp.sum(jnp.sqrt(beta_cols), axis=0), COLUMN_AXIS
        )                                            # (N, ni)
        backoff_f = jax.lax.psum(
            jnp.sum(jnp.sqrt(beta_f_l), axis=0), COLUMN_AXIS
        )                                            # (ni_f,)
        cost_tube = jnp.sqrt(jax.lax.psum(jnp.sum(cost_sq), COLUMN_AXIS))
        return beta_cols, beta_f_l, backoff, backoff_f, cost_tube

    beta_cols, beta_f, backoff, backoff_f, cost_tube = run(
        js, K_cols, A, B, E, Gx, Gu, Gf
    )
    # (cols, stages, ni) -> dense layout beta (N, N, ni): stage-major, trim
    # the terminal + padded columns (all-zero by construction)
    beta = jnp.swapaxes(beta_cols[:N], 0, 1)
    return beta, beta_f[: N + 1], backoff, backoff_f, cost_tube


def sharded_tube_iteration(mesh, A, B, E, Gmat, Gf, mu, mu_f, beta_prev,
                           beta_f_prev, regs: SLSRegs, epsilon):
    """One fully column-local fast-SLS tube iteration on the mesh:
    eta from (replicated mu, LOCAL beta columns) -> backward Riccati ->
    streaming response, with only the backoff/cost psums crossing devices.

    beta_prev (N, N, ni) / beta_f_prev (N+1, ni_f) are the previous
    iteration's backoffs in the dense layout (use `epsilon`-floored ones or
    the kernel's output; first iteration passes zeros -> eta hits the
    epsilon floor exactly as the dense path does).

    Returns (K, beta, beta_f, backoff, backoff_f, cost_tube) in dense
    layouts. This is the building block for running the WHOLE inner loop
    without ever materializing a cross-device eta or Phi.
    """
    N, nx = A.shape[0], A.shape[1]
    pad = _pad_cols(N + 1, mesh.size)
    js = jnp.concatenate([jnp.arange(N + 1), jnp.full((pad,), N + 1)])
    beta_cols = jnp.swapaxes(beta_prev, 0, 1)        # (N, stages N, ni)
    beta_cols = jnp.concatenate(
        [beta_cols, jnp.zeros((1 + pad,) + beta_cols.shape[1:], beta_cols.dtype)]
    )                                                # (N+1+pad, N, ni)
    beta_f_p = jnp.concatenate(
        [beta_f_prev, jnp.zeros((pad,) + beta_f_prev.shape[1:], beta_f_prev.dtype)]
    )
    col = P(COLUMN_AXIS)
    rep = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(col, col, col, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(col, col, col, rep, rep, rep),
    )
    def run(js_l, beta_l, beta_f_l, mu_, mu_f_, A_, B_, E_, Gmat_, Gf_):
        Gx_ = Gmat_[:, :nx]
        Gu_ = Gmat_[:, nx:]
        phi0 = jax.lax.pcast(
            jnp.zeros((nx, E_.shape[2]), A_.dtype), (COLUMN_AXIS,), to="varying"
        )

        def one(j, beta_c, beta_f_j):
            # eta[k, j] = mu[k] / (2 sqrt(max(beta[k, j], eps))) for k >= j
            b = jnp.maximum(beta_c, epsilon)
            eta_c = mu_ / (2.0 * jnp.sqrt(b))
            eta_c = jnp.where((jnp.arange(mu_.shape[0]) >= j)[:, None], eta_c, 0.0)
            eta_f_j = mu_f_ / (2.0 * jnp.sqrt(jnp.maximum(beta_f_j, epsilon)))
            _, K_col = riccati_column(j, eta_c, eta_f_j, A_, B_, Gmat_, Gf_, regs)
            return response_column(
                j, K_col, A_, B_, E_, Gx_, Gu_, Gf_, regs, epsilon, phi0=phi0
            ) + (K_col,)

        beta_c, beta_f_c, cost_sq, K_cols = jax.vmap(one)(js_l, beta_l, beta_f_l)
        backoff = jax.lax.psum(jnp.sum(jnp.sqrt(beta_c), axis=0), COLUMN_AXIS)
        backoff_f = jax.lax.psum(jnp.sum(jnp.sqrt(beta_f_c), axis=0), COLUMN_AXIS)
        cost_tube = jnp.sqrt(jax.lax.psum(jnp.sum(cost_sq), COLUMN_AXIS))
        return K_cols, beta_c, beta_f_c, backoff, backoff_f, cost_tube

    K_cols, beta_cols_o, beta_f_o, backoff, backoff_f, cost_tube = run(
        js, beta_cols, beta_f_p, mu, mu_f, A, B, E, Gmat, Gf
    )
    K = jnp.swapaxes(K_cols[: N + 1], 0, 1)
    beta = jnp.swapaxes(beta_cols_o[:N], 0, 1)
    return K, beta, beta_f_o[: N + 1], backoff, backoff_f, cost_tube
