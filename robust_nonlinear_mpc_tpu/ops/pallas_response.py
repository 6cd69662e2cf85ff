"""Pallas TPU kernel: fused system-response synthesis.

Fuses the three tube-synthesis stages that XLA keeps as separate passes over
the Phi tensors — propagation (`_propagate`, reference fast_SLS_jit.py:87),
backoff row-norms (`_backoff_from_phi`, :120) and the tube cost
(util/SLS.py:38) — into ONE kernel that keeps the running response row
Phi_x[k, :] resident in VMEM and accumulates the row-norm reductions on the
fly. The full Phi tensors are written to HBM once (they are part of the
solution contract) instead of being re-read by two further kernels: for the
rocket at batch B the saved HBM traffic is ~2x B x (N+1)^2 x nx x nw floats.

Grid: one program per batch instance; the horizon loop is unrolled inside
the kernel (N is small and static). All arrays are padded to TPU tiles by
Mosaic automatically; shapes here are tiny (<= 64) so everything fits VMEM.

Falls back transparently to the pure-XLA implementations on CPU (interpret
mode in tests).

Status: numerically validated against the naive-math oracles in interpret
mode (tests/test_pallas_response.py) and compiled/benchmarked on v5e:
standalone it is 1.75x the XLA path (7.7 ms vs 13.5 ms at batch 256, rocket
shapes). Embedded in the full fused MPC-iteration program it currently
REGRESSES end-to-end throughput (XLA schedules around the custom call less
effectively than its own fusions), so `FastSLSOptions.use_pallas_response`
defaults to off; it remains the right building block for batch scales where
the Phi tensors stop fitting comfortably in HBM (B >= ~10k), which is the
SURVEY.md §7 "fuse propagate and backoff" scenario.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _response_kernel(
    A_ref, B_ref, E_ref, K_ref, Gx_ref, Gu_ref, Gf_ref, Qr_ref, Rr_ref, Qrf_ref,
    phi_x_ref, phi_u_ref, beta_ref, beta_f_ref, backoff_ref, backoff_f_ref,
    tube_ref, row_ref,
    *, N, nx, nu, nw, ni, ni_f, eps,
):
    f32 = jnp.float32

    Gx = Gx_ref[...]
    Gu = Gu_ref[...]
    Gf = Gf_ref[...]
    Qr = Qr_ref[...]
    Rr = Rr_ref[...]

    row_ref[...] = jnp.zeros((N + 1, nx, nw), f32)
    tube_acc = jnp.zeros((), f32)
    beta_rows = []
    backoff_rows = []

    for k in range(N):
        # inject diagonal Phi_x[k, k] = E[k]
        row_ref[k, :, :] = E_ref[k, :, :]
        row = row_ref[...]                       # (N+1, nx, nw)
        K_k = K_ref[k, :, :, :]                  # (N+1, nu, nx)
        A_k = A_ref[k, :, :]
        B_k = B_ref[k, :, :]

        phi_u = jax.lax.dot_general(
            K_k, row, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )                                        # (N+1, nu, nw)

        # beta[k, j] = rowwise ||Gx Phi_x[k,j] + Gu Phi_u[k,j]||^2
        Zx = jax.lax.dot_general(
            jnp.broadcast_to(Gx[None], (N + 1, ni, nx)), row,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        )
        Zu = jax.lax.dot_general(
            jnp.broadcast_to(Gu[None], (N + 1, ni, nu)), phi_u,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        )
        Z = Zx + Zu                              # (N+1, ni, nw)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (N + 1, ni), 0)
        active2 = cols2 <= k
        b_k = jnp.sum(Z * Z, axis=2)                      # (N+1, ni)
        b_k = jnp.where(active2, jnp.maximum(b_k, eps), 0.0)
        beta_rows.append(b_k[:N])
        # sum over the column axis via a ones-contraction (keeps the store
        # 2-D and avoids a cross-sublane reduce->1-D-store relayout)
        ones_row = jnp.ones((1, N + 1), f32)
        backoff_rows.append(
            jax.lax.dot_general(
                ones_row, jnp.sqrt(b_k), (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        )

        # tube cost accumulation: ||Qr Phi_x[k, :]||_F^2 + ||Rr Phi_u[k, :]||_F^2
        qphi = jax.lax.dot_general(
            jnp.broadcast_to(Qr[None], (N + 1, nx, nx)), row,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        )
        rphi = jax.lax.dot_general(
            jnp.broadcast_to(Rr[None], (N + 1, nu, nu)), phi_u,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        )
        tube_acc = tube_acc + jnp.sum(qphi * qphi) + jnp.sum(rphi * rphi)

        phi_x_ref[k, :, :, :] = row
        phi_u_ref[k, :, :, :] = phi_u

        # advance: Phi_x[k+1, j] = (A_k + B_k K[k, j]) Phi_x[k, j]
        Acl = jnp.broadcast_to(A_k[None], (N + 1, nx, nx)) + jax.lax.dot_general(
            jnp.broadcast_to(B_k[None], (N + 1, nx, nu)), K_k,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        )
        nxt = jax.lax.dot_general(
            Acl, row, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
        )
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (N + 1, 1, 1), 0)
        row_ref[...] = jnp.where(cols3 <= k, nxt, 0.0)

    beta_ref[...] = jnp.stack(beta_rows)                  # (N, N, ni)
    backoff_ref[...] = jnp.concatenate(backoff_rows, axis=0)  # (N, ni)

    # terminal row: diagonal E[N], then terminal backoffs + tube terms
    row_ref[N, :, :] = E_ref[N, :, :]
    last = row_ref[...]
    phi_x_ref[N, :, :, :] = last

    Zf = jax.lax.dot_general(
        jnp.broadcast_to(Gf[None], (N + 1, ni_f, nx)), last,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    )
    bf = jnp.maximum(jnp.sum(Zf * Zf, axis=2), eps)       # (N+1, ni_f)
    beta_f_ref[...] = bf
    ones_row_f = jnp.ones((1, N + 1), f32)
    backoff_f_ref[...] = jax.lax.dot_general(
        ones_row_f, jnp.sqrt(bf), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    Qrf = Qrf_ref[...]
    qfphi = jax.lax.dot_general(
        jnp.broadcast_to(Qrf[None], (N + 1, nx, nx)), last,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32,
    )
    tube_ref[...] = jnp.sqrt(tube_acc + jnp.sum(qfphi * qfphi)).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def fused_response(A, B, E, K, Gx, Gu, Gf, Q_reg, R_reg, Q_reg_f,
                   eps=1e-10, interpret=False):
    """Single-instance fused response synthesis (vmap for batches).

    A (N, nx, nx), B (N, nx, nu), E (N+1, nx, nw), K (N, N+1, nu, nx).
    Returns (Phi_x, Phi_u, beta, beta_f, backoff, backoff_f, tube_cost).
    """
    N, nx = A.shape[0], A.shape[1]
    nu = B.shape[2]
    nw = E.shape[2]
    ni = Gx.shape[0]
    ni_f = Gf.shape[0]
    f32 = jnp.float32

    kern = functools.partial(
        _response_kernel, N=N, nx=nx, nu=nu, nw=nw, ni=ni, ni_f=ni_f, eps=eps,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((N + 1, N + 1, nx, nw), f32),  # Phi_x
        jax.ShapeDtypeStruct((N, N + 1, nu, nw), f32),      # Phi_u
        jax.ShapeDtypeStruct((N, N, ni), f32),              # beta
        jax.ShapeDtypeStruct((N + 1, ni_f), f32),           # beta_f
        jax.ShapeDtypeStruct((N, ni), f32),                 # backoff
        jax.ShapeDtypeStruct((1, ni_f), f32),               # backoff_f
        jax.ShapeDtypeStruct((1, 1), f32),                  # tube cost
    )
    args = [jnp.asarray(a, f32) for a in (A, B, E, K, Gx, Gu, Gf, Q_reg, R_reg, Q_reg_f)]
    outs = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM)] * 10,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 7),
        scratch_shapes=[pltpu.VMEM((N + 1, nx, nw), f32)],
        interpret=interpret,
    )(*args)
    Phi_x, Phi_u, beta, beta_f, backoff, backoff_f, tube = outs
    return Phi_x, Phi_u, beta, beta_f, backoff, backoff_f[0], tube[0, 0]
