"""Batch-on-lanes Pallas backward kernel vs the folded XLA oracle.

Runs in Pallas interpret mode on CPU (exact math, no TPU needed). The
kernel itself is an experimental research option — measured on v5e at
rocket shapes (B=512): 8.3 ms total (2.3 ms curvature prologue + ~6 ms
kernel) vs 12.9 ms for the f32 blocked XLA kernel but ~6.6 ms for the
production bf16 tube-precision path, i.e. at the VPU f32 roofline
(~6.6 GFMA / ~1 TFLOP/s) and NOT an end-to-end win — see the module
docstring of ops/pallas_sls.py. The slab utilities (_spd_inv_slabs) are
shared groundwork for the QP Newton-solve kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robust_nonlinear_mpc_tpu.ops.sls_kernels import SLSRegs, backward_solve_folded
from robust_nonlinear_mpc_tpu.ops.pallas_sls import (
    _backward_K_batched,
    make_backward_K,
)


def _problem(Bc, N, nx, nu, ni, ni_f, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(0.9 * np.eye(nx) + 0.05 * rng.standard_normal((Bc, N, nx, nx)))
    B = jnp.asarray(0.2 * rng.standard_normal((Bc, N, nx, nu)))
    G = jnp.asarray(rng.standard_normal((ni, nx + nu)))
    Gf = jnp.asarray(rng.standard_normal((ni_f, nx)))
    eta = np.abs(rng.standard_normal((Bc, N, N, ni)))
    for k in range(N):
        eta[:, k, k + 1:] = 0.0
    eta = jnp.asarray(eta)
    eta_f = jnp.asarray(np.abs(rng.standard_normal((Bc, N + 1, ni_f))))
    regs = SLSRegs(jnp.eye(nx) * 2.0, jnp.eye(nu) * 1.5, jnp.eye(nx) * 3.0)
    return A, B, G, Gf, eta, eta_f, regs


@pytest.mark.parametrize(
    "Bc,N,nx,nu,ni,ni_f",
    [(3, 5, 4, 2, 6, 4),   # even nu: 2x2 Schur split
     (2, 4, 5, 1, 7, 5),   # nu=1: scalar base case
     (5, 7, 6, 4, 9, 6)],  # nu=4, J=8: two recursion levels
)
def test_pallas_backward_matches_folded(Bc, N, nx, nu, ni, ni_f):
    A, B, G, Gf, eta, eta_f, regs = _problem(Bc, N, nx, nu, ni, ni_f)
    K_ref = jax.vmap(
        lambda a, b, e, ef: backward_solve_folded(a, b, G, Gf, e, ef, regs)[1]
    )(A, B, eta, eta_f)
    # b_tile smaller than Bc exercises batch padding + multi-tile grid
    K_p = _backward_K_batched(
        A, B, G, Gf, eta, eta_f, regs, b_tile=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_ref), atol=1e-10)


def test_pallas_backward_custom_vmap():
    """The custom_vmap wrapper: unbatched call = folded kernel; vmapped
    call routes into the batched Pallas kernel."""
    A, B, G, Gf, eta, eta_f, regs = _problem(3, 5, 4, 2, 6, 4)
    bk = make_backward_K(b_tile=4, interpret=True)
    K_v = jax.vmap(
        lambda a, b, e, ef: bk(a, b, G, Gf, e, ef, *regs)
    )(A, B, eta, eta_f)
    K_1 = bk(A[0], B[0], G, Gf, eta[0], eta_f[0], *regs)
    K_ref = jax.vmap(
        lambda a, b, e, ef: backward_solve_folded(a, b, G, Gf, e, ef, regs)[1]
    )(A, B, eta, eta_f)
    np.testing.assert_allclose(np.asarray(K_v), np.asarray(K_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(K_1), np.asarray(K_ref[0]), atol=1e-10)
