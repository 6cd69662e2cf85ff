"""SLS kernels vs naive loop oracles (direct transcriptions of the math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
    SLSRegs,
    backoff_from_phi,
    backward_solve,
    evaluate_dual_eta,
    propagate,
    tensor_to_matrix,
    matrix_to_tensor,
    tube_cost,
)

from tests import oracles


def _setup(seed=0, N=6, nx=4, nu=2, ni=5, ni_f=4, nw=3):
    rng = np.random.default_rng(seed)
    A = 0.7 * rng.standard_normal((N, nx, nx)) / np.sqrt(nx)
    B = rng.standard_normal((N, nx, nu))
    E = 0.2 * rng.standard_normal((N + 1, nx, nw))
    G = rng.standard_normal((ni, nx + nu))
    Gf = rng.standard_normal((ni_f, nx))
    mu = np.abs(rng.standard_normal((N, ni)))
    mu_f = np.abs(rng.standard_normal(ni_f))
    beta = np.abs(rng.standard_normal((N, N, ni)))
    beta_f = np.abs(rng.standard_normal((N + 1, ni_f)))
    Qr = np.eye(nx) * 2.0
    Rr = np.eye(nu) * 3.0
    Qrf = np.eye(nx) * 5.0
    return A, B, E, G, Gf, mu, mu_f, beta, beta_f, Qr, Rr, Qrf


@pytest.mark.parametrize("seed", [0, 1])
def test_eta(seed):
    A, B, E, G, Gf, mu, mu_f, beta, beta_f, *_ = _setup(seed)
    eps = 1e-10
    eta, eta_f = evaluate_dual_eta(
        jnp.asarray(mu), jnp.asarray(mu_f), jnp.asarray(beta), jnp.asarray(beta_f), eps
    )
    eta_ref, eta_f_ref = oracles.eta_np(mu, mu_f, beta, beta_f, eps)
    np.testing.assert_allclose(np.asarray(eta), eta_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(eta_f), eta_f_ref, atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1])
def test_backward_riccati_columns(seed):
    A, B, E, G, Gf, mu, mu_f, beta, beta_f, Qr, Rr, Qrf = _setup(seed)
    eps = 1e-10
    eta, eta_f = oracles.eta_np(mu, mu_f, beta, beta_f, eps)
    regs = SLSRegs(jnp.asarray(Qr), jnp.asarray(Rr), jnp.asarray(Qrf))
    S, K = jax.jit(backward_solve, static_argnums=())(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(G), jnp.asarray(Gf),
        jnp.asarray(eta), jnp.asarray(eta_f), regs,
    )
    S_ref, K_ref = oracles.backward_np(A, B, G, Gf, eta, eta_f, Qr, Rr, Qrf)
    np.testing.assert_allclose(np.asarray(K), K_ref, atol=1e-9)
    # S on the computed region k >= j (the kernel leaves k < j zero like K)
    N = A.shape[0]
    for j in range(N + 1):
        for k in range(j, N + 1):
            np.testing.assert_allclose(np.asarray(S[k, j]), S_ref[k, j], atol=1e-8)


@pytest.mark.parametrize("seed", [0, 2])
def test_propagate_and_backoff(seed):
    A, B, E, G, Gf, mu, mu_f, beta, beta_f, Qr, Rr, Qrf = _setup(seed)
    eps = 1e-10
    eta, eta_f = oracles.eta_np(mu, mu_f, beta, beta_f, eps)
    _, K_ref = oracles.backward_np(A, B, G, Gf, eta, eta_f, Qr, Rr, Qrf)

    Phi_x, Phi_u = jax.jit(propagate)(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(E), jnp.asarray(K_ref)
    )
    Phi_x_ref, Phi_u_ref = oracles.propagate_np(A, B, E, K_ref)
    np.testing.assert_allclose(np.asarray(Phi_x), Phi_x_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(Phi_u), Phi_u_ref, atol=1e-10)

    nx = A.shape[1]
    Gx, Gu = G[:, :nx], G[:, nx:]
    b, bf, bo, bof = backoff_from_phi(
        Phi_x, Phi_u, jnp.asarray(Gx), jnp.asarray(Gu), jnp.asarray(Gf), eps
    )
    b_ref, bf_ref, bo_ref, bof_ref = oracles.backoff_np(
        Phi_x_ref, Phi_u_ref, Gx, Gu, Gf, eps
    )
    np.testing.assert_allclose(np.asarray(b), b_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(bf), bf_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(bo), bo_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(bof), bof_ref, atol=1e-10)

    regs = SLSRegs(jnp.asarray(Qr), jnp.asarray(Rr), jnp.asarray(Qrf))
    ct = tube_cost(Phi_x, Phi_u, regs)
    ct_ref = oracles.tube_cost_np(Phi_x_ref, Phi_u_ref, Qr, Rr, Qrf)
    np.testing.assert_allclose(float(ct), ct_ref, rtol=1e-10)


def test_phi_closed_loop_identity():
    """Phi must satisfy the SLS identity: Phi_x[k+1,j] = A Phi_x[k,j] + B Phi_u[k,j]
    with Phi_x[j,j] = E[j] — i.e. the response maps solve the closed loop."""
    A, B, E, G, Gf, mu, mu_f, beta, beta_f, Qr, Rr, Qrf = _setup(3)
    eta, eta_f = oracles.eta_np(mu, mu_f, beta, beta_f, 1e-10)
    _, K = oracles.backward_np(A, B, G, Gf, eta, eta_f, Qr, Rr, Qrf)
    Phi_x, Phi_u = propagate(jnp.asarray(A), jnp.asarray(B), jnp.asarray(E), jnp.asarray(K))
    Phi_x, Phi_u = np.asarray(Phi_x), np.asarray(Phi_u)
    N = A.shape[0]
    for k in range(N):
        for j in range(k + 1):
            np.testing.assert_allclose(
                Phi_x[k + 1, j], A[k] @ Phi_x[k, j] + B[k] @ Phi_u[k, j], atol=1e-10
            )
    for j in range(N + 1):
        np.testing.assert_allclose(Phi_x[j, j], E[j], atol=0)


@pytest.mark.parametrize("seed", [0, 2])
def test_response_streaming_matches_materialized(seed):
    """The fused streaming response must equal propagate + backoff_from_phi +
    tube_cost without ever materializing Phi (ops/sls_kernels.response_streaming)."""
    from robust_nonlinear_mpc_tpu.ops.sls_kernels import response_streaming

    A, B, E, G, Gf, mu, mu_f, beta, beta_f, Qr, Rr, Qrf = _setup(seed)
    eps = 1e-10
    eta, eta_f = oracles.eta_np(mu, mu_f, beta, beta_f, eps)
    _, K = oracles.backward_np(A, B, G, Gf, eta, eta_f, Qr, Rr, Qrf)

    nx = A.shape[1]
    Gx, Gu = jnp.asarray(G[:, :nx]), jnp.asarray(G[:, nx:])
    regs = SLSRegs(jnp.asarray(Qr), jnp.asarray(Rr), jnp.asarray(Qrf))

    Phi_x, Phi_u = propagate(jnp.asarray(A), jnp.asarray(B), jnp.asarray(E), jnp.asarray(K))
    b_ref, bf_ref, bo_ref, bof_ref = backoff_from_phi(Phi_x, Phi_u, Gx, Gu, jnp.asarray(Gf), eps)
    ct_ref = tube_cost(Phi_x, Phi_u, regs)

    b, bf, bo, bof, ct = jax.jit(response_streaming)(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(E), jnp.asarray(K),
        Gx, Gu, jnp.asarray(Gf), regs, eps,
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bf), np.asarray(bf_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bo), np.asarray(bo_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bof), np.asarray(bof_ref), atol=1e-12)
    np.testing.assert_allclose(float(ct), float(ct_ref), rtol=1e-12)


def test_tensor_matrix_roundtrip():
    rng = np.random.default_rng(0)
    t = rng.standard_normal((4, 5, 3, 2))
    m = tensor_to_matrix(jnp.asarray(t))
    assert m.shape == (12, 10)
    t2 = matrix_to_tensor(m, 4, 5, 3, 2)
    np.testing.assert_allclose(np.asarray(t2), t)
    # block placement: block (i, j) of the matrix == t[i, j]
    np.testing.assert_allclose(np.asarray(m)[3:6, 2:4], t[1, 1])


@pytest.mark.parametrize("seed", [0, 1])
def test_folded_kernels_match_vmapped(seed):
    """The GEMM-folded kernels (column axis folded into the GEMM M/N dims,
    curvatures from Gram tensors, shared operands on the plain dot side) must
    reproduce the vmapped-column kernels to roundoff — they are pure
    reformulations, not approximations."""
    from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
        backward_solve_folded,
        response_streaming,
        response_streaming_folded,
    )

    A, B, E, G, Gf, mu, mu_f, beta, beta_f, Qr, Rr, Qrf = _setup(seed)
    eps = 1e-10
    eta, eta_f = evaluate_dual_eta(
        jnp.asarray(mu), jnp.asarray(mu_f), jnp.asarray(beta),
        jnp.asarray(beta_f), eps,
    )
    regs = SLSRegs(jnp.asarray(Qr), jnp.asarray(Rr), jnp.asarray(Qrf))
    args = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(G), jnp.asarray(Gf),
            eta, eta_f, regs)
    S1, K1 = jax.jit(backward_solve)(*args)
    S2, K2 = jax.jit(backward_solve_folded)(*args)
    np.testing.assert_allclose(np.asarray(S2), np.asarray(S1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K1), atol=1e-11)

    nx = A.shape[1]
    rargs = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(E), K1,
             jnp.asarray(G[:, :nx]), jnp.asarray(G[:, nx:]), jnp.asarray(Gf),
             regs, eps)
    r1 = jax.jit(response_streaming)(*rargs)
    r2 = jax.jit(response_streaming_folded)(*rargs)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-11)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("block", [2, 3, 4, 8, 32])
def test_blocked_kernels_match_folded(seed, block):
    """The triangular column-blocked kernels (segments of `block` stages,
    carrying only potentially-active column blocks) must reproduce the folded
    kernels to roundoff — they skip only exact-zero columns. Covers block
    sizes that divide N, don't divide N, and exceed N (degenerate single
    segment)."""
    from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
        backward_solve_blocked,
        backward_solve_folded,
        response_streaming_blocked,
        response_streaming_folded,
    )

    A, B, E, G, Gf, mu, mu_f, beta, beta_f, Qr, Rr, Qrf = _setup(seed)
    eps = 1e-10
    eta, eta_f = evaluate_dual_eta(
        jnp.asarray(mu), jnp.asarray(mu_f), jnp.asarray(beta),
        jnp.asarray(beta_f), eps,
    )
    regs = SLSRegs(jnp.asarray(Qr), jnp.asarray(Rr), jnp.asarray(Qrf))
    args = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(G), jnp.asarray(Gf),
            eta, eta_f, regs)
    S1, K1 = jax.jit(backward_solve_folded)(*args)
    S2, K2 = jax.jit(lambda *a: backward_solve_blocked(*a, block=block))(*args)
    np.testing.assert_allclose(np.asarray(S2), np.asarray(S1), atol=1e-11)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K1), atol=1e-11)

    nx = A.shape[1]
    rargs = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(E), K1,
             jnp.asarray(G[:, :nx]), jnp.asarray(G[:, nx:]), jnp.asarray(Gf),
             regs, eps)
    r1 = jax.jit(response_streaming_folded)(*rargs)
    r2 = jax.jit(lambda *a: response_streaming_blocked(*a, block=block))(*rargs)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-11)
