"""Column-axis sharding (parallel/columns.py) matches the dense single-chip
SLS kernels on the 8-device virtual CPU mesh, including when the column
count does not divide the mesh (padding path) and for large horizons."""

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
    response_streaming,
    tube_cost,
)
from robust_nonlinear_mpc_tpu.parallel.columns import (
    column_mesh,
    column_sharded_backward_solve,
    column_sharded_response,
    sharded_tube_iteration,
)

EPS = 1e-10


def _problem(N, nx=3, nu=2, ni=5, ni_f=4, nw=3, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(0.9 * rng.standard_normal((N, nx, nx)) / np.sqrt(nx))
    B = jnp.asarray(rng.standard_normal((N, nx, nu)) / np.sqrt(nu))
    E = jnp.asarray(0.1 * rng.standard_normal((N + 1, nx, nw)))
    Gmat = jnp.asarray(rng.standard_normal((ni, nx + nu)))
    Gf = jnp.asarray(rng.standard_normal((ni_f, nx)))
    mu = jnp.asarray(np.abs(rng.standard_normal((N, ni))))
    mu_f = jnp.asarray(np.abs(rng.standard_normal((ni_f,))))
    regs = SLSRegs(
        Q_reg=jnp.eye(nx) * 2.0, R_reg=jnp.eye(nu) * 3.0, Q_reg_f=jnp.eye(nx) * 5.0
    )
    beta = jnp.asarray(np.abs(rng.standard_normal((N, N, ni))))
    kk = jnp.arange(N)[:, None]
    jj = jnp.arange(N)[None, :]
    beta = jnp.where((kk >= jj)[:, :, None], beta, 0.0)
    beta_f = jnp.asarray(np.abs(rng.standard_normal((N + 1, ni_f))))
    return A, B, E, Gmat, Gf, mu, mu_f, beta, beta_f, regs


@pytest.fixture(scope="module")
def mesh():
    return column_mesh(8)


# N = 15 -> 16 columns / 8 devices (exact); N = 12 -> 13 columns (padded)
@pytest.mark.parametrize("N", [15, 12])
def test_sharded_backward_solve_matches_dense(mesh, N):
    A, B, E, Gmat, Gf, mu, mu_f, beta, beta_f, regs = _problem(N)
    eta, eta_f = evaluate_dual_eta(mu, mu_f, beta, beta_f, EPS)
    S_d, K_d = backward_solve(A, B, Gmat, Gf, eta, eta_f, regs)
    S_s, K_s = column_sharded_backward_solve(mesh, A, B, Gmat, Gf, eta, eta_f, regs)
    np.testing.assert_allclose(np.asarray(S_s), np.asarray(S_d), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(K_s), np.asarray(K_d), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("N", [15, 12])
def test_sharded_response_matches_dense(mesh, N):
    A, B, E, Gmat, Gf, mu, mu_f, beta0, beta_f0, regs = _problem(N)
    nx = A.shape[1]
    eta, eta_f = evaluate_dual_eta(mu, mu_f, beta0, beta_f0, EPS)
    _, K = backward_solve(A, B, Gmat, Gf, eta, eta_f, regs)
    Gx, Gu = Gmat[:, :nx], Gmat[:, nx:]

    Phi_x, Phi_u = propagate(A, B, E, K)
    beta_d, beta_f_d, boff_d, boff_f_d = backoff_from_phi(Phi_x, Phi_u, Gx, Gu, Gf, EPS)
    cost_d = tube_cost(Phi_x, Phi_u, regs)

    beta_s, beta_f_s, boff_s, boff_f_s, cost_s = column_sharded_response(
        mesh, A, B, E, K, Gx, Gu, Gf, regs, EPS
    )
    np.testing.assert_allclose(np.asarray(beta_s), np.asarray(beta_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(beta_f_s), np.asarray(beta_f_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(boff_s), np.asarray(boff_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(boff_f_s), np.asarray(boff_f_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(cost_s), float(cost_d), rtol=1e-10)


@pytest.mark.parametrize("N", [15, 12])
def test_sharded_tube_iteration_matches_dense_pipeline(mesh, N):
    A, B, E, Gmat, Gf, mu, mu_f, beta0, beta_f0, regs = _problem(N)
    nx = A.shape[1]
    Gx, Gu = Gmat[:, :nx], Gmat[:, nx:]

    # dense pipeline: eta -> backward Riccati -> streaming response
    eta, eta_f = evaluate_dual_eta(mu, mu_f, beta0, beta_f0, EPS)
    _, K_d = backward_solve(A, B, Gmat, Gf, eta, eta_f, regs)
    beta_d, beta_f_d, boff_d, boff_f_d, cost_d = response_streaming(
        A, B, E, K_d, Gx, Gu, Gf, regs, EPS
    )

    K_s, beta_s, beta_f_s, boff_s, boff_f_s, cost_s = sharded_tube_iteration(
        mesh, A, B, E, Gmat, Gf, mu, mu_f, beta0, beta_f0, regs, EPS
    )
    np.testing.assert_allclose(np.asarray(K_s), np.asarray(K_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(beta_s), np.asarray(beta_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(beta_f_s), np.asarray(beta_f_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(boff_s), np.asarray(boff_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(boff_f_s), np.asarray(boff_f_d), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(cost_s), float(cost_d), rtol=1e-10)


def test_large_horizon_padded(mesh):
    """N = 41 -> 42 columns over 8 devices (pad 6): the sizing the module is
    for — long horizons where the O(N^2) response is the dominant cost."""
    A, B, E, Gmat, Gf, mu, mu_f, beta0, beta_f0, regs = _problem(41, seed=3)
    nx = A.shape[1]
    Gx, Gu = Gmat[:, :nx], Gmat[:, nx:]
    eta, eta_f = evaluate_dual_eta(mu, mu_f, beta0, beta_f0, EPS)
    _, K_d = backward_solve(A, B, Gmat, Gf, eta, eta_f, regs)
    beta_d, beta_f_d, boff_d, boff_f_d, cost_d = response_streaming(
        A, B, E, K_d, Gx, Gu, Gf, regs, EPS
    )
    K_s, beta_s, beta_f_s, boff_s, boff_f_s, cost_s = sharded_tube_iteration(
        mesh, A, B, E, Gmat, Gf, mu, mu_f, beta0, beta_f0, regs, EPS
    )
    np.testing.assert_allclose(np.asarray(K_s), np.asarray(K_d), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(boff_s), np.asarray(boff_d), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(boff_f_s), np.asarray(boff_f_d), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(cost_s), float(cost_d), rtol=1e-9)


def test_column_contributions_are_exactly_zero_for_padding(mesh):
    """Padded columns (j > N) must not inject the epsilon floor into the
    psum'd backoffs: compare a padded mesh run against a 1-device run."""
    A, B, E, Gmat, Gf, mu, mu_f, beta0, beta_f0, regs = _problem(12, seed=7)
    one = column_mesh(1)
    out8 = sharded_tube_iteration(mesh, A, B, E, Gmat, Gf, mu, mu_f, beta0, beta_f0, regs, EPS)
    out1 = sharded_tube_iteration(one, A, B, E, Gmat, Gf, mu, mu_f, beta0, beta_f0, regs, EPS)
    for a, b in zip(out8, out1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12)


def test_solver_level_column_mesh_equivalence_N60(mesh):
    """The FastSLSOptions.column_mesh consumer (VERDICT r1 item 5): a full
    SCP-SLS solve at a LARGE horizon (pendulum, N=60) routed through the
    column-sharded kernels on the 8-device mesh matches the single-chip
    streaming path at f64 roundoff."""
    from robust_nonlinear_mpc_tpu.models import Pendulum
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver, SCPSLSOptions

    def build(col_mesh):
        m = Pendulum()
        m.E = 0.003 * np.eye(4)
        opts = SCPSLSOptions(streaming_response=True, column_mesh=col_mesh)
        return SCPSLSSolver(
            60, np.eye(4), np.eye(1), m, 10 * np.eye(4),
            Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1),
            Q_reg_f=1e4 * np.eye(4),
            rti=1, fast_sls_rti_steps=1, options=opts, verbose=False,
        )

    x0 = np.array([0.5, 0.5, 0.0, 0.0])
    sols = []
    for cm in (None, mesh):
        solver = build(cm)
        s0 = solver.solve(x0)
        solver.reset_warm_start()
        s1 = solver.solve(x0 * 0.9)
        sols.append((s0, s1))
    for (a, b) in zip(*sols):
        assert a["success"] and b["success"]
        np.testing.assert_allclose(
            np.asarray(a["primal_u"]), np.asarray(b["primal_u"]),
            rtol=1e-8, atol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(a["backoff_x"]), np.asarray(b["backoff_x"]),
            rtol=1e-8, atol=1e-10,
        )
