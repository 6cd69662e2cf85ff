"""Pallas fused response kernel vs the XLA kernels (interpret mode on CPU)."""

import numpy as np
import pytest

from robust_nonlinear_mpc_tpu.ops.pallas_response import fused_response

from tests import oracles


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_response_matches_oracles(seed):
    rng = np.random.default_rng(seed)
    N, nx, nu, nw, ni, nif = 6, 5, 2, 5, 8, 6
    A = rng.standard_normal((N, nx, nx)) * 0.3
    B = rng.standard_normal((N, nx, nu))
    E = 0.2 * rng.standard_normal((N + 1, nx, nw))
    G = rng.standard_normal((ni, nx + nu))
    Gf = rng.standard_normal((nif, nx))
    mu = np.abs(rng.standard_normal((N, ni)))
    muf = np.abs(rng.standard_normal(nif))
    beta = np.abs(rng.standard_normal((N, N, ni)))
    betaf = np.abs(rng.standard_normal((N + 1, nif)))
    Qr, Rr, Qrf = 2 * np.eye(nx), 3 * np.eye(nu), 5 * np.eye(nx)

    eta, etaf = oracles.eta_np(mu, muf, beta, betaf, 1e-10)
    _, K = oracles.backward_np(A, B, G, Gf, eta, etaf, Qr, Rr, Qrf)
    Px_ref, Pu_ref = oracles.propagate_np(A, B, E, K)
    b_ref, bf_ref, bo_ref, bof_ref = oracles.backoff_np(
        Px_ref, Pu_ref, G[:, :nx], G[:, nx:], Gf, 1e-10
    )
    tc_ref = oracles.tube_cost_np(Px_ref, Pu_ref, Qr, Rr, Qrf)

    Px, Pu, b, bf, bo, bof, tc = fused_response(
        A, B, E, K, G[:, :nx], G[:, nx:], Gf, Qr, Rr, Qrf, interpret=True
    )
    # f32 kernel vs f64 oracle
    np.testing.assert_allclose(np.asarray(Px), Px_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Pu), Pu_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), b_ref, atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bo), bo_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bof), bof_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(tc), tc_ref, rtol=1e-5)
