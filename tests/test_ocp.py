"""Tests for the reference-API parity surface: `solvers/ocp.py` (the OCP
container, reference `solver/ocp.py:7-119`) and the output-feedback model
stubs (`models/linear.py`, reference `dyn/{LTI_OF,LTV_OF}.py`).

The packing helpers are cross-checked against the independent reference-port
oracle (`tests/reference_port/scp_sls.pack_primal`), and the Riccati-step
helpers against the oracle's loop-level recursion.
"""

import numpy as np
import pytest

from reference_port.fast_sls import riccati_step as oracle_riccati_step
from reference_port.scp_sls import pack_primal as oracle_pack
from robust_nonlinear_mpc_tpu.models import LTI, LTI_OF, LTV, LTV_OF, Pendulum
from robust_nonlinear_mpc_tpu.solvers.ocp import OCP


def _lti(nx=3, nu=2, seed=0):
    rng = np.random.default_rng(seed)
    A = 0.8 * rng.standard_normal((nx, nx)) / np.sqrt(nx)
    B = rng.standard_normal((nx, nu))
    E = 0.1 * np.eye(nx)
    G = np.vstack([np.eye(nx + nu), -np.eye(nx + nu)])
    g = np.ones(2 * (nx + nu))
    Gf = np.vstack([np.eye(nx), -np.eye(nx)])
    gf = np.ones(2 * nx)
    return LTI(A, B, E, G=G, g=g, Gf=Gf, gf=gf)


def test_pack_unpack_roundtrip_and_oracle_agreement():
    m = _lti()
    N = 5
    ocp = OCP(N, np.eye(m.nx), np.eye(m.nu), m, 2 * np.eye(m.nx))
    rng = np.random.default_rng(1)
    X = rng.standard_normal((m.nx, N + 1))
    U = rng.standard_normal((m.nu, N))
    y = ocp.pack_primal_nominal(X, U)
    np.testing.assert_array_equal(y, oracle_pack(X, U))
    X2, U2 = ocp.unpack_primal_nominal(y)
    np.testing.assert_array_equal(X, X2)
    np.testing.assert_array_equal(U, U2)
    with pytest.raises(AssertionError):
        ocp.unpack_primal_nominal(y[:-1])


def test_initialize_list_dynamics_lti_and_ltv():
    m = _lti()
    N = 4
    ocp = OCP(N, np.eye(m.nx), np.eye(m.nu), m, np.eye(m.nx))
    ocp.initialize_list_dynamics()
    assert ocp.A_stack.shape == (N, m.nx, m.nx)
    assert ocp.E_stack.shape == (N + 1, m.nx, m.nw)
    np.testing.assert_array_equal(ocp.A_stack[2], m.A)
    np.testing.assert_array_equal(ocp.g_stack[1], m.g)
    np.testing.assert_array_equal(ocp.c_offset_stack, 0.0)

    # LTV wrapper: placeholder ones until the first update (dyn/LTV.py:28-32)
    p = Pendulum()
    ltv = LTV(p, N)
    ocp2 = OCP(N, np.eye(p.nx), np.eye(p.nu), ltv, np.eye(p.nx))
    ocp2.initialize_list_dynamics()
    np.testing.assert_array_equal(ocp2.A_stack, 1.0)
    assert ocp2.B_stack.shape == (N, p.nx, p.nu)

    class Bogus:
        nx = nu = nw = ni = ni_f = 1

    with pytest.raises(ValueError):
        bogus_ocp = OCP(2, np.eye(1), np.eye(1), Bogus(), np.eye(1))
        bogus_ocp.initialize_list_dynamics()


def test_riccati_step_variants_agree_with_oracle():
    rng = np.random.default_rng(2)
    nx, nu = 4, 2
    A = rng.standard_normal((nx, nx)) * 0.5
    B = rng.standard_normal((nx, nu))
    Cx = np.eye(nx) + 0.1 * _psd(rng, nx)
    Cu = np.eye(nu) + 0.1 * _psd(rng, nu)
    Sk = np.eye(nx) + _psd(rng, nx)

    K1, S1 = OCP.riccati_step(A, B, Cx, Cu, Sk)
    K2, S2 = OCP.riccati_step_cholesky(A, B, Cx, Cu, Sk)
    Ko, So = oracle_riccati_step(A, B, Cx, Cu, Sk)
    np.testing.assert_allclose(K1, K2, atol=1e-12)
    np.testing.assert_allclose(S1, S2, atol=1e-12)
    np.testing.assert_allclose(K1, Ko, atol=1e-12)
    # the fast-SLS kernel symmetrizes S (fast_SLS_jit.py:61); OCP's does not
    np.testing.assert_allclose(0.5 * (S1 + S1.T), So, atol=1e-12)


def test_output_feedback_stubs():
    m = _lti()
    C = np.eye(2, m.nx)
    F = 0.1 * np.eye(2)
    of = LTI_OF(m.A, m.B, m.E, C, F)
    assert (of.ny, of.nv) == (2, 2)
    p = Pendulum()
    ofv = LTV_OF(p, 6)
    assert ofv.C_stack.shape == (7, p.nx, p.nx)
    assert ofv.F_stack.shape == (7, p.nx, p.nx)


def _psd(rng, n):
    M = rng.standard_normal((n, n))
    return M @ M.T / n
