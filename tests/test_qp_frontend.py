"""QP front-end (stateful API parity with reference qp_jit.QP) smoke tests."""

import numpy as np
import pytest

from robust_nonlinear_mpc_tpu.models.linear import LTI, LTV
from robust_nonlinear_mpc_tpu.models import Pendulum
from robust_nonlinear_mpc_tpu.native import available
from robust_nonlinear_mpc_tpu.solvers.qp_frontend import QP


def _lti():
    A = np.array([[1.0, 0.1], [0.0, 1.0]])
    B = np.array([[0.005], [0.1]])
    E = 0.1 * np.eye(2)
    G = np.vstack([np.eye(3), -np.eye(3)])
    g = np.array([4.0, 4.0, 2.0, 4.0, 4.0, 2.0])
    Gf = np.vstack([np.eye(2), -np.eye(2)])
    gf = np.array([4.0, 4.0, 4.0, 4.0])
    return LTI(A, B, E, G=G, g=g, Gf=Gf, gf=gf)


@pytest.mark.parametrize("backend", ["jax"] + (["native"] if available() else []))
def test_frontend_lti_solve(backend):
    m = _lti()
    qp = QP(6, np.eye(2), 0.1 * np.eye(1), m, 5 * np.eye(2), backend=backend)
    # x(0) is pinned to -x0 (reference sign convention)
    sol = qp.solve(np.array([-3.0, -0.5]))
    assert sol["success"]
    np.testing.assert_allclose(sol["primal_x"][:, 0], [3.0, 0.5], atol=1e-7)
    # dynamics hold
    X, U = sol["primal_x"], sol["primal_u"]
    for k in range(6):
        np.testing.assert_allclose(
            X[:, k + 1], m.A @ X[:, k] + m.B @ U[:, k], atol=1e-7
        )
    assert np.max(np.abs(X)) <= 4.0 + 1e-6


def test_frontend_updates_change_solution():
    m = _lti()
    qp = QP(6, np.eye(2), 0.1 * np.eye(1), m, 5 * np.eye(2))
    s1 = qp.solve(np.array([-3.0, -0.5]))
    # the unconstrained optimum rides the |u| <= 2 bound; tightening the
    # input rows must change the trajectory (state rows stay feasible)
    h = np.asarray(qp._nominal_h).copy()
    h[:, 2] = 1.5   # u upper bound rows
    h[:, 5] = 1.5   # u lower bound rows
    qp.update_ubg(h)
    s2 = qp.solve(np.array([-3.0, -0.5]))
    assert s2["success"]
    assert np.max(np.abs(s2["primal_u"])) <= 1.5 + 1e-6
    assert not np.allclose(s1["primal_u"], s2["primal_u"])

    # an infeasible tightening must be reported as failure
    qp.update_ubg(0.5 * np.asarray(qp._nominal_h), 0.5 * np.asarray(qp._nominal_hf))
    s_inf = qp.solve(np.array([-3.0, -0.5]))
    assert not s_inf["success"]
    qp.reset_ubg()
    s3 = qp.solve(np.array([-3.0, -0.5]))
    np.testing.assert_allclose(s3["primal_u"], s1["primal_u"], atol=1e-7)
    # linear cost update shifts the optimum
    qp.update_q_cost_lin(np.ones((7, 2)), np.ones((6, 1)))
    s4 = qp.solve(np.array([-3.0, -0.5]))
    assert not np.allclose(s4["primal_u"], s1["primal_u"])


def test_frontend_ltv_from_model():
    m = Pendulum()
    ltv = LTV(m, 5)
    import jax
    import jax.numpy as jnp

    X = jnp.zeros((6, 4))
    U = jnp.zeros((5, 1))
    A, B, c = m.linearize_traj(X, U)
    ltv.update_model(np.asarray(A), np.asarray(B),
                     np.zeros((6, 4, 4)), np.broadcast_to(m.g, (5, 10)), m.gf)
    qp = QP(5, np.eye(4), np.eye(1), ltv, 10 * np.eye(4))
    qp.offset_constraints(np.asarray(c))
    sol = qp.solve(np.array([-0.5, -0.5, 0.0, 0.0]))
    assert sol["success"]
    np.testing.assert_allclose(sol["primal_x"][:, 0], [0.5, 0.5, 0, 0], atol=1e-7)


def test_frontend_reset_lbg_clears_equality_offsets():
    """reset_lbg restores the nominal equality rhs (reference qp_jit.py:589,
    called by fast_SLS initialize_solver, fast_SLS_jit.py:437): after an
    offset_constraints + reset_lbg + reset_ubg round trip the solution
    matches a fresh solve."""
    m = _lti()
    qp = QP(6, np.eye(2), 0.1 * np.eye(1), m, 5 * np.eye(2))
    x0 = np.array([-3.0, -0.5])
    ref = qp.solve(x0)
    qp.offset_constraints(0.02 * np.ones((6, 2)))
    shifted = qp.solve(x0)
    assert shifted["success"]
    assert np.max(np.abs(shifted["primal_x"] - ref["primal_x"])) > 1e-3
    qp.reset_lbg()
    qp.reset_ubg()
    back = qp.solve(x0)
    np.testing.assert_allclose(back["primal_x"], ref["primal_x"], atol=1e-9)


def test_frontend_quadprog_export(tmp_path):
    """export_standard_QP dumps every successful solve as a MATLAB quadprog
    problem (reference qp_jit.py:36,477,884-943): same field names, and the
    stored solution must be the optimum of the stored standard-form QP."""
    from scipy.io import loadmat

    from tests.oracles import dense_qp_reference

    m = _lti()
    qp = QP(6, np.eye(2), 0.1 * np.eye(1), m, 5 * np.eye(2),
            export_standard_QP=True, export_dir=str(tmp_path))
    x0 = np.array([-3.0, -0.5])
    sol = qp.solve(x0)
    assert sol["success"]
    qp.solve(np.array([-2.0, 0.5]))
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == ["qp_export_000000.mat", "qp_export_000001.mat"]

    d = loadmat(tmp_path / "qp_export_000000.mat")
    for key in ("H", "f", "A", "b", "Aeq", "beq", "lb", "ub", "x0",
                "x_sol", "x_traj", "u_traj", "cost", "backend", "dimensions"):
        assert key in d, key
    y = d["x_sol"].ravel()
    H, f = d["H"], d["f"].ravel()
    # stored solution is feasible for the stored problem
    np.testing.assert_allclose(d["Aeq"] @ y, d["beq"].ravel(), atol=1e-7)
    assert np.all(d["A"] @ y <= d["b"].ravel() + 1e-7)
    # stored cost is the quadprog objective at the solution
    np.testing.assert_allclose(
        0.5 * y @ H @ y + f @ y, float(d["cost"]), rtol=1e-6, atol=1e-8
    )
    # and it is the OPTIMUM: an independent dense solve agrees
    y_ref, cost_ref, status = dense_qp_reference(
        H / 2, f, d["Aeq"], d["beq"].ravel(), d["A"], d["b"].ravel()
    )
    assert status == 0
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
    np.testing.assert_allclose(float(d["cost"]), cost_ref, rtol=1e-5, atol=1e-7)
