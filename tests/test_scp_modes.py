"""SCP solver modes: until-convergence (rti = -1), deviation-mismatch probe,
LQR generator, reset semantics."""

import numpy as np
import pytest

from robust_nonlinear_mpc_tpu.models import Pendulum
from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver


def _solver(rti=-1, inner=0, N=8):
    m = Pendulum()
    m.E = 0.003 * np.eye(4)
    return m, SCPSLSSolver(
        N, np.eye(4), np.eye(1), m, 10 * np.eye(4),
        Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1), Q_reg_f=1e4 * np.eye(4),
        rti=rti, fast_sls_rti_steps=inner,
    )


def test_until_convergence_mode():
    """rti = -1: iterate until |delta|_inf < epsilon_convergence
    (reference SCP_SLS_jit.py:104-133); inner loop also until convergence."""
    m, solver = _solver(rti=-1, inner=0)
    solver.opts = solver.opts._replace(epsilon_convergence=1e-8)
    sol = solver.solve(np.array([0.4, 0.3, 0.1, 0.0]))
    assert sol["success"]
    assert sol["iterations"] < 20
    # converged trajectory: dynamics defects at machine precision
    assert abs(sol["primal_infeasibility"]) < 1e-8
    X, U = sol["primal_x"], sol["primal_u"]
    # constraints hold with the tube tightening
    assert np.max(np.abs(U)) <= 5.0 + 1e-9
    assert np.max(np.abs(X)) <= 10.0 + 1e-9


def test_rti_matches_until_convergence_at_fixpoint():
    """After convergence, one more RTI step must not move the iterate."""
    m, solver = _solver(rti=-1, inner=0)
    solver.opts = solver.opts._replace(epsilon_convergence=1e-9)
    x0 = np.array([0.4, 0.3, 0.1, 0.0])
    sol = solver.solve(x0)
    U_conv = sol["primal_u"].copy()

    # continue with a single RTI iteration from the converged state
    solver.opts = solver.opts._replace(rti=1)
    sol2 = solver.solve(x0)
    np.testing.assert_allclose(sol2["primal_u"], U_conv, atol=1e-6)


def test_eval_deviation_mismatch():
    m, solver = _solver(rti=1, inner=1)
    x0 = np.array([0.4, 0.3, 0.1, 0.0])
    solver.solve(x0)
    N, nx, nu = solver.N, m.nx, m.nu
    e = 1e-3 * np.ones((nx, N + 1))
    d = 1e-3 * np.ones((nu, N))
    out = solver.eval_deviation_mismatch(e, d)
    # linearization error of a smooth system at 1e-3 deviations is O(1e-6)
    assert out["mismatch"].shape == (nx, N)
    assert np.max(np.abs(out["mismatch"])) < 1e-5
    # zero deviation -> zero mismatch
    out0 = solver.eval_deviation_mismatch(np.zeros((nx, N + 1)), np.zeros((nu, N)))
    np.testing.assert_allclose(out0["mismatch"], 0.0, atol=1e-12)


def test_generate_lqr_controller():
    m, solver = _solver()
    lqr = solver.generate_lqr_controller()
    A, B, K, P = lqr["A"], lqr["B"], lqr["K"], lqr["P"]
    # DARE residual
    res = A.T @ P @ A - P - (A.T @ P @ B) @ np.linalg.solve(
        solver.R + B.T @ P @ B, B.T @ P @ A
    ) + solver.Q
    np.testing.assert_allclose(res, 0.0, atol=1e-8)
    # closed loop stable
    eigs = np.abs(np.linalg.eigvals(A - B @ K))
    assert np.all(eigs < 1.0)
    # like the reference (:656-657), Qf is overwritten with P
    np.testing.assert_allclose(solver.Qf, P)


def test_reset_clears_warm_state():
    m, solver = _solver(rti=1, inner=1)
    x0 = np.array([0.4, 0.3, 0.1, 0.0])
    s1 = solver.solve(x0)
    solver.reset()
    assert solver._X is None
    s2 = solver.solve(x0)  # re-runs nominal init
    np.testing.assert_allclose(s1["primal_u"], s2["primal_u"], atol=1e-7)


def test_solve_profiled_stage_timings():
    """solve_profiled: per-stage timings and consistency with the fused path
    (rti = 1 / fast_sls_rti_steps = 1 only)."""
    m, solver_a = _solver(rti=1, inner=1)
    x0 = np.array([0.4, 0.3, 0.1, 0.0])
    fused = solver_a.solve(x0)

    m2, solver_b = _solver(rti=1, inner=1)
    prof = solver_b.solve_profiled(x0)
    assert prof["success"]
    for k in ("t_jac_ms", "t_qp_ms", "t_backward_ms", "t_tighten_ms"):
        assert prof[k] >= 0.0
    # same math as the fused iteration
    np.testing.assert_allclose(prof["primal_u"], fused["primal_u"], atol=1e-7)
    np.testing.assert_allclose(prof["backoff"], fused["backoff"], atol=1e-8)


def test_throughput_options_first_class():
    """SCPSLSOptions exposes the throughput modes (streaming response,
    dual-recycling, loose first-QP) without monkeypatching _fast_sls_opts;
    the closed-loop solve stays successful and feasible."""
    m, solver = _solver(rti=1, inner=1)
    solver.opts = solver.opts._replace(
        streaming_response=True, recycle_eta=True
    )
    fso = solver._fast_sls_opts()
    assert fso.streaming_response and fso.recycle_eta

    x0 = np.array([0.4, 0.3, 0.1, 0.0])
    sol = solver.solve(x0)
    assert sol["success"]
    # streaming mode leaves Phi unfilled (zeros in the full-size persist)
    assert float(np.max(np.abs(sol["Phi_x"]))) == 0.0
    # recycled eta from the first QP's duals survives the warm shift
    solver.reset_warm_start()
    assert float(np.max(np.abs(np.asarray(solver._persist.eta)))) > 0
    sol2 = solver.solve(x0)
    assert sol2["success"]
    X, U = sol2["primal_x"], sol2["primal_u"]
    assert np.max(np.abs(U)) <= 5.0 + 1e-9
    assert np.max(np.abs(X)) <= 10.0 + 1e-9


def test_ctor_kwarg_parity():
    """The remaining reference ctor kwargs (SCP_SLS_jit.py:33-44) are
    accepted: save_it_data gates it_data capture, linearization_error=True
    raises (as the reference's update_jacobian does), warm_start_ubg_shift
    is accepted and recorded (its reference consumer is dead code)."""
    m = Pendulum()
    solver = SCPSLSSolver(
        5, np.eye(m.nx), np.eye(m.nu), m, np.eye(m.nx),
        rti=1, fast_sls_rti_steps=1,
        save_it_data=False, warm_start_ubg_shift=False,
    )
    assert not solver.save_it_data
    assert not solver.warm_start_ubg_shift_enabled
    res = solver.solve(np.array([0.1, 0.0, 0.0, 0.0]))
    assert res["success"]
    assert solver.it_data == {}

    with pytest.raises(NotImplementedError):
        SCPSLSSolver(
            5, np.eye(m.nx), np.eye(m.nu), m, np.eye(m.nx),
            rti=1, linearization_error=True,
        )
