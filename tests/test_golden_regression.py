"""Golden closed-loop regression tests (REGRESSION PINS ONLY).

Since round 2 these are no longer the behavioral acceptance bar: that role
belongs to tests/test_reference_parity.py, which diffs the framework against
the independent full-stack reference oracle (tests/reference_port/) on the
three seeded closed loops. The goldens remain as cheap change-detectors:
they freeze the framework's OWN seeded closed-loop outputs (CPU, f64) so
any future change that shifts the control sequence is caught at 1e-8.

Regenerate deliberately (after an intended behavior change) with the script
embedded in the repo history (see the commit that added tests/golden/).
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_rocket_closed_loop_matches_golden():
    g = np.load(os.path.join(GOLDEN_DIR, "rocket_closed_loop_10.npz"))

    from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
        X0,
        make_rocket_problem,
    )
    from robust_nonlinear_mpc_tpu.sim.closed_loop import run_closed_loop

    np.random.seed(0)
    m, solver = make_rocket_problem(15)
    solver.opts = solver.opts._replace(verbose=False)
    out = run_closed_loop(
        m, solver, np.array(X0), 10, noise="uniform", rng=np.random.RandomState(0)
    )
    np.testing.assert_allclose(
        out["input_trajectory"], g["input_trajectory"], atol=1e-8
    )
    np.testing.assert_allclose(
        out["state_trajectory"], g["state_trajectory"], atol=1e-8
    )
    np.testing.assert_allclose(
        out["backoff_trajectory_x"][:, :, 5], g["backoff_x0"], atol=1e-8
    )


def test_pendulum_closed_loop_matches_golden():
    g = np.load(os.path.join(GOLDEN_DIR, "pendulum_closed_loop_10.npz"))

    from robust_nonlinear_mpc_tpu.models import Pendulum
    from robust_nonlinear_mpc_tpu.sim.closed_loop import run_closed_loop
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

    m = Pendulum()
    m.E = 0.003 * np.eye(4)
    solver = SCPSLSSolver(
        15, np.eye(4), np.eye(1), m, 10 * np.eye(4),
        Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1), Q_reg_f=1e4 * np.eye(4),
        rti=3, fast_sls_rti_steps=2,
    )
    out = run_closed_loop(m, solver, np.array([0.5, 0.5, 0.0, 0.0]), 10, noise="none")
    np.testing.assert_allclose(
        out["input_trajectory"], g["input_trajectory"], atol=1e-8
    )
    np.testing.assert_allclose(
        out["state_trajectory"], g["state_trajectory"], atol=1e-8
    )
