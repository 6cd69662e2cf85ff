"""Oracle closed-loop drivers reproducing the reference's seeded experiments.

One function per experiment, mirroring the sim-loop structure and noise
handling of `expe/main_{pendulum,quadrotor,rocket}_robust_closed_loop.py`:
warm-shift (i>0), solve, apply u0, propagate — pendulum/quadrotor noise-free
(`main_pendulum...py:96`, `main_quadrotor...py:133`), rocket with
w ~ U[-1,1]^nx from the seeded global-RNG stream (`main_rocket...py:30,178-182`).
"""

from __future__ import annotations

import numpy as np

from .models import OraclePendulum, OracleQuadrotor, OracleRocket
from .scp_sls import OracleSCPSLS

ROCKET_X0 = np.array([
    1.75729, 4.15951, 4.72757,
    -0.18913, -0.38367, -0.08697,
    -0.79487, 0.00768, -0.21110, -0.56883,
    -0.12752, -0.58026, -0.76542,
    0.20555, 0.54610, -0.40116, -0.35401,
])


def _run(m, solver, x0, steps, *, noise=False, rng=None):
    x0 = np.asarray(x0, float).ravel()
    U_applied = np.zeros((m.nu, steps - 1))
    X_visited = np.zeros((m.nx, steps))
    X_visited[:, 0] = x0
    for i in range(steps):
        if i > 0:
            solver.reset_warm_start()
        sol = solver.solve(x0)
        assert sol.get("success", False) or "primal_u" in sol, \
            f"oracle solve failed hard at step {i}"
        u0 = np.asarray(sol["primal_u"][:, 0]).ravel()
        if i < steps - 1:
            U_applied[:, i] = u0
            x0 = np.asarray(m.ddyn(x0, u0, m.dt), float).ravel()
            if noise:
                x0 = x0 + np.asarray(m.E, float) @ (2.0 * rng.rand(m.nx) - 1.0)
            X_visited[:, i + 1] = x0
    return X_visited, U_applied


def run_pendulum(steps=60, N=15):
    m = OraclePendulum()
    m.E = 0.003 * np.eye(m.nx)
    m.dt = 0.05
    x_max = 10 * np.ones(m.nx)
    u_max = 5 * np.ones(m.nu)
    m.replace_constraints(x_max, -x_max, u_max, -u_max, x_max, -x_max)
    solver = OracleSCPSLS(
        N, np.eye(m.nx), np.eye(m.nu), m, 10 * np.eye(m.nx),
        Q_reg=1e3 * np.eye(m.nx), R_reg=1e3 * np.eye(m.nu),
        Q_reg_f=1e4 * np.eye(m.nx), rti=3, fast_sls_rti_steps=2)
    return _run(m, solver, np.array([0.5, 0.5, 0.0, 0.0]), steps)


def run_quadrotor(steps=30, N=15, x0=None):
    m = OracleQuadrotor()
    m.dt = 0.05
    sigma_theta = np.deg2rad(2.0)
    q_vec_std = 0.5 * sigma_theta
    q_w_std = 0.1 * q_vec_std
    m.E = m.dt * 5 * np.diag([0.10, 0.10, 0.10, 0.15, 0.15, 0.15,
                              q_w_std, q_vec_std, q_vec_std, q_vec_std,
                              0.2, 0.2, 0.2])
    Q = np.diag([10.0, 10.0, 10.0, 1.0, 1.0, 1.0,
                 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
    R = np.eye(4)
    solver = OracleSCPSLS(
        N, Q, R, m, 10 * Q,
        Q_reg=1e4 * np.eye(m.nx), R_reg=1e4 * np.eye(m.nu),
        Q_reg_f=1e4 * np.eye(m.nx), rti=3, fast_sls_rti_steps=2)
    if x0 is None:
        x0 = np.zeros(m.nx)
        x0[:3] = [2.0, -1.5, 1.0]
        x0[6] = 1.0
    return _run(m, solver, x0, steps)


def make_rocket_oracle(N=15):
    """Rocket oracle model + solver in the reference experiment config
    (`main_rocket_robust_closed_loop.py:34-85`); shared by run_rocket and
    the sensitivity probes (sensitivity.py)."""
    m = OracleRocket()
    m.dt = 0.05
    sigma_theta = np.deg2rad(2.0)
    q_vec_std = 0.5 * sigma_theta
    q_w_std = 0.1 * q_vec_std
    m.E = m.dt * np.diag([0.20, 0.20, 0.20, 0.2, 0.20, 0.20,
                          q_vec_std, q_vec_std, q_vec_std, q_w_std,
                          0.2, 0.2, 0.2, 0.8, 0.2, 0.04, 0.04])
    # `main_rocket_robust_closed_loop.py:34-59`
    Q = np.diag([10.0, 10.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
                 1.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0])
    R = np.eye(m.nu)
    solver = OracleSCPSLS(
        N, Q, R, m, 10 * Q,
        Q_reg=1e4 * np.eye(m.nx), R_reg=1e4 * np.eye(m.nu),
        Q_reg_f=1e4 * np.eye(m.nx), rti=1, fast_sls_rti_steps=1)
    return m, solver


def run_rocket(steps=30, N=15):
    m, solver = make_rocket_oracle(N)
    rng = np.random.RandomState(0)  # == np.random.seed(0) global MT stream
    return _run(m, solver, ROCKET_X0, steps, noise=True, rng=rng)
