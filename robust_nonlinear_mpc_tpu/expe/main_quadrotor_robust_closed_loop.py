"""Quadrotor robust closed loop.

Config parity with the reference `expe/main_quadrotor_robust_closed_loop.py`:
N = 15, Q = diag(10,10,10, 1,1,1, 1,1,1,1, 2,2,2), R = I, Qf = 10 Q,
regs = 1e4 I, rti = 3, fast_sls_rti_steps = 2, E = dt*5*diag(...), 30
noise-free steps, random x0 within half the state bounds with a unit
quaternion (here drawn from a seeded rng so runs are reproducible; the
reference uses an unseeded default_rng, reference :83).

Usage:  python -m robust_nonlinear_mpc_tpu.expe.main_quadrotor_robust_closed_loop --run [--N 15]
"""

from __future__ import annotations

import argparse

from robust_nonlinear_mpc_tpu.utils.platform import setup

FOLDER = "quadrotor_robust_closed_loop"


def generate(N: int | None = None, sim_steps: int = 30, seed: int | None = 1234):
    setup("cpu", x64=True)
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe._common import save_results
    from robust_nonlinear_mpc_tpu.models import Quadrotor
    from robust_nonlinear_mpc_tpu.sim.closed_loop import run_closed_loop
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

    np.random.seed(0)
    m = Quadrotor()
    Q = np.diag([10.0, 10.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
    R = np.eye(4)
    Qf = 10 * Q
    N = int(N) if N is not None else 15
    m.dt = 0.05

    sigma_theta = np.deg2rad(2.0)
    q_vec_std = 0.5 * sigma_theta
    q_w_std = 0.1 * q_vec_std
    m.E = m.dt * 5 * np.diag(
        [0.10, 0.10, 0.10,
         0.15, 0.15, 0.15,
         q_w_std, q_vec_std, q_vec_std, q_vec_std,
         0.2, 0.2, 0.2]
    )

    solver = SCPSLSSolver(
        N, Q, R, m, Qf,
        Q_reg=1e4 * np.eye(m.nx), R_reg=1e4 * np.eye(m.nu),
        Q_reg_f=1e4 * np.eye(m.nx),
        rti=3, fast_sls_rti_steps=2, verbose=True,
    )

    # random x0 within half-range with a unit quaternion (reference :82-90)
    ub_x = m.g[: m.nx]
    lb_x = -m.g[m.nx + m.nu : m.nx + m.nu + m.nx]
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(lb_x / 2, ub_x / 2)
    q_rand = rng.normal(size=4)
    nrm = np.linalg.norm(q_rand)
    q_rand = q_rand / nrm if nrm > 1e-12 else np.array([1.0, 0, 0, 0])
    x0[6:10] = q_rand

    results = run_closed_loop(m, solver, x0, sim_steps, noise="none", verbose=True)
    return save_results(FOLDER, "quadrotor_robust_closed_loop", results)


def plot():
    from robust_nonlinear_mpc_tpu.expe._common import plot_closed_loop

    plot_closed_loop(FOLDER)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--N", type=int, default=None)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()
    if args.run:
        generate(args.N, args.steps)
    else:
        plot()
